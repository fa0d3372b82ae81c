package graft.ops

import graft.SparkSpec

/** Cross-validation of the three similarity-dedup candidate generators
  * (promised by the Dedup scaladoc): q_dedup_ngram is the exact
  * all-candidates ground truth; MinHash must find the same final pair
  * set on this corpus (J ≥ 0.97 for every true pair → band collision is
  * certain); SimHash is a verified SUBSET with measured recall.
  */
class DedupSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntryPairs(name, spark, sf0001)

  private object SparkEntryPairs {
    def apply(name: String, s: org.apache.spark.sql.SparkSession, d: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(s, d)
        .select("a_id", "b_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
  }

  test("minhash+LSH finds exactly the brute-force pair set") {
    val exact = pairs("q_dedup_ngram")
    val mh = pairs("q_dedup_minhash")
    assert(exact.nonEmpty)
    assert(mh == exact)
  }

  test("simhash candidates are a subset with recall ≥ 0.5 on this corpus") {
    val exact = pairs("q_dedup_ngram")
    val sh = pairs("q_dedup_simhash")
    assert(sh.subsetOf(exact), s"simhash produced non-duplicate pairs: ${sh -- exact}")
    val recall = sh.size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("connected components: chains merge, components stay separate, singletons self-label") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // component {1,5,9,12} as a chain, component {2,7}, singleton 3
    val pairs = Seq((1L, 5L), (5L, 9L), (9L, 12L), (2L, 7L)).toDF("a_id", "b_id")
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L, 12L).toDF("node")
    val got = Dedup.connectedComponents(pairs, nodes)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 5L -> 1L, 7L -> 2L, 9L -> 1L, 12L -> 1L))
  }

  test("connected components: a 300-link chain converges (pointer jumping, O(log d) rounds)") {
    import spark.implicits._
    val n = 300
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a_id", "b_id")
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val got = Dedup.connectedComponents(pairs, nodes).collect()
    assert(got.length == n)
    assert(got.forall(_.getLong(1) == 0L), "every chain node must label to the min id")
  }

  test("q_dedup_cc: cluster ids are the min doc_id over the ngram pair graph") {
    val pairs = SparkEntryPairs("q_dedup_ngram", spark, sf0001)
    val cc = graft.SparkEntry.queries("q_dedup_cc")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every paired doc shares its cluster with its partner
    pairs.foreach { case (a, b) => assert(cc(a) == cc(b), s"pair ($a,$b) split") }
    // docs in no pair label themselves
    val inPairs = pairs.flatMap { case (a, b) => Seq(a, b) }
    cc.foreach { case (doc, cl) => if (!inPairs(doc)) assert(cl == doc) }
  }

  test("connected components under reliable checkpoints: same labels, files on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.RELIABLE_CONF, "true")
    try {
      val pairs = Seq((1L, 5L), (5L, 9L), (2L, 7L)).toDF("a_id", "b_id")
      val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("node")
      val got = Dedup.connectedComponents(pairs, nodes)
        .orderBy("node")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 5L -> 1L, 7L -> 2L, 9L -> 1L))
      // the rounds actually persisted to the checkpoint dir (fault
      // tolerance is real, not just a flag)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable mode must write checkpoint files")
    } finally {
      spark.conf.unset(Materialize.RELIABLE_CONF)
    }
  }

  test("reliable checkpoints without a checkpoint dir fail loudly") {
    // a session with no checkpoint dir set must not silently fall back
    val s2 = spark.newSession()
    s2.conf.set(Materialize.RELIABLE_CONF, "true")
    import s2.implicits._
    val df = Seq(1L, 2L).toDF("x")
    // newSession shares the SparkContext (and thus any checkpoint dir a
    // sibling test set) — only assert when the context really has none
    if (s2.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] { Materialize(df) }
    } else {
      assert(Materialize(df).count() == 2L)
    }
  }

  test("incrementalPairs law: exactly {b new, a corpus or earlier-new}; corpus×corpus never emitted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one bucket per key; members parity-encoded (id*2 + isNew) across
    // every new/corpus interleaving of up to 4 members
    val rows = Seq(
      // key, id, isNew
      ("k1", 1L, 0), ("k1", 2L, 1), ("k1", 3L, 0), ("k1", 4L, 1),
      ("k2", 5L, 1), ("k2", 6L, 1), ("k2", 7L, 1),
      ("k3", 8L, 0), ("k3", 9L, 0),
      ("k4", 10L, 1),
      ("k5", 11L, 0), ("k5", 12L, 1)
    )
    val df = rows.toDF("key", "id", "isNew")
      .select(col("key"), (col("id") * 2 + col("isNew")).as("enc"))
    val buckets = BoundedBucket.buckets(df, Seq("key"), "enc", cap = 16)
    val got = BoundedBucket.incrementalPairs(buckets)
      .select(expr("a_enc div 2"), expr("b_enc div 2"))
      .as[(Long, Long)].collect().toSet
    val naive = (for {
      (ka, a, an) <- rows; (kb, b, bn) <- rows
      if ka == kb && bn == 1 && a != b && (an == 0 || a < b)
    } yield (a, b)).toSet
    assert(got == naive, s"pair law violated: got $got expected $naive")
    // explicit non-emission: corpus×corpus
    val corpus = rows.collect { case (_, id, 0) => id }.toSet
    assert(!got.exists { case (a, b) => corpus(a) && corpus(b) })
  }

  test("bloom decontamination: never misses a truly contaminated train doc; fp bounded") {
    // sf0.01, not sf0.001: the planted near-dups that straddle the split
    // boundary (the real contamination) only exist at the t2 scale
    val sf001 = "/root/testdata/sf0.01"
    // independent exact recompute, driver-side, on STRING shingles
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long = (id % 2147483647L * 2654435761L) % 4294967296L % 100L
    def shingles(text: String): Set[String] =
      text.split(" ", -1).sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    val testSh = docs.filter(d => bucket(d._1) >= 95).flatMap(d => shingles(d._2)).toSet
    val exactContaminated = docs
      .filter(d => bucket(d._1) < 90 && shingles(d._2).nonEmpty)
      .filter(d => shingles(d._2).exists(testSh))
      .map(_._1).toSet
    val got = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    val flagged = got.collect { case (id, true) => id }.toSet
    // one-sided error: every exact hit must be flagged
    assert(exactContaminated.subsetOf(flagged),
      s"bloom missed contaminated docs: ${exactContaminated -- flagged}")
    assert(exactContaminated.nonEmpty, "corpus must plant real contamination")
    // false positives bounded: fpp 1e-4 compounds to ~0.5% per 50-shingle
    // doc — allow 2% of train docs as slack on the small corpus
    val fp = flagged -- exactContaminated
    assert(fp.size <= math.max(2, got.size / 50), s"fp docs: ${fp.size} of ${got.size}")
  }

  test("exact dedup survivor rule: lowest doc_id kept, copies counted") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.count()
    val res = Dedup.qDedupExact.fn(spark, sf0001)
    assert(res.select(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0) == total)
  }

  test("q_pit_join: no future leakage — every feature was valid at its probe time (brute force)") {
    // single Long key for a timestamp incl. sub-millisecond precision
    def tsKey(t: java.sql.Timestamp): Long =
      (t.getTime / 1000) * 1000000000L + t.getNanos
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
    // history versions per entity in (ts, event_id) order, version = idx+1
    val hist = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> es.sortBy(e => (tsKey(e._3), e._4)).zipWithIndex
    }
    val out = Dedup.qPitJoin.fn(spark, sf0001).collect()
    assert(out.length == ev.count(_._4 % 7 == 0), "one output row per example")
    for (r <- out) {
      val (eid, uid, etype) = (r.getLong(0), r.getLong(1), r.getString(2))
      val probe = tsKey(r.getTimestamp(3))
      val visible = hist((uid, etype)).filter(v => tsKey(v._1._3) <= probe)
      assert(visible.nonEmpty, s"example $eid probes after its own event — must see >= 1 version")
      val (latest, idx) = visible.maxBy(v => (tsKey(v._1._3), v._2))
      // the joined version is the NEWEST one valid at probe time — a
      // version from the probe's future here would be training leakage
      assert(r.getInt(5) == idx + 1, s"feature_version leak at example $eid")
      assert(r.getDouble(4) == latest._5, s"feature_value leak at example $eid")
    }
  }

  test("q_split_leakproof: no near-dup pair straddles splits; singletons keep their q_split_assign split") {
    val split = graft.SparkEntry.queries("q_split_leakproof")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    // 1. the defining law: every near-dup pair (the same ngram pair graph
    //    the clusters were built from) lands in ONE split
    val pairs = SparkEntryPairs("q_dedup_ngram", spark, sf0001)
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs or the law is vacuous")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2,
        s"near-dup pair ($a, $b) straddles splits ${split(a)._2}/${split(b)._2} — leakage")
    }
    // 2. cluster labels are exactly q_dedup_cc's (the shared-definition claim)
    val cc = graft.SparkEntry.queries("q_dedup_cc")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(split.view.mapValues(_._1).toMap == cc, "cluster labels drifted from q_dedup_cc")
    // 3. a SINGLETON doc keeps its exact q_split_assign split (same salt,
    //    same thresholds): adopting the leakproof split only moves docs
    //    that actually have near-duplicates
    val baseline = graft.SparkEntry.queries("q_split_assign")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val singles = split.keySet -- cc.filter { case (d, l) => d != l || clustered(d) }.keySet
    assert(singles.nonEmpty)
    singles.foreach { d =>
      assert(split(d)._2 == baseline(d), s"singleton $d moved split without a near-dup reason")
    }
  }
}
