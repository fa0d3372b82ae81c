package graft.ops

import graft.SparkSpec

/** The KMV sketch laws q_kmv_overlap / q_kmv_merge hang their 100 TB
  * story on (promised by the Dedup scaladoc):
  *
  *  1. the MERGE MONOID — bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  *     bottom-k(B)) for ANY disjoint-or-not split, proven driver-side
  *     on seeded pseudo-random sets (this is what lets per-shard
  *     sketches combine without re-scanning the corpus);
  *  2. the CARDINALITY ESTIMATOR — (k−1)·2⁴⁸ div kth_min tracks the
  *     true distinct count for uniform 48-bit hashes;
  *  3. END-TO-END — [[Dedup.kmvSketchSharded]]'s per-(corpus, shard)
  *     build + re-rank merge equals a plain-Scala direct bottom-64 of
  *     the md5-derived shingle hashes computed here from the raw
  *     documents, sharing nothing with the Spark plan but the
  *     hash definition.
  */
class KmvSpec extends SparkSpec {

  private val K = 64

  /** Deterministic 48-bit pseudo-hashes (splitmix-style mix of a seed
    * and index) — Math.random is banned, and determinism is the point.
    */
  private def hashes(seed: Long, n: Int): Set[Long] =
    (0 until n).map { i =>
      var z = seed + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & ((1L << 48) - 1)
    }.toSet

  private def bottomK(s: Iterable[Long]): Seq[Long] =
    s.toSeq.distinct.sorted.take(K)

  test("merge monoid: bottom-k(A∪B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) on arbitrary splits") {
    val universe = hashes(42L, 5000).toSeq
    // splits of every flavor: disjoint halves, skewed, overlapping,
    // one side smaller than k, one side empty
    val splits: Seq[(Seq[Long], Seq[Long])] = Seq(
      universe.splitAt(2500),
      universe.splitAt(40), // left smaller than k
      (universe, Seq.empty[Long]),
      (universe.take(3000), universe.drop(1000)), // overlap of 2000
      universe.partition(_ % 3 == 0))
    splits.foreach { case (a, b) =>
      val direct = bottomK(a ++ b)
      val merged = bottomK(bottomK(a) ++ bottomK(b))
      assert(merged == direct,
        s"monoid law broken on split sizes (${a.size}, ${b.size})")
    }
  }

  test("merge monoid is associative across 4 shards (the kmvSketchSharded shape)") {
    val universe = hashes(7L, 8000).toSeq
    val shards = universe.groupBy(h => (h % 4).toInt).values.toSeq
    val direct = bottomK(universe)
    val merged = bottomK(shards.flatMap(bottomK))
    assert(merged == direct)
  }

  test("cardinality estimator: (k−1)·2⁴⁸ div kth_min within 20% of truth at n=10k") {
    val n = 10000
    val sk = bottomK(hashes(1234L, n))
    val kth = sk.last
    val est = (63L * (1L << 48)) / kth
    assert(math.abs(est.toDouble / n - 1.0) < 0.20,
      s"estimate $est for true $n — hash uniformity or estimator broken")
  }

  test("cardinality conditioning: an under-filled sketch reports its EXACT size, never estNum DIV kth") {
    // a corpus whose per-split distinct 3-shingle count is far below
    // k=64: `(k−1)·2⁴⁸ div kth` assumes a FULL sketch and would report
    // millions; the conditioned estimator must return the sketch size
    // itself (which for an under-filled sketch IS the exact distinct
    // count — the sketch saw every hash)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmv-small-").toString
    val docs = (0L until 20L)
      .map(i => (i, s"alpha beta gamma delta tail${i % 4}"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long =
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    def distinctShingles(pred: Long => Boolean): Set[Long] =
      (0L until 20L).filter(pred).flatMap { i =>
        s"alpha beta gamma delta tail${i % 4}".split(" ", -1).sliding(3)
          .map(t => h48(t.mkString(" ")))
      }.toSet
    val train = distinctShingles(_ % 10 < 8)
    val eval_ = distinctShingles(_ % 10 >= 8)
    assert(train.size < K && eval_.size < K, "fixture must under-fill both sketches")

    val row = graft.SparkEntry.queries("q_kmv_overlap")(spark, tmp).collect().head
    assert(row.getAs[Long]("a_card_est") == train.size.toLong,
      "under-filled train sketch must report its exact size")
    assert(row.getAs[Long]("b_card_est") == eval_.size.toLong,
      "under-filled eval sketch must report its exact size")
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("kmvSketchSharded equals a plain-Scala direct bottom-64 of the raw shingle hashes") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val byCorpus = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().foreach { r =>
      val corpus =
        if (r.getLong(0) % 10 < 8) "train"
        else if (r.getLong(0) % 10 == 8) "val" else "eval"
      val w = r.getString(1).split(" ", -1)
      if (w.length >= 3) w.sliding(3).foreach { tri =>
        byCorpus.getOrElseUpdate(corpus, scala.collection.mutable.Set()) +=
          h48(tri.mkString(" "))
      }
    }
    val expect = byCorpus.map { case (c, hs) => c -> bottomK(hs) }
    val got = graft.ops.Dedup.kmvSketchSharded(spark, sf0001).collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) => c -> rows.map(_.getLong(1)).toSeq.sorted }
    assert(got.keySet == expect.keySet && expect.keySet == Set("train", "val", "eval"))
    expect.foreach { case (c, sk) =>
      assert(got(c) == sk, s"corpus $c: sharded-merge sketch drifted from the direct sketch")
    }
  }
}
