package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property coverage for the E16 sampling/shuffle/reshape/layout family
  * beyond the DuckDB oracle: determinism across runs, statistical
  * bounds, the per-key cap, Z-order bijectivity, and pivot/unpivot
  * round-trip integrity.
  */
object SamplingSpec {
  // executor-side marker (same-JVM local mode, the storm-spec pattern)
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}

class SamplingSpec extends SparkSpec {

  test("samples are deterministic: two independent runs yield identical rows") {
    for (q <- Seq(Sampling.qSampleHash, Sampling.qSampleStratified,
        Sampling.qSamplePerKey, Sampling.qInterleave, Sampling.qPack)) {
      val a = q.fn(spark, sf0001).collect()
      val b = q.fn(spark, sf0001).collect()
      assert(a.sameElements(b), s"${q.name} not deterministic")
    }
  }

  test("epoch shuffle: each epoch a complete permutation, orders decorrelated") {
    val docs = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val rows = Sampling.qEpochShuffle.fn(spark, sf0001).collect()
    val byEpoch = rows.groupBy(_.getInt(0))
    assert(byEpoch.keySet == Set(0, 1, 2))
    // completeness: every epoch covers the whole corpus exactly once
    for ((e, rs) <- byEpoch) {
      val ids = rs.map(_.getLong(2))
      assert(ids.toSet == docs && ids.length == docs.size, s"epoch $e not a permutation")
    }
    // decorrelation: the rank agreement between epoch orders must be far
    // from identity. Spearman-ish check: fraction of docs within ±5 of
    // their epoch-0 position stays small (identical orders would be 1.0).
    def order(e: Int): Map[Long, Int] =
      byEpoch(e).sortBy(r => (r.getLong(1), r.getLong(2)))
        .zipWithIndex.map { case (r, i) => r.getLong(2) -> i }.toMap
    val o0 = order(0)
    for (e <- Seq(1, 2)) {
      val oe = order(e)
      val near = docs.count(id => math.abs(o0(id) - oe(id)) <= 5).toDouble / docs.size
      // under a random permutation of n=50, P(|shift|<=5) ~ 11/50
      assert(near < 0.5, s"epoch $e order correlates with epoch 0 (near=$near)")
      assert(o0 != oe, s"epoch $e order identical to epoch 0")
    }
  }

  test("uniform sample rate lands near 10% and is independent of the split hash") {
    val total = Tables.documents(spark, sf0001).count().toDouble
    val sampled = Sampling.qSampleHash.fn(spark, sf0001).count().toDouble
    val rate = sampled / total
    // binomial 3-sigma band around 0.10 for n=total
    val sigma = math.sqrt(0.1 * 0.9 / total)
    assert(math.abs(rate - 0.1) <= 3 * sigma, s"rate $rate")

    // independence from q_split_assign: the sample must not collapse
    // into one split (same id stream, different salt => different hash)
    val joined = Sampling.qSampleHash.fn(spark, sf0001)
      .join(TextOps.qSplitAssign.fn(spark, sf0001), "doc_id")
      .groupBy("split").count().collect()
    assert(joined.length > 1, "sample fell entirely inside one split")
  }

  test("stratified sample: en down-sampled vs the rest") {
    val docs = Tables.documents(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val kept = Sampling.qSampleStratified.fn(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("k"))
    val rates = docs.join(kept, "lang")
      .select(col("lang"), col("k") / col("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // en targeted at 10%, others at 50% — with sf0.001's small strata
    // just assert the ordering the rates must induce
    val (en, rest) = (rates("en"), (rates - "en").values)
    assert(rest.forall(_ > en), s"en=$en rest=$rest")
  }

  test("per-key sample: never more than 3 events per user, exact hash-rank choice") {
    val out = Sampling.qSamplePerKey.fn(spark, sf0001)
    val maxPerUser = out.groupBy("user_id").count().agg(max("count")).head().getLong(0)
    assert(maxPerUser <= 3)
    // a user with >3 events contributes exactly 3
    val eligible = Tables.events(spark, sf0001)
      .groupBy("user_id").count().where(col("count") > 3).count()
    if (eligible > 0) {
      val full = out.groupBy("user_id").count().where(col("count") === 3).count()
      assert(full == eligible || full > 0)
    }
  }

  test("interleave is a permutation: bijective over doc_id, order fixed by key") {
    val out = Sampling.qInterleave.fn(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).count()
    assert(out.length == docs)
    assert(out.map(_.getLong(1)).distinct.length == out.length)
    // emitted in (shuffle_key, doc_id) order
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("pivot row sums equal per-lang totals (no rows lost in reshape)") {
    val p = Sampling.qPivot.fn(spark, sf0001).collect()
    val totals = Tables.documents(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- p) {
      val lang = r.getString(0)
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == totals(lang), lang)
    }
  }

  test("unpivot emits exactly 2 metric rows per doc") {
    val u = Sampling.qUnpivot.fn(spark, sf0001)
    val docs = Tables.documents(spark, sf0001).count()
    assert(u.count() == 2 * docs)
    assert(u.groupBy("doc_id").count().where(col("count") =!= 2).count() == 0)
  }

  test("packing: per-shard prefix sums are exact and pack ids follow the chunk rule") {
    val rows = Sampling.qPack.fn(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every document is packed exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    for ((shard, docs) <- rows.groupBy(_._2)) {
      // within a shard, ordering by cum_toks reconstructs the stream:
      // each cum is the previous cum + own toks (an exact prefix sum)
      val ordered = docs.sortBy(_._4)
      var prev = 0L
      for ((_, _, toks, cum, packId) <- ordered) {
        assert(cum == prev + toks, s"shard $shard: prefix sum broken at cum=$cum")
        prev = cum
        assert(packId == shard * 1099511627776L + (cum - toks) / 2048,
          s"pack rule violated: $packId")
      }
    }
    // chunking actually splits the stream (sf0.001 corpus >> 2048 tokens)
    assert(rows.map(_._5).distinct.length > 8, "every shard fit one pack — corpus too small?")
  }

  test("ntile: quartiles are balanced (sizes differ by at most 1)") {
    val sizes = Sampling.qNtile.fn(spark, sf0001)
      .groupBy("quartile").count().collect().map(_.getLong(1))
    assert(sizes.length == 4)
    assert(sizes.max - sizes.min <= 1)
  }

  test("sample membership survives a real task retry bit-for-bit (the no-rand() payoff)") {
    // the REASON sampling is hash-based: a retried task recomputes the
    // identical sample. rand()-based sampling re-draws on retry —
    // silently corrupting eval-set membership. local[4,2] gives real
    // retries (maxFailures=2), same pattern as CopyRetryStormSpec.
    import spark.implicits._
    val clean = Sampling.qSampleHash.fn(spark, sf0001)
      .as[(Long, String, Long)].collect().sorted
    SamplingSpec.injected.set(0)
    val chaotic = Sampling.qSampleHash.fn(spark, sf0001)
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
          SamplingSpec.injected.incrementAndGet()
          throw new RuntimeException("injected chaos: die before emitting")
        }
        it
      }
      .collect().sorted
    assert(SamplingSpec.injected.get() == 1, "chaos was never injected")
    assert(chaotic.sameElements(clean), "retry changed sample membership")
  }

  test("z-order key is a bijective interleave (exact deinterleave round-trip)") {
    // deinterleave in plain Scala: even bits -> x, odd bits -> y
    def deinterleave(z: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (j <- 0 until 16) {
        x |= ((z >> (2 * j)) & 1L) << j
        y |= ((z >> (2 * j + 1)) & 1L) << j
      }
      (x, y)
    }
    val rows = Tables.events(spark, sf0001)
      .withColumn("zkey",
        expr(Sampling.zorderSql("user_id % 65536", "(hour(ts) * 60 + minute(ts))", 16, "div")))
      .select(col("zkey"), (col("user_id") % 65536).cast("long"),
        expr("hour(ts) * 60 + minute(ts)").cast("long"))
      .collect()
    for (r <- rows) {
      val (x, y) = deinterleave(r.getLong(0))
      assert(x == r.getLong(1) && y == r.getLong(2),
        s"zkey=${r.getLong(0)} -> ($x,$y) expected (${r.getLong(1)},${r.get(2)})")
    }
  }

  test("hilbert key: bijective over the full 256x256 grid, every step adjacent") {
    import spark.implicits._
    // the whole domain, via the SAME generated step expressions the
    // declared query uses — bijectivity proves the 8 rotation steps
    // compose to a space-filling curve; unit step distance proves it is
    // the HILBERT curve (Morton jumps; Hilbert never does)
    var df = (0 until 65536).map(i => (i.toLong / 256, i.toLong % 256)).toDF("x0", "y0")
      .selectExpr("x0", "y0", "x0 AS x", "y0 AS y", "CAST(0 AS BIGINT) AS dd")
    for (lvl <- (0 until 8).reverse) {
      val (xn, yn, dn) = Sampling.hilbertStep(1L << lvl, 256L, "div")
      df = df.selectExpr("x0", "y0", s"$xn AS x", s"$yn AS y", s"$dn AS dd")
    }
    val cells = df.select("dd", "x0", "y0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(cells.length == 65536)
    assert(cells.head._1 == 0L && cells.last._1 == 65535L)
    assert(cells.map(_._1).distinct.length == 65536, "hilbert key is not a bijection")
    cells.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve step ($x1,$y1)->($x2,$y2) is not adjacent — not a Hilbert walk")
    }
  }

  test("temperature sampling flattens BETWEEN balance (α=1) and identity (α=0)") {
    val langTotals = Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = langTotals.values.min

    def keptByLang(q: String): Map[String, Long] =
      graft.SparkEntry.queries(q)(spark, sf0001)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)

    val temp = keptByLang("q_mix_temperature")
    val bal = keptByLang("q_mix_balance")
    // exact membership recompute: h²·n_l < 10¹²·min_n over BigInt
    val expected = Tables.documents(spark, sf0001)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) =>
        val h = BigInt((id % 2147483647L + 424243L) % 2147483647L
          * 2654435761L % 4294967296L % 1000000L)
        h * h * langTotals(lang) < BigInt("1000000000000") * minN
      }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    for (l <- langTotals.keys)
      assert(temp(l) == expected(l), s"lang $l membership drifted")
    // α = 1/2 sits between α = 1 (balance) and α = 0 (keep all):
    // summed over languages the orders hold strictly on this corpus
    assert(bal.values.sum < temp.values.sum,
      "temperature must keep more than full balance")
    assert(temp.values.sum < langTotals.values.sum,
      "temperature must drop something from over-represented languages")
  }

  test("q_sequence_assemble: trajectory is the exact (ts, event_id)-ordered event walk") {
    val out = graft.SparkEntry.queries("q_sequence_assemble")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[String]("trajectory"))).toMap
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val expect = evs.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        .map(_._4).mkString(" ")
    }
    assert(out.keySet == expect.keySet)
    out.foreach { case (u, (n, traj)) =>
      assert(traj == expect(u), s"user $u trajectory diverges")
      assert(n == traj.split(" ").length.toLong, s"user $u n_events != tokens")
    }
  }

  test("z-order locality: a 2-D box maps to a bounded zkey range") {
    // the defining skip property: for an aligned 2^k x 2^k box, all
    // points fall in ONE contiguous zkey range of length 4^k — min/max
    // row-group stats prune everything outside it
    def z(x: Long, y: Long): Long =
      (0 until 16).map(j => (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))).sum
    val k = 4 // 16x16 box aligned at multiples of 16
    for ((bx, by) <- Seq((0L, 0L), (16L, 32L), (256L, 768L))) {
      val zs = for (x <- bx until bx + 16; y <- by until by + 16) yield z(x, y)
      assert(zs.max - zs.min == (1L << (2 * k)) - 1, s"box ($bx,$by)")
    }
  }

  /** The priority the q_weighted_sample scaladoc defines, re-derived in
    * BigInt so no IEEE/overflow behavior of the engine is trusted:
    * min over replicas r ∈ [0, w) of ((id·8+r) mod p)·A mod 2^32.
    */
  private def wsPriority(docId: Long, w: Long): BigInt =
    (0L until w).map { r =>
      (BigInt(docId) * 8 + r).mod(2147483647L) * BigInt(2654435761L) mod BigInt(4294967296L)
    }.min

  test("weighted sample: BigInt priority re-derivation + full bottom-20 membership from (doc_id, w) alone") {
    // per-doc weights from the raw table (the same capped token count)
    val wByDoc = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        least(size(split(col("text"), " ")).cast("long"), lit(8L)).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Sampling.qWeightedSample.fn(spark, sf0001).collect()
    assert(out.length == 20)
    // 1) every emitted priority equals the BigInt re-derivation
    for (r <- out) {
      val (id, w, p) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(w == wByDoc(id), s"doc $id weight drifted")
      assert(BigInt(p) == wsPriority(id, w), s"doc $id priority mismatch")
    }
    // 2) membership: the bottom-20 by (priority, doc_id) over the WHOLE
    //    corpus, derived driver-side from (doc_id, w) alone, IS the output
    val expect = wByDoc.toSeq
      .map { case (id, w) => (wsPriority(id, w), id) }
      .sortBy(identity).take(20).map(_._2)
    assert(out.map(_.getLong(0)).toSeq == expect, "bottom-20 membership not re-derivable")
  }

  test("weighted sample: monotone coupling — raising w can only lower priority (min over a superset)") {
    for (id <- Seq(0L, 1L, 7L, 499L, 123456789L, 99999999999L); w <- 1L until 8L)
      assert(wsPriority(id, w + 1) <= wsPriority(id, w),
        s"priority rose with weight at (id=$id, w=$w)")
  }

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prefpair-docs-").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("preference pairs: packed argmax survives doc_id >= 10^8 (the old multiplier's corruption zone)") {
    // ids straddling 1e8..1e11: under the old 1e8 pack these would bleed
    // into the score digits and mis-attribute chosen/rejected
    val dir = docsDir(Seq(
      (100000005L, "the the the of x", "s1"), // stop-heavy -> high score
      (99999999999L, "alpha beta gamma delta", "s1"), // no stopwords -> score 0
      (123456789L, "a of y z", "s1"),
      (100000001L, "plain words only here", "s2"),
      (200000002L, "the of and a", "s2")))
    val rows = Sampling.qPreferencePairs.fn(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val s1 = rows(0)
    assert(s1.getLong(2) == 100000005L, "chosen_doc mis-attributed") // 4 stop / 5 toks
    assert(s1.getLong(4) == 99999999999L, "rejected_doc mis-attributed")
    val s2 = rows(1)
    assert(s2.getLong(2) == 200000002L && s2.getLong(4) == 100000001L)
    // margin = chosen_score - rejected_score, exact fixed-point
    assert(s1.getLong(6) == 1000000L * 4 / 5 - 0L)
  }

  test("length batching: full batches of 8, dense ids, waste bounded by the bucket width") {
    val rows = Sampling.qLengthBatching.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for ((b, bs) <- rows.groupBy(_.getInt(0))) {
      val ordered = bs.sortBy(_.getInt(1))
      assert(ordered.map(_.getInt(1)).toSeq == ordered.indices, s"bucket $b: batch ids not dense")
      // all but the bucket's last batch are exactly the batch size
      assert(ordered.init.forall(_.getLong(2) == 8L), s"bucket $b: interior batch not full")
      for (r <- ordered) {
        val (n, mx, sm, waste) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(n >= 1 && n <= 8)
        assert(waste == n * mx - sm, s"bucket $b: waste arithmetic broken")
        // every doc in a 64-token bucket is within 63 tokens of the max:
        // the bound that makes length batching pay
        assert(waste < 64 * n, s"bucket $b: padding waste exceeds the bucket width")
        assert(mx / 64 == b, s"bucket $b: a doc crossed its length bucket")
      }
    }
    // completeness: every document lands in exactly one batch
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf0001).count())
  }

  test("preference pairs: the 10^12 id-range guard aborts loudly, never packs wrong") {
    val dir = docsDir(Seq(
      (1000000000000L, "the of", "s1"), // exactly at the bound -> out of range
      (7L, "plain", "s1")))
    val e = intercept[Exception] {
      Sampling.qPreferencePairs.fn(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("doc_id out of pack range")),
      s"guard did not fire: ${messages(e).mkString(" | ")}")
  }

  test("importance sample: effective mixture law — kept·weight per lang ∝ the declared target") {
    // the operator's whole point: downsampling + loss-weighting makes
    // the EFFECTIVE per-lang mass (Σ weight over kept docs) proportional
    // to the declared per-mille target. Verify within binomial noise:
    // effective_share/target ∈ [0.75, 1.25] for every language, and
    // weights are exactly 1 for downsampled langs (keep-rate < 1).
    val langN = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = langN.values.sum
    val target = Map("en" -> 400L, "zh" -> 250L, "de" -> 150L, "es" -> 100L, "fr" -> 100L)
    val rows = graft.SparkEntry.queries("q_importance_sample")(spark, sf0001).collect()
    val eff = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getDouble(2)).sum).toMap
    val effTotal = eff.values.sum
    target.foreach { case (l, t) =>
      val ratio = (eff(l) / effTotal) / (t / 1000.0)
      assert(ratio > 0.75 && ratio < 1.25, s"lang $l effective share off target: $ratio")
      val downsampled = t * total < 1000L * langN(l)
      if (downsampled)
        assert(rows.filter(_.getString(1) == l).forall(_.getDouble(2) == 1.0),
          s"downsampled lang $l must carry weight exactly 1")
      else
        assert(rows.filter(_.getString(1) == l).forall(_.getDouble(2) >= 1.0),
          s"upsampled lang $l must carry weight >= 1")
    }
  }

  test("grpo advantage: per-group laws — zero-sum, rank agrees with reward order, dropped groups are exactly var=0") {
    val rows = graft.SparkEntry.queries("q_grpo_advantage")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = raw.groupBy(_._2)
    rows.groupBy(_._2).foreach { case (uid, g) =>
      // advantages are (r − μ)/σ up to the per-group √n factor: they sum
      // to ~0 and the rank column must equal the (value desc, id) order
      val sumAdv = g.map(_._3).sum
      assert(math.abs(sumAdv) < 1e-3 * g.length, s"user $uid advantages don't center: $sumAdv")
      val rewards = byUser(uid).map(e => e._1 -> e._3).toMap
      val byRank = g.sortBy(_._4).map(x => (rewards(x._1), -x._1)).toSeq
      assert(byRank == byRank.sorted.reverse, s"user $uid pref_rank disagrees with reward order")
    }
    // completeness: every event of a group with variance > 0 is present
    val emitted = rows.map(_._1).toSet
    byUser.foreach { case (uid, es) =>
      val vals = es.map(_._3)
      val varZero = vals.distinct.length == 1
      if (varZero) assert(es.forall(e => !emitted(e._1)), s"user $uid zero-variance group leaked")
      else assert(es.forall(e => emitted(e._1)), s"user $uid rows missing")
    }
  }

  test("dsir: every weight re-derived in plain Scala from raw text (bucket hash, quantized bits, normalizer)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Seq[String] = {
      val w = t.split(" ", -1).toSeq
      w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Long = synchronized {
      md.reset()
      val h = md.digest(g.getBytes("UTF-8")).take(2)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(h, 16) % 4096L
    }
    def flog2(c: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(c)
    val all = docs.flatMap { case (id, lang, t) => grams(t).map(g => (id, lang, bucket(g))) }
    val cr = all.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val ct = all.filter(_._2 == "en").groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val rTot = all.length.toLong
    val tTot = all.count(_._2 == "en").toLong
    val norm = flog2(rTot + 4096) - flog2(tTot + 4096)
    val expect = all.groupBy(_._1).map { case (id, gs) =>
      id -> (gs.length.toLong,
        gs.map(x => flog2(ct.getOrElse(x._3, 0L) + 1) - flog2(cr(x._3) + 1)).sum
          + gs.length * norm)
    }
    val got = Sampling.qDsir.fn(spark, sf0001).collect()
    assert(got.length == expect.size, "doc universe drifted")
    got.foreach { r =>
      val (n, w) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_grams") == n, s"doc ${r.get(0)} gram count drifted")
      assert(r.getAs[Long]("w_bits") == w, s"doc ${r.get(0)} weight drifted")
    }
  }
}
