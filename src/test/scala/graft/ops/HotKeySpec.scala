package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-bucket safety for the candidate-generation joins (the 100 TB
  * failure mode: one stop-shingle / hot first-token floods a shuffle
  * partition with O(f²) pairs).
  *
  * Two mechanisms, each proven here:
  *  - [[Skew.dropHotKeys]] (ngram / minhash-band / simhash-block
  *    candidates): surviving buckets are ≤ cap rows ⇒ ≤ cap²/2
  *    candidate pairs per bucket; verification against full sets keeps
  *    every reported pair exact.
  *  - [[Similarity.pairwiseNear]] adaptive sub-blocking: EXACT — hot
  *    first-token buckets split into ⌈f/cap⌉ hash sub-blocks joined
  *    pairwise (triangle coverage), so the result is identical to the
  *    unsplit join for every cap.
  */
class HotKeySpec extends SparkSpec {

  /** Synthetic corpus: one true near-dup pair (docs 1000/1001 share 7 of
    * their 8 shingles) + 40 docs that pairwise share ONLY the ubiquitous
    * shingle "the common phrase" (df = 40 — the stop-shingle shape).
    */
  private lazy val hotDir: String = {
    val dir = Files.createTempDirectory("hotkey-docs-").toString
    import spark.implicits._
    val near = Seq(
      (1000L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (1001L, "alpha bravo charlie delta echo foxtrot golf hotel india kilo")
    )
    val hot = (0 until 40).map(i =>
      (i.toLong, s"unique$i token$i the common phrase filler$i end$i"))
    (near ++ hot).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Corpus with one HOT first token: 20 docs all starting with "the"
    * (two of them near-dups), plus cold one-off buckets.
    */
  private lazy val hotFtDir: String = {
    val dir = Files.createTempDirectory("hotft-docs-").toString
    import spark.implicits._
    val hotBucket = (0 until 18).map(i =>
      (i.toLong, s"the subject $i differs entirely alpha$i beta$i gamma$i"))
    val dups = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "the quick brown fox jumps over the lazy dog today")
    )
    val cold = Seq((200L, "isolated words that match nothing else at all"))
    (hotBucket ++ dups ++ cold).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("BoundedBucket: hot buckets dropped in-agg, cold buckets exact and sorted") {
    import spark.implicits._
    // key 7 is hot (50 members), keys 0-6 are cold
    val rows = ((0 until 50).map(i => (7L, 1000L + i)) ++
      (0 until 21).map(i => (i.toLong % 7, 100L + i))).toDF("key", "id")
    val buckets = BoundedBucket.buckets(rows, Seq("key"), "id", cap = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(!buckets.contains(7L), "hot bucket must drop inside the aggregation")
    assert(buckets.keySet == (0L until 7L).toSet)
    assert(buckets(0L) == Seq(100L, 107L, 114L)) // exact, sorted
    // pair stream: every i<j pair of each bucket exactly once
    val pairs = BoundedBucket.pairs(
      BoundedBucket.buckets(rows, Seq("key"), "id", cap = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.length == 7 * 3) // 7 cold buckets × C(3,2)
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("dropHotKeys bounds every surviving bucket at cap rows") {
    import spark.implicits._
    // key 7 is hot (50 rows), keys 0-6 are cold (≤ 8 rows)
    val rows = ((0 until 50).map(i => (7L, i.toLong)) ++
      (0 until 40).map(i => (i.toLong % 7, 100L + i))).toDF("key", "id")
    val capped = Skew.dropHotKeys(rows, Seq("key"), 8)
    val maxBucket = capped.groupBy("key").count()
      .agg(max("count")).head.getLong(0)
    assert(maxBucket <= 8)
    // cold keys untouched — the cap is not a sampler
    assert(capped.count() == 40)
  }

  test("ngram cap drops the stop-shingle bucket but keeps true pairs, exactly") {
    val capped = Dedup.ngramPairs(spark, hotDir, cap = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.ngramPairs(spark, hotDir, cap = 1 << 20)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot-bucket pairs are not near-dups (J = 1/9), so the capped
    // result equals the exact one — the cap only pruned candidate work
    assert(uncapped == Set((1000L, 1001L)))
    assert(capped == uncapped)
  }

  test("minhash/simhash band caps keep the true pair on the hot corpus") {
    val mh = Dedup.minhashPairs(spark, hotDir, cap = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((1000L, 1001L)))
    val sh = Dedup.simhashPairs(spark, hotDir, cap = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.subsetOf(Set((1000L, 1001L))))
  }

  test("pairwise sub-blocking is exact for EVERY cap (property sweep)") {
    val reference = Similarity.pairwiseNear(spark, sf0001, cap = 1 << 20).collect().toSeq
    assert(reference.nonEmpty)
    for (cap <- Seq(1, 2, 3, 7, 64)) {
      val got = Similarity.pairwiseNear(spark, sf0001, cap).collect().toSeq
      assert(got == reference, s"cap=$cap diverged from the unsplit join")
    }
  }

  test("asofJoin: hot key stays linear — no join node, exact union-merge result") {
    import spark.implicits._
    // hot key 1: 2000 probes × 2000 builds — the naive join-then-rn=1
    // form materializes ~2M intermediate rows in this ONE key's task;
    // the union-merge shape touches exactly 4000.
    val n = 2000
    val hotProbes = (0 until n).map(i => (1L, i.toLong, i.toLong * 10 + 5))
    val hotBuilds = (0 until n).map(j => (1L, j.toLong, j.toLong * 10))
    // probe before any build -> null match (left semantics)
    val early = Seq((2L, 9000L, 50L))
    val lateBuild = Seq((2L, 9100L, 100L))
    // equal-ts ties: two builds AT the probe instant -> `<=` admits them,
    // max bkey wins (the naive form's ts DESC, key DESC tie-break)
    val tieProbe = Seq((3L, 9500L, 300L))
    val tieBuilds = Seq((3L, 9600L, 300L), (3L, 9601L, 300L))
    val probe = (hotProbes ++ early ++ tieProbe)
      .toDF("k", "probe_id", "sec")
      .select(col("k"), col("probe_id"), timestamp_seconds(col("sec")).as("ts"))
    val build = (hotBuilds ++ lateBuild ++ tieBuilds)
      .toDF("k", "bkey", "sec")
      .select(col("k"), col("bkey"), timestamp_seconds(col("sec")).as("bts"))

    val out = Relational.asofJoin(probe, build)
    assert(!out.queryExecution.executedPlan.toString.contains("Join"),
      "bounded as-of must not plan a join")

    val rows = out.collect()
    assert(rows.length == n + 2, "exactly one output row per probe row")
    val byId = rows.map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    // hot key: probe i (ts = 10i+5) matches build i (bts = 10i), all i
    assert((0 until n).forall(i => byId(i.toLong).contains(i.toLong)))
    assert(byId(9000L).isEmpty, "probe before any build must keep nulls")
    assert(byId(9500L).contains(9601L), "equal-ts tie must pick the max build key")
  }

  test("pairwise sub-blocking is exact: tiny cap == no-split result") {
    // cap 4 ⇒ the 20-doc "the" bucket splits into 5 sub-blocks;
    // cap 2^20 ⇒ nsub = 1 everywhere (the plain blocked join)
    val split = Similarity.pairwiseNear(spark, hotFtDir, cap = 4).collect()
    val plain = Similarity.pairwiseNear(spark, hotFtDir, cap = 1 << 20).collect()
    assert(plain.nonEmpty, "expected the dup pair in the hot bucket")
    assert(split.toSeq == plain.toSeq)
    // and the replication really happened: a-side rows explode to >1
    // sub-pair key only when a bucket is split
    assert(split.map(r => (r.getLong(0), r.getLong(1))).contains((100L, 101L)))
  }
}
