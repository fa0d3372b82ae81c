package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles (the manual complement to AQE's
  * skew-join splitting, for when one join/grouping key dominates —
  * e.g. a null-ish user_id or a hot document bucket at 100 TB).
  *
  * Mechanics: the large (skewed) side gets a deterministic salt in
  * [0, S) hashed from a secondary column, splitting each hot key's rows
  * across S shuffle partitions; the other side is replicated S× with
  * every salt value. The salted equi-join is row-for-row equal to the
  * plain join (SkewSpec + the q_join_salted oracle prove it).
  */
object Skew {

  /** Deterministic salt: pmod(xxhash64(saltBy), salts). Hash-derived so
    * re-runs and retries salt identically (no rand()).
    */
  def saltCol(saltBy: Column, salts: Int): Column =
    pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int")

  /** Hot-bucket frequency cap for candidate-generation self-joins
    * (shingle / LSH-band / SimHash-block keys): drop every key whose
    * row frequency exceeds `cap`, so any surviving bucket contributes
    * at most cap·(cap−1)/2 candidate pairs. Without this, one
    * stop-shingle ("the") with frequency f floods a single shuffle
    * partition with O(f²) pairs — the first failure on a real web
    * corpus.
    *
    * Scale shape: one aggregation on the SAME key the join shuffles on
    * (the standard document-frequency pass), then a SHUFFLE anti-join on
    * that key. The hot list is pigeonhole-bounded at N/cap keys — small
    * relative to the stream, but N/cap still grows linearly with the
    * corpus (10^9 keys at 10^12 rows), so it must never be a broadcast
    * build side; AQE is free to downgrade the exchange to a broadcast at
    * runtime when the actual list is tiny. Semantics: callers must treat
    * the capped stream as CANDIDATE GENERATION ONLY and verify pairs
    * against the full uncapped sets; a pair whose every shared key is
    * hot is missed — the documented approximation (a pair sharing only
    * ubiquitous shingles is not a near-duplicate in any meaningful
    * corpus). The fused single-shuffle form ([[BoundedBucket]]) is what
    * the engine's own candidate generators use.
    */
  def dropHotKeys(rows: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val hot = rows
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_df"))
      .where(col("_df") > cap)
      .drop("_df")
    rows.join(hot.hint("shuffle_hash"), keyCols, "left_anti")
  }

  /** Inner equi-join with the LEFT side salted and the RIGHT side
    * replicated `salts`×. Use when `left` is large with hot `leftKey`
    * values and `right` is small enough to replicate (dim-scale).
    *
    * Pinned to `merge` (sort-merge): salting only means anything on a
    * SHUFFLE join — it spreads one hot key's rows across S shuffle
    * partitions — and left to itself AQE upgrades the replicated right
    * side to a broadcast build (measured at sf1: a 1.2M-row
    * single-threaded HashedRelation build, 25 s where the shuffle join
    * takes 3), which is doubly wrong: the S× replication inflates the
    * broadcast for no benefit, and a broadcast join never had a skew
    * problem to salt away in the first place. Among the shuffle
    * strategies it must be SMJ, not shuffle_hash: the replicated side
    * is S× a data-scale table, so the per-task hash build grows ∝
    * S·n/partitions — the r12 full-sf10 ledger caught the earlier
    * shuffle_hash pin OOMing at 15M orders × 8 salts ("not enough
    * memory to build hash map"), the same hash-build class the r10
    * q_bleu finding established; SMJ's per-task memory is flat in
    * partition size and spills gracefully.
    */
  /** Input bytes of a table directory — one driver-side
    * getContentSummary, the metadata AQE itself plans from.
    */
  def dirBytes(s: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
  }

  /** Scoped confs under which AQE's OptimizeSkewedJoin fires on the
    * engine's fixtures at EVERY declared scale — the automatic
    * complement to [[saltedJoin]] (r13). Production keeps the defaults
    * (256 MB threshold / 64 MB advisory); a unit-scale hot partition is
    * kilobytes, so the thresholds here derive from the actual input
    * size (threshold = max(4 KB, input/64), advisory = max(2 KB,
    * threshold/2)): at sf0.001 the hot partition (~70 KB) clears the
    * 4 KB floor and splits, and at sf10 the same formula yields
    * ~32 MB/16 MB — production-shaped chunks, never a task explosion. Broadcast is disabled in scope because a broadcast
    * join never had a skew problem (the [[saltedJoin]] argument);
    * coalescing is off so the split's sub-partitions stay visible.
    *
    * When SALTING still beats AQE: (1) skewed AGGREGATIONS — AQE splits
    * join partitions only, a hot groupBy key needs the two-stage salted
    * aggregate; (2) join types OptimizeSkewedJoin cannot split (both
    * sides of a full outer); (3) when the salted layout's partitioning
    * is REUSED by later stages — AQE's split is per-join and breaks
    * co-partitioning downstream; (4) skew known AT WRITE time, where
    * salting the layout avoids ever materializing the hot partition.
    * AQE wins when skew is discovered at runtime — which at 100 TB is
    * most of the time.
    */
  def withSkewAqe[T](s: org.apache.spark.sql.SparkSession, inputBytes: Long)(body: => T): T = {
    val threshold = math.max(4L << 10, inputBytes / 64)
    val advisory = math.max(2L << 10, threshold / 2)
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> threshold.toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory.toString,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      saltBy: Column
  ): DataFrame = {
    val l = left.withColumn("_salt", saltCol(saltBy, salts))
    val r = right.withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r.hint("merge"), l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
