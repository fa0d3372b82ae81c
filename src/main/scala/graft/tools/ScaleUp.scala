package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for scaling experiments
  * (BASELINE.md's "prove the bench at sf1" item).
  *
  * Replicates a driver-generated sf directory `factor`x the TPC-H way —
  * MORE entities, same per-entity density — so per-key work stays
  * constant while totals grow linearly, which is the property a scaling
  * run must preserve to be interpretable:
  *
  *  - fact/dim keys are offset per copy by the key-space size, so copy
  *    i's customers own copy i's orders and referential integrity holds
  *    across the whole scaled corpus (`user_id` lives in the custkey
  *    space, `doc_id`/`vec_id` share one space via the multimodal join);
  *  - `region`/`nation` stay fixed (TPC-H scales facts, not geography);
  *  - document text in copy i>0 gets every word suffixed with `_i`:
  *    WITHIN-copy duplicate/near-duplicate structure is byte-identical
  *    to the original corpus, while cross-copy shingle overlap drops to
  *    zero — without this, every doc would gain `factor-1` artificial
  *    twins and the dedup queries would measure a corpus that no longer
  *    resembles the original workload;
  *  - `documents.source` in copy i>0 is suffixed `_i` (r11): domains
  *    are entities too — source cardinality grows ∝ factor with
  *    per-source density fixed, so per-source windows are exercised
  *    with MORE partitions, not BIGGER ones;
  *  - embeddings in copy i>0 are multiplied by a per-copy deterministic
  *    ±1 sign pattern: cos(s.x, s.y) = cos(x, y), so within-copy cosine
  *    geometry is EXACTLY preserved, while cross-copy agreement decays
  *    to noise — same rationale as the text suffix;
  *  - `events.ts` stays the raw nanos long the streaming `rawSchema`
  *    expects (`Replay.readEvents`); event density per hour grows
  *    linearly, the window-state row count does not.
  *
  * All randomness is `hash(...)` of literals — re-runs are bit-stable.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional comma-separated table subset (arg 4): an sf10 ledger over
    // the probe-path queries needs documents/embeddings/events only —
    // skipping the 60M-row lineitem copy keeps the build proportionate
    val only = if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet) else None
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try run(spark, inDir, outDir, factor, only)
    finally spark.stop()
  }

  def run(spark: SparkSession, inDir: String, outDir: String, factor: Int,
      only: Option[Set[String]] = None): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)

    // Key-space sizes (keys are 0-based dense, so size = max + 1).
    val custSpace = maxOf(read("customer"), "c_custkey") + 1
    val ordSpace = maxOf(read("orders"), "o_orderkey") + 1
    val partSpace = maxOf(read("part"), "p_partkey") + 1
    val suppSpace = maxOf(read("supplier"), "s_suppkey") + 1
    val evtSpace = maxOf(read("events"), "event_id") + 1
    // doc_id and vec_id join directly (q_multimodal_join) -> one space.
    val docVecSpace =
      math.max(maxOf(read("documents"), "doc_id"), maxOf(read("embeddings"), "vec_id")) + 1

    def copies(t: String)(mk: (DataFrame, Int) => DataFrame): DataFrame = {
      val df = read(t)
      (0 until factor).map(i => mk(df, i)).reduce(_ unionByName _)
    }

    def shiftKeys(df: DataFrame, i: Int, spaces: (String, Long)*): DataFrame =
      spaces.foldLeft(df) { case (d, (c, space)) =>
        d.withColumn(c, col(c) + lit(i.toLong * space))
      }

    val scaled: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> copies("customer")(shiftKeys(_, _, "c_custkey" -> custSpace)),
      "supplier" -> copies("supplier")(shiftKeys(_, _, "s_suppkey" -> suppSpace)),
      "part" -> copies("part")(shiftKeys(_, _, "p_partkey" -> partSpace)),
      "orders" -> copies("orders")(
        shiftKeys(_, _, "o_orderkey" -> ordSpace, "o_custkey" -> custSpace)),
      "lineitem" -> copies("lineitem")(
        shiftKeys(_, _, "l_orderkey" -> ordSpace, "l_partkey" -> partSpace,
          "l_suppkey" -> suppSpace)),
      "events" -> copies("events")(
        shiftKeys(_, _, "event_id" -> evtSpace, "user_id" -> custSpace)),
      "documents" -> copies("documents") { (df, i) =>
        val shifted = shiftKeys(df, i, "doc_id" -> docVecSpace)
        if (i == 0) shifted
        else
          shifted
            .withColumn(
              "text",
              array_join(
                transform(split(col("text"), " "), w => concat(w, lit(s"_$i"))),
                " "))
            .withColumn("n_chars", length(col("text")))
            // source is an ENTITY key like every other (r11, VERDICT
            // r10 missing #2): real corpora grow domains with size, so
            // copy i's sources are distinct domains — source
            // CARDINALITY grows ∝ factor, per-source density stays the
            // fixture's. Without this, every per-source window
            // (q_rouge/q_bleu pairing, q_nucleus_sources,
            // q_domain_filter, q_sample_stratified) benches with
            // per-partition size ∝ corpus and parallelism capped at
            // the fixture's 20 sources.
            .withColumn("source", concat(col("source"), lit(s"_$i")))
      },
      "embeddings" -> copies("embeddings") { (df, i) =>
        val shifted = shiftKeys(df, i, "vec_id" -> docVecSpace)
        if (i == 0) shifted
        else
          // per-(copy, dim) sign flip: norm- and within-copy-cosine-preserving
          shifted.withColumn(
            "embedding",
            transform(
              col("embedding"),
              (x, j) =>
                when(pmod(hash(lit(i), j), lit(2)) === 0, x).otherwise(-x)))
      }
    )

    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    scaled.filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, df) =>
      val tmp = out.resolve(s".stage_$name")
      graft.FsUtil.deleteRecursively(tmp)
      // single file named <table>.parquet, matching the driver layout
      // (the streaming glob `events*.parquet` expects files, not dirs) —
      // but with 4 MB row groups, NOT the driver fixtures' single row
      // group: a parquet reader parallelizes over row groups, so a
      // single-group 6M-row lineitem serializes every scan into one
      // task no matter the cluster size. Multi-group single files are
      // what a real large table looks like; without this the sf1 bench
      // measures single-threaded scans, not the engine.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try
          listing
            .filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst()
            .orElseThrow(() => new IllegalStateException(s"no parquet part written for $name"))
        finally listing.close()
      val target = out.resolve(s"$name.parquet")
      java.nio.file.Files.deleteIfExists(target)
      java.nio.file.Files.move(part, target)
      graft.FsUtil.deleteRecursively(tmp)
      println(s"scaleup: $name -> $target")
    }
  }
}
