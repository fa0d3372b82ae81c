package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** E14 — Structured Streaming replay of the `events` table (SURVEY §2.C):
  * the streaming analogue of the reference's chunked micro-batch loop
  * (op-14, `main.py:174-271`), where the "chunks" become micro-batches
  * with real watermark/state semantics instead of a memory-bounding
  * device.
  *
  * Not part of the DuckDB oracle set (t2): streaming output depends on
  * trigger boundaries; ReplaySpec self-verifies each transform against
  * its batch equivalent on the same data — exact equality, since event
  * time (not arrival time) drives every aggregate.
  *
  * 100 TB posture: the file source scales by listing+splitting (the same
  * partitioned scan as batch); windowed aggregation state is bounded by
  * the watermark horizon × group cardinality; sessionization state is
  * per-active-user and evicted on event-time timeout. Checkpointing
  * gives exactly-once on restart (local temp dirs here).
  */
object Replay {

  /** Physical schema of events.parquet with ts as TIMESTAMP(NANOS) read
    * as long via nanosAsLong (a streaming source needs the schema
    * declared up front). The driver has also shipped events with a
    * naive-micros ts — see [[rawSchemaNtz]]; [[readEvents]] probes which
    * shape a directory holds.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** [[rawSchema]] variant for the naive TIMESTAMP(MICROS) physical
    * shape (read as TIMESTAMP_NTZ, reinterpreted in the session's UTC).
    */
  val rawSchemaNtz: StructType =
    StructType(rawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = TimestampNTZType)
      case f                   => f
    })

  /** True when the events files under `dir` carry ts as a nanos long
    * (vs naive micros). One driver-side footer read — metadata-only,
    * the same cost as the schema inference a batch read does anyway.
    */
  private def tsIsLong(spark: SparkSession, dir: String): Boolean =
    spark.read.parquet(dir).schema("ts").dataType == LongType

  /** File-source stream over an events directory, one file per
    * micro-batch (replays multi-file drops as distinct batches). Both
    * physical ts shapes land on session-TZ TimestampType
    * (Tables.normalizeTs — same floor-to-micros / naive-as-UTC
    * semantics as the batch reader).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Tables.normalizeTs(
      spark.readStream
        .schema(if (tsIsLong(spark, dir)) rawSchema else rawSchemaNtz)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))

  /** The tumbling-window aggregate body shared by the batch and
    * streamed shapes: 1-hour windows per event_type, counts + exact
    * decimal sum (same discipline as the batch queries).
    */
  private def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value")
      )
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )

  /** Watermarked windowed counts. The same function applies to a batch
    * DataFrame (unified API) — ReplaySpec exploits that for the
    * equivalence check.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", "1 hour"))

  /** APPEND-mode windowed counts over a replay dir that carries a DRAIN
    * SENTINEL (user -1, ts 2100-01-01 — the [[sentinelReplayDir]]
    * shape). Append mode only emits a window once the watermark passes
    * its end, and a terminated stream never advances the watermark past
    * its last window — so the sentinel flows THROUGH the watermark node
    * (advancing it past every real window, closing and flushing them
    * all) and is filtered ABOVE it, so it never creates aggregate state
    * or an output row. Standard flush-on-drain discipline for finite
    * replays of watermarked aggregations; the result is the FULL batch
    * window set, via a real production sink.
    */
  def windowedCountsDrained(events: DataFrame): DataFrame =
    windowAgg(
      events
        .withWatermark("ts", "1 hour")
        // the drain filter must reference ts: Catalyst pushes non-ts
        // predicates BELOW the EventTimeWatermark node (they'd drop the
        // sentinel before its timestamp reaches the watermark
        // accumulator — observed, not hypothetical); a predicate on the
        // watermark column itself is pinned above it
        .where(col("ts") < to_timestamp(lit("2099-01-01 00:00:00"))))

  /** Declared-query wiring: stage events + the drain sentinel, replay
    * [[windowedCountsDrained]] through a temp PARQUET sink
    * (executor-parallel writes — the r1-r5 Complete-mode memory sink
    * pinned the whole window table on the driver), hand back the lazy
    * sink read. The staged input is deleted once the replay completes.
    */
  def replayWindowedCounts(spark: SparkSession, d: String): DataFrame = {
    val live = sentinelReplayDir(spark, d)
    val out = java.nio.file.Files.createTempDirectory("swindow-out-")
    try
      replayToParquet(
        windowedCountsDrained(readEvents(spark, live.toString)),
        out.toString + "/counts")
    finally graft.FsUtil.deleteRecursively(live)
  }

  /** Stateful-stream state sizing for the REPLAY harness: the shuffle
    * partition count in force when a streaming query first starts is
    * BAKED INTO ITS CHECKPOINT as the state-store partition count, and
    * every micro-batch pays per-partition store open/commit overhead —
    * 32 stores for the replay's kilobytes of state is pure fixed cost
    * (~3 s/query locally). A production deployment sizes this to its
    * state volume at first start exactly the same way; 8 matches the
    * replay corpus. Batch queries are untouched (the session value is
    * restored after the replay completes).
    */
  private val ReplayStatePartitions = 8

  private def withStatePartitions[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, ReplayStatePartitions.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  /** Eagerly unload every loaded state-store provider once a finite
    * replay completes (r14 optimization round, guide §5 memory). A
    * terminated streaming query's HDFSBackedStateStoreProviders stay
    * LOADED — each holding up to maxBatchesToRetainInMemory versions of
    * its full state map in heap — until the 60 s state-store
    * maintenance tick notices the deactivated run. A bench/test JVM
    * that replays dozens of finite streams back to back therefore
    * accumulates hundreds of MB of dead join/dedup state, and the GC
    * pressure taxes every SUBSEQUENT query (measured: q_stream_dedup
    * 2.3 s alone vs 5.5 s after two doc-stream replays in the same
    * JVM). Unloading on completion is the deterministic lifecycle end
    * of a finite replay; the next stream reloads from its own
    * checkpoint as usual. Also ordered BEFORE the checkpoint dir
    * delete so maintenance never snapshots into a deleted directory.
    */
  private lazy val stateStoreUnloadAll: () => Unit = {
    // StateStore.unloadAll() is private[sql] at the Scala level but
    // public in bytecode (the executor shutdown path uses it); one
    // reflective handle, resolved once
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val mod = cls.getField("MODULE$").get(null)
    val m = cls.getMethod("unloadAll")
    () => { m.invoke(mod); () }
  }

  private def unloadStateStores(): Unit = stateStoreUnloadAll()

  /** Replay an append-mode stream to a TEMP PARQUET sink and hand back a
    * lazy batch read of the sink directory — the production wiring for
    * unbounded output: the write is executor-parallel, nothing
    * accumulates on the driver (a memory sink would pin the full result
    * set there — linear in the input for a join, dead at 100 TB).
    */
  def replayToParquet(stream: DataFrame, outDir: String): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory("replay-ckpt-")
    val out = replayToParquet(stream, outDir, ckpt.toString)
    graft.FsUtil.deleteRecursively(ckpt)
    out
  }

  /** Checkpoint-explicit variant: re-invoking with the SAME checkpoint
    * after new files land RESUMES the stream — offsets and join/dedup
    * state restore from the checkpoint, processed files are never
    * re-read, and cross-restart matches emit exactly once (proven by
    * ReplaySpec's restart test).
    */
  def replayToParquet(stream: DataFrame, outDir: String, ckptDir: String): DataFrame = {
    val spark = stream.sparkSession
    withStatePartitions(spark) {
      val q = stream.writeStream
        .format("parquet")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckptDir)
        .option("path", outDir)
        .start()
      q.awaitTermination()
      unloadStateStores()
    }
    // explicit schema: a zero-row replay leaves no data file to infer from
    spark.read.schema(stream.schema).parquet(outDir)
  }

  /** Plan-audit hook (PLANS.md): replay `stream` to exhaustion against a
    * throwaway parquet sink and return the FINAL micro-batch's executed
    * physical plan. The stateful operators (StateStoreRestore/Save,
    * StreamingSymmetricHashJoin, StreamingDeduplicateWithinWatermark)
    * exist only in the per-batch IncrementalExecution — the declared
    * queries return the sink read-back, whose plan is just a parquet
    * scan, so this is the only way to put the streaming shape on audit.
    */
  def lastExecutionPlan(stream: DataFrame, outDir: String): String = {
    val spark = stream.sparkSession
    val ckpt = java.nio.file.Files.createTempDirectory("replay-ckpt-")
    try withStatePartitions(spark) {
      val q = stream.writeStream
        .format("parquet")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .option("path", outDir)
        .start()
      q.awaitTermination()
      unloadStateStores()
      q match {
        case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
          w.streamingQuery.lastExecution
            .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
    } finally graft.FsUtil.deleteRecursively(ckpt)
  }

  /** Declared query — ORACLED: a sentinel-drained Append replay is
    * trigger-invariant (event time drives every aggregate, and the
    * drain closes every real window exactly once), so the streamed
    * result equals the batch tumbling-window aggregation, and a 1-hour
    * epoch-aligned tumbling window start is exactly
    * `date_trunc('hour', ts)` — the driver's t2 hash-verifies the
    * windowed streaming path like the join/dedup ones, now through the
    * same parquet-sink wiring as the other seven streaming queries.
    */
  val qStreamWindow: graft.ops.Q = graft.ops.Q(
    "q_stream_window",
    (s, d) =>
      replayWindowedCounts(s, d)
        .orderBy("window_start", "event_type"),
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
                   event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY window_start, event_type
            ORDER BY window_start, event_type""")
  )

  /** STREAMING TOP-K (E14 × E5): the per-window leaderboard — top-3
    * event types per closed 1-hour window by count. The streaming half
    * is the SAME drained append windowed aggregation as q_stream_window
    * (watermark-closed windows flow to the parquet sink exactly once);
    * the rank is applied over the SINK read-back, which is the
    * production serving pattern: the stream maintains per-window
    * aggregates, the consumer ranks closed windows — a rank inside the
    * stream would re-rank on every update and cannot emit append-mode
    * results before the window closes anyway. Rank is total-ordered
    * (n_events DESC, event_type ASC) and plans WindowGroupLimit over
    * |windows × types| rows — never corpus-scale.
    */
  val qStreamTopk: graft.ops.Q = graft.ops.Q(
    "q_stream_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("window_start")
        .orderBy(col("n_events").desc, col("event_type").asc)
      replayWindowedCounts(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("window_start"), col("event_type"), col("n_events"), col("rn"))
        .orderBy("window_start", "rn")
    },
    Some("""SELECT window_start, event_type, n_events, rn FROM (
              SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
                     event_type, count(*) AS n_events,
                     CAST(row_number() OVER (PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
                                        ORDER BY count(*) DESC, event_type ASC) AS INTEGER) AS rn
              FROM events
              GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type) t
            WHERE rn <= 3
            ORDER BY window_start, rn""")
  )

  /** Stream-stream RANGE JOIN (the streaming analogue of the batch
    * q_range_join): same user, later event within 60 s, both sides
    * watermarked 1 h. State on each side is bounded by the watermark:
    * a left row is evicted once the watermark passes `a_ts + 60 s`,
    * provably after the last admissible match — so the INNER join's
    * result set is INDEPENDENT of trigger boundaries and equals the
    * batch join exactly (which is why q_stream_join can carry the same
    * DuckDB oracle as q_range_join: a hash-verified streaming operator).
    */
  def rangeJoinStream(spark: SparkSession, dir: String): DataFrame = {
    val a = readEvents(spark, dir)
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 hour")
    val b = readEvents(spark, dir)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 hour")
    // Same bucketed equi-key shape as the batch join (bounded per-key
    // state partitioning; the watermark on a_ts survives the a-side
    // bucket explode — eviction semantics are unchanged).
    graft.ops.Relational.bucketedRangeJoin(a, b)
  }

  /** Replay [[rangeJoinStream]] to completion via a temp parquet sink
    * ([[replayToParquet]] — join output is linear in the input, so it
    * must never accumulate on the driver).
    */
  def replayRangeJoin(spark: SparkSession, dir: String): DataFrame =
    replayToParquet(
      rangeJoinStream(spark, dir),
      java.nio.file.Files.createTempDirectory("replay-join-out-").toString
    )

  /** COUNT-TARGETED event-time-sliced staged copy of the raw events
    * file (r11) — the [[pitReplayDir]] one-write staging applied to
    * the stream-stream join replay. A single-file replay delivers the
    * WHOLE corpus as one micro-batch, so the join holds corpus-sized
    * state no matter what the watermark says (the r11 sf10 ledger
    * measured it: 33 s and >8 GB of state at 10 M events — the one
    * entry growing ∝ events). Event-time-ascending slice files +
    * readEvents' maxFilesPerTrigger=1 advance the watermark BETWEEN
    * batches, so each side's state evicts down to the previous
    * slice's trailing 1 h + 60 s — O(slice), not O(corpus) — which is
    * the live-stream shape (arrival-bounded batches). The INNER
    * join's emission is trigger-invariant (see [[rangeJoinStream]]),
    * so the result — and the q_range_join oracle it carries — is
    * unchanged by the slicing. ONE partitioned write stages every
    * slice (the pit rule: never a per-slice job loop); raw columns
    * pass through byte-exact (the slice key is a partition-column
    * COPY that never lands in the data files).
    *
    * Slice granularity is COUNT-TARGETED, the production
    * `maxBytesPerTrigger` shape: nSlices = ⌈n / 500 k⌉ equal
    * event-time spans, so a micro-batch holds ~500 k events at ANY
    * corpus size or density. The first r11 cut used calendar units
    * (week, day past 2 M events) — but a calendar slice's row count
    * grows with corpus DENSITY, so the very bound the slicing exists
    * for (state a default heap holds) silently erodes as corpora
    * densify, and conversely a small corpus paid ~5 needless
    * state-store commit rounds (measured +4.9 s at sf0.1's 100 k
    * events, where ONE batch is the bounded shape already). One
    * footer-metadata count() + one min/max scan decide the width;
    * both deterministic from the corpus. Non-uniform arrival skews a
    * slice above target proportionally to local density — the same
    * approximation a time-based trigger makes live.
    */
  private[graft] def weekSlicedEventsDir(s: SparkSession, glob: String): java.nio.file.Path = {
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val longShape = tsIsLong(s, glob)
    val raw = s.read.schema(if (longShape) rawSchema else rawSchemaNtz).parquet(glob)
    val tsuSql =
      if (longShape) "ts div 1000"
      else "unix_micros(CAST(ts AS TIMESTAMP))"
    val n = raw.count()
    val nSlices = math.max(1L, (n + 499999L) / 500000L)
    // single-slice corpora (including n == 0, where min/max would be
    // NULL and getLong would NPE) never need the bounds scan: every
    // row, if any, lands in slice 0
    val (lo, width) =
      if (nSlices == 1L) (0L, Long.MaxValue)
      else {
        val bounds = raw.agg(
          min(expr(tsuSql)).as("lo"), max(expr(tsuSql)).as("hi")).head()
        val (l, h) = (bounds.getLong(0), bounds.getLong(1))
        (l, math.max(1L, (h - l) / nSlices + 1L))
      }
    val wkCol = expr(s"($tsuSql - ${lo}L) div ${width}L")
    // single-slice corpora (n ≤ target, the whole point of the
    // count-targeted rule) need no re-staging at all: ONE batch IS the
    // bounded shape, so the replay reads a byte-identical copy of the
    // source file — no Spark write job, no repartition (measured ~2 s
    // of needless staging at sf0.1's 100 k events)
    if (nSlices == 1L) {
      val hp = new org.apache.hadoop.fs.Path(glob)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val srcs = fs.globStatus(hp).map(_.getPath).sortBy(_.getName)
      if (srcs.length == 1) {
        val live = Files.createTempDirectory("replay-sjoin-in-")
        val dst = live.resolve("000.parquet")
        fs.copyToLocalFile(srcs.head, new org.apache.hadoop.fs.Path(dst.toString))
        Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000000000L))
        return live
      }
    }
    val staged = Files.createTempDirectory("sjoin-staged-")
    raw.withColumn("pslice", wkCol)
      .repartition(col("pslice"))
      .write.mode("overwrite").partitionBy("pslice").parquet(staged.toString)
    val live = Files.createTempDirectory("replay-sjoin-in-")
    val slices = for {
      wd <- new java.io.File(staged.toString).listFiles().toSeq
      if wd.getName.startsWith("pslice=")
    } yield (wd.getName.stripPrefix("pslice=").toLong, wd)
    var slot = 0
    for ((w, dir0) <- slices.sortBy(_._1)) {
      val fs = dir0.listFiles().filter(_.getName.endsWith(".parquet"))
      require(fs.length == 1,
        s"slice $w staged ${fs.length} files — the one-task-per-slice repartition contract broke")
      Files.move(fs.head.toPath, live.resolve(f"$slot%03d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(live.resolve(f"$slot%03d.parquet"),
        FileTime.fromMillis(1000000000000L + slot * 60000L))
      slot += 1
    }
    graft.FsUtil.deleteRecursively(staged)
    live
  }

  /** Declared query: the streaming range join over the sf directory,
    * totally ordered — and ORACLED with the same SQL as q_range_join
    * (see [[rangeJoinStream]] for why the result is trigger-invariant,
    * and [[weekSlicedEventsDir]] for why the replay feeds slice-sized
    * micro-batches instead of one corpus-sized batch).
    */
  val qStreamJoin: graft.ops.Q = graft.ops.Q(
    "q_stream_join",
    (s, d) => {
      val live = weekSlicedEventsDir(s, s"$d/events*.parquet")
      try
        replayRangeJoin(s, s"$live/*.parquet")
          .orderBy("user_id", "a_id", "b_id")
      finally graft.FsUtil.deleteRecursively(live)
    },
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 SECOND
            ORDER BY a.user_id, a_id, b_id""")
  )

  /** SLIDING-window streamed counts (1 h window, 30 min slide): every
    * event belongs to exactly TWO overlapping windows, the state the
    * tumbling q_stream_window never exercises. Same drained append
    * replay; the oracle expands each event into its two window starts
    * (trunc30(ts) and trunc30(ts) − 30 min) — the relational identity
    * of Spark's sliding `window()` — so the streamed overlapping-state
    * path is hash-verified like the tumbling one.
    */
  val qStreamSliding: graft.ops.Q = graft.ops.Q(
    "q_stream_sliding",
    (s, d) => {
      val live = sentinelReplayDir(s, d)
      val out = java.nio.file.Files.createTempDirectory("sslide-out-")
      val counts =
        try {
          val stream = readEvents(s, live.toString)
            .withWatermark("ts", "1 hour")
            .where(col("ts") < to_timestamp(lit("2099-01-01 00:00:00")))
            .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n_events"))
            .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
          replayToParquet(stream, out.toString + "/counts")
        } finally graft.FsUtil.deleteRecursively(live)
      counts.orderBy("window_start", "event_type")
    },
    Some("""WITH starts AS (
              SELECT event_type,
                     time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS w
              FROM events
              UNION ALL
              SELECT event_type,
                     time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE
              FROM events)
            SELECT w AS window_start, event_type, count(*) AS n_events
            FROM starts GROUP BY w, event_type
            ORDER BY window_start, event_type""")
  )

  /** Stream-stream LEFT OUTER range join — the hard half of streaming
    * joins: an unmatched left row can only be emitted once the
    * watermark PROVES no match can still arrive (wm past a_ts + 60 s),
    * so a terminated stream would hold every tail row's verdict
    * forever. The replay therefore runs over a drain-sentinel dir
    * ([[sentinelReplayDir]]): the sentinel advances both sides'
    * watermarks past every real row's horizon, every pending verdict
    * resolves, and the result equals the batch LEFT JOIN exactly —
    * which is why this query carries a plain batch oracle: a
    * hash-verified streaming OUTER join. Sentinel rows are filtered on
    * the watermark column itself (both sides, and the -1 user can
    * never match anything anyway); unmatched output is (a_id, null).
    *
    * State: each side bounded by the watermark exactly as in
    * [[rangeJoinStream]]; the outer-ness only changes WHEN a left row
    * leaves state (with a verdict) — not how much state exists. The
    * equi key is user_id (per-user state); the bucketed-key inner twin
    * q_stream_join carries the hot-user blocking story.
    */
  def rangeJoinOuterStream(spark: SparkSession, dir: String): DataFrame = {
    val horizon = to_timestamp(lit("2099-01-01 00:00:00"))
    val a = readEvents(spark, dir)
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 hour")
      .where(col("a_ts") < horizon)
    val b = readEvents(spark, dir)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 hour")
      .where(col("b_ts") < horizon)
    a.join(
        b,
        col("user_id") === col("b_user") && col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") < col("a_ts") + expr("INTERVAL 60 SECONDS"),
        "left_outer")
      .select(col("user_id"), col("a_id"), col("b_id"))
  }

  val qStreamJoinOuter: graft.ops.Q = graft.ops.Q(
    "q_stream_join_outer",
    (s, d) => {
      val live = sentinelReplayDir(s, d)
      val out = java.nio.file.Files.createTempDirectory("sjoin-outer-out-")
      val res =
        try replayToParquet(rangeJoinOuterStream(s, live.toString), out.toString + "/rows")
        finally graft.FsUtil.deleteRecursively(live)
      res.orderBy("user_id", "a_id", "b_id")
    },
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
            FROM events a LEFT JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 SECOND
            ORDER BY a.user_id, a_id, b_id""")
  )

  /** Streaming exact dedup (E10 × E14): first event per (user_id,
    * event_type) via dropDuplicatesWithinWatermark — per-key state is
    * EVICTED once the watermark passes it (the scale-correct streaming
    * dedup; plain dropDuplicates would grow state forever). A key whose
    * duplicates span more than the watermark re-emits — so the declared
    * query projects the distinct KEY SET, which is watermark-invariant
    * and oracled against batch DISTINCT; ReplaySpec bounds re-emission
    * separately.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "event_id", "ts")

  /** Replay [[dedupStream]] to completion via a temp parquet sink
    * (see [[replayToParquet]]).
    */
  def replayDedup(spark: SparkSession, dir: String): DataFrame =
    replayToParquet(
      dedupStream(readEvents(spark, dir)),
      java.nio.file.Files.createTempDirectory("replay-dedup-out-").toString
    )

  val qStreamDedup: graft.ops.Q = graft.ops.Q(
    "q_stream_dedup",
    (s, d) =>
      replayDedup(s, s"$d/events*.parquet")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type"),
    Some("""SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type""")
  )

  /** Drain a stream fed by a rate-limited [[graft.sources.QueueBroker]]
    * queue to a temp parquet sink. Trigger.AvailableNow cannot drive a
    * source without SupportsTriggerAvailableNow (Spark wraps one and
    * processes only the FIRST admitted batch), and a queue genuinely
    * does not know its end offset up front — so this variant triggers
    * continuously and returns once `processAllAvailable` proves the
    * broker has revealed nothing new: the live-deployment drain.
    */
  def replayQueueToParquet(stream: DataFrame, outDir: String): DataFrame = {
    val spark = stream.sparkSession
    val ckpt = java.nio.file.Files.createTempDirectory("replay-ckpt-")
    withStatePartitions(spark) {
      val q = stream.writeStream
        .format("parquet")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime(0L))
        .option("checkpointLocation", ckpt.toString)
        .option("path", outDir)
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      unloadStateStores()
    }
    graft.FsUtil.deleteRecursively(ckpt)
    spark.read.schema(stream.schema).parquet(outDir)
  }

  /** Shard a ts-carrying frame ROUND-ROBIN over its GLOBAL event-time
    * order — the queue feeds' frontier-alignment stage: the broker's
    * admission is count-based, so each shard's event-time frontier
    * advances ∝ its share of the data, and ANY shard imbalance under a
    * watermark-dropping stateful operator turns into late-row loss
    * once triggers span more time than the watermark delay (measured:
    * hash-of-user sharding lost the corpus's second half under the
    * windowed aggregate). Round-robin over the ts order makes every
    * shard a ts-INTERLEAVED exact 1/n sample — frontiers stay within
    * one row of each other at any trigger size. The global numbering
    * is the q_global_rownum two-pass closed form (range partition +
    * broadcast offsets — never a one-partition window), and the hash
    * partitioner is INVERTED so shard value v lands exactly in
    * partition v (a colliding hash-of-shard-value would fold two
    * samples into one log and halve its frontier speed): per target
    * partition, the smallest long key whose pmod(murmur3(seed 42), n)
    * maps there — the same expression hashpartitioning evaluates.
    * `sentinel` (one row per shard, carrying `rr` = the shard index)
    * appends terminal control records that sort last per shard
    * (far-future ts).
    */
  private def tsRoundRobinShards(s: SparkSession, df: DataFrame, nShards: Int,
      sentinel: Option[DataFrame] = None): DataFrame = {
    val cols = df.columns.toSeq.map(col)
    val ranked = df
      .repartitionByRange(8 * nShards, col("ts"))
      .sortWithinPartitions("ts")
      .select(cols :+ monotonically_increasing_id().as("mid"): _*)
      .select(cols ++ Seq(
        expr("mid div 8589934592").as("pid"),
        (col("mid") % lit(8589934592L)).as("idx")): _*)
    val offsets = ranked.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum("cnt").over(
        org.apache.spark.sql.expressions.Window.orderBy("pid")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("pid", "offset")
    val keyFor: Map[Int, Long] = s.range(0, 64L * nShards)
      .select(col("id"), pmod(hash(col("id")), lit(nShards)).cast("int").as("p"))
      .collect().map(r => (r.getInt(1), r.getLong(0)))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).min }
    require(keyFor.size == nShards, s"hash-partitioner inversion incomplete: $keyFor")
    val base = ranked
      .join(broadcast(offsets), "pid")
      .select(cols :+
        pmod(col("offset") + col("idx"), lit(nShards.toLong)).cast("int").as("rr"): _*)
    sentinel.fold(base)(sen => base.unionByName(sen.select(base.columns.map(col): _*)))
      .withColumn("skey", element_at(typedLit(keyFor), col("rr")))
      .repartition(nShards, col("skey"))
      .sortWithinPartitions("ts")
      .drop("rr", "skey")
  }

  /** CONTENT-KEYED staged-shard cache (r13 VERDICT): the ts-round-robin
    * staging re-sorted and re-wrote the corpus on EVERY replay (3 bench
    * passes × each queue query × scales). The shard logs are a pure
    * function of (source file, query feed: column set + sentinel shape
    * + shard count), so they publish ONCE under the content-keyed
    * layout idiom ([[graft.ops.Partitioned.sourceKey]] +
    * `buildAtomically`) and every replay HARD-LINKS them into its
    * private live dir — the broker's ack = physical drop deletes the
    * LINKS, never the cached inodes, so the live queue keeps its
    * cannot-relist-history contract while warm replays skip the
    * staging job entirely (`df` is by-name: on a warm hit no Spark job
    * runs at all, not even the sharding plan's offset collect). Falls
    * back to a per-file copy where the tmp filesystem refuses links.
    */
  private def stageShardsCached(s: SparkSession, name: String, df: => DataFrame,
      schema: StructType, srcPath: String, tag: String, nShards: Int,
      liveDir: java.nio.file.Path, rowsPerBatch: Int, hold: Boolean): Unit = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_queue_stage_" +
      graft.ops.Partitioned.sourceKey(Seq(srcPath)) + s"_${tag}_n$nShards"
    def complete() = graft.ops.Partitioned.successExists(s, root)
    if (!complete()) {
      graft.ops.Partitioned.buildAtomically(s, root, () => complete()) { tmp =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        val n = graft.sources.QueueBroker.writeShardLogs(df, tmp)
        require(n == nShards, s"staged $n shards, expected $nShards")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, "_SUCCESS"), Array.emptyByteArray)
      }
    }
    val rootP = java.nio.file.Paths.get(root)
    (0 until nShards).foreach { i =>
      Seq(f"shard-$i%05d.log", f"shard-$i%05d.count").foreach { fn =>
        val src = rootP.resolve(fn)
        val dst = liveDir.resolve(fn)
        try java.nio.file.Files.createLink(dst, src)
        catch {
          case _: UnsupportedOperationException =>
            java.nio.file.Files.copy(src, dst)
        }
      }
    }
    graft.sources.QueueBroker.registerStaged(
      name, schema, liveDir.toString, nShards, rowsPerBatch, hold)
  }

  /** [[dedupStream]] — the IDENTICAL operator — fed through the
    * [[graft.sources.QueueSource]] micro-batch source instead of the
    * file source: the broker reveals ≤ rowsPerBatch rows per trigger
    * (count-targeted by default: ⌈n/5⌉ capped at the 500 k
    * q_stream_join slice target) across `nShards` PARTITION-PARALLEL
    * log shards ([[graft.sources.QueueBroker.stageShards]] — staged and
    * served executor-side; no row crosses the driver), and every
    * commit makes the acked range un-servable, so the replay exercises
    * the checkpoint/state machinery against a source that cannot
    * re-list history. Broker memory is O(1) per shard: the logs live
    * on disk, only offsets in memory.
    */
  def replayDedupQueue(s: SparkSession, d: String, rowsPerBatch: Int = 0,
      nShards: Int = 8): DataFrame = {
    val evts = graft.ops.Tables.events(s, d)
      .select("event_id", "ts", "user_id", "event_type")
    // the broker delivers in PER-SHARD EVENT-TIME order — the
    // production queue assumption (Kafka per-partition append order ≈
    // event order; the watermark absorbs bounded disorder). Feeding raw
    // file order instead loses data at scale, caught by the r12 sf10
    // t2: ScaleUp corpora are concatenated copies whose ts ranges
    // RESTART per copy, so batch 2+ arrived wholly behind the watermark
    // and the stateful dedup dropped it as late (got 86 520 of 750 000
    // keys). Shards are ts-round-robin ([[tsRoundRobinShards]]): the
    // dedup key-SET contract happens to tolerate keyed sharding's
    // frontier skew (a late-dropped duplicate's key already emitted),
    // but frontier alignment removes the latent late-drop class
    // entirely, and key locality buys nothing here — the dedup state
    // shuffles by key downstream regardless. The r12 feed was ONE
    // driver-side toLocalIterator (~39 k rows/s, 257 s at sf10 — the
    // round's scale-killer); stageShards writes and serves every shard
    // executor-side, the driver handles offsets only.
    val stageDir = java.nio.file.Files.createTempDirectory("queue-log-")
    val name = "events-" + java.util.UUID.randomUUID()
    // rowsPerBatch ≤ 0: the broker derives the rate limit from its own
    // staged totals — no separate corpus count() (r13 late fix).
    // Staging rides the content-keyed cache: warm replays link the
    // shard logs instead of re-sorting the corpus (r14).
    stageShardsCached(s, name, tsRoundRobinShards(s, evts, nShards), evts.schema,
      s"$d/events.parquet", "dedup", nShards, stageDir, rowsPerBatch, hold = false)
    try {
      val stream = s.readStream
        .format(graft.sources.QueueSource.Name)
        .option("queue", name)
        .load()
      replayQueueToParquet(
        dedupStream(stream),
        // the returned frame lazily reads this sink, so it cannot be
        // deleted here — registered for JVM-exit cleanup instead (the
        // r12 ADVICE leak: 3 Bench passes × scales left one key-set
        // dir each)
        graft.FsUtil.deleteOnExit(
          java.nio.file.Files.createTempDirectory("replay-qdedup-out-")).toString)
    } finally {
      graft.sources.QueueBroker.remove(name)
      graft.FsUtil.deleteRecursively(stageDir)
    }
  }

  /** Declared query — q_stream_dedup THROUGH THE QUEUE SOURCE, carrying
    * the same batch-DISTINCT oracle verbatim (the projected key set is
    * batch-split-invariant, see [[dedupStream]]): the t2 hash proves the
    * non-file source delivers exactly the file source's semantics.
    */
  val qStreamDedupQueue: graft.ops.Q = graft.ops.Q(
    "q_stream_dedup_queue",
    (s, d) =>
      replayDedupQueue(s, d)
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type"),
    qStreamDedup.oracle
  )

  /** [[windowedCountsDrained]] — the watermark-CLOSURE operator — fed
    * through the sharded queue source (r13): where the dedup twin only
    * needed bounded disorder, a drained APPEND aggregation needs the
    * watermark to pass every real window at END of stream, and a queue
    * has no file listing to prove exhaustion — so the DRAIN SENTINEL
    * rides the data path PER SHARD (one far-future row staged LAST in
    * every shard's log, the per-shard analogue of
    * [[sentinelReplayDir]]'s final file), released under the broker's
    * DRAIN BARRIER: Spark's watermark is the global MAX event time
    * minus delay, so a shard that exhausts early and surfaced its
    * sentinel would drop every other shard's in-flight tail as late —
    * the barrier withholds each shard's terminal row until all real
    * rows are admitted (the coordination any Kafka drain protocol pays
    * under max-semantics watermarks). Sharding is hash-balanced on
    * user_id; each shard is event-time sorted with its sentinel last
    * by construction (2100 sorts after every real ts).
    */
  def replayWindowedCountsQueue(s: SparkSession, d: String, rowsPerBatch: Int = 0,
      nShards: Int = 8): DataFrame = {
    val evts = graft.ops.Tables.events(s, d)
      .select("ts", "event_type", "value")
    // ts-round-robin sharding ([[tsRoundRobinShards]]) — load-bearing
    // here: a watermark-dropping AGGREGATE pays any frontier skew as
    // late-row loss (measured: hash-of-user sharding lost the corpus's
    // second half), and the per-shard sentinels must sort last
    val sentinels = s.range(nShards).select(
      col("id").cast("int").as("rr"),
      to_timestamp(lit("2100-01-01 00:00:00")).as("ts"),
      lit("sentinel").as("event_type"),
      lit(0.0).as("value"))
    val stageDir = java.nio.file.Files.createTempDirectory("queue-log-w-")
    val name = "events-w-" + java.util.UUID.randomUUID()
    // holdLastUntilDrained: each shard's sentinel is its LAST row, and
    // the broker's drain barrier keeps every sentinel back until all
    // shards' real rows are admitted — Spark's watermark is the global
    // MAX event time, so one early sentinel would drop every other
    // shard's tail as late (see the LogQueue scaladoc; measured)
    stageShardsCached(s, name,
      tsRoundRobinShards(s, evts, nShards, Some(sentinels)), evts.schema,
      s"$d/events.parquet", "window", nShards, stageDir, rowsPerBatch, hold = true)
    try {
      val stream = s.readStream
        .format(graft.sources.QueueSource.Name)
        .option("queue", name)
        .load()
      replayQueueToParquet(
        windowedCountsDrained(stream),
        graft.FsUtil.deleteOnExit(
          java.nio.file.Files.createTempDirectory("replay-qwindow-out-")).toString)
    } finally {
      graft.sources.QueueBroker.remove(name)
      graft.FsUtil.deleteRecursively(stageDir)
    }
  }

  /** Declared query — q_stream_window THROUGH THE QUEUE SOURCE with the
    * per-shard drain sentinel, carrying the same batch oracle verbatim
    * (a drained append replay is trigger- and source-invariant): the
    * hash proves the sharded broker drives watermark-closed
    * aggregations, not just the dedup state machine.
    */
  val qStreamWindowQueue: graft.ops.Q = graft.ops.Q(
    "q_stream_window_queue",
    (s, d) =>
      replayWindowedCountsQueue(s, d)
        .orderBy("window_start", "event_type"),
    qStreamWindow.oracle
  )

  final case class Evt(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(start: java.sql.Timestamp, last: java.sql.Timestamp, n: Int)
  /** Per-user state: the OPEN session fragments, kept until the
    * watermark proves no admissible event can extend them.
    */
  final case class SessionAcc(open: Seq[SessionState])
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int
  )

  private val GapMs = 30L * 60 * 1000

  private def tsMin(a: java.sql.Timestamp, b: java.sql.Timestamp) =
    if (a.compareTo(b) <= 0) a else b
  private def tsMax(a: java.sql.Timestamp, b: java.sql.Timestamp) =
    if (a.compareTo(b) >= 0) a else b

  /** Custom stateful operator: sessionization with a 30-minute idle gap
    * via flatMapGroupsWithState (the KeyValueGroupedDataset custom-state
    * surface).
    *
    * Correct for ANY arrival order the 1-hour watermark admits: state
    * holds a LIST of open session fragments, an event merges into (and
    * can bridge) every fragment within the gap of it, and a fragment is
    * emitted only once the watermark passes `last + gap` — i.e. once no
    * admissible future event can extend or bridge it. (The round-1
    * single-fragment version emitted a session as soon as a later event
    * exceeded the gap, so a late-but-in-watermark event could corrupt
    * or falsely split sessions — ADVICE r1.) This makes the streamed
    * output equal [[sessionizeBatch]]'s lag-gap ground truth for every
    * delivery order with lateness under the watermark; ReplaySpec
    * replays a delayed-delivery reordering to prove it.
    *
    * Gap decisions use millisecond precision on both the streaming and
    * batch sides; emitted timestamps are the exact event timestamps
    * (micros preserved — fragment bounds compare by full precision).
    */
  def sessionize(events: Dataset[Evt]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, it: Iterator[Evt], state: GroupState[SessionAcc]) =>
        var frags: Seq[SessionState] =
          state.getOption.map(_.open).getOrElse(Seq.empty)
        // Insert each event: merge every fragment within the gap (one
        // event can bridge two fragments into one).
        for (e <- it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
          val t = e.ts.getTime
          val (touch, rest) = frags.partition(f =>
            t >= f.start.getTime - GapMs && t <= f.last.getTime + GapMs)
          val merged = touch.foldLeft(SessionState(e.ts, e.ts, 1)) { (m, f) =>
            SessionState(tsMin(m.start, f.start), tsMax(m.last, f.last), m.n + f.n)
          }
          frags = merged +: rest
        }
        // Emit exactly the fragments no admissible event can still touch
        // (events older than the watermark are dropped upstream, so
        // ts >= wm always; a fragment with last + gap < wm is final).
        val wm = state.getCurrentWatermarkMs()
        val (due, open) = frags.partition(_.last.getTime + GapMs < wm)
        if (open.isEmpty) state.remove()
        else {
          state.update(SessionAcc(open.sortBy(_.start.getTime)))
          // Timeout must stay above the current watermark or Spark
          // rejects it; a clamped fragment emits on a later batch.
          state.setTimeoutTimestamp(
            math.max(open.map(_.last.getTime + GapMs).min, wm + 1)
          )
        }
        due.sortBy(_.start.getTime)
          .map(f => Session(uid, f.start, f.last, f.n))
          .iterator
      }
  }

  /** Batch ground truth for [[sessionize]]: lag-gap session ids. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select("user_id", "event_id", "ts")
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn(
        "new_session",
        (col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > GapMs).cast("int")
      )
      .withColumn(
        "session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events")
      )
      .select("user_id", "session_start", "session_end", "n_events")
  }

  /** Declared query: batch lag-gap sessionization over events — the
    * ground truth the streaming operator is spec-verified against, now
    * oracled in its own right (lag + running sum + group-by are plain
    * ANSI SQL). Gap decisions at millisecond precision on both engines
    * (unix_millis / epoch_ms, both floor); emitted bounds keep micros.
    */
  val qSessions: graft.ops.Q = graft.ops.Q(
    "q_sessions",
    (s, d) =>
      sessionizeBatch(graft.ops.Tables.events(s, d))
        .orderBy("user_id", "session_start"),
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            l AS (SELECT user_id, event_id, ts,
                         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
                  FROM e),
            n AS (SELECT user_id, event_id, ts,
                         CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
                              THEN 1 ELSE 0 END AS new_s
                  FROM l),
            sid AS (SELECT user_id, ts,
                           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                    FROM n)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS INTEGER) AS n_events
            FROM sid GROUP BY user_id, session_id
            ORDER BY user_id, session_start""")
  )

  /** Run sessionization over a directory of event files, streaming
    * emitted sessions straight to a parquet sink — the production wiring
    * (executor-parallel write, nothing accumulates on the driver) —
    * then hand back the sink contents as a lazy Dataset.
    */
  /** Declared query — ORACLED: the custom stateful operator
    * ([[sessionize]], flatMapGroupsWithState) replayed to a parquet
    * sink, with an END-OF-STREAM SENTINEL event appended as a second
    * file (user −1, year 2100): the sentinel advances the watermark past
    * every real session's `last + gap`, so event-time timeouts flush ALL
    * fragments and the emitted set (sentinel filtered back out) equals
    * the batch lag-gap sessionization exactly — the driver's t2
    * hash-verifies the stateful operator itself against [[qSessions]]'s
    * SQL. The sentinel file is the streaming end-of-input marker any
    * bounded replay of an unbounded operator needs; on a live stream
    * there is no end, and open sessions correctly stay open.
    */
  val qStreamSessions: graft.ops.Q = graft.ops.Q(
    "q_stream_sessions",
    (s, d) => {
      val live = sentinelReplayDir(s, d)
      val out = java.nio.file.Files
        .createTempDirectory("replay-sess-out-").toString + "/sessions"
      val sessions = replaySessions(s, live.toString, out)
        .toDF()
        .where(org.apache.spark.sql.functions.col("user_id") =!= -1L)
        .orderBy("user_id", "session_start")
      // the replay has fully consumed its inputs; only `out` (lazily
      // read) must survive — don't leave an events copy per run in /tmp
      graft.FsUtil.deleteRecursively(live)
      sessions
    },
    qSessions.oracle
  )

  /** [[sessionize]] — the CUSTOM-STATE operator
    * (flatMapGroupsWithState, EventTimeTimeout) — fed through the
    * sharded queue source: with dedup state and windowed-aggregation
    * state already queue-proven, this closes the third stateful class.
    * Same feed discipline as the window twin (ts-round-robin shards,
    * per-shard far-future sentinels under the drain barrier): the
    * sentinel advances the watermark past every open session's
    * event-time timeout, flushing all fragments; its own user (−1) is
    * filtered in the declared query exactly as [[qStreamSessions]]
    * filters the file-staged sentinel. A user's events interleave
    * ACROSS shards here (round-robin is not keyed) — legal because the
    * group state shuffles by user anyway and sessionize's fragment
    * merge absorbs any within-watermark disorder, the ReplaySpec
    * arrival-order law.
    */
  def replaySessionsQueue(s: SparkSession, d: String, rowsPerBatch: Int = 0,
      nShards: Int = 8): DataFrame = {
    import s.implicits._
    val evts = graft.ops.Tables.events(s, d)
      .select("event_id", "ts", "user_id")
    val sentinels = s.range(nShards).select(
      col("id").cast("int").as("rr"),
      lit(-1L).as("event_id"),
      to_timestamp(lit("2100-01-01 00:00:00")).as("ts"),
      lit(-1L).as("user_id"))
    val stageDir = java.nio.file.Files.createTempDirectory("queue-log-s-")
    val name = "events-s-" + java.util.UUID.randomUUID()
    stageShardsCached(s, name,
      tsRoundRobinShards(s, evts, nShards, Some(sentinels)), evts.schema,
      s"$d/events.parquet", "sessions", nShards, stageDir, rowsPerBatch, hold = true)
    try {
      val stream = s.readStream
        .format(graft.sources.QueueSource.Name)
        .option("queue", name)
        .load()
        .as[Evt]
      replayQueueToParquet(
        sessionize(stream).toDF(),
        graft.FsUtil.deleteOnExit(
          java.nio.file.Files.createTempDirectory("replay-qsess-out-")).toString)
    } finally {
      graft.sources.QueueBroker.remove(name)
      graft.FsUtil.deleteRecursively(stageDir)
    }
  }

  /** Declared query — q_stream_sessions THROUGH THE QUEUE SOURCE,
    * carrying the batch lag-gap oracle verbatim (sessionization is a
    * pure function of event times once the drain flushes every
    * fragment): the hash proves custom flatMapGroupsWithState state
    * survives the non-file source's batch boundaries.
    */
  val qStreamSessionsQueue: graft.ops.Q = graft.ops.Q(
    "q_stream_sessions_queue",
    (s, d) =>
      replaySessionsQueue(s, d)
        .where(col("user_id") =!= -1L)
        .orderBy("user_id", "session_start"),
    qSessions.oracle
  )

  /** Queue-fed STREAM-STREAM JOIN — the FOURTH stateful class through
    * the non-file source (r13 VERDICT: dedup, windowed-agg, and
    * flatMapGroupsWithState state were queue-proven; the symmetric
    * hash-join state of q_stream_join still rode the file source
    * only). The two topics of a production stream join are literally
    * TWO broker queues here — carrying the SAME staged shard logs
    * (one content-keyed staging job, hard-linked into each queue's
    * private live dir; consumption is independent because acks drop
    * links, not cached inodes). Each side admits ts-round-robin
    * aligned micro-batches at the same per-trigger rate, so the
    * global watermark — Spark takes the MIN across sources — advances
    * between triggers and each side's join state evicts down to the
    * watermark horizon exactly as in [[rangeJoinStream]]; a lagging
    * side can only hold the watermark back, never lose rows. Per-shard
    * far-future sentinels under the drain barrier advance the final
    * watermark past every pending row's eviction horizon; they are
    * filtered on the watermark columns themselves and their user (−1)
    * could never match anyway. INNER-join emission is
    * trigger-invariant (see [[rangeJoinStream]]), which is why the
    * replay carries q_range_join's batch oracle verbatim.
    */
  def replayRangeJoinQueue(s: SparkSession, d: String, rowsPerBatch: Int = 0,
      nShards: Int = 8): DataFrame = {
    val evts = graft.ops.Tables.events(s, d)
      .select("event_id", "ts", "user_id")
    val sentinels = s.range(nShards).select(
      col("id").cast("int").as("rr"),
      lit(-1L).as("event_id"),
      to_timestamp(lit("2100-01-01 00:00:00")).as("ts"),
      lit(-1L).as("user_id"))
    val liveA = java.nio.file.Files.createTempDirectory("queue-log-ja-")
    val liveB = java.nio.file.Files.createTempDirectory("queue-log-jb-")
    val nameA = "events-ja-" + java.util.UUID.randomUUID()
    val nameB = "events-jb-" + java.util.UUID.randomUUID()
    def stage(name: String, live: java.nio.file.Path): Unit =
      stageShardsCached(s, name,
        tsRoundRobinShards(s, evts, nShards, Some(sentinels)), evts.schema,
        s"$d/events.parquet", "join", nShards, live, rowsPerBatch, hold = true)
    stage(nameA, liveA)
    stage(nameB, liveB) // warm by construction: links the logs A staged
    try {
      val horizon = to_timestamp(lit("2099-01-01 00:00:00"))
      def topic(name: String) = s.readStream
        .format(graft.sources.QueueSource.Name)
        .option("queue", name)
        .load()
      val a = topic(nameA)
        .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
        .withWatermark("a_ts", "1 hour")
        .where(col("a_ts") < horizon)
      val b = topic(nameB)
        .select(col("user_id").as("b_user"), col("event_id").as("b_id"),
          col("ts").as("b_ts"))
        .withWatermark("b_ts", "1 hour")
        .where(col("b_ts") < horizon)
      replayQueueToParquet(
        graft.ops.Relational.bucketedRangeJoin(a, b),
        graft.FsUtil.deleteOnExit(
          java.nio.file.Files.createTempDirectory("replay-qjoin-out-")).toString)
    } finally {
      graft.sources.QueueBroker.remove(nameA)
      graft.sources.QueueBroker.remove(nameB)
      graft.FsUtil.deleteRecursively(liveA)
      graft.FsUtil.deleteRecursively(liveB)
    }
  }

  /** Declared query — q_stream_join THROUGH TWO QUEUE SOURCES, carrying
    * the same q_range_join batch oracle verbatim: the t2 hash proves
    * symmetric stream-stream join state survives a source that cannot
    * re-list history, on both sides, across queue batch boundaries.
    */
  val qStreamJoinQueue: graft.ops.Q = graft.ops.Q(
    "q_stream_join_queue",
    (s, d) =>
      replayRangeJoinQueue(s, d)
        .orderBy("user_id", "a_id", "b_id"),
    qStreamJoin.oracle
  )


  /** Physical schema of documents.parquet (declared up front — a
    * streaming source cannot infer). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** In-flight QUALITY GATE (E12 × E14): the SAME frozen linear model
    * as q_quality_classifier, applied inside a stream — but as a
    * closed-form per-row expression (left fold of the token array
    * against a literal weight map) instead of the batch
    * explode→broadcast-join→aggregate. A stateless projection needs no
    * shuffle, no state store, no watermark — so the result is
    * trigger-invariant by construction and carries the batch oracle
    * verbatim. The two formulations are the corpus/ingest split of one
    * model: join form for bulk scoring (agg parallelism), expression
    * form for gating documents as they arrive (zero state, scan speed).
    * ReplaySpec asserts both produce the identical accepted set.
    */
  def qualityGate(docs: DataFrame): DataFrame = {
    val entries = graft.ops.Quality.VOCAB
      .flatMap { case (t, w) => Seq(lit(t), lit(w.toLong)) }
    val weights = map(entries: _*)
    docs
      .withColumn("score_milli",
        aggregate(split(col("text"), " "), lit(graft.ops.Quality.BIAS_MILLI),
          (acc, tok) => acc + coalesce(element_at(weights, tok), lit(0L))))
      .where(col("score_milli") >= 0)
      .select(col("doc_id"), col("score_milli"))
  }

  val qStreamQuality: graft.ops.Q = graft.ops.Q(
    "q_stream_quality",
    (s, d) =>
      replayToParquet(
        qualityGate(
          s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
            .parquet(s"$d/documents*.parquet")),
        java.nio.file.Files.createTempDirectory("replay-quality-out-").toString
      ).orderBy("doc_id"),
    Some {
      val rows = graft.ops.Quality.VOCAB
        .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
      s"""WITH vocab(tok, w_milli) AS (VALUES $rows),
          t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          sc AS (SELECT doc_id,
                        CAST(coalesce(sum(w_milli), 0) + ${graft.ops.Quality.BIAS_MILLI}
                             AS BIGINT) AS score_milli
                 FROM t LEFT JOIN vocab USING (tok) GROUP BY doc_id)
          SELECT doc_id, score_milli FROM sc
          WHERE score_milli >= 0 ORDER BY doc_id"""
    }
  )

  /** STREAM-STATIC JOIN anomaly gate (E14 × E16, r7) — the remaining
    * streaming join class after stream-stream (q_stream_join) and
    * stateless projection (q_stream_quality): a live stream joined
    * against a STATIC reference relation. The static side is the exact
    * per-event_type (mu, sigma) profile [[graft.ops.Sampling.eventTypeStats]]
    * computes batch-side (q_normalize's moment discipline — the
    * "yesterday's corpus profile" a monitoring deployment refreshes
    * offline), broadcast once; each arriving event gets its z-score and
    * a 2-sigma anomaly flag as a per-row projection. No state store,
    * no watermark — the join is re-broadcast per micro-batch, emission
    * is trigger-invariant, so the replay carries the batch SQL
    * verbatim and the driver's t2 hash-verifies the streaming
    * stream-static join path itself.
    */
  def anomalyGate(stream: DataFrame, stats: DataFrame): DataFrame =
    stream
      .join(broadcast(stats), col("event_type") === col("g"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sigma"), 6).as("z"),
        (abs(col("value") - col("mu")) > lit(2.0) * col("sigma")).as("is_anomaly"))

  val qStreamAnomaly: graft.ops.Q = graft.ops.Q(
    "q_stream_anomaly",
    (s, d) =>
      replayToParquet(
        anomalyGate(
          readEvents(s, s"$d/events*.parquet"),
          graft.ops.Sampling.eventTypeStats(graft.ops.Tables.events(s, d))),
        java.nio.file.Files.createTempDirectory("replay-anom-out-").toString
      ).orderBy("event_id"),
    Some("""WITH stats AS (
              SELECT event_type AS g,
                     CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mu,
                     sqrt(CAST(sum(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) / count(*)
                          - (CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*))
                            * (CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(*))) AS sigma
              FROM events GROUP BY event_type)
            SELECT event_id, event_type, value,
                   round((value - mu) / sigma, 6) AS z,
                   (abs(value - mu) > 2.0 * sigma) AS is_anomaly
            FROM events JOIN stats ON event_type = g
            ORDER BY event_id""")
  )

  /** Streaming INCREMENTAL DEDUP (E10 × E14) — exact corpus dedup as a
    * dedup-on-ingest operator: state is the set of content keys ever
    * admitted, a document is emitted iff its content was never seen,
    * and the ESTABLISHED copy survives a later lower-id arrival (the
    * same survivor rule as batch q_incremental_dedup — the corpus copy
    * wins, because downstream shards already reference it). Within one
    * micro-batch the lowest id is kept, matching batch q_dedup_exact.
    *
    * Unlike [[dedupStream]] (watermark-bounded, keys re-admit after
    * eviction), corpus dedup state must NEVER expire — the seen-set IS
    * the corpus index. NoTimeout + no watermark makes that explicit.
    * State cost is one entry per DISTINCT content: with the RocksDB
    * state store provider and this key that is the content string; at
    * 100 TB the group key becomes the 128-bit content hash (16-byte
    * state keys, ~collision-free — q_dedup_exact documents the same
    * trade) and the store shards across executors with the shuffle.
    */
  def dedupIngest(docs: Dataset[(Long, String)]): Dataset[Long] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, Long](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (_: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
        if (state.exists) Iterator.empty // established copy survives
        else {
          val keep = it.map(_._1).min // within-batch: lowest id
          state.update(keep)
          Iterator.single(keep)
        }
      }
  }

  /** ORACLED because the driver corpus is a single documents.parquet —
    * one micro-batch, where the within-batch rule IS batch
    * q_dedup_exact's min-id survivor for any arrival order. The
    * cross-batch law with real bite (established copy beats a
    * later-arriving LOWER id; state + offsets survive a checkpoint
    * restart) is proven in ReplaySpec on a two-phase crafted corpus.
    */
  val qStreamIncrementalDedup: graft.ops.Q = graft.ops.Q(
    "q_stream_incremental_dedup",
    (s, d) => {
      import s.implicits._
      val docs = s.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$d/documents*.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
      replayToParquet(
        dedupIngest(docs).toDF("doc_id"),
        java.nio.file.Files.createTempDirectory("replay-increvdedup-out-").toString
      ).orderBy("doc_id")
    },
    Some("""SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY text ORDER BY doc_id""")
  )

  final case class CdcEvt(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class CdcState(tsMs: Long, eid: Long, op: String, v: Double, n: Long)
  final case class CdcOut(user_id: Long, last_op: String, last_value: Double,
      n_changes: Long)

  /** Streaming CDC APPLY (E10 × E14) — the upsert-view maintenance a
    * change stream feeds (the Kafka→lake MERGE idiom): per key, keep
    * the LATEST operation by (ts, event_id) plus the change count. The
    * state fold is a commutative monoid — max by (ts, eid) and a sum —
    * so ANY split of the stream into micro-batches, any arrival order,
    * and a checkpoint restart all produce the same view: that is what
    * makes the single-file driver replay ORACLED against the batch
    * window SQL (q_cdc_apply), and ReplaySpec proves the multi-batch
    * and restart laws on a split replay.
    *
    * End-of-stream: like [[sessionize]]'s bounded replay, final rows
    * flush via event-time timeouts when the far-future sentinel
    * advances the watermark; on a live stream there is no end and the
    * view simply stays current in state (the Update-mode deployment).
    * State is one fixed-width row per key, sharded with the shuffle.
    */
  def cdcApply(evts: Dataset[CdcEvt]): Dataset[CdcOut] = {
    import evts.sparkSession.implicits._
    evts
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, it: Iterator[CdcEvt], state: GroupState[CdcState]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          if (s.op == "error") Iterator.empty // batch rule: error last-op drops
          else Iterator.single(CdcOut(uid, s.op, s.v, s.n))
        } else {
          val merged = it.foldLeft(state.getOption.orNull) { (acc, e) =>
            val t = e.ts.getTime
            if (acc == null || t > acc.tsMs || (t == acc.tsMs && e.event_id > acc.eid))
              CdcState(t, e.event_id, e.event_type, e.value,
                (if (acc == null) 0L else acc.n) + 1)
            else acc.copy(n = acc.n + 1)
          }
          state.update(merged)
          // flush when the watermark passes the stream's end (sentinel)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          Iterator.empty
        }
      }
  }

  /** Declared query — single-file replay + sentinel, ORACLED with the
    * batch q_cdc_apply SQL (see [[cdcApply]]'s invariance argument).
    */
  val qStreamCdc: graft.ops.Q = graft.ops.Q(
    "q_stream_cdc",
    (s, d) => {
      import s.implicits._
      val live = sentinelReplayDir(s, d)
      val out = java.nio.file.Files.createTempDirectory("replay-cdc-out-").toString + "/cdc"
      val evts = readEvents(s, live.toString)
        .select("event_id", "ts", "user_id", "event_type", "value").as[CdcEvt]
      val ckpt = java.nio.file.Files.createTempDirectory("cdc-ckpt-")
      withStatePartitions(s) {
        val q = cdcApply(evts).writeStream
          .format("parquet")
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .option("path", out)
          .start()
        q.awaitTermination()
      unloadStateStores()
      }
      graft.FsUtil.deleteRecursively(ckpt)
      graft.FsUtil.deleteRecursively(live)
      s.read.parquet(out)
        .where(col("user_id") =!= -1L)
        .orderBy("user_id")
    },
    graft.ops.Dedup.qCdcApply.oracle
  )

  final case class FunnelBuf(ts: java.sql.Timestamp, eid: Long, typ: String)
  final case class FunnelAcc(
      buf: Seq[FunnelBuf],
      tV: Option[java.sql.Timestamp],
      tC: Option[java.sql.Timestamp],
      tP: Option[java.sql.Timestamp])
  final case class FunnelOut(
      user_id: Long,
      t_view: Option[java.sql.Timestamp],
      t_click: Option[java.sql.Timestamp],
      t_purchase: Option[java.sql.Timestamp],
      stage: Int,
      us_view_to_click: Option[Long],
      us_click_to_purchase: Option[Long])

  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + t.getNanos / 1000L % 1000L

  /** Watermark values beyond this (2090-01-01) can only come from the
    * drain sentinel (2100) — the replay's end-of-input signal. */
  private val DrainMs = 3786825600000L

  /** The ordered funnel fold — the SEQUENTIAL formulation of
    * [[graft.ops.Composite.qFunnel]]'s window algebra: first view, then
    * the first click at-or-after it, then the first purchase at-or-after
    * that click, processed in exact (ts, event_id) order.
    */
  private def funnelStep(
      tV0: Option[java.sql.Timestamp],
      tC0: Option[java.sql.Timestamp],
      tP0: Option[java.sql.Timestamp],
      evs: Seq[FunnelBuf]
  ): (Option[java.sql.Timestamp], Option[java.sql.Timestamp], Option[java.sql.Timestamp]) = {
    var (tV, tC, tP) = (tV0, tC0, tP0)
    for (e <- evs) e.typ match {
      case "view" if tV.isEmpty               => tV = Some(e.ts)
      case "click" if tC.isEmpty && tV.isDefined     => tC = Some(e.ts)
      case "purchase" if tP.isEmpty && tC.isDefined  => tP = Some(e.ts)
      case _                                  =>
    }
    (tV, tC, tP)
  }

  /** STREAMING FUNNEL (E14 × E17, r7) — q_funnel's ordered
    * view→click→purchase fold as a stateful stream: the live conversion
    * tracker a product-analytics pipeline runs on the event firehose.
    * The fold is ORDER-SENSITIVE (a click before any view never
    * counts), so unlike the CDC monoid it cannot absorb events
    * commutatively; instead state buffers only the NON-FINALIZED suffix:
    * each batch folds every buffered event with ts strictly below the
    * watermark into the compact (t_view, t_click, t_purchase) triple —
    * no admissible arrival can precede those anymore — and keeps just
    * the in-lateness-window tail. State per user = 3 timestamps + the
    * last hour of that user's events, O(lateness window), NOT O(user
    * lifetime); sharded with the state-store shuffle.
    *
    * A funnel row is a LIFETIME aggregate — on a live stream it never
    * closes (the Update-mode deployment keeps the current triple in
    * state). The bounded replay drains through the shared far-future
    * sentinel; a timeout that fires while the watermark is still in
    * real time (< [[DrainMs]]) is a mid-stream advance, NOT
    * end-of-input, and re-arms without emitting — so a multi-batch
    * split can never flush a user prematurely no matter how the files
    * slice (ReplaySpec proves the 5-batch split equals the batch
    * window).
    */
  def funnelStream(evts: Dataset[CdcEvt], drainMs: Long = DrainMs): Dataset[FunnelOut] = {
    import evts.sparkSession.implicits._
    evts
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelAcc, FunnelOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, it: Iterator[CdcEvt], state: GroupState[FunnelAcc]) =>
        def finish(acc: FunnelAcc): FunnelOut = {
          val (tV, tC, tP) =
            funnelStep(acc.tV, acc.tC, acc.tP, acc.buf.sortBy(b => (tsUs(b.ts), b.eid)))
          val stage = if (tP.isDefined) 3 else if (tC.isDefined) 2 else if (tV.isDefined) 1 else 0
          FunnelOut(uid, tV, tC, tP, stage,
            for (c <- tC; v <- tV) yield tsUs(c) - tsUs(v),
            for (p <- tP; c <- tC) yield tsUs(p) - tsUs(c))
        }
        if (state.hasTimedOut) {
          if (state.getCurrentWatermarkMs() >= drainMs) {
            val acc = state.get
            state.remove()
            Iterator.single(finish(acc))
          } else {
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
        } else {
          val acc0 = state.getOption.getOrElse(FunnelAcc(Seq.empty, None, None, None))
          val wm = state.getCurrentWatermarkMs()
          val all = (acc0.buf ++ it.map(e => FunnelBuf(e.ts, e.event_id, e.event_type)))
            .sortBy(b => (tsUs(b.ts), b.eid))
          // finalized prefix: tsMs < wm can no longer be preceded
          val (done, open) = all.partition(_.ts.getTime < wm)
          val (tV, tC, tP) = funnelStep(acc0.tV, acc0.tC, acc0.tP, done)
          state.update(FunnelAcc(open, tV, tC, tP))
          state.setTimeoutTimestamp(wm + 1)
          Iterator.empty
        }
      }
  }

  /** Declared query — single-file replay + sentinel through a parquet
    * sink, ORACLED with the batch q_funnel window SQL (see
    * [[funnelStream]]'s prefix-finalization argument).
    */
  val qStreamFunnel: graft.ops.Q = graft.ops.Q(
    "q_stream_funnel",
    (s, d) => {
      import s.implicits._
      val live = sentinelReplayDir(s, d)
      val out = java.nio.file.Files.createTempDirectory("replay-funnel-out-").toString + "/funnel"
      val evts = readEvents(s, live.toString)
        .select("event_id", "ts", "user_id", "event_type", "value").as[CdcEvt]
      val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt-")
      withStatePartitions(s) {
        val q = funnelStream(evts).writeStream
          .format("parquet")
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .option("path", out)
          .start()
        q.awaitTermination()
      unloadStateStores()
      }
      graft.FsUtil.deleteRecursively(ckpt)
      graft.FsUtil.deleteRecursively(live)
      s.read.parquet(out)
        .where(col("user_id") =!= -1L)
        .orderBy("user_id")
    },
    graft.ops.Composite.qFunnel.oracle
  )

  /** Replay dir: the events file plus the far-future sentinel that
    * advances the watermark past every real event — shared by the
    * sessionization and CDC replays (the streaming end-of-input
    * marker any bounded replay of an unbounded operator needs).
    */
  private def sentinelReplayDir(s: SparkSession, d: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val live = Files.createTempDirectory("replay-sentinel-in-")
    val src = Paths.get(s"$d/events.parquet")
    Files.copy(src, live.resolve("00.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(live.resolve("00.parquet"), FileTime.fromMillis(1000000000000L))
    val sentinelSecs = 4102444800L // 2100-01-01T00:00Z
    val longShape = tsIsLong(s, src.toString)
    val row =
      if (longShape)
        org.apache.spark.sql.Row(-1L, sentinelSecs * 1000000000L, -1L, "sentinel", 0.0, "{}")
      else
        org.apache.spark.sql.Row(-1L,
          java.time.LocalDateTime.ofEpochSecond(sentinelSecs, 0, java.time.ZoneOffset.UTC),
          -1L, "sentinel", 0.0, "{}")
    val tmp = Files.createTempDirectory("sentinel-file-")
    s.createDataFrame(java.util.List.of(row), if (longShape) rawSchema else rawSchemaNtz)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
    Files.move(part, live.resolve("01.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(live.resolve("01.parquet"), FileTime.fromMillis(1000000060000L))
    graft.FsUtil.deleteRecursively(tmp)
    live
  }

  def replaySessions(spark: SparkSession, dir: String, outDir: String): Dataset[Session] = {
    import spark.implicits._
    val evts = readEvents(spark, dir).select("event_id", "ts", "user_id").as[Evt]
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt-")
    withStatePartitions(spark) {
      val q = sessionize(evts).writeStream
        .format("parquet")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .option("path", outDir)
        .start()
      q.awaitTermination()
      unloadStateStores()
    }
    graft.FsUtil.deleteRecursively(ckpt)
    spark.read.parquet(outDir).as[Session]
  }

  /** Shard count for the streaming sampler's bottom-k state — the
    * parallelism knob: state is k rows PER SHARD, shards hash across
    * the state-store partitions, and the final merge reads shards·k
    * rows. 8 matches the replay harness (ReplayStatePartitions); a
    * production deployment sizes it to its executor count.
    */
  private val SampleShards = 8L

  final case class WDoc(doc_id: Long, w: Long, priority: Long)

  /** Stage a documents replay dir with a DRAIN sentinel file: the data
    * file first, then (strictly later mtime, so `maxFilesPerTrigger=1`
    * delivers it as its own FINAL micro-batch) one sentinel row per
    * shard (doc_id −1…−SampleShards covers every pmod class). The
    * [[sentinelReplayDir]] discipline for a source with no event time:
    * a watermark can't signal end-of-stream here, so the drain marker
    * rides the DATA path and is recognized by its impossible id.
    */
  private[graft] def docSentinelDir(s: SparkSession, d: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val live = Files.createTempDirectory("replay-docsent-in-")
    val src = Paths.get(s"$d/documents.parquet")
    // Files.copy on a DIRECTORY-style dataset would copy an empty dir
    // entry and the replay source would silently read zero data rows —
    // fail loudly instead (the successExists hadoop-FS discipline)
    require(Files.isRegularFile(src),
      s"replay fixture must be a single-file parquet dataset: $src")
    Files.copy(src, live.resolve("00.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(live.resolve("00.parquet"), FileTime.fromMillis(1000000000000L))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.List.of((0L until SampleShards).map(i =>
        org.apache.spark.sql.Row(-1L - i, "drain", "xx", "drain", 0L)): _*)
    val tmp = Files.createTempDirectory("docsent-file-")
    s.createDataFrame(rows, docSchema).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
    Files.move(part, live.resolve("01.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(live.resolve("01.parquet"), FileTime.fromMillis(1000000060000L))
    graft.FsUtil.deleteRecursively(tmp)
    live
  }

  /** Sharded streaming BOTTOM-K state fold: per shard keep the k docs
    * with the smallest (priority, doc_id) seen so far — a commutative,
    * idempotent-on-merge monoid (the TopKAgg bound, held as streaming
    * state), flushed when the shard's drain sentinel arrives. Emission
    * only at drain is what makes Append mode correct: a bottom-k
    * member can be displaced by a later batch, so nothing may be
    * emitted while data still flows.
    */
  def sampleStream(docs: Dataset[WDoc], k: Int): Dataset[WDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(dd => ((dd.doc_id % SampleShards) + SampleShards) % SampleShards)
      .flatMapGroupsWithState[List[WDoc], WDoc](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (_: Long, it: Iterator[WDoc], state: GroupState[List[WDoc]]) =>
        def ins(buf: List[WDoc], e: WDoc): List[WDoc] = {
          val (pre, post) = buf.span(x =>
            x.priority < e.priority || (x.priority == e.priority && x.doc_id < e.doc_id))
          val m = pre ::: (e :: post)
          if (m.length > k) m.take(k) else m
        }
        val (drains, data) = it.toSeq.partition(_.doc_id < 0)
        val buf = data.foldLeft(state.getOption.getOrElse(Nil))(ins)
        state.update(buf)
        if (drains.nonEmpty) buf.iterator else Iterator.empty
      }
  }

  /** STREAMING WEIGHTED SAMPLE (E16 × E14) — q_weighted_sample as a
    * sample-on-ingest operator: the replication-min-hash priority is a
    * pure per-row expression (identical Column tree to the batch
    * query), so the bottom-k BY PRIORITY is a deterministic set and
    * the streaming fold just maintains it — per shard, k rows of
    * state, O(shards·k) total regardless of stream length. The final
    * batch step merges the 8 shard flushes (≤ 8k rows) into the global
    * bottom-20, which equals the batch bottom-20 because each shard's
    * global members are necessarily within that shard's own bottom-k.
    * ORACLED with q_weighted_sample's own algebra (minus the lang
    * column the state never carries): the hash match proves the
    * streamed sample IS the batch sample — trigger-split invariance
    * comes free from determinism, and ReplaySpec adds the two-phase
    * displacement law (a later batch's lower priority evicts an
    * earlier batch's member).
    */
  /** The replication-min-hash priority stream over a staged sentinel
    * dir — the q_stream_sample input, shared with the PlanDump audit
    * hook so the plan on file is the plan the declared query runs.
    */
  private[graft] def weightedDocStream(s: SparkSession, live: String): Dataset[WDoc] = {
    import s.implicits._
    s.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$live/*.parquet")
      .select(col("doc_id"),
        least(size(split(col("text"), " ")).cast("long"), lit(8L)).as("w"))
      .withColumn("priority",
        array_min(transform(sequence(lit(0L), col("w") - 1),
          r => (col("doc_id") * 8L + r) % 2147483647L *
            2654435761L % 4294967296L)))
      .as[WDoc]
  }

  val qStreamSample: graft.ops.Q = graft.ops.Q(
    "q_stream_sample",
    (s, d) => {
      val live = docSentinelDir(s, d)
      try {
        val docs = weightedDocStream(s, live.toString)
        replayToParquet(
          sampleStream(docs, 20).toDF(),
          java.nio.file.Files.createTempDirectory("replay-wsample-out-").toString)
          .orderBy("priority", "doc_id").limit(20)
          .select("doc_id", "w", "priority")
      } finally graft.FsUtil.deleteRecursively(live)
    },
    Some("""SELECT doc_id,
                   least(CAST(len(string_split(text,' ')) AS BIGINT), 8) AS w,
                   list_min(list_transform(
                     range(0, least(CAST(len(string_split(text,' ')) AS BIGINT), 8)),
                     r -> (doc_id * 8 + r) % 2147483647 * 2654435761 % 4294967296))
                     AS priority
            FROM documents
            ORDER BY priority, doc_id LIMIT 20""")
  )

  /** One staged row of the PIT replay: feature versions (kind 0,
    * purchases) and probes (kind 1, clicks), with the epoch-week both
    * the file layout and the oracle derive from the same micros.
    */
  final case class PitRow(kind: Int, event_id: Long, user_id: Long,
      tsu: Long, wk: Long, value: Double)

  /** Per-entity serving state: the latest feature version seen in
    * COMPLETED micro-batches (max by (tsu, event_id) — an associative,
    * order-free fold) plus how many versions preceded it.
    */
  final case class PitState(tsu: Long, eid: Long, value: Double, n: Long)

  final case class PitOut(event_id: Long, user_id: Long, probe_wk: Long,
      feature_value: Option[Double], feature_version: Long)

  private val pitSchema: StructType = StructType(Seq(
    StructField("kind", IntegerType), StructField("event_id", LongType),
    StructField("user_id", LongType), StructField("tsu", LongType),
    StructField("wk", LongType), StructField("value", DoubleType)))

  /** Stage the PIT replay dir: one VERSIONS file then one PROBES file
    * per epoch-week, mtimes strictly increasing, so
    * `maxFilesPerTrigger=1` delivers week w's features BEFORE week w's
    * probes — the feature-store publish cadence ("features computed at
    * week open serve that week's traffic") the oracle encodes as
    * `v.wk <= p.wk`.
    */
  private[graft] def pitReplayDir(s: SparkSession, d: String): java.nio.file.Path = {
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = graft.ops.Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"), col("value"))
      .withColumn("wk", expr("tsu div 604800000000"))
    val staged = ev
      .where(col("event_type").isin("purchase", "click"))
      .select(
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
        col("event_id"), col("user_id"), col("tsu"), col("wk"), col("value"))
    val live = Files.createTempDirectory("replay-pit-in-")
    // ONE partitioned write stages every (week, kind) slice (r11,
    // VERDICT r10 next #4: the previous per-slice coalesce(1) loop ran
    // one Spark job per slice — driver work ∝ weeks, and at sf10 the
    // ~200 slice jobs dominated the 28.5 s query). partitionBy on
    // COPIES of the keys keeps wk/kind in the data files (the stream
    // reader's schema needs them); repartition on the same keys lands
    // each slice in ONE task, so each dir holds exactly ONE file; an
    // empty slice produces no dir at all (dynamic partition writes
    // skip them — the r10 empty-slice rule, now free).
    val stagedir = Files.createTempDirectory("pit-staged-")
    staged
      .withColumn("pwk", col("wk")).withColumn("pkind", col("kind"))
      .repartition(col("pwk"), col("pkind"))
      .write.mode("overwrite").partitionBy("pwk", "pkind")
      .parquet(stagedir.toString)
    // post-hoc mtime stamping, (week asc, versions-before-probes)
    // order — the mtime contract documented on the reader below is
    // applied AFTER the one write, driver-side file moves only
    val slices = for {
      wd <- new java.io.File(stagedir.toString).listFiles().toSeq
      if wd.getName.startsWith("pwk=")
      kd <- wd.listFiles().toSeq if kd.getName.startsWith("pkind=")
    } yield (wd.getName.stripPrefix("pwk=").toLong,
      kd.getName.stripPrefix("pkind=").toInt, kd)
    var slot = 0
    for ((w, k, dir) <- slices.sortBy(t => (t._1, t._2))) {
      val fs = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      require(fs.length == 1,
        s"PIT slice (wk=$w, kind=$k) staged ${fs.length} files — the one-task-per-slice repartition contract broke")
      Files.move(fs.head.toPath, live.resolve(f"$slot%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(live.resolve(f"$slot%02d.parquet"),
        FileTime.fromMillis(1000000000000L + slot * 60000L))
      slot += 1
    }
    graft.FsUtil.deleteRecursively(stagedir)
    live
  }

  /** ONLINE POINT-IN-TIME ENRICHMENT — the serving-side state fold:
    * per entity keep only the LATEST feature version from completed
    * batches (O(entities) state at ANY stream length — the online
    * twin of the batch [[graft.ops.Dedup]] q_pit_join, whose state is
    * the full history because it answers probes at arbitrary past
    * timestamps; the online path answers "now", so one version
    * suffices). Versions fold before probes emit within an
    * invocation, so a mixed batch degenerates to the same `wk ≤ wk`
    * contract the file layout enforces.
    */
  def pitStream(rows: Dataset[PitRow]): Dataset[PitOut] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PitState, PitOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (uid: Long, it: Iterator[PitRow], state: GroupState[PitState]) =>
        val (versions, probes) = it.toSeq.partition(_.kind == 0)
        val st0 = state.getOption.getOrElse(PitState(Long.MinValue, Long.MinValue, 0.0, 0L))
        val st = versions.foldLeft(st0) { (acc, v) =>
          val better = v.tsu > acc.tsu || (v.tsu == acc.tsu && v.event_id > acc.eid)
          PitState(
            if (better) v.tsu else acc.tsu,
            if (better) v.event_id else acc.eid,
            if (better) v.value else acc.value,
            acc.n + 1)
        }
        if (versions.nonEmpty) state.update(st)
        probes.iterator.map(p =>
          PitOut(p.event_id, uid, p.wk,
            if (st.n > 0) Some(st.value) else None, st.n))
      }
  }

  /** STREAMING POINT-IN-TIME ENRICHMENT (r9, E14 × E10) — feature
    * serving as an operator: probes (clicks) enriched on arrival with
    * the entity's latest feature version (purchases) published in any
    * EARLIER-or-same-week batch. ORACLED: the staged file cadence
    * (versions of week w before probes of week w, weeks ascending)
    * makes the streamed answer a pure function of the data — the
    * DuckDB asof join over `v.wk ≤ p.wk` reproduces every enriched
    * row bit-for-bit, including feature_version (how many versions
    * preceded the serve) and the NULL feature of a never-featured
    * entity.
    *
    * 100 TB posture: state is ONE row per live entity (the latest
    * version), emission is per-probe Append — the stream never holds
    * history, never re-sorts, never drains; a year of traffic costs
    * the same state as a day's.
    */
  val qStreamPit: graft.ops.Q = graft.ops.Q(
    "q_stream_pit",
    (s, d) => {
      import s.implicits._
      val live = pitReplayDir(s, d)
      try {
        // ORDERING DEPENDENCY (the docSentinelDir discipline): with
        // maxFilesPerTrigger=1, FileStreamSource delivers files
        // OLDEST-MTIME-FIRST — pitReplayDir stamps mtimes 60 s apart in
        // (week asc, versions-before-probes) order, and that mtime
        // contract is what makes the replay equal the `v.wk <= p.wk`
        // asof-join oracle. Renaming/touching the staged files breaks it.
        val rows = s.readStream.schema(pitSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$live/*.parquet")
          .as[PitRow]
        replayToParquet(
          pitStream(rows).toDF(),
          java.nio.file.Files.createTempDirectory("replay-pit-out-").toString)
          .orderBy("event_id")
          .select("event_id", "user_id", "probe_wk", "feature_value", "feature_version")
      } finally graft.FsUtil.deleteRecursively(live)
    },
    Some("""WITH v AS (
              SELECT user_id, epoch_us(ts) AS tsu, event_id, value,
                     epoch_us(ts) // 604800000000 AS wk
              FROM events WHERE event_type = 'purchase'),
            p AS (
              SELECT event_id, user_id, epoch_us(ts) // 604800000000 AS wk
              FROM events WHERE event_type = 'click'),
            j AS (
              SELECT p.event_id, p.user_id, p.wk AS probe_wk,
                     v.value,
                     row_number() OVER (PARTITION BY p.event_id
                                        ORDER BY v.tsu DESC, v.event_id DESC) AS rn,
                     count(v.user_id) OVER (PARTITION BY p.event_id) AS nv
              FROM p LEFT JOIN v
                ON v.user_id = p.user_id AND v.wk <= p.wk)
            SELECT event_id, user_id, probe_wk,
                   value AS feature_value,
                   CAST(nv AS BIGINT) AS feature_version
            FROM j WHERE rn = 1
            ORDER BY event_id""")
  )
}
