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

  /** Physical schema of events.parquet (ts is TIMESTAMP(NANOS) — read as
    * long via nanosAsLong, converted below; a streaming source needs the
    * schema declared up front).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** File-source stream over an events directory, one file per
    * micro-batch (replays multi-file drops as distinct batches).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      // integer div: see Tables.events — double division floors 1µs low
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour windows per event_type with a 1-hour watermark:
    * counts + exact decimal sum (same discipline as the batch queries).
    * The same function applies to a batch DataFrame (unified API) —
    * ReplaySpec exploits that for the equivalence check.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
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

  /** Replay to completion. Complete output mode: append mode would hold
    * back every window newer than (max event time − watermark) forever,
    * because a terminated stream never advances the watermark past its
    * last window — the batch-equality check needs the full result.
    */
  def replayWindowedCounts(spark: SparkSession, dir: String, name: String = "replay_counts"): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory("replay-ckpt-")
    val q = windowedCounts(readEvents(spark, dir)).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.awaitTermination()
    graft.FsUtil.deleteRecursively(ckpt) // one-shot replay: no /tmp leak
    spark.table(name)
  }

  private val runCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Declared query (rows-only check — E14 is not DuckDB-comparable):
    * the windowed replay over the sf directory's events file, totally
    * ordered. Exercises readStream → watermark → windowed agg → memory
    * sink end-to-end inside the driver's Verify pass.
    */
  val qStreamWindow: graft.ops.Q = graft.ops.Q(
    "q_stream_window",
    (s, d) => {
      val name = s"replay_counts_${runCounter.incrementAndGet()}"
      // glob, not the bare file path: the file stream source requires a
      // directory or glob for basePath inference.
      replayWindowedCounts(s, s"$d/events*.parquet", name)
        .orderBy("window_start", "event_type")
    },
    None
  )

  final case class Evt(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(start: java.sql.Timestamp, last: java.sql.Timestamp, n: Int)
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int
  )

  private val GapMs = 30L * 60 * 1000

  /** Custom stateful operator: sessionization with a 30-minute idle gap
    * via flatMapGroupsWithState (the KeyValueGroupedDataset custom-state
    * surface). A session closes when the gap is exceeded by a later
    * event of the same user, or when the event-time timeout fires
    * (watermark passed last+gap with no new data).
    *
    * Gap decisions use millisecond precision on both the streaming and
    * batch sides ([[sessionizeBatch]]); emitted timestamps are the exact
    * event timestamps (micros preserved).
    */
  def sessionize(events: Dataset[Evt]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, it: Iterator[Evt], state: GroupState[SessionState]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption
        val out = Seq.newBuilder[Session]
        if (state.hasTimedOut) {
          cur.foreach(s => out += Session(uid, s.start, s.last, s.n))
          state.remove()
          cur = None
        }
        for (e <- sorted) {
          cur match {
            case Some(s) if e.ts.getTime - s.last.getTime <= GapMs =>
              cur = Some(SessionState(s.start, e.ts, s.n + 1))
            case Some(s) =>
              out += Session(uid, s.start, s.last, s.n)
              cur = Some(SessionState(e.ts, e.ts, 1))
            case None =>
              cur = Some(SessionState(e.ts, e.ts, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Timeout must stay above the current watermark or Spark
          // rejects it; a clamped session emits on a later batch.
          state.setTimeoutTimestamp(
            math.max(s.last.getTime + GapMs, state.getCurrentWatermarkMs() + 1)
          )
        }
        out.result().iterator
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

  /** Run sessionization over a directory of event files, collecting all
    * emitted sessions (foreachBatch accumulator).
    */
  def replaySessions(spark: SparkSession, dir: String): Seq[Session] = {
    import spark.implicits._
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Session]()
    val evts = readEvents(spark, dir).select("event_id", "ts", "user_id").as[Evt]
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt-")
    val q = sessionize(evts).writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        batch.collect().foreach(sink.add)
        ()
      }
      .start()
    q.awaitTermination()
    graft.FsUtil.deleteRecursively(ckpt)
    import scala.jdk.CollectionConverters._
    sink.asScala.toSeq
  }
}
