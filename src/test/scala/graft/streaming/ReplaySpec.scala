package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E14 self-verification (SURVEY §2.C: streaming output equals its batch
  * equivalent on the same data — the reference-free correctness anchor
  * for the non-t2 streaming surface).
  */
class ReplaySpec extends SparkSpec {

  /** Split sf0.001 events (raw nanos schema) into `slices` parquet files
    * in a fresh dir, ordered by DELIVERY time (event time + `delayNanos`
    * per event), so maxFilesPerTrigger=1 replays them as micro-batches.
    * delayNanos == 0 gives chronological replay; a nonzero bounded delay
    * produces out-of-order arrival within the watermark. Returns the dir.
    */
  private def sliceEvents(
      slices: Int,
      sentinel: Boolean,
      delayNanos: org.apache.spark.sql.Row => Long = _ => 0L
  ): String = {
    val dir = Files.createTempDirectory("events-replay-")
    val raw = spark.read.schema(Replay.rawSchema)
      .parquet(s"$sf0001/events.parquet")
    val rows = raw.collect().sortBy(r => r.getLong(1) + delayNanos(r)) // by delivery time
    val per = math.ceil(rows.length.toDouble / slices).toInt
    val groups = rows.grouped(per).toSeq
    def writeSlice(rs: Seq[org.apache.spark.sql.Row], idx: Int): Unit = {
      val tmp = Files.createTempDirectory("slice-")
      spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
        Replay.rawSchema
      ).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      val dest = dir.resolve(f"$idx%02d.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + idx * 60000L))
    }
    groups.zipWithIndex.foreach { case (g, i) => writeSlice(g, i) }
    if (sentinel) {
      // One far-future event of user -1: advances the watermark past every
      // real session so event-time timeouts flush them all.
      val maxTs = rows.map(_.getLong(1)).max
      val row = org.apache.spark.sql.Row(
        -1L, maxTs + 10L * 86400 * 1000000000L, -1L, "sentinel", 0.0, "{}"
      )
      writeSlice(Seq(row), groups.size)
    }
    dir.toString
  }

  private def batchEvents(dir: String): DataFrame =
    spark.read.schema(Replay.rawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  test("windowed counts: drained append replay == batch aggregation (full window set)") {
    // sentinel=true: the drain event is what lets APPEND mode flush
    // every real window through the parquet sink before termination
    val dir = sliceEvents(4, sentinel = true)
    val out = Files.createTempDirectory("swindow-spec-out-")
    val streamed = Replay.replayToParquet(
      Replay.windowedCountsDrained(Replay.readEvents(spark, dir)),
      out.toString + "/counts")
      .orderBy("window_start", "event_type").collect()
    val batch = Replay.windowedCounts(
      batchEvents(dir).where(col("user_id") =!= -1L)) // sentinel is user -1 at 2100
      .orderBy("window_start", "event_type").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "append replay must emit EVERY real window exactly once — the drain sentinel " +
        "advances the watermark past the last one")
  }

  test("windowed counts: checkpoint restart across file drops == batch (exactly-once)") {
    // run 1 consumes the first two slices and stops; the remaining
    // slices + drain sentinel land; run 2 RESUMES from the same
    // checkpoint into the same sink. Offsets and window state must
    // restore so every window is emitted exactly once — no loss (state
    // forgotten), no duplication (slices re-read).
    val full = sliceEvents(4, sentinel = true)
    val live = Files.createTempDirectory("restart-live-")
    val out = Files.createTempDirectory("restart-out-").toString + "/counts"
    val ckpt = Files.createTempDirectory("restart-ckpt-").toString
    val files = Files.list(Paths.get(full)).iterator()
    val all = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    while (files.hasNext) all += files.next()
    val sorted = all.sortBy(_.getFileName.toString)
    def drop(p: java.nio.file.Path): Unit = {
      val d = live.resolve(p.getFileName.toString)
      Files.copy(p, d, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(d, Files.getLastModifiedTime(p))
    }
    sorted.take(2).foreach(drop)
    Replay.replayToParquet(
      Replay.windowedCountsDrained(Replay.readEvents(spark, live.toString)), out, ckpt)
    sorted.drop(2).foreach(drop)
    val streamed = Replay.replayToParquet(
      Replay.windowedCountsDrained(Replay.readEvents(spark, live.toString)), out, ckpt)
      .orderBy("window_start", "event_type").collect()
    val batch = Replay.windowedCounts(
      batchEvents(full).where(col("user_id") =!= -1L))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "restart lost or duplicated window state across the checkpoint")
  }

  private def assertSessionsMatchBatch(dir: String): Unit = {
    val out = Files.createTempDirectory("sess-out-").toString + "/sessions"
    val emitted = Replay.replaySessions(spark, dir, out)
      .collect().toSeq
      .filter(_.user_id != -1L)
      .sortBy(s => (s.user_id, s.session_start.getTime))
    val expected = Replay.sessionizeBatch(batchEvents(dir).where(col("user_id") =!= -1L))
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => Replay.Session(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      .toSeq
    assert(emitted.nonEmpty)
    assert(emitted == expected)
  }

  test("sessionize: streamed flatMapGroupsWithState == batch lag-gap sessions") {
    assertSessionsMatchBatch(sliceEvents(4, sentinel = true))
  }

  test("sessionize: out-of-order delivery within the watermark still == batch") {
    // Every third event is delivered 25 minutes late (< 1 h watermark,
    // comparable to the 30 min gap): sessions can arrive end-first,
    // events can land inside or before already-open fragments, and one
    // late event can bridge two fragments. The multi-fragment state must
    // still reproduce the batch ground truth exactly.
    val lateEvery3 = (r: org.apache.spark.sql.Row) =>
      if (r.getLong(0) % 3 == 0) 25L * 60 * 1000000000L else 0L
    assertSessionsMatchBatch(sliceEvents(6, sentinel = true, delayNanos = lateEvery3))
  }

  test("q_stream_window declared query runs on the plain sf dir") {
    val n = Replay.qStreamWindow.fn(spark, sf0001).count()
    assert(n > 0)
  }

  test("stream-stream range join: multi-batch replay == batch join exactly") {
    // 4 micro-batches: pairs straddle trigger boundaries, so this fails
    // if cross-batch state retention or eviction is wrong.
    val dir = sliceEvents(4, sentinel = false)
    val streamed = Replay.replayRangeJoin(spark, dir)
      .orderBy("user_id", "a_id", "b_id").collect()
    val e = batchEvents(dir)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    val batch = a.join(
        b,
        col("user_id") === col("b_user") && col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") < col("a_ts") + expr("INTERVAL 60 SECONDS"))
      .select("user_id", "a_id", "b_id")
      .orderBy("user_id", "a_id", "b_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sliding windows: multi-batch drained replay == two-window batch expansion") {
    val dir = sliceEvents(4, sentinel = true)
    val out = Files.createTempDirectory("sslide-spec-")
    val stream = Replay.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .where(col("ts") < to_timestamp(lit("2099-01-01 00:00:00")))
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
    val streamed = Replay.replayToParquet(stream, out.toString + "/counts")
      .orderBy("window_start", "event_type").collect()
    val batch = batchEvents(dir).where(col("user_id") =!= -1L)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "overlapping-window state must close every slide exactly once across batches")
  }

  test("stream-stream LEFT OUTER join: multi-batch replay == batch left join") {
    // 4 micro-batches + drain sentinel: unmatched-left verdicts must
    // survive batch boundaries (a left row's match can arrive 2 batches
    // later; its null verdict may only fire at watermark passage) —
    // this fails if outer-state eviction or the drain flush is wrong.
    val dir = sliceEvents(4, sentinel = true)
    val out = Files.createTempDirectory("sjoin-outer-spec-")
    val streamed = Replay.replayToParquet(
      Replay.rangeJoinOuterStream(spark, dir), out.toString + "/rows")
      .orderBy("user_id", "a_id", "b_id").collect()
    val e = batchEvents(dir).where(col("user_id") =!= -1L)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    val batch = a.join(
        b,
        col("user_id") === col("b_user") && col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") < col("a_ts") + expr("INTERVAL 60 SECONDS"),
        "left_outer")
      .select("user_id", "a_id", "b_id")
      .orderBy("user_id", "a_id", "b_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.count(_.isNullAt(2)) > 0, "no unmatched lefts — outer path untested")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming funnel: split replay == batch window, no premature flush") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // 5 micro-batches: the ordered fold must survive batch boundaries.
    // The drain gate is what makes this safe — a mid-stream timeout
    // (watermark still in real time) re-arms instead of flushing, so no
    // user can emit before end-of-input regardless of how files slice.
    val dir = sliceEvents(5, sentinel = true)
    val maxRealMs = batchEvents(dir).where(col("user_id") =!= -1L)
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val evts = Replay.readEvents(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Replay.CdcEvt]
    val out = Files.createTempDirectory("funnel-spec-out-").toString + "/rows"
    val ckpt = Files.createTempDirectory("funnel-spec-ckpt-")
    val q = Replay.funnelStream(evts, drainMs = maxRealMs + 5L * 86400000L)
      .writeStream
      .format("parquet")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .option("path", out)
      .start()
    q.awaitTermination()
    val cols = Seq("user_id", "t_view", "t_click", "t_purchase", "stage",
      "us_view_to_click", "us_click_to_purchase")
    val got = spark.read.parquet(out)
      .where(col("user_id") =!= -1L)
      .select(cols.head, cols.tail: _*)
      .orderBy("user_id").collect()
    val batch = graft.ops.Composite.funnelBatch(
        batchEvents(dir).where(col("user_id") =!= -1L))
      .select(cols.head, cols.tail: _*).collect()
    assert(got.length == batch.length, s"${got.length} users vs batch ${batch.length}")
    assert(got.map(_.getLong(0)).distinct.length == got.length, "premature flush duplicated a user")
    assert(got.toSeq == batch.toSeq, "streamed funnel diverged from the batch window")
    // the fold must complete for real on this fixture (the slice
    // timeline is gap-compressed, so every user converts — stage
    // DIVERSITY is exercised by the declared query's oracle at sf0.01)
    assert(got.map(_.getInt(4)).forall(s => s >= 0 && s <= 3))
    assert(got.exists(_.getInt(4) == 3))
  }

  test("streaming CDC apply: split replay == batch window, any batch boundaries") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // 5 micro-batches: per-key latest-op state must merge across
    // batches; the commutative-monoid fold makes the boundaries
    // invisible — this is the law that lets the declared single-file
    // replay carry the batch oracle
    val dir = sliceEvents(5, sentinel = true)
    val evts = Replay.readEvents(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Replay.CdcEvt]
    val out = Files.createTempDirectory("cdc-spec-out-").toString + "/rows"
    val ckpt = Files.createTempDirectory("cdc-spec-ckpt-")
    val q = Replay.cdcApply(evts).writeStream
      .format("parquet")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .option("path", out)
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .where(col("user_id") =!= -1L)
      .select("user_id", "last_op", "last_value", "n_changes")

    val byKey = Window.partitionBy("user_id")
    val w = byKey.orderBy(col("ts").desc, col("event_id").desc)
    val batch = batchEvents(dir)
      .where(col("user_id") =!= -1L)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(byKey))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_op"),
        col("value").as("last_value"), col("n_changes"))

    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streamed CDC view diverged from the batch window")
  }

  test("restart from checkpoint: offsets + join state recover, exactly-once output") {
    val src = sliceEvents(4, sentinel = false)
    val live = Files.createTempDirectory("events-live-")
    val out = Files.createTempDirectory("restart-out-").toString + "/rows"
    val ckpt = Files.createTempDirectory("restart-ckpt-").toString
    // deliver in two phases, preserving the chronological mtime order the
    // maxFilesPerTrigger=1 source replays by
    def deliver(names: String*): Unit = names.foreach { n =>
      val dest = live.resolve(n)
      Files.copy(Paths.get(src, n), dest, StandardCopyOption.REPLACE_EXISTING)
      val idx = n.takeWhile(_.isDigit).toInt
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + idx * 60000L))
    }
    deliver("00.parquet", "01.parquet")
    val phase1 = Replay
      .replayToParquet(Replay.rangeJoinStream(spark, live.toString), out, ckpt)
      .count()
    // "process crash": the query object is gone; only checkpoint + sink
    // survive. New files land, the stream restarts from the checkpoint.
    deliver("02.parquet", "03.parquet")
    val resumed = Replay
      .replayToParquet(Replay.rangeJoinStream(spark, live.toString), out, ckpt)
      .select("user_id", "a_id", "b_id")
      .orderBy("user_id", "a_id", "b_id")
      .collect()
    val e = batchEvents(live.toString)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    val batch = a.join(
        b,
        col("user_id") === col("b_user") && col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") < col("a_ts") + expr("INTERVAL 60 SECONDS"))
      .select("user_id", "a_id", "b_id")
      .orderBy("user_id", "a_id", "b_id").collect()
    assert(phase1 > 0 && phase1 < batch.length, "both phases must contribute matches")
    // complete + exactly-once: missing rows would mean lost state/offsets,
    // extras would mean reprocessed files
    assert(resumed.toSeq == batch.toSeq)
  }

  test("streaming dedup: key set == batch distinct, re-emission bounded") {
    val dir = sliceEvents(4, sentinel = false)
    val out = Replay.replayDedup(spark, dir).collect()
    val keys = out.map(r => (r.getLong(0), r.getString(1))).toSeq
    val batchKeys = batchEvents(dir)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keys.toSet == batchKeys) // complete: nothing lost, nothing invented
    // re-emission only when a key's duplicates span > the 1 h watermark:
    // far fewer emissions than input events
    val nEvents = batchEvents(dir).count()
    assert(keys.size < nEvents / 2, s"dedup emitted ${keys.size} of $nEvents events")
  }

  test("queue source parity: dedup through the broker == dedup through the file source == batch distinct") {
    // force several micro-batches (sf0.001 events / 500 rows ≈ 4+
    // triggers) so the parity claim covers real batch boundaries, not a
    // one-shot drain
    val queued = Replay.replayDedupQueue(spark, sf0001, rowsPerBatch = 500)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batchKeys = graft.ops.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(queued == batchKeys, "queue-fed dedup key set drifted from batch DISTINCT")
    assert(queued.nonEmpty)
  }

  test("queue source: a time-restarting corpus (concatenated epochs) loses nothing — event-time feed order is load-bearing") {
    // the r12 sf10 t2 catch: ScaleUp corpora are concatenated copies
    // whose ts ranges RESTART per copy; fed in raw file order, batch 2+
    // arrives wholly behind the watermark and the stateful dedup drops
    // it as late (86 520 of 750 000 keys survived). The broker feed
    // sorts by event time — this corpus is the regression trap.
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("queue-epochs-").toString
    e.unionByName(
        e.withColumn("event_id", col("event_id") + 1000000L)
          .withColumn("user_id", col("user_id") + 1000000L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Replay.replayDedupQueue(spark, dir, rowsPerBatch = 700)
      .select("user_id", "event_type").distinct().count()
    val want = graft.ops.Tables.events(spark, dir)
      .select("user_id", "event_type").distinct().count()
    assert(got == want, s"epoch-2 keys lost behind the watermark: $got of $want")
  }

  test("queue-fed windowed counts: per-shard drain sentinels close every real window — result == batch aggregation") {
    // small batches force many triggers, so window closure genuinely
    // rides the watermark advancing across micro-batches, per shard
    val got = Replay.replayWindowedCountsQueue(spark, sf0001, rowsPerBatch = 700)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = graft.ops.Tables.events(spark, sf0001)
      .groupBy(
        org.apache.spark.sql.functions.date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(col("value").cast("decimal(28,6)"))
          .cast("double").as("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want, "queue-fed drained window set drifted from batch aggregation")
    assert(got.nonEmpty && !got.exists(_._2 == "sentinel"),
      "the drain sentinel must advance the watermark, never appear in output")
  }

  test("queue-fed sessionization: custom flatMapGroupsWithState state survives queue batch boundaries — result == batch lag-gap sessions") {
    val got = Replay.replaySessionsQueue(spark, sf0001, rowsPerBatch = 700)
      .where(col("user_id") =!= -1L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      .toSet
    val want = Replay.sessionizeBatch(
        graft.ops.Tables.events(spark, sf0001).select("event_id", "ts", "user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      .toSet
    assert(got == want, "queue-fed sessionization drifted from the batch lag-gap sessions")
    assert(got.nonEmpty && !got.exists(_._1 == -1L))
  }

  test("queue-fed stream-stream join: symmetric join state survives two queues' batch boundaries — result == batch range join") {
    // small batches force many triggers on BOTH topics: matches must be
    // found across batch boundaries from each side's retained state,
    // and the min-across-sources watermark must never drop a pending
    // match
    val got = Replay.replayRangeJoinQueue(spark, sf0001, rowsPerBatch = 700)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val ev = graft.ops.Tables.events(spark, sf0001)
    val a = ev.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = ev.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    val want = graft.ops.Relational.bucketedRangeJoin(a, b)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want, "queue-fed stream-stream join drifted from the batch range join")
    assert(got.nonEmpty && !got.exists(_._1 == -1L),
      "drain sentinels must close state, never join")
  }

  test("queue broker contract: rate-limited admission, ack drops history, replay of acked offsets refused") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType)))
    val rows = (0L until 10L).map(i => org.apache.spark.sql.Row(i))
    graft.sources.QueueBroker.register("contract-test", schema, 4, rows.iterator)
    val q = graft.sources.QueueBroker.get("contract-test")
      .asInstanceOf[graft.sources.QueueBroker.Queue]
    assert(q.pullMore() == 4L) // rate limit: ≤ 4 rows revealed per trigger
    assert(q.pullMore() == 8L)
    assert(q.slice(0L, 4L).map(_.getLong(0)).toSeq == (0L until 4L))
    q.ack(4L)
    assert(q.ackedOffset == 4L)
    // history is GONE: a source that could serve this would be a file
    // source in disguise
    assertThrows[IllegalArgumentException](q.slice(0L, 4L))
    assert(q.slice(4L, 8L).map(_.getLong(0)).toSeq == (4L until 8L))
    assert(q.pullMore() == 10L) // drained: reveals the final partial batch
    assert(q.pullMore() == 10L) // and then stays put — the drain signal
    graft.sources.QueueBroker.remove("contract-test")
  }

  test("sharded log queue contract: per-shard rate limit, executor-format rows, un-acked re-fetch legal, acked replay refused, full ack deletes the log") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 100)
      .select(col("id"), (col("id") * 7 % 13).as("k"))
      .repartition(4, col("k"))
    val dir = Files.createTempDirectory("queue-log-contract-")
    graft.sources.QueueBroker.stageShards("log-contract", df, 20, dir)
    val q = graft.sources.QueueBroker.get("log-contract")
      .asInstanceOf[graft.sources.QueueBroker.LogQueue]
    assert(q.nShards == 4)
    assert(q.perShardBatch == 5) // ceil(20/4): a trigger admits ≈ rowsPerBatch total
    val shardTotals = (0 until 4).map { i =>
      var last = 0L
      var cur = q.shard(i).reveal(q.perShardBatch)
      var n = 0
      while (cur != last) { last = cur; cur = q.shard(i).reveal(q.perShardBatch); n += 1 }
      last
    }
    assert(shardTotals.sum == 100, s"shards lost rows: $shardTotals")
    // rows come back in the engine's own wire format — read a slice and
    // decode field 0 (id LONG) straight off the UnsafeRow
    val s0 = q.shard(0)
    val firstTwo = s0.read(0L, 2L).map(_.getLong(0)).toSeq
    assert(firstTwo.length == 2)
    // un-acked re-fetch (a task retry) is LEGAL — Kafka's consumer seek
    assert(s0.read(0L, 2L).map(_.getLong(0)).toSeq == firstTwo)
    s0.ack(2L)
    // acked history is refused: the queue law that distinguishes it
    // from a file source
    assertThrows[IllegalArgumentException](s0.read(0L, 2L))
    // reading past the acked boundary still works
    assert(s0.read(2L, shardTotals(0)).length == (shardTotals(0) - 2L))
    // full ack physically drops the shard log
    s0.ack(shardTotals(0))
    assert(!Files.exists(dir.resolve("shard-00000.log")), "fully-acked log not deleted")
    graft.sources.QueueBroker.remove("log-contract")
    graft.FsUtil.deleteRecursively(dir)
  }

  test("sharded log queue: every micro-batch plans one InputPartition per shard — the executor-parallel read path") {
    // drive the real MicroBatchStream surface directly: admission must
    // be per-shard vectors and plans must fan out one descriptor per
    // shard carrying offsets only (no rows through the driver)
    import org.apache.spark.sql.functions.col
    val df = spark.range(0, 60).select(col("id")).repartition(3, col("id"))
    val dir = Files.createTempDirectory("queue-log-plan-")
    graft.sources.QueueBroker.stageShards("log-plan", df, 30, dir)
    try {
      val stream = new graft.sources.QueueMicroBatchStream("log-plan", df.schema)
      val o0 = stream.initialOffset().asInstanceOf[graft.sources.QueueOffset]
      assert(o0.v == Vector(0L, 0L, 0L))
      val o1 = stream.latestOffset().asInstanceOf[graft.sources.QueueOffset]
      assert(o1.v.forall(_ == 10L)) // ceil(30/3) per shard
      val parts = stream.planInputPartitions(o0, o1)
      assert(parts.length == 3, "one partition per shard")
      assert(parts.forall(_.isInstanceOf[graft.sources.QueueLogBatch]))
      // offset JSON roundtrip (checkpoint format)
      assert(stream.deserializeOffset(o1.json()) == o1)
      stream.commit(o1)
      // committed history refused at plan time
      assertThrows[IllegalArgumentException](stream.planInputPartitions(o0, o1))
    } finally {
      graft.sources.QueueBroker.remove("log-plan")
      graft.FsUtil.deleteRecursively(dir)
    }
  }

  test("streaming quality gate: expression-form model == batch classifier accepted set") {
    import org.apache.spark.sql.functions.col
    val streamed = graft.SparkEntry.queries("q_stream_quality")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.SparkEntry.queries("q_quality_classifier")(spark, sf0001)
      .where(col("accept"))
      .select("doc_id", "score_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, "the two formulations of one model diverged")
    assert(streamed.nonEmpty)
  }

  test("dedup-on-ingest: established copy survives, state survives restart") {
    import spark.implicits._
    val live = Files.createTempDirectory("docs-live-")
    val out = Files.createTempDirectory("increvdedup-out-").toString + "/rows"
    val ckpt = Files.createTempDirectory("increvdedup-ckpt-").toString
    def deliver(name: String, idx: Int, docs: Seq[(Long, String)]): Unit = {
      val dest = live.resolve(name).toString
      docs.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(dest)
      Files.setLastModifiedTime(Paths.get(dest),
        FileTime.fromMillis(1000000000000L + idx * 60000L))
    }
    def replay(): Seq[Long] = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$live/*.parquet")
        .as[(Long, String)]
      Replay.replayToParquet(Replay.dedupIngest(docs).toDF("doc_id"), out, ckpt)
        .collect().map(_.getLong(0)).toSeq.sorted
    }
    // phase 1: within-batch rule — lowest id per content
    deliver("00.parquet", 0, Seq(1L -> "AAA", 2L -> "AAA", 3L -> "BBB"))
    assert(replay() == Seq(1L, 3L))
    // phase 2 ("process crash" between): doc 0 re-delivers content AAA
    // with a LOWER id — the established copy (1) must survive, which is
    // only possible if the seen-state recovered from the checkpoint
    deliver("01.parquet", 1, Seq(0L -> "AAA", 4L -> "CCC", 5L -> "CCC"))
    assert(replay() == Seq(1L, 3L, 4L),
      "cross-restart dedup state lost, or survivor rule wrong")
  }

  test("streaming sample: a later batch's lower priority displaces an earlier member") {
    import spark.implicits._
    import graft.streaming.Replay.WDoc
    // crafted priorities on one shard (ids ≡ 0 mod 8): k=2, phase-1
    // members (10,20) must yield to the phase-2 priority-5 arrival —
    // proving the bottom-k state is maintained ACROSS micro-batches and
    // nothing was emitted prematurely (Append-mode correctness)
    val live = Files.createTempDirectory("wsample-live-")
    def deliver(name: String, idx: Int, docs: Seq[WDoc]): Unit = {
      val dest = live.resolve(name).toString
      docs.toDF().coalesce(1).write.mode("overwrite").parquet(dest)
      Files.setLastModifiedTime(Paths.get(dest),
        FileTime.fromMillis(1000000000000L + idx * 60000L))
    }
    deliver("00.parquet", 0, Seq(WDoc(8, 1, 10), WDoc(16, 1, 20), WDoc(24, 1, 30)))
    deliver("01.parquet", 1, Seq(WDoc(32, 1, 5)))
    deliver("02.parquet", 2, Seq(WDoc(-8, 0, 0))) // shard-0 drain sentinel
    val docs = spark.readStream
      .schema("doc_id LONG, w LONG, priority LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$live/*.parquet")
      .as[WDoc]
    val out = Files.createTempDirectory("wsample-out-").toString + "/rows"
    val got = Replay.replayToParquet(Replay.sampleStream(docs, 2).toDF(), out)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(got == Seq((8L, 10L), (32L, 5L)),
      s"bottom-2 after displacement must be {32@5, 8@10}, got $got")
  }

  test("streaming PIT: serve-from-past only — a later batch's version never rewrites an earlier probe") {
    import spark.implicits._
    import graft.streaming.Replay.{PitRow, PitOut}
    // crafted cadence on one entity: v(week1)=10 → probe(week1) serves
    // 10@v1; v(week2)=99 arrives LATER; probe(week2) serves 99@v2. The
    // week-1 probe's emitted row must still say 10@v1 — proving the
    // Append emission is final and the state fold is batch-ordered.
    val live = Files.createTempDirectory("pit-live-")
    def deliver(name: String, idx: Int, rows: Seq[PitRow]): Unit = {
      val dest = live.resolve(name).toString
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(dest)
      Files.setLastModifiedTime(Paths.get(dest),
        FileTime.fromMillis(1000000000000L + idx * 60000L))
    }
    deliver("00.parquet", 0, Seq(PitRow(0, 100, 7, 1000L, 1, 10.0)))
    deliver("01.parquet", 1, Seq(PitRow(1, 101, 7, 1500L, 1, 0.0)))
    deliver("02.parquet", 2, Seq(PitRow(0, 102, 7, 2000L, 2, 99.0)))
    deliver("03.parquet", 3, Seq(PitRow(1, 103, 7, 2500L, 2, 0.0)))
    val rows = spark.readStream
      .schema("kind INT, event_id LONG, user_id LONG, tsu LONG, wk LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$live/*.parquet")
      .as[PitRow]
    val out = Files.createTempDirectory("pit-out-").toString + "/rows"
    val got = Replay.replayToParquet(Replay.pitStream(rows).toDF(), out)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq((101L, 10.0, 1L), (103L, 99.0, 2L)),
      s"expected week-1 probe pinned at 10@v1 and week-2 probe at 99@v2, got $got")
  }

  test("streaming PIT on live data: every enriched row re-derived from raw events in plain Scala") {
    // the MlpSpec discipline for the streaming path: collect the raw
    // events, replay the declared query, and check EVERY output row
    // against a loop-built expectation (latest purchase with wk <= the
    // probe's wk by (tsu, event_id); version = count of such purchases)
    val ev = graft.ops.Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS tsu", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val W = 604800000000L
    val versions = ev.filter(_._3 == "purchase")
      .groupBy(_._2).view.mapValues(_.toSeq.sortBy(v => (v._4, v._1))).toMap
    val got = graft.SparkEntry.queries("q_stream_pit")(spark, sf0001).collect()
    val probes = ev.filter(_._3 == "click")
    assert(got.length == probes.length, "one enriched row per click probe")
    got.foreach { r =>
      val (eid, uid, wk) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val served = versions
        .getOrElse(uid, Seq.empty[(Long, Long, String, Long, Double)])
        .filter(v => v._4 / W <= wk)
      assert(served.size.toLong == r.getLong(4), s"probe $eid version count")
      if (served.isEmpty) assert(r.isNullAt(3), s"probe $eid must have NULL feature")
      else assert(r.getDouble(3) == served.last._5, s"probe $eid feature value")
    }
  }
}
