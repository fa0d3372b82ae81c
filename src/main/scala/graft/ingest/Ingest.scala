package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.{Date, Timestamp}

/** The reference pipeline (ops 1-16 of SURVEY §2.A), re-expressed as one
  * lazy Spark plan instead of a driver-side chunk loop.
  *
  * Reference shape (`main.py:174-271`): download → read CSV in 50k-row
  * chunks → rename 16 cols → strict to_datetime(UTC) → running
  * max(transaction_date) → re-serialize CSV → Postgres COPY, one txn.
  *
  * Spark shape: the chunk loop disappears — a partitioned scan bounds
  * memory (op-14), whole-stage codegen pipelines scan→cast→write per
  * task, and the running max rides the SAME pass via `df.observe`
  * (op-7: Catalyst does partial/final aggregation per partition exactly
  * like the reference's per-chunk max + running max, but in parallel).
  * Parquet `Overwrite` stands in for TRUNCATE+COPY (ops 10-11); a real
  * Postgres sink would be `foreachPartition` + pgjdbc CopyManager behind
  * the same interface.
  *
  * 100 TB notes: the plan is shuffle-free (scan → narrow ops → write);
  * it scales linearly with input splits. The only aggregation is the
  * observed max, which is partial-per-task + tiny final on the driver.
  */
object Ingest {

  final case class RunResult(
      autoDate: Option[Date],
      rowCount: Long,
      downloadSizeMB: Long,
      meta: RunMeta
  )

  /** op-1/2/3/16: fetch a URL (http(s)/file) to a local temp file with
    * bounded retries — reference `download_data_to_disk_retry_wrapper`
    * (`main.py:93-171`): ≤3 attempts, fixed sleep, stream to temp file.
    * Driver-side by design: Spark has no http:// source; at scale the
    * fetch lands on shared storage and the cluster reads the splits.
    */
  def fetchToLocal(url: String, maxRetries: Int = 3, sleepMs: Long = 10000): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      attempt += 1
      val tmp = Files.createTempFile("pp-complete-", ".csv")
      try {
        val in = new java.net.URI(url).toURL.openStream()
        try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        return tmp.toString
      } catch {
        case e: Throwable =>
          Files.deleteIfExists(tmp) // op-16: no orphaned partial downloads
          lastErr = e
          if (attempt < maxRetries) Thread.sleep(sleepMs)
      }
    }
    throw lastErr
  }

  /** op-4: headerless all-string CSV scan with the reference's NULL
    * discipline (§1.5): QUOTED empty fields stay `''` (emptyValue
    * override — Spark's default would null them) and the literal `\N`
    * token is NULL (COPY `NULL '\N'`).
    *
    * Caveat: an UNQUOTED empty field reads as NULL — Spark's builtin
    * CSV options cannot distinguish unquoted-empty from the null token
    * at parser level. The real pp-complete.txt quotes every field, so
    * this never fires on reference data. The DSv2 UrlCsvSource DOES
    * implement the exact reference semantics (unquoted empty → '', only
    * `\N` → NULL — `main.py:208`), proven by q_url_source_unquoted; this
    * builtin path's divergence on unquoted-empty is the known residual.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(PPComplete.rawSchema)
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** ops 5+6: positional rename (toDF is implicit in the schema read) +
    * strict datetime typing. The reference aborts on a malformed date
    * (`main.py:218-222` raises); under Spark 4's default ANSI mode this
    * strict `to_timestamp` throws INSIDE the scan of whatever job
    * evaluates it, so fail-on-malformed needs no validation pass of its
    * own — [[rethrowMalformed]] translates the ANSI error at the one
    * job that reads the data (the write).
    */
  def typed(raw: DataFrame): DataFrame =
    raw.withColumn(
      "transaction_date",
      to_timestamp(col("transaction_date"), PPComplete.dateTimeFormat)
    )

  /** BAD-RECORDS QUARANTINE ingest (r12) — the production complement of
    * §1.6's fail-on-malformed: the reference aborts the whole run on one
    * malformed date (`main.py:218-222`, reproduced by [[typed]] +
    * [[rethrowMalformed]]); a 100 TB ingest needs the mode where good
    * rows flow through the §1.5/§1.6 path and bad rows land in a
    * quarantine sink with a reason code instead of killing the job.
    *
    * Shape: ONE scan of the input classifies every line — token count
    * first (`bad_columns`), then the strict §1.6 date parse
    * (`bad_date`, via `try_to_timestamp`: the non-throwing twin of the
    * ANSI parse [[typed]] relies on) — and writes a reason-partitioned
    * staging (no shuffle: classification is a per-row codegen
    * projection, the write fans out by partition column). The clean
    * sink is then a partition-PRUNED re-read of `reason=ok` projected
    * through the exact §1.5 discipline (unquoted empty → `''`, the bare
    * token `\N` the ONLY null — the UrlCsvReader semantics, here as
    * plain expressions) and [[typed]]'s strict timestamp; the
    * quarantine sink keeps (id, reason, raw line) so every rejected
    * byte is recoverable. The classify→route pass is the bronze→silver
    * two-hop every lake ingest pays; at 100 TB the quarantine side is
    * tiny and the clean re-encode reads columnar staging, not raw text.
    *
    * Dialect: lines split on bare commas (the fixture contract —
    * unquoted, comma-free fields), which is what makes the DuckDB
    * oracle's `string_split` replay exactly symmetric, including on
    * ragged rows the builtin CSV parser silently null-pads (PERMISSIVE
    * mode never flags token-count errors on an all-string schema —
    * measured, not assumed). A quoted-dialect quarantine swaps this
    * splitter for the univocity parse at the same seam.
    *
    * Returns (cleanDir, quarantineDir).
    */
  def quarantineIngest(s: SparkSession, path: String, outDir: String): (String, String) = {
    val nCols = PPComplete.columns.length
    val parts = split(col("value"), ",", -1)
    val reason = when(size(parts) =!= lit(nCols), lit("bad_columns"))
      .when(try_to_timestamp(element_at(parts, 3), lit(PPComplete.dateTimeFormat)).isNull,
        lit("bad_date"))
      .otherwise(lit("ok"))
    // the three sinks publish ATOMICALLY (r12 ADVICE): all writes land
    // in a scratch sibling and ONE rename exposes them, so a crash
    // between the staging write and the sink writes can never leave a
    // partially-routed outDir that a path-reusing caller reads as
    // complete. Completeness = all three sinks' _SUCCESS markers AND a
    // content key of the INPUT (path + size + mtime, the sourceKey
    // idiom) published with the layout — without it, a caller reusing
    // an outDir with a different source file silently got the previous
    // run's routing (r13 ADVICE).
    val inputKey = graft.ops.Partitioned.sourceKey(Seq(path))
    val keyFile = "_graft_input_key"
    def publishedKey(): Option[String] = {
      val kp = new org.apache.hadoop.fs.Path(s"$outDir/$keyFile")
      val kfs = kp.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!kfs.exists(kp)) None
      else {
        val in = kfs.open(kp)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    }
    def complete() = Seq("staging", "clean", "quarantine")
      .forall(p => graft.ops.Partitioned.successExists(s, s"$outDir/$p")) &&
      publishedKey().contains(inputKey)
    if (!complete()) {
      graft.ops.Partitioned.buildAtomically(s, outDir, () => complete()) { tmp =>
        val staging = s"$tmp/staging"
        s.read.text(path)
          .select(col("value"), reason.as("reason"))
          .write.mode("overwrite").partitionBy("reason").parquet(staging)
        val fs = new org.apache.hadoop.fs.Path(staging)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        def stagedOr(reasons: Seq[String], schema: org.apache.spark.sql.types.StructType): DataFrame = {
          val dirs = reasons.map(r => s"$staging/reason=$r")
            .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
          if (dirs.isEmpty)
            s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
          else s.read.option("basePath", staging).parquet(dirs: _*)
        }
        val stagedSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("reason",
            org.apache.spark.sql.types.StringType)))
        // clean: §1.5 projection (split again — scan-speed, columnar input)
        // + §1.6 strict typing; by construction every date here parses, so
        // the ANSI to_timestamp cannot throw
        val cleanCols = PPComplete.columns.zipWithIndex.map { case (name, i) =>
          val f = element_at(split(col("value"), ",", -1), i + 1)
          when(f === "\\N", lit(null)).otherwise(f).as(name)
        }
        typed(stagedOr(Seq("ok"), stagedSchema).select(cleanCols: _*))
          .write.mode("overwrite").parquet(s"$tmp/clean")
        stagedOr(Seq("bad_columns", "bad_date"), stagedSchema)
          .select(
            element_at(split(col("value"), ",", -1), 1).as("transaction_unique_id"),
            col("reason"),
            col("value").as("raw"))
          .write.mode("overwrite").parquet(s"$tmp/quarantine")
        // the input's content key rides the atomic publish: a reused
        // outDir over a CHANGED input reads as incomplete and rebuilds
        val kp = new org.apache.hadoop.fs.Path(s"$tmp/$keyFile")
        val kout = kp.getFileSystem(s.sparkContext.hadoopConfiguration).create(kp, true)
        try kout.write(inputKey.getBytes("UTF-8")) finally kout.close()
      }
    }
    (s"$outDir/clean", s"$outDir/quarantine")
  }

  /** §1.6 fail-on-malformed, single-pass: run `body` (the write job) and
    * translate a scan-side ANSI datetime parse failure into the
    * reference's informative abort. Round 1 ran a separate
    * validate-then-write (a 2× read of clean input at 100 TB); the
    * reference reads its file exactly once (`main.py:204-249`) and
    * aborts mid-COPY when pandas' strict to_datetime raises — this is
    * the same semantics on the same single pass.
    */
  def rethrowMalformed[T](body: => T): T =
    try body
    catch {
      case e: Throwable =>
        val chain =
          Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(32).toSeq
        chain.collectFirst { case dt: java.time.DateTimeException => dt } match {
          case Some(dt) =>
            throw new IllegalArgumentException(
              s"malformed transaction_date (expected ${PPComplete.dateTimeFormat}): " +
                dt.getMessage,
              e
            )
          case None => throw e
        }
    }

  /** op-13 stage-metric recovery: the reference measures read /
    * datetime-convert / write / upload as separate wall-clock spans
    * (`main.py:211-249`); Spark FUSES scan→convert→write into one
    * whole-stage-codegen pipeline, so the engine-honest equivalents come
    * from the write job's own metric system (QueryExecutionListener):
    * `pipelineTime` = the executor-side fused scan+convert pipeline
    * duration (ms). Returns it in microseconds.
    */
  private def recoverStageMetrics(
      qe: org.apache.spark.sql.execution.QueryExecution
  ): Long = {
    var pipelineMs = 0L
    qe.executedPlan.foreach { n =>
      n.metrics.get("pipelineTime").foreach(m => pipelineMs += math.max(0L, m.value))
    }
    pipelineMs * 1000
  }

  /** Full run (op-15 orchestration): fetch → scan → type → write with the
    * max(transaction_date) observed on the same pass (op-7 "auto_date"),
    * floored to a calendar date (op-8) — then append one provenance row
    * (ops 12-13) to the metadata table.
    */
  def run(
      spark: SparkSession,
      sourceUrl: String,
      outDir: String,
      metaDir: String
  ): RunResult =
    run(spark, sourceUrl, ParquetSink(outDir), ParquetSink(metaDir))

  /** Sink-parameterized run (SURVEY §7.1: swap in a JDBC/COPY sink for
    * real-Postgres parity without touching the pipeline).
    */
  def run(
      spark: SparkSession,
      sourceUrl: String,
      dataSink: Sink,
      metaSink: Sink
  ): RunResult = {
    val t0 = System.nanoTime()
    val start = new Timestamp(System.currentTimeMillis())

    val dl0 = System.nanoTime()
    val local = fetchToLocal(sourceUrl)
    val dlUs = (System.nanoTime() - dl0) / 1000
    val sizeMB = Files.size(Paths.get(local)) / (1024L * 1024L)

    try {
      val raw = readRaw(spark, local)
      val data = typed(raw)

      // op-7 fused with the load pass: observe piggybacks the aggregate on
      // the write job — no second scan (reference computes the running max
      // while uploading, `main.py:228-230`).
      val wr0 = System.nanoTime()
      // Observation (not raw observe + queryExecution.observedMetrics: the
      // write command runs its own QueryExecution, so the DataFrame's QE
      // would never see the metrics — Observation registers a listener).
      // Unique observation name per run: the listener below uses it to
      // recognize THIS write's QueryExecution on the async bus — a
      // late-delivered event from a previous query (e.g. the prior
      // run's 1-row meta append in back-to-back runs) must not be
      // captured in its place.
      val obsName = s"ingest_stats_${java.util.UUID.randomUUID()}"
      val obs = org.apache.spark.sql.Observation(obsName)
      val observed = data.observe(
        obs,
        max(col("transaction_date")).as("max_ts"),
        count(lit(1)).as("n_rows")
      )
      // Capture the write's QueryExecution for op-13 metric recovery
      // (the listener bus is async — latch before reading). Ownership
      // check: the analyzed plan must carry this run's observation. The
      // plan STRING is matched (CollectMetrics prints its name) because
      // write commands hold their query as innerChildren, which tree
      // traversal skips but toString prints.
      def ownsObservation(q: org.apache.spark.sql.execution.QueryExecution): Boolean =
        scala.util.Try(q.analyzed.toString.contains(obsName)).getOrElse(false)
      val qeLatch = new java.util.concurrent.CountDownLatch(1)
      @volatile var writeQe: org.apache.spark.sql.execution.QueryExecution = null
      val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
        def onSuccess(f: String, q: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
          if (writeQe == null && ownsObservation(q)) { writeQe = q; qeLatch.countDown() }
        }
        def onFailure(f: String, q: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit =
          ()
      }
      spark.listenerManager.register(qeListener)
      val pipelineUs =
        try {
          // ops 10-11: full-refresh bulk load — the ONE job over the input
          // (strict-date abort fires in this scan, §1.6).
          rethrowMalformed(dataSink.overwrite(observed))
          if (qeLatch.await(10, java.util.concurrent.TimeUnit.SECONDS) && writeQe != null)
            recoverStageMetrics(writeQe)
          else 0L
        } finally spark.listenerManager.unregister(qeListener)
      val wrUs = (System.nanoTime() - wr0) / 1000

      val stats = obs.get
      val maxTs = Option(stats("max_ts").asInstanceOf[Timestamp])
      val nRows = stats("n_rows").asInstanceOf[Long]
      // op-8 floor-to-date, explicitly in UTC (new Date(millis) would keep
      // the time-of-day and break date equality).
      val autoDate = maxTs.map(ts =>
        Date.valueOf(ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)
      )

      val end = new Timestamp(System.currentTimeMillis())
      val meta = RunMeta(
        auto_date = autoDate.orNull,
        download_size_MB = sizeMB,
        process_start_timestamp = start,
        process_complete_timestamp = end,
        process_duration_us = (System.nanoTime() - t0) / 1000,
        download_duration_us = dlUs,
        // op-13 recovery: the fused scan+datetime-convert executor
        // pipeline, from the engine's own metrics (ms granularity — can
        // legitimately be 0 for sub-ms pipelines). The convert share is
        // not separable from the read (whole-stage codegen), so it is
        // reported fused here and 0 below, documented. NOTE: pipelineTime
        // sums across concurrent tasks — on multi-split input this is
        // AGGREGATE EXECUTOR TIME and can exceed the write's wall clock
        // (upload_duration_us then clamps to 0); the reference's
        // single-threaded run has no such distinction to preserve.
        read_duration_us = pipelineUs,
        datetime_convert_duration_us = 0L, // fused into read_duration_us
        write_duration_us = wrUs,
        // sink-side share of the write job: wall minus the fused
        // scan/convert pipeline (reference: database_upload_duration)
        upload_duration_us = math.max(0L, wrUs - pipelineUs)
      )
      // op-12: single-row append to the metadata table.
      import spark.implicits._
      metaSink.append(Seq(meta).toDF())
      RunResult(autoDate, nRows, sizeMB, meta)
    } finally {
      Files.deleteIfExists(Paths.get(local)) // op-16 temp-file lifecycle
    }
  }
}
