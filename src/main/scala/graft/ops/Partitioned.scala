package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition pruning, exercised end-to-end (SURVEY §4 claims it among
  * the Catalyst rewrites the engine relies on; this makes it a tested
  * plan property instead of a claim).
  *
  * A 100 TB events store lives or dies on its partition layout, and the
  * natural key is the event date — the same freshness column the
  * reference derives as `auto_date` (reference `main.py:218-222`).
  * [[eventsByDay]] materializes a date-partitioned copy of the events
  * table (one `day=YYYY-MM-DD` directory per UTC day, the standard lake
  * layout); [[qPartitionPrune]] filters one literal day and must touch
  * exactly one partition — QueriesPlanSpec pins `PartitionFilters` on
  * the scan and the driver's DuckDB oracle checks the rows against the
  * unpartitioned table.
  */
object Partitioned {

  /** Cache key for a derived layout: the SOURCE PATH plus the source
    * file's size and mtime — regenerated testdata at the same path gets
    * a fresh key, so a stale /tmp layout from a previous corpus can
    * never serve (it would silently diverge from the oracle, which
    * always reads the live file). Full md5 of the signature, not a
    * 32-bit hash: at 2³² a birthday collision between two corpora is a
    * real hazard for a shared tmpdir, and a collision here silently
    * serves the WRONG index.
    */
  private[graft] def sourceKey(paths: Seq[String]): String = {
    val sig = paths.map { p =>
      val f = java.nio.file.Paths.get(p)
      val (sz, mt) =
        if (java.nio.file.Files.exists(f))
          (java.nio.file.Files.size(f), java.nio.file.Files.getLastModifiedTime(f).toMillis)
        else (0L, 0L)
      s"$p:$sz:$mt"
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Multi-file layout builds are NOT atomic by default: a concurrent
    * builder of the same key (or a crash between part writes) could
    * leave a partially-overwritten layout whose parts disagree. This
    * helper gives the standard fix — build every part under a private
    * temp dir, then RENAME the whole dir into place (one FS metadata op
    * on a local/HDFS filesystem); a racer that finds the target already
    * renamed discards its own build. Readers therefore only ever see a
    * complete layout or none.
    *
    * `complete` is the caller's layout-completeness predicate (defaults
    * to a top-level `_SUCCESS` probe; multi-part layouts pass their own
    * all-parts check). A pre-existing target is deleted ONLY while it
    * is known-incomplete (a crashed earlier build) — a PUBLISHED layout
    * is never deleted, so a concurrent reader of the live path cannot
    * hit missing files mid-swap.
    *
    * Race handling is Hadoop-rename-aware: `fs.rename(tmp, out)` onto
    * an EXISTING directory does not refuse — HDFS (and the local FS's
    * copy fallback) moves tmp INTO the target as a child and returns
    * true, which would silently nest a loser's full duplicate build
    * inside the published layout (duplicate rows on recursive
    * listings). So a racer (1) re-checks completeness immediately
    * before renaming and discards its tmp if a winner is already in
    * place, and (2) after a "successful" rename verifies that
    * `out/<tmp-basename>` does NOT exist — if it does, the rename was
    * actually a nest-into-winner, so the nested copy is deleted and
    * the race treated as lost. A rename failure with a complete winner
    * in place is likewise a lost race (discard tmp); a rename failure
    * with NO winner throws instead of silently returning a path that
    * doesn't exist.
    */
  private[graft] def buildAtomically(s: SparkSession, out: String,
      complete: () => Boolean = null)(
      build: String => Unit): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(conf)
    val isComplete: () => Boolean =
      if (complete != null) complete else () => successExists(s, out)
    val tmp = new org.apache.hadoop.fs.Path(
      out + ".build-" + java.util.UUID.randomUUID().toString)
    build(tmp.toString)
    if (fs.exists(outPath) && !isComplete()) fs.delete(outPath, true)
    // lost-race fast path: a complete winner published while we built
    if (isComplete()) { fs.delete(tmp, true); return }
    if (!fs.rename(tmp, outPath)) {
      fs.delete(tmp, true)
      if (!isComplete())
        throw new java.io.IOException(
          s"atomic publish of $out failed: rename refused and no complete layout occupies the target")
    } else {
      // rename returned true — but if a winner appeared between the
      // completeness check and the rename, Hadoop moved tmp INTO it as
      // a child rather than refusing. Detect and discard the nested
      // duplicate; the winner's layout stays published.
      val nested = new org.apache.hadoop.fs.Path(outPath, tmp.getName)
      if (fs.exists(nested)) fs.delete(nested, true)
      if (!isComplete())
        throw new java.io.IOException(
          s"atomic publish of $out failed: rename landed but the layout is incomplete")
    }
  }

  /** Cached-layout guard through the HADOOP FileSystem, not java.io —
    * on any non-local deployment (the object-store layouts these
    * queries model) a `java.io.File` check always misses, silently
    * rewriting the layout on every invocation. Same FS resolution as
    * the writes/listings it guards.
    */
  private[graft] def successExists(s: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Per-source location for the partitioned copy (content-keyed — see
    * [[sourceKey]]; sf0.01 verify and sf0.1 bench never collide either).
    */
  private def layoutDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_by_day_${sourceKey(Seq(s"$d/events.parquet"))}"

  /** Date-partitioned copy of events, written once per sf dir (reused on
    * later calls — Bench invokes each query three times). The write is a
    * one-shot setup cost, exactly like the ingest job that would
    * maintain this layout in production; the read back is a partitioned
    * scan whose `day` column comes from directory names, not file data.
    */
  def eventsByDay(s: SparkSession, d: String): DataFrame = {
    val out = layoutDir(d)
    if (!successExists(s, out)) {
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(out)
    }
    s.read.parquet(out)
  }

  /** One-day slice of the partitioned layout: the scan must prune to the
    * single `day=2024-01-15` directory (29 of 30 partitions never
    * touched — the property that turns a 100 TB scan into a 3 TB one).
    */
  val qPartitionPrune = Q(
    "q_partition_prune",
    (s, d) =>
      eventsByDay(s, d)
        .where(col("day") === lit(java.sql.Date.valueOf("2024-01-15")))
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id"),
    // CAST(ts AS TIMESTAMP): micros, same floor as the engine's
    // nanos→micros conversion (Tables.events)
    Some("""SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
            FROM events
            WHERE CAST(ts AS DATE) = DATE '2024-01-15'
            ORDER BY event_id""")
  )

  /** Per-sfDir catalog database holding BUCKETED copies of
    * lineitem/orders on the join key — the second storage-layout lever
    * (alongside day-partitioning): two tables bucketed+sorted on the
    * same key join with ZERO exchanges, deleting the dominant cost of
    * every fact-fact join a 100 TB pipeline repeats. Written once per sf
    * dir (the one-shot layout job), read back through the catalog.
    */
  private def bucketedDb(s: SparkSession, d: String): String = {
    // content-keyed like layoutDir: regenerated source tables get a new
    // database, never a stale bucketed copy
    val db = "graft_bkt_" + sourceKey(Seq(s"$d/lineitem.parquet", s"$d/orders.parquet"))
    if (!s.catalog.databaseExists(db)) {
      // a crashed previous run can leave the warehouse dir without the
      // catalog entry — clear it before CREATE. Resolve the REAL
      // warehouse root from the session conf (a cwd-relative path would
      // miss it whenever cwd differs from the session's launch dir).
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
      val whPath =
        if (wh.getScheme == "file") java.nio.file.Paths.get(wh)
        else java.nio.file.Paths.get(s.conf.get("spark.sql.warehouse.dir"))
      graft.FsUtil.deleteRecursively(whPath.resolve(s"$db.db"))
      s.sql(s"CREATE DATABASE $db")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
    }
    db
  }

  /** Fact-fact join over the bucketed layout: per-priority revenue of
    * heavy lineitems. The join itself is exchange-free (bucket-local
    * sort-merge — QueriesPlanSpec pins it); the only shuffles in the
    * plan belong to the final aggregation and sort. Oracled against the
    * same join over the raw unbucketed tables.
    */
  val qJoinBucketed = Q(
    "q_join_bucketed",
    (s, d) => {
      val db = bucketedDb(s, d)
      s.table(s"$db.lineitem_b")
        .hint("merge") // shuffle-sensitive strategy: no broadcast
        .join(s.table(s"$db.orders_b"), col("l_orderkey") === col("o_orderkey"))
        .where(col("l_quantity") > 30)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("revenue")
        )
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_quantity > 30
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Small-file input layout for [[qCompact]] (content-keyed, written
    * once per sf dir): lineitem deliberately shattered into 64 tiny
    * files — the debris a micro-batching ingest leaves behind, and the
    * thing that kills scan throughput at 100 TB (every file is a task +
    * a footer read + an object-store GET).
    */
  private[ops] def smallFilesDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lineitem_small_${sourceKey(Seq(s"$d/lineitem.parquet"))}"

  /** Output location for the compacted copy (overwritten every run —
    * the compaction IS the operator under test, unlike the cached input
    * layout above). */
  private[ops] def compactedDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lineitem_compacted_${sourceKey(Seq(s"$d/lineitem.parquet"))}"

  /** Target compacted-file payload. 4 MiB here so the test corpora
    * actually produce a multi-file range layout; a production lake sets
    * `spark.graft.compact.targetBytes` to ~256 MiB. The file COUNT is
    * derived from the input bytes, so the same code sizes a 100 TB
    * table to ~400k files instead of a constant. */
  val COMPACT_TARGET_BYTES_CONF = "spark.graft.compact.targetBytes"

  /** E15 — small-file COMPACTION, the table-maintenance operator every
    * lake runs nightly: rewrite a shattered layout (64 tiny files) into
    * few size-targeted, range-clustered files. Output file count =
    * ⌈input_bytes / targetBytes⌉ (data-derived, never a constant);
    * `repartitionByRange(l_orderkey)` + `sortWithinPartitions` gives
    * each output file a disjoint, sorted key range — so downstream
    * scans get both fewer tasks AND min/max-pruned row groups (the
    * q_zorder_key idea, applied at the file level). The oracle reads
    * the compacted copy back and hash-compares against the original
    * table: compaction must be byte-lossless. PartitionedSpec asserts
    * the file-count collapse and the per-file disjoint key ranges.
    */
  val qCompact = Q(
    "q_compact",
    (s, d) => {
      val small = smallFilesDir(d)
      if (!successExists(s, small))
        Tables.lineitem(s, d).repartition(64)
          .write.mode("overwrite").parquet(small)
      val targetBytes = s.conf.getOption(COMPACT_TARGET_BYTES_CONF)
        .map(_.toLong).getOrElse(4L << 20)
      // Hadoop FS, not java.io: on a cluster this path is object storage
      val smallPath = new org.apache.hadoop.fs.Path(small)
      val fs = smallPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val inputBytes = fs.listStatus(smallPath)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
      val nFiles = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt
      val out = compactedDir(d)
      s.read.parquet(small)
        .repartitionByRange(nFiles, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // TRUE total order: (orderkey, linenumber) is not unique in the
        // synthetic lineitem (the q_filter lesson) — sort every column
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_returnflag = 'R'
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""")
  )

  // -------------------------------------------------------------- E15.4
  // Manifest-based FILE SKIPPING — the data-skipping layer a lake format
  // (Delta/Iceberg/Hudi) puts between the catalog and the scan: a
  // per-file stats manifest consulted at plan time so a selective
  // predicate reads only the files whose [min,max] intersect it.
  // Directory partitioning (qPartitionPrune) prunes on ONE coarse
  // column; the manifest prunes on any clustered column at FILE
  // granularity without moving data into directories.

  private[ops] def eventsClusteredDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_clustered_${sourceKey(Seq(s"$d/events.parquet"))}"

  private[ops] def manifestDir(layout: String): String = s"$layout/_graft_manifest"

  /** ts-range-clustered events copy (16 files, disjoint ts ranges) plus
    * its stats manifest: one row per data file with min/max ts, row
    * count, and null count. The manifest is built from the written
    * files themselves (group by `input_file_name`), so it can never
    * disagree with the data; it is file-count-sized — at 100 TB that is
    * ~400k rows of metadata, which is exactly what Delta checkpoints /
    * Iceberg manifest files hold. Written once per sf dir (guarded like
    * every cached layout here).
    */
  def eventsClustered(s: SparkSession, d: String): String = {
    val out = eventsClusteredDir(d)
    // guard on the MANIFEST's _SUCCESS — it is written last, so a crash
    // between the data write and the stats build can never leave a
    // guard-passing layout with no (or stale) manifest
    if (!successExists(s, manifestDir(out))) {
      Tables.events(s, d)
        .repartitionByRange(16, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(input_file_name().as("file"))
        .agg(
          min(col("ts")).as("ts_min"),
          max(col("ts")).as("ts_max"),
          count(lit(1)).as("n_rows"),
          count(when(col("ts").isNull, 1)).as("n_null_ts"))
        .coalesce(1)
        .write.mode("overwrite").parquet(manifestDir(out))
    }
    out
  }

  /** Plan-time file pruning: keep a data file iff its [ts_min, ts_max]
    * intersects [lo, hi) — or it holds null ts rows and the predicate
    * is not null-rejecting (ours is, so all-null files drop too). The
    * manifest collect is DRIVER-side by design: it is metadata planning
    * over file-count rows, the same driver-side step Delta/Iceberg run;
    * the DATA never moves. Returns the pruned scan plus (selected,
    * total) file counts for the skipping assertions.
    */
  def manifestSkipScan(
      s: SparkSession,
      layout: String,
      lo: java.sql.Timestamp,
      hi: java.sql.Timestamp
  ): (DataFrame, Int, Int) = {
    // stats may collect as Timestamp (LTZ) or LocalDateTime (NTZ layout
    // written before ts normalization) — compare in epoch micros
    def micros(a: Any): Long = a match {
      case t: java.sql.Timestamp => t.getTime * 1000L + t.getNanos / 1000L % 1000L
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      case i: java.time.Instant => i.toEpochMilli * 1000L
      case other => throw new IllegalArgumentException(s"unexpected ts stat: $other")
    }
    val (loU, hiU) = (micros(lo), micros(hi))
    val manifest = s.read.parquet(manifestDir(layout)).collect()
    val selected = manifest.iterator.filter { r =>
      val mn = r.getAs[Any]("ts_min")
      val mx = r.getAs[Any]("ts_max")
      mn != null && mx != null && micros(mx) >= loU && micros(mn) < hiU
    }.map(_.getAs[String]("file")).toSeq
    val base = Tables.normalizeTs(
      if (selected.isEmpty)
        s.read.parquet(layout).limit(0) // schema-preserving empty relation
      else s.read.parquet(selected: _*))
    // residual predicate stays on the pruned scan: skipping is an
    // optimization, never a correctness dependency
    (base.where(col("ts") >= lit(lo) && col("ts") < lit(hi)),
      selected.length, manifest.length)
  }

  /** Two-day slice through the manifest-pruned scan — same rows as the
    * full-table filter (the oracle), reading ~2/30ths of the files.
    * PartitionedSpec asserts the skip ratio and skipping SOUNDNESS (the
    * complement files hold zero qualifying rows).
    */
  val qManifestSkip = Q(
    "q_manifest_skip",
    (s, d) => {
      val layout = eventsClustered(s, d)
      val (scan, _, _) = manifestSkipScan(s, layout,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-12 00:00:00"))
      scan.select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
            FROM events
            WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
              AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00'
            ORDER BY event_id""")
  )

  // ---------------------------------------------------------------------
  // Bloom-filter FILE SKIPPING — the point-lookup complement to the
  // min/max manifest: a hashed/bucketed layout spreads every key range
  // across every file, so [min,max] stats prune NOTHING for
  // `user_id = X`, while a per-file Bloom filter answers "definitely
  // not in this file" probabilistically with no false negatives
  // (Parquet bloom columns, Delta/Iceberg bloom file skipping). The
  // fixture is the honest production case: BUCKET EVOLUTION. Batch 1
  // was ingested bucketed 8 ways by user_id; the table grew and batch 2
  // re-bucketed 16 ways. The hash-function shortcut (file =
  // hash(user) % n) now needs per-epoch bookkeeping a reader doesn't
  // have, while per-file Blooms keep answering uniformly — and keep
  // working for layouts with no bucket discipline at all.
  // ---------------------------------------------------------------------

  private def eventsBloomDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_bloom_${sourceKey(Seq(s"$d/events.parquet"))}"

  private val BloomK = 6 // double-hashed probes per key
  private val BloomSeed1 = 0x9e3779b9L
  private val BloomSeed2 = 0x85ebca6bL

  /** The k bit positions of `key` in an m-bit Bloom filter — Kirsch &
    * Mitzenmacher double hashing over Spark's codegen `xxhash64`, as a
    * COLUMN so build (executor, millions of rows) and probe (driver,
    * one row) evaluate the identical expression.
    */
  private def bloomPositions(key: Column, m: Long): Seq[Column] = {
    // each hash reduced mod m BEFORE combining: the raw h1 + i*h2 form
    // overflows Long under ANSI arithmetic; mod-first is the same
    // residue class and keeps every intermediate under 6m
    val h1 = pmod(xxhash64(key, lit(BloomSeed1)), lit(m))
    val h2 = pmod(xxhash64(key, lit(BloomSeed2)), lit(m))
    (0 until BloomK).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m)))
  }

  /** Two-epoch bucketed layout (8-way then 16-way by user_id over the
    * event_id halves) plus its Bloom manifest: one row per (file, word)
    * with the OR of the 64-bit word's set bits — built as one
    * explode + groupBy over the written files themselves (never
    * disagreeing with the data), file-count × m/64 rows of metadata.
    * One GLOBAL m, sized to the largest file (next power of two of
    * 8 bits/row, fpp ≈ 2% at k = 6), so probe word indexes are the
    * same for every file and the probe reads k pushdown-filtered
    * manifest rows per file instead of the whole manifest.
    */
  private[ops] def eventsBloomLayout(s: SparkSession, d: String): String = {
    val out = eventsBloomDir(d)
    if (!successExists(s, manifestDir(out))) {
      val ev = Tables.events(s, d)
      val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
      ev.where(col("event_id") <= mid).repartition(8, col("user_id"))
        .write.mode("overwrite").parquet(s"$out/epoch=1")
      ev.where(col("event_id") > mid).repartition(16, col("user_id"))
        .write.mode("overwrite").parquet(s"$out/epoch=2")
      val data = s.read.parquet(out)
      val maxRows = data.groupBy(input_file_name()).count()
        .agg(max(col("count"))).head().getLong(0)
      val m = java.lang.Long.highestOneBit(math.max(64L, 8L * maxRows) * 2 - 1)
      data
        .select(input_file_name().as("file"),
          explode(array(bloomPositions(col("user_id"), m): _*)).as("pos"))
        .groupBy(col("file"), (col("pos") / 64).cast("long").as("word"))
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")).as("bits"))
        .withColumn("bloom_m", lit(m))
        .coalesce(1)
        .write.mode("overwrite").parquet(manifestDir(out))
    }
    out
  }

  /** Plan-time Bloom pruning for `user_id = user`: evaluate the SAME
    * position expression the build used (driver-side, one-row plan),
    * fetch only the probed words from the manifest (k × files rows
    * through parquet pushdown on `word`), and keep a file iff ALL k
    * bits are set — a missing word row is an all-zero word, i.e. a
    * definite miss. No false negatives by construction; the residual
    * predicate stays on the pruned scan, so a false positive costs one
    * extra file read, never a wrong row. Returns (pruned scan,
    * selected, total) like [[manifestSkipScan]].
    */
  private[ops] def bloomSkipScan(s: SparkSession, layout: String, user: Long)
      : (DataFrame, Int, Int) = {
    val manifest = manifestDir(layout)
    val m = s.read.parquet(manifest).select("bloom_m").head().getLong(0)
    val posRow = s.range(1)
      .select(bloomPositions(lit(user), m).zipWithIndex
        .map { case (c, i) => c.as(s"p$i") }: _*).head()
    val positions = (0 until BloomK).map(posRow.getLong).distinct
    val words = positions.map(_ / 64).distinct
    val probed = s.read.parquet(manifest)
      .where(col("word").isin(words: _*))
      .collect()
      .groupBy(_.getAs[String]("file"))
      .view.mapValues(_.map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap)
    // the file universe comes from the manifest (its keys are the
    // input_file_name URIs the build recorded — the readable truth),
    // one pushdown-pruned column read, file-count-sized after distinct
    val total = s.read.parquet(manifest).select("file").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val selected = total.filter { f =>
      probed.get(f).exists(ws =>
        positions.forall(p => (ws.getOrElse(p / 64, 0L) & (1L << (p % 64).toInt)) != 0L))
    }
    val base =
      if (selected.isEmpty) s.read.parquet(layout).limit(0)
      else s.read.parquet(selected: _*)
    (Tables.normalizeTs(base).where(col("user_id") === lit(user)),
      selected.size, total.size)
  }

  /** Point lookup through Bloom skipping — same rows as the full-table
    * filter (the oracle), reading ~2 of the 24 files (one bucket per
    * epoch, plus rare false positives). PartitionedSpec asserts the
    * skip ratio, the no-false-negative law over every user, and the
    * false-positive rate on absent keys.
    */
  val qBloomSkip = Q(
    "q_bloom_skip",
    (s, d) => {
      val layout = eventsBloomLayout(s, d)
      val (scan, _, _) = bloomSkipScan(s, layout, 7L)
      scan.select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
            FROM events
            WHERE user_id = 7
            ORDER BY event_id""")
  )

  // ---------------------------------------------------------------------
  // snapshot versioning (time travel)
  // ---------------------------------------------------------------------

  // the `m2` tag names the MANIFEST FORMAT (full file list per version,
  // Iceberg-style) — bumping it on a format change invalidates cached
  // layouts written under the old reader contract
  private def versionedDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_versioned_m2_${sourceKey(Seq(s"$d/events.parquet"))}"

  private def listParquet(s: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
      .sorted
  }

  /** Two-commit VERSIONED layout — the MVCC idiom under every lake
    * format's time travel: data files only ever ACCUMULATE in `data/`;
    * the manifest is what makes a file visible — one row (version,
    * file) per file VISIBLE AT that version, the Iceberg snapshot
    * shape (a full list per version, so rewrites can retire files
    * without tombstone algebra); and the manifest's own `_SUCCESS` is
    * written LAST, so a reader either sees a fully committed table or
    * none of it.
    *
    * Version 1 = the initial load (event_id % 10 < 8, range-clustered);
    * version 2 = an appended batch (the rest). The append never
    * rewrites v1 files — the write cost of a commit is the BATCH, never
    * the table, and every earlier version stays byte-identical on disk.
    */
  private[ops] def eventsVersioned(s: SparkSession, d: String): String =
    buildVersioned(s, d, versionedDir(d), withCompaction = false)

  private[ops] def buildVersioned(
      s: SparkSession, d: String, root: String, withCompaction: Boolean): String = {
    val data = s"$root/data"
    val mdir = s"$root/_graft_versions"
    if (!successExists(s, mdir)) {
      val ev = Tables.events(s, d)
      ev.where(col("event_id") % 10 < 8)
        .repartitionByRange(8, col("event_id"))
        .write.mode("overwrite").parquet(data)
      val v1 = listParquet(s, data)
      ev.where(col("event_id") % 10 >= 8)
        .repartition(2) // batch-sized shuffle: the append costs the batch
        .write.mode("append").parquet(data)
      val v2 = listParquet(s, data)
      // v3 (vacuum lifecycle only): COMPACTION commit — rewrite the head
      // into 2 range-clustered files; the new manifest lists ONLY them,
      // retiring every v1/v2 file from the head without touching bytes
      val v3 =
        if (!withCompaction) Seq.empty
        else {
          Tables.normalizeTs(s.read.parquet(v2: _*))
            .repartitionByRange(2, col("event_id"))
            .sortWithinPartitions("event_id")
            .write.mode("append").parquet(data)
          listParquet(s, data).filterNot(v2.toSet)
        }
      import s.implicits._
      (v1.map(f => (f, 1)) ++ v2.map(f => (f, 2)) ++ v3.map(f => (f, 3)))
        .toDF("file", "version")
        .coalesce(1)
        .write.mode("overwrite").parquet(mdir)
    }
    root
  }

  /** Snapshot read AS OF `version`: the visible file set is a manifest
    * filter (file-count-sized metadata, driver-side planning like
    * [[manifestSkipScan]]); the data never moves. A version, once
    * committed, is immutable — the property that makes a training run
    * reproducible down to the file list months after later appends.
    */
  def snapshotRead(s: SparkSession, root: String, version: Int): DataFrame = {
    val files = s.read.parquet(s"$root/_graft_versions")
      .where(col("version") === version)
      .collect().map(_.getAs[String]("file")).toSeq.sorted
    require(files.nonEmpty, s"no files visible at version $version")
    Tables.normalizeTs(s.read.parquet(files: _*))
  }

  /** VACUUM: physically delete every data file not visible at any
    * version ≥ `horizon` — the retention-driven reclamation every lake
    * format pairs with time travel. Purely a metadata diff (manifest
    * file set vs directory listing) followed by FS deletes: no data
    * moves, no manifest rewrite, and versions ≥ horizon remain
    * byte-identically readable. Time travel BELOW the horizon is
    * intentionally destroyed — that is the storage the operation
    * reclaims. Returns (files before, files after).
    */
  def vacuum(s: SparkSession, root: String, horizon: Int): (Int, Int) = {
    val data = s"$root/data"
    val keep = s.read.parquet(s"$root/_graft_versions")
      .where(col("version") >= horizon)
      .collect().map(_.getAs[String]("file")).toSet
    require(keep.nonEmpty, s"vacuum horizon $horizon would empty the table")
    val all = listParquet(s, data)
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    all.filterNot(keep).foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    (all.size, listParquet(s, data).size)
  }

  /** Per-type stats of the VERSION-1 snapshot, read while the v2 append
    * sits in the same directory — the oracle is the batch predicate
    * itself, so a hash match proves snapshot isolation: the appended
    * files are invisible to the pinned version. PartitionedSpec adds
    * the versioning laws (v2 ⊇ v1, v2 = full table, immutability of
    * the v1 read after the append).
    */
  val qTimeTravel = Q(
    "q_time_travel",
    (s, d) => {
      val root = eventsVersioned(s, d)
      snapshotRead(s, root, 1)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM events
            WHERE event_id % 10 < 8
            GROUP BY event_type
            ORDER BY event_type""")
  )

  private def vacuumDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_vacuum_m2_${sourceKey(Seq(s"$d/events.parquet"))}"

  /** The full lake-maintenance LIFECYCLE on its own layout copy (so
    * [[qTimeTravel]]'s history stays intact): initial load (v1) →
    * append (v2) → compaction commit (v3, head rewritten into 2 files,
    * old files retired from the manifest but not from disk) → VACUUM at
    * horizon 3, physically reclaiming every file below the horizon.
    * The declared query reads the head AFTER the vacuum; its oracle is
    * the full unversioned table, so the hash match proves compaction +
    * vacuum preserved every visible row while the directory shrank to
    * the 2 compacted files (PartitionedSpec asserts the file-count
    * collapse, sub-horizon read failure, and vacuum idempotence).
    */
  private[ops] def vacuumedLayout(s: SparkSession, d: String): String =
    buildVersioned(s, d, vacuumDir(d), withCompaction = true)

  val qVacuum = Q(
    "q_vacuum",
    (s, d) => {
      val root = vacuumedLayout(s, d)
      vacuum(s, root, horizon = 3)
      snapshotRead(s, root, 3)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type""")
  )

  private def evolvedDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_evolved_m1_${sourceKey(Seq(s"$d/events.parquet"))}"

  /** SCHEMA EVOLUTION read — the lake reality that a long-lived table's
    * files do not share one schema: the early batch was written before
    * the `value` column existed, the later batch carries it. Spark's
    * `mergeSchema` parquet read unions the footer schemas at PLAN time
    * (file-count-sized metadata work, like manifest planning) and
    * null-fills the missing column in old files — no rewrite of
    * history, which at 100 TB is the difference between an ALTER TABLE
    * that costs nothing and one that rewrites the lake.
    *
    * Layout: the two batches split on `event_id % 10 < 8` (the same
    * data-derived split the versioned layouts use), old files written
    * WITHOUT `value`. The declared query aggregates per event_type over
    * the merged read — n_with_value counts exactly the new-batch rows,
    * so the oracle (the split predicate inlined over the live table)
    * hash-verifies both the union schema and the null-filling.
    */
  private[ops] def eventsEvolved(s: SparkSession, d: String): DataFrame = {
    val out = evolvedDir(d)
    if (!successExists(s, out)) {
      val ev = Tables.events(s, d)
      // old batch: written before `value` existed
      ev.where(col("event_id") % 10 < 8)
        .select("event_id", "user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(out)
      // new batch: schema grew; append files carry the extra column
      ev.where(col("event_id") % 10 >= 8)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .write.mode("append").parquet(out)
    }
    Tables.normalizeTs(s.read.option("mergeSchema", "true").parquet(out))
  }

  val qSchemaEvolution = Q(
    "q_schema_evolution",
    (s, d) =>
      eventsEvolved(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count(col("value")).as("n_with_value"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("total_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n_events,
                   count(CASE WHEN event_id % 10 >= 8 THEN value END) AS n_with_value,
                   CAST(sum(CASE WHEN event_id % 10 >= 8
                                 THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS total_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type""")
  )

  /** MERGE INTO (upsert) — the lake-lifecycle write path the family was
    * still missing: apply a CDC batch to a SNAPSHOT and emit the merged
    * table, the core of every Delta/Iceberg/Hudi `MERGE` statement.
    * The merge key is (user_id, event_type) — per-user-per-stream state.
    * Snapshot = latest state per key in the FIRST week; batch = latest
    * per key in the LAST week, so the fixture genuinely exercises every
    * branch (sf0.01: 612 updated / 69 deleted / 34 inserted / 32 kept).
    * Delete tombstones ride the fixture's out-of-band marker
    * (batch event_id % 10 = 0 — integer-exact): matched+delete drops
    * the row, unmatched delete no-ops. `action` is the MERGE audit
    * column every lake engine emits as operation metrics.
    *
    * Shape: two window collapses + ONE full-outer SMJ, all keyed on the
    * merge key — Catalyst reuses the windows' hash partitioning for the
    * join, so the merge is 2 data-scale exchanges + the output sort
    * (plan-pinned; nothing broadcasts — in a real MERGE both sides are
    * table-scale). At 100 TB this is exactly the shuffle plan a Delta
    * MERGE executes (minus its file-rewrite commit, which
    * q_compact/q_time_travel already cover on the layout side).
    */
  val qMergeUpsert = Q(
    "q_merge_upsert",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      def latest(df: DataFrame) =
        df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      val snap = latest(Tables.events(s, d)
        .where(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp")))
        .select(col("user_id"), col("event_type"), col("value").as("old_value"))
      val batch = latest(Tables.events(s, d)
        .where(col("ts") >= lit("2024-01-24 00:00:00").cast("timestamp")))
        .select(col("user_id").as("b_user"), col("event_type").as("b_type"),
          col("event_id").as("b_eid"), col("value").as("new_value"))
      snap
        .join(batch,
          col("user_id") === col("b_user") && col("event_type") === col("b_type"),
          "full_outer")
        // matched+delete drops; unmatched delete no-ops — both reduce to
        // "no tombstone rows survive"
        .where(col("b_eid").isNull || pmod(col("b_eid"), lit(10)) =!= 0)
        .select(
          coalesce(col("user_id"), col("b_user")).as("user_id"),
          coalesce(col("event_type"), col("b_type")).as("event_type"),
          coalesce(col("new_value"), col("old_value")).as("value"),
          when(col("b_eid").isNull, "kept")
            .when(col("user_id").isNull, "inserted")
            .otherwise("updated").as("action"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH snap AS (
              SELECT user_id, event_type, value AS old_value FROM (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00') t
              WHERE rn = 1),
            batch AS (
              SELECT user_id AS b_user, event_type AS b_type,
                     event_id AS b_eid, value AS new_value FROM (
                SELECT user_id, event_type, event_id, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00') t
              WHERE rn = 1)
            SELECT coalesce(user_id, b_user) AS user_id,
                   coalesce(event_type, b_type) AS event_type,
                   coalesce(new_value, old_value) AS value,
                   CASE WHEN b_eid IS NULL THEN 'kept'
                        WHEN user_id IS NULL THEN 'inserted'
                        ELSE 'updated' END AS action
            FROM snap FULL OUTER JOIN batch
              ON user_id = b_user AND event_type = b_type
            WHERE b_eid IS NULL OR b_eid % 10 <> 0
            ORDER BY user_id, event_type""")
  )

  /** CHANGE DATA FEED — the version-diff read every lake format offers
    * (Delta CDF / Iceberg changelog): classify how each (user_id,
    * event_type) key's latest-wins state changed between two snapshot
    * times (the q_merge_upsert cutoffs): `added` (absent at T1),
    * `removed` (tombstoned since — the fixture's event_id%10 marker),
    * `changed` (value differs), `unchanged` — a ONE-DAY feed window so
    * all four classes are live on the fixture (sf0.01:
    * 430/218/24/24 unchanged/changed/added/removed). Downstream incremental
    * consumers (index maintenance, cache invalidation, GDPR audits)
    * read exactly this relation instead of diffing full snapshots.
    *
    * Shape: two latest-wins window collapses sharing one hash
    * partitioning + one full-outer SMJ on the key — the same 2-exchange
    * plan as q_merge_upsert; the diff itself is a per-row CASE. At
    * 100 TB the state collapses are |keys|-bounded after their windows,
    * and nothing broadcasts.
    */
  val qChangeFeed = Q(
    "q_change_feed",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      // a key is VISIBLE in a snapshot iff its latest event is not a
      // tombstone (the merge's delete rule) — the same rule at BOTH
      // times, so removed/added are symmetric
      def stateAt(upper: String) =
        Tables.events(s, d)
          .where(col("ts") < lit(upper).cast("timestamp"))
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .where(pmod(col("event_id"), lit(10)) =!= 0)
      val old = stateAt("2024-01-16 00:00:00")
        .select(col("user_id"), col("event_type"), col("value").as("old_value"))
      val neu = stateAt("2024-01-17 00:00:00")
        .select(col("user_id").as("n_user"), col("event_type").as("n_type"),
          col("value").as("new_value"))
      old
        .join(neu,
          col("user_id") === col("n_user") && col("event_type") === col("n_type"),
          "full_outer")
        .select(
          coalesce(col("user_id"), col("n_user")).as("user_id"),
          coalesce(col("event_type"), col("n_type")).as("event_type"),
          col("old_value"), col("new_value"),
          when(col("old_value").isNull, "added")
            .when(col("new_value").isNull, "removed")
            .when(col("old_value") =!= col("new_value"), "changed")
            .otherwise("unchanged").as("change"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH old AS (
              SELECT user_id, event_type, value AS old_value FROM (
                SELECT user_id, event_type, event_id, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00') t
              WHERE rn = 1 AND event_id % 10 <> 0),
            neu AS (
              SELECT user_id AS n_user, event_type AS n_type, value AS new_value FROM (
                SELECT user_id, event_type, event_id, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '2024-01-17 00:00:00') t
              WHERE rn = 1 AND event_id % 10 <> 0)
            SELECT coalesce(user_id, n_user) AS user_id,
                   coalesce(event_type, n_type) AS event_type,
                   old_value, new_value,
                   CASE WHEN old_value IS NULL THEN 'added'
                        WHEN new_value IS NULL THEN 'removed'
                        WHEN old_value <> new_value THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM old FULL OUTER JOIN neu
              ON user_id = n_user AND event_type = n_type
            ORDER BY user_id, event_type""")
  )

  // ---------------------------------------------------------------------
  // deletion vectors (merge-on-read row-level delete)
  // ---------------------------------------------------------------------

  private def dvDir(d: String): String = s"${eventsClusteredDir(d)}_dv"

  /** Build the deletion-vector side table for the clustered events
    * layout: the positions — (file, row_index), NO payload columns — of
    * every row hit by the delete predicate (user_id % 10 = 3, the
    * GDPR-style erasure batch). Positions come from the parquet reader's
    * own `_metadata.file_path` / `_metadata.row_index`, so they are the
    * physical row positions an Iceberg v2 position-delete file or a
    * Delta deletion vector stores. The DATA FILES ARE NEVER REWRITTEN
    * (PartitionedSpec asserts byte-identical listings) — that is the
    * merge-on-read trade: delete commits cost O(deleted positions), the
    * debt is paid at read time until the next compaction rewrite
    * ([[qCompact]]) folds the DVs in.
    */
  private[ops] def buildDeletionVectors(s: SparkSession, d: String): (String, String) = {
    val layout = eventsClustered(s, d)
    val dv = dvDir(d)
    if (!successExists(s, dv)) {
      s.read.parquet(layout)
        .select(
          col("_metadata.file_path").as("file"),
          col("_metadata.row_index").as("pos"),
          col("user_id"))
        .where(col("user_id") % 10 === 3)
        .select("file", "pos")
        .coalesce(1)
        .write.mode("overwrite").parquet(dv)
    }
    (layout, dv)
  }

  /** MERGE-ON-READ DELETE READ (r7) — the scan that applies deletion
    * vectors: base files anti-joined on (file, pos) against the DV
    * table. The reader never sees the delete PREDICATE, only positions
    * — exactly the contract under Iceberg v2 position deletes / Delta
    * DVs — yet the oracle IS the predicate on the live table, so the
    * hash match proves position-level apply ≡ predicate semantics.
    *
    * Scale: the DV side is O(deleted positions) — broadcast here (the
    * per-file-bitmap-beside-the-scan shape the real formats use; a
    * mass-delete whose DV outgrows the broadcast threshold falls back
    * to a (file, pos)-keyed shuffle join, same plan text minus the
    * hint). The base scan stays a plain pruned parquet scan; nothing
    * corpus-sized shuffles, and no data file was touched by the delete.
    */
  val qDeletionVectors = Q(
    "q_deletion_vectors",
    (s, d) => {
      val (layout, dv) = buildDeletionVectors(s, d)
      val dvDf = s.read.parquet(dv)
      Tables.normalizeTs(
        s.read.parquet(layout)
          .withColumn("file", col("_metadata.file_path"))
          .withColumn("pos", col("_metadata.row_index")))
        .join(broadcast(dvDf), Seq("file", "pos"), "left_anti")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
            FROM events
            WHERE user_id % 10 <> 3
            ORDER BY event_id""")
  )

  private def dvCompactDir(d: String): String = s"${eventsClusteredDir(d)}_dvc"

  /** DV FOLD-IN COMPACTION (r7) — the maintenance op that PAYS the
    * merge-on-read debt [[qDeletionVectors]] takes on: survivors (base
    * anti DV) rewritten into 4 ts-range-clustered files; after the
    * fold the DV set for the new files is EMPTY by construction and
    * readers drop the anti join entirely. This is Iceberg's
    * rewrite-data-files with delete-file compaction / Delta's OPTIMIZE
    * folding DVs. Write-side: repartitionByRange + in-partition sort,
    * so the rewritten files recover the disjoint range clustering the
    * DV holes degraded ([[qCompact]]'s shape). The declared query reads
    * the folded layout with NO DV join and carries q_deletion_vectors'
    * oracle verbatim — the hash match proves the fold preserved every
    * surviving row.
    */
  private[ops] def dvCompactedLayout(s: SparkSession, d: String): String = {
    val out = dvCompactDir(d)
    if (!successExists(s, out)) {
      val (layout, dv) = buildDeletionVectors(s, d)
      val dvDf = s.read.parquet(dv)
      s.read.parquet(layout)
        .withColumn("file", col("_metadata.file_path"))
        .withColumn("pos", col("_metadata.row_index"))
        .join(broadcast(dvDf), Seq("file", "pos"), "left_anti")
        .drop("file", "pos")
        .repartitionByRange(4, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  val qDvCompact = Q(
    "q_dv_compact",
    (s, d) => {
      val out = dvCompactedLayout(s, d)
      Tables.normalizeTs(s.read.parquet(out))
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id")
    },
    qDeletionVectors.oracle
  )

  // -------------------------------------------------------------------
  // CONCURRENT-WRITER COMMIT PROTOCOL (r13) — the optimistic-concurrency
  // loop under every multi-writer lake format (Delta's
  // put-if-absent of _delta_log/N.json; Iceberg's atomic
  // swap-table-pointer): the r12 lifecycle (time travel, vacuum, merge,
  // change feed) assumed ONE committer; this closes the gap. A commit
  // is: read the head version, stage your data files anywhere (appends
  // never rewrite — data files are immutable and uniquely named), then
  // PUT-IF-ABSENT the next version's manifest. The loser of a race gets
  // a CAS failure (the version file already exists), re-reads the new
  // head — which now includes the winner's files — and retries on top
  // of it. History is therefore LINEAR: every version = its
  // predecessor + exactly one batch, no commit is ever lost or applied
  // twice, writers never coordinate beyond the one atomic primitive.
  // -------------------------------------------------------------------

  /** Atomic PUT-IF-ABSENT of a small metadata file — THE commit
    * primitive. On HDFS `create(path, overwrite = false)` is atomic;
    * on an object store this is the conditional PUT every lake format
    * rides (S3 If-None-Match, GCS x-goog-if-generation-match:0). On
    * LOCAL paths Hadoop's RawLocalFileSystem emulates the create with
    * a non-atomic exists() check, so we publish by HARD LINK instead:
    * write the body to a unique temp, then `link(temp, target)` — one
    * POSIX syscall that both fails-if-exists and exposes only complete
    * content (a reader can never observe a half-written manifest).
    * Returns false on the CAS failure the optimistic loop retries on.
    */
  private[ops] def casCreate(s: SparkSession, target: String, body: Array[Byte]): Boolean = {
    val p = new org.apache.hadoop.fs.Path(target)
    p.toUri.getScheme match {
      case null | "file" =>
        val nio = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(nio.getParent)
        val tmp = java.nio.file.Files.createTempFile(nio.getParent, ".cas-", ".tmp")
        try {
          java.nio.file.Files.write(tmp, body)
          try { java.nio.file.Files.createLink(nio, tmp); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } finally java.nio.file.Files.deleteIfExists(tmp)
      case _ =>
        // Distinguish CREATE-REFUSED (a real CAS loss) from a failure
        // AFTER create succeeded (r13 ADVICE): a write/close error
        // leaves the version file existing with partial content, and a
        // partial manifest as the head silently drops every prior file
        // from reads while poisoning this version's CAS forever. So a
        // post-create failure must remove the partial file before
        // surfacing — and if even the delete fails, throw rather than
        // report a clean CAS loss over a corrupt head.
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        val out =
          try fs.create(p, false)
          catch { case _: java.io.IOException => return false } // CAS refused
        try {
          out.write(body)
          out.close()
          true
        } catch {
          case e: java.io.IOException =>
            try out.close() catch { case _: java.io.IOException => () }
            val gone =
              try fs.delete(p, false)
              catch { case _: java.io.IOException => false }
            if (!gone && fs.exists(p))
              throw new java.io.IOException(
                s"commit write to $target failed AND the partial version file could not be removed — " +
                  "manual cleanup required before any further commit at this version", e)
            false
        }
    }
  }

  private def commitLogDir(root: String): String = s"$root/_graft_log"
  private def versionFile(logDir: String, v: Int): String =
    f"$logDir/v$v%05d.txt"

  /** Head version of a commit log (0 = empty table) — one directory
    * listing, file-count-sized driver metadata like every manifest read
    * in this family.
    */
  private[ops] def headVersion(s: SparkSession, logDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .maxOption.getOrElse(0)
  }

  /** Version-file header recording the commit's OPERATION TYPE —
    * `append` (blind add of fresh uniquely-named files) or `rewrite`
    * (compaction/vacuum/DV rewrite: retires existing files). The type
    * is what makes optimistic rebase SOUND to decide (r13 VERDICT):
    * appends commute with everything, rewrites only with commits that
    * leave their inputs alone — Delta's logical conflict matrix.
    */
  private val OpHeader = "#op="

  /** Body-format header distinguishing r14 INCREMENTAL commits from the
    * legacy full-snapshot bodies. A delta body lists ACTIONS (`+file` /
    * `-file`), so a commit writes O(batch) bytes instead of re-listing
    * the whole table — the difference between an append costing its
    * batch and costing a million-line manifest rewrite at 100 TB
    * (Delta's add/remove action log). Legacy bodies (no `#fmt` header)
    * read as self-contained snapshots, so pre-r14 logs and the
    * [[tryCommit]] CAS-law fixtures stay readable unchanged.
    */
  private val FmtHeader = "#fmt="
  private val FmtDelta = s"${FmtHeader}delta"

  /** Snapshot cadence: every [[CheckpointInterval]]-th commit also
    * publishes `vNNNNN.ckpt` — the full file list at that version — so
    * snapshot reconstruction replays at most [[CheckpointInterval]]
    * delta bodies no matter how long the history grows, and everything
    * strictly below the checkpoint becomes safe to truncate
    * (Delta's 10-commit parquet checkpoint, in this log's text form).
    */
  private[ops] val CheckpointInterval = 10

  private def checkpointFile(logDir: String, v: Int): String =
    f"$logDir/v$v%05d.ckpt"

  private def readLines(s: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val body = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0L, body) finally in.close()
    new String(body, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  private[ops] def versionBody(s: SparkSession, logDir: String, v: Int): Seq[String] =
    readLines(s, versionFile(logDir, v))

  /** The file list visible at `v`, reconstructed Delta-style: walk DOWN
    * from `v` collecting delta bodies until a SNAPSHOT BASE — a
    * `vNNNNN.ckpt` checkpoint or a legacy full-snapshot body — then
    * apply the collected add/remove actions upward. Cost is bounded by
    * [[CheckpointInterval]] small reads regardless of history length.
    * A missing version file below a live head fails loudly with the
    * truncation diagnosis (never a silently-shorter table).
    */
  private[ops] def manifestFiles(s: SparkSession, logDir: String, v: Int): Seq[String] = {
    if (v == 0) return Seq.empty
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val deltas = collection.mutable.ArrayBuffer.empty[Seq[String]]
    var w = v
    var base: Set[String] = null
    while (base == null) {
      if (w == 0) base = Set.empty
      else if (fs.exists(new org.apache.hadoop.fs.Path(checkpointFile(logDir, w))))
        base = readLines(s, checkpointFile(logDir, w)).filterNot(_.startsWith("#")).toSet
      else {
        require(fs.exists(new org.apache.hadoop.fs.Path(versionFile(logDir, w))),
          s"commit log $logDir is truncated below v$v with no checkpoint at or above v$w — " +
            "cannot reconstruct the snapshot")
        val body = versionBody(s, logDir, w)
        if (body.contains(FmtDelta)) {
          deltas += body.filterNot(_.startsWith("#"))
          w -= 1
        } else base = body.filterNot(_.startsWith("#")).toSet // legacy full snapshot
      }
    }
    val files = deltas.reverseIterator.foldLeft(base) { (acc, actions) =>
      val adds = actions.collect { case a if a.startsWith("+") => a.drop(1) }
      val removes = actions.collect { case a if a.startsWith("-") => a.drop(1) }.toSet
      (acc -- removes) ++ adds
    }
    files.toSeq.sorted
  }

  /** The operation type committed at `v` (headerless pre-r14 logs read
    * as `append` — the only op they could record).
    */
  private[ops] def versionOp(s: SparkSession, logDir: String, v: Int): String =
    if (v == 0) "append"
    else versionBody(s, logDir, v)
      .collectFirst { case l if l.startsWith(OpHeader) => l.stripPrefix(OpHeader) }
      .getOrElse("append")

  /** One commit ATTEMPT at exactly version `v` with the full manifest
    * `files` and its operation header — the LEGACY full-snapshot body,
    * kept as the CAS-law fixture and the back-compat read case. False =
    * CAS failure (someone else owns `v` now) — the law the race test
    * pins.
    */
  private[ops] def tryCommitOp(s: SparkSession, logDir: String, v: Int,
      files: Seq[String], op: String): Boolean =
    casCreate(s, versionFile(logDir, v),
      (s"$OpHeader$op" +: files.sorted).mkString("\n").getBytes("UTF-8"))

  /** One APPEND attempt: manifest = the previous head's list + this
    * batch (kept as the narrow surface the existing specs drive).
    */
  private[ops] def tryCommit(s: SparkSession, logDir: String, v: Int,
      prev: Seq[String], batch: Seq[String]): Boolean =
    tryCommitOp(s, logDir, v, prev ++ batch, "append")

  /** One INCREMENTAL commit attempt: the body is the op header plus
    * add/remove ACTIONS only — O(batch) bytes, the r14 write-side fix
    * ([[FmtDelta]] scaladoc). The actions are sorted for bit-stable
    * bodies, not because order matters to reconstruction.
    */
  private[ops] def tryCommitDelta(s: SparkSession, logDir: String, v: Int,
      op: String, adds: Seq[String], removes: Seq[String]): Boolean =
    casCreate(s, versionFile(logDir, v),
      (Seq(s"$OpHeader$op", FmtDelta) ++
        removes.sorted.map("-" + _) ++ adds.sorted.map("+" + _))
        .mkString("\n").getBytes("UTF-8"))

  /** Publish the checkpoint for `v` when the cadence hits. NOT a CAS:
    * version `v` is already committed and immutable, so the checkpoint
    * content is deterministic — concurrent writers double-writing it
    * produce identical bytes, and readers treat a missing checkpoint
    * as "replay further", never as corruption. Written via the same
    * temp-then-atomic-publish discipline as [[casCreate]] so a reader
    * can never observe a half-written snapshot.
    */
  private def maybeCheckpoint(s: SparkSession, logDir: String, v: Int): Unit =
    if (v % CheckpointInterval == 0) {
      val body = manifestFiles(s, logDir, v).mkString("\n").getBytes("UTF-8")
      val p = new org.apache.hadoop.fs.Path(checkpointFile(logDir, v))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, s".ckpt-${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, true)
      try { out.write(body); out.close() }
      catch { case e: java.io.IOException => fs.delete(tmp, false); throw e }
      if (!fs.rename(tmp, p)) fs.delete(tmp, false) // lost a benign double-write race
    }

  /** Delete every version file strictly below the NEWEST checkpoint —
    * safe because reconstruction at or above the checkpoint never
    * walks past it, and the whole point of checkpointing (bounded log
    * growth; Delta's log cleanup). Reads pinned below the checkpoint
    * fail loudly afterwards ([[manifestFiles]]'s truncation require).
    * Returns the number of files removed.
    */
  private[ops] def truncateLog(s: SparkSession, logDir: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(logDir)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val ckpts = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".ckpt") =>
        n.stripPrefix("v").stripSuffix(".ckpt").toInt }
    ckpts.maxOption.fold(0) { c =>
      val victims = fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".txt") &&
          n.stripPrefix("v").stripSuffix(".txt").toInt < c => n }
      victims.foreach(n => fs.delete(new org.apache.hadoop.fs.Path(dir, n), false))
      victims.size
    }
  }

  /** The optimistic-concurrency APPEND LOOP: re-read head, attempt
    * head+1, retry on CAS failure — no commit is lost and none applies
    * twice. With r14's INCREMENTAL bodies the rebase is implicit: the
    * delta records only `+batch`, so a retry at a new version number
    * composes with whatever won — losing to another append lands both
    * batches, and losing to a REWRITE can never resurrect retired
    * files because the rewrite's removes precede this delta in replay
    * order (Delta: blind INSERTs conflict with nothing). The attempt
    * cap turns livelock into a loud error (Delta's maxCommitAttempts);
    * returns the committed version. Every [[CheckpointInterval]]-th
    * winner also publishes the checkpoint snapshot.
    */
  private[ops] def commitAppend(s: SparkSession, logDir: String,
      batch: Seq[String], maxAttempts: Int = 50): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val head = headVersion(s, logDir)
      if (tryCommitDelta(s, logDir, head + 1, "append", batch, Seq.empty)) {
        maybeCheckpoint(s, logDir, head + 1)
        return head + 1
      }
    }
    throw new java.io.IOException(
      s"commit of ${batch.size} files lost $maxAttempts CAS races in $logDir")
  }

  /** The REWRITE commit loop (compaction / vacuum / DV rewrite):
    * retire `retired`, produce `produced`. Rewrites do NOT commute the
    * way appends do (r13 VERDICT): a rewrite that blindly rebased after
    * losing a race could re-add files another rewrite just retired —
    * resurrecting deleted data — or silently drop a concurrent
    * append's rows from its own recompaction. So each attempt performs
    * LOGICAL CONFLICT DETECTION against the live head (Delta's
    * conflict matrix, ConcurrentDeleteDeleteException branch): every
    * retired input must still be present in the head manifest. If an
    * interleaving commit was a pure append, the inputs survive and the
    * rebase is `head − retired ∪ produced` — the append's batch rides
    * through untouched. If any input is gone, a concurrent rewrite
    * owned it: abort loudly (the caller re-plans its rewrite from the
    * new head; its staged output references inputs that no longer
    * exist, so committing it can never be made safe by retrying).
    */
  private[ops] def commitRewrite(s: SparkSession, logDir: String,
      retired: Seq[String], produced: Seq[String], maxAttempts: Int = 50): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val head = headVersion(s, logDir)
      val prev = manifestFiles(s, logDir, head)
      val missing = retired.filterNot(prev.toSet)
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"rewrite conflict in $logDir at v$head: inputs ${missing.mkString(", ")} " +
            "were retired by a concurrent rewrite; re-plan from the new head")
      if (tryCommitDelta(s, logDir, head + 1, "rewrite", produced, retired)) {
        maybeCheckpoint(s, logDir, head + 1)
        return head + 1
      }
    }
    throw new java.io.IOException(
      s"rewrite of ${retired.size}→${produced.size} files lost $maxAttempts CAS races in $logDir")
  }

  private def ccCommitDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_cc_commit_${sourceKey(Seq(s"$d/events.parquet"))}"

  /** The declared layout: base load committed as v1, then TWO WRITERS
    * on real threads race to append the held-out rows (split by parity)
    * through [[commitAppend]] — whichever loses the v2 CAS rebases and
    * lands v3. Each writer stages its batch in its OWN directory (a
    * manifest lists absolute paths, so data files never share a
    * directory with a concurrent writer — no _temporary collisions,
    * the Iceberg anywhere-files shape). The final head is identical
    * regardless of who wins: base ∪ batch_a ∪ batch_b, which is what
    * makes the query deterministic and its full-table oracle a proof
    * of exactly-once: a lost commit drops rows, a double-applied one
    * doubles them, and either breaks the hash.
    */
  private[ops] def concurrentCommitLayout(s: SparkSession, d: String): String = {
    val root = ccCommitDir(d)
    // completeness = the v3 manifest exists (base + two racing appends);
    // version files publish atomically LAST per commit, so this is the
    // layout's _SUCCESS analogue
    def complete() = {
      val p = new org.apache.hadoop.fs.Path(versionFile(commitLogDir(root), 3))
      p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
    }
    if (!complete()) {
      buildAtomically(s, root, () => complete()) { tmp =>
        val log = commitLogDir(tmp)
        val ev = Tables.events(s, d)
        // manifests record TABLE-RELATIVE paths (Delta's convention):
        // the layout publishes by directory rename, so absolute paths
        // staged under the build dir would go stale at publish
        def rel(sub: String): Seq[String] =
          listParquet(s, s"$tmp/$sub")
            .map(f => sub + "/" + f.substring(f.lastIndexOf('/') + 1))
        ev.where(col("event_id") % 10 < 8)
          .repartitionByRange(8, col("event_id"))
          .write.mode("overwrite").parquet(s"$tmp/base")
        require(commitAppend(s, log, rel("base")) == 1)
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val writers = Seq(("a", 0), ("b", 1)).map { case (nm, par) =>
          new Thread(() => {
            try {
              ev.where(col("event_id") % 10 >= 8 && col("event_id") % 2 === par)
                .repartition(2) // batch-sized shuffle: a commit costs the batch
                .write.mode("overwrite").parquet(s"$tmp/batch_$nm")
              commitAppend(s, log, rel(s"batch_$nm"))
            } catch { case t: Throwable => failures.add(t) }
          }, s"graft-cc-writer-$nm")
        }
        writers.foreach(_.start())
        writers.foreach(_.join())
        if (!failures.isEmpty) throw failures.peek()
        require(headVersion(s, log) == 3,
          s"two racing appends over v1 must land v2 and v3, got head ${headVersion(s, log)}")
      }
    }
    root
  }

  /** Head-snapshot read through the commit log — the same
    * metadata-then-pruned-scan shape as [[snapshotRead]].
    */
  private[ops] def commitHeadRead(s: SparkSession, root: String): DataFrame = {
    val log = commitLogDir(root)
    val files = manifestFiles(s, log, headVersion(s, log))
    require(files.nonEmpty, s"empty commit log under $root")
    Tables.normalizeTs(s.read.parquet(files.map(f => s"$root/$f"): _*))
  }

  private def ckptCommitDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_events_ckpt_commit_${sourceKey(Seq(s"$d/events.parquet"))}"

  /** The checkpointed-log layout: ONE ranged write of the events table
    * produces 14 files, committed as 14 sequential incremental appends
    * (v1..v14) — so the log crosses the [[CheckpointInterval]] boundary
    * and v10 publishes its checkpoint — then [[truncateLog]] deletes
    * v1..v9. The declared read reconstructs the head from checkpoint +
    * 4 delta replays over a log whose early history is GONE, which is
    * the property that bounds both commit cost (O(batch) bodies) and
    * reconstruction cost (≤ interval replays) on a 100 TB table with
    * millions of commits. The full-table oracle is the exactly-once
    * law: a file lost to truncation-gone-wrong or double-applied by
    * replay breaks the hash.
    */
  private[ops] def checkpointCommitLayout(s: SparkSession, d: String): String = {
    val root = ckptCommitDir(d)
    def complete() = {
      val p = new org.apache.hadoop.fs.Path(checkpointFile(commitLogDir(root), CheckpointInterval))
      p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
    }
    if (!complete()) {
      buildAtomically(s, root, () => complete()) { tmp =>
        val log = commitLogDir(tmp)
        Tables.events(s, d)
          .repartitionByRange(14, col("event_id"))
          .write.mode("overwrite").parquet(s"$tmp/data")
        val files = listParquet(s, s"$tmp/data")
          .map(f => "data/" + f.substring(f.lastIndexOf('/') + 1)).sorted
        require(files.size > CheckpointInterval,
          s"need >$CheckpointInterval files to cross the checkpoint cadence, got ${files.size}")
        files.foreach(f => commitAppend(s, log, Seq(f)))
        require(headVersion(s, log) == files.size)
        val dropped = truncateLog(s, log)
        require(dropped == CheckpointInterval - 1,
          s"truncation must remove v1..v${CheckpointInterval - 1}, removed $dropped")
      }
    }
    root
  }

  val qCommitCheckpoint = Q(
    "q_commit_checkpoint",
    (s, d) => {
      val root = checkpointCommitLayout(s, d)
      commitHeadRead(s, root)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("total_value"))
        .orderBy("event_type")
    },
    // the FULL table through checkpoint + post-truncation replay —
    // exactly-once as a hash (see checkpointCommitLayout)
    Some("""SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type""")
  )

  val qConcurrentCommit = Q(
    "q_concurrent_commit",
    (s, d) => {
      val root = concurrentCommitLayout(s, d)
      commitHeadRead(s, root)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("total_value"))
        .orderBy("event_type")
    },
    // the FULL table: both racing writers' rows exactly once on top of
    // the base commit — the exactly-once law as a hash
    Some("""SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type""")
  )

  val all: Seq[Q] =
    Seq(qPartitionPrune, qJoinBucketed, qCompact, qManifestSkip, qTimeTravel,
      qVacuum, qSchemaEvolution, qMergeUpsert, qChangeFeed, qDeletionVectors,
      qDvCompact, qConcurrentCommit, qCommitCheckpoint, qBloomSkip)
}
