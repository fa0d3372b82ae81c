package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-layout cache discipline: the /tmp partitioned copy is keyed
  * by source path + size + mtime, so regenerated source data can never
  * be served from a stale layout (which would silently diverge from the
  * oracle reading the live file).
  */
class PartitionedSpec extends SparkSpec {

  test("partitioned layout invalidates when the source file is regenerated") {
    val dir = Files.createTempDirectory("prune-src-")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val full = Partitioned.qPartitionPrune.fn(spark, dir.toString).count()
    assert(full > 0)

    // regenerate the source at the SAME path: halve the rows (raw nanos
    // schema — rewrite preserves the long ts column)
    val halvedDir = Files.createTempDirectory("prune-halved-")
    spark.read
      .schema(graft.streaming.Replay.rawSchema)
      .parquet(dir.resolve("events.parquet").toString)
      .where(col("event_id") % 2 === 0)
      .coalesce(1)
      .write.mode("overwrite").parquet(halvedDir.toString)
    val listing = Files.list(halvedDir)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
    Files.move(part, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val halved = Partitioned.qPartitionPrune.fn(spark, dir.toString).count()
    assert(halved < full, s"stale layout served: $halved rows vs $full before regeneration")
  }

  test("q_compact: file count collapses and output files hold disjoint sorted key ranges") {
    def parquetFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // force a multi-file compaction even on the tiny corpus
    spark.conf.set(Partitioned.COMPACT_TARGET_BYTES_CONF, (64L << 10).toString)
    try {
      assert(Partitioned.qCompact.fn(spark, sf0001).count() > 0)
      val before = parquetFiles(Partitioned.smallFilesDir(sf0001)).size
      val afterFiles = parquetFiles(Partitioned.compactedDir(sf0001))
      assert(before == 64, s"small-file input layout must be 64 files, was $before")
      assert(afterFiles.size > 1, "target forced a multi-file layout")
      assert(afterFiles.size < before / 4,
        s"compaction must collapse the file count: $before -> ${afterFiles.size}")
      // range clustering: per-file [min,max] of the range key do not overlap
      val ranges = afterFiles.map { f =>
        val df = spark.read.parquet(f.getAbsolutePath)
          .agg(min("l_orderkey"), max("l_orderkey")).head()
        (df.getLong(0), df.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"file key ranges overlap: $ranges")
        case _ =>
      }
    } finally spark.conf.unset(Partitioned.COMPACT_TARGET_BYTES_CONF)
  }

  test("q_manifest_skip: prunes most files, and skipping is SOUND") {
    import org.apache.spark.sql.functions.col
    val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val layout = Partitioned.eventsClustered(spark, sf0001)
    val (scan, nSel, nTotal) = Partitioned.manifestSkipScan(spark, layout, lo, hi)
    assert(nTotal == 16, s"clustered layout must be 16 files, was $nTotal")
    // 2 days of a ~30-day range over 16 ts-disjoint files -> at most a
    // third of the files can intersect the window
    assert(nSel <= nTotal / 3, s"manifest pruned only $nTotal -> $nSel files")
    assert(nSel >= 1, "window must hit at least one file")

    // result equality vs the un-pruned filter over the same layout
    val full = spark.read.parquet(layout)
      .where(col("ts") >= lo && col("ts") < hi)
    assert(scan.count() == full.count())
    assert(scan.exceptAll(full).isEmpty && full.exceptAll(scan).isEmpty,
      "pruned scan diverged from the full-scan filter")

    // SOUNDNESS: the files the manifest skipped contain ZERO qualifying
    // rows — if this ever fails the manifest stats lie about the data
    val all = spark.read.parquet(manifestPathOf(layout)).collect()
      .map(_.getAs[String]("file")).toSet
    val selected = all.filter { f =>
      val r = spark.read.parquet(manifestPathOf(layout))
        .where(col("file") === f).head()
      val mn = r.getAs[java.sql.Timestamp]("ts_min")
      val mx = r.getAs[java.sql.Timestamp]("ts_max")
      mn != null && mx != null && !mx.before(lo) && mn.before(hi)
    }
    val skipped = (all -- selected).toSeq
    assert(skipped.nonEmpty)
    val leaked = spark.read.parquet(skipped: _*)
      .where(col("ts") >= lo && col("ts") < hi).count()
    assert(leaked == 0, s"skipped files held $leaked qualifying rows")
  }

  private def manifestPathOf(layout: String): String =
    Partitioned.manifestDir(layout)

  test("q_deletion_vectors: positions-only DVs, data files untouched, complement exact") {
    def listing(dir: String): Map[String, (Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime)).toMap
    }
    val (layout, dv) = Partitioned.buildDeletionVectors(spark, sf0001)
    val before = listing(layout)
    // the DV table is POSITIONS ONLY — no payload column leaks the data
    val dvDf = spark.read.parquet(dv)
    assert(dvDf.schema.fieldNames.toSet == Set("file", "pos"))
    // merge-on-read: applying the delete rewrote NO data file
    val survivors = Partitioned.qDeletionVectors.fn(spark, sf0001).collect()
    assert(listing(layout) == before, "a data file changed under a DV delete")
    // complement exactness: survivors + deleted = total, and the
    // survivor set is exactly the predicate complement
    val total = Tables.events(spark, sf0001).count()
    val deleted = dvDf.count()
    assert(survivors.length + deleted == total)
    assert(deleted > 0, "the delete batch must bite on the fixture")
    assert(survivors.forall(_.getLong(1) % 10 != 3))
    // every DV position is unique (a position deleted twice would
    // silently under-count on a bitmap representation)
    assert(dvDf.distinct().count() == deleted)
  }

  test("q_dv_compact: fold-in pays the DV debt — no join, few files, identical rows") {
    val out = Partitioned.dvCompactedLayout(spark, sf0001)
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    assert(files <= 4, s"fold-in produced $files files (range clustering lost)")
    // the folded read needs NO DV anti join — that IS the paid debt
    val plan = Partitioned.qDvCompact.fn(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), "the folded layout still joins DVs")
    // byte-identical survivors vs the merge-on-read path
    val folded = Partitioned.qDvCompact.fn(spark, sf0001).collect()
    val mor = Partitioned.qDeletionVectors.fn(spark, sf0001).collect()
    assert(folded.nonEmpty && folded.toSeq == mor.toSeq,
      "fold-in changed the surviving rows")
  }

  test("q_time_travel: snapshot isolation and version immutability") {
    import org.apache.spark.sql.functions.col
    val root = Partitioned.eventsVersioned(spark, sf0001)
    val v1 = Partitioned.snapshotRead(spark, root, 1)
    val v2 = Partitioned.snapshotRead(spark, root, 2)
    val full = graft.ops.Tables.events(spark, sf0001)

    // v2 is the complete table; v1 is the strict initial-load subset
    assert(v2.count() == full.count(), "latest version must equal the live table")
    assert(v1.count() < v2.count(), "v1 must pre-date the append")
    val expectV1 = full.where(col("event_id") % 10 < 8)
    assert(v1.count() == expectV1.count())
    assert(v1.select("event_id").exceptAll(expectV1.select("event_id")).isEmpty,
      "v1 snapshot diverged from the initial-load predicate")

    // immutability: re-reading v1 AFTER the v2 files exist in the same
    // data dir returns the identical row set (file-list reproducibility)
    val again = Partitioned.snapshotRead(spark, root, 1)
    assert(again.select("event_id").exceptAll(v1.select("event_id")).isEmpty &&
      v1.select("event_id").exceptAll(again.select("event_id")).isEmpty)

    // append-only: every v1 file is still listed at v2
    val m = spark.read.parquet(s"$root/_graft_versions")
    val f1 = m.where(col("version") <= 1).collect().map(_.getString(0)).toSet
    val f2 = m.where(col("version") <= 2).collect().map(_.getString(0)).toSet
    assert(f1.subsetOf(f2) && f2.size > f1.size)
  }

  test("q_schema_evolution: merged read unions footers, null-fills history, old files untouched") {
    val merged = Partitioned.eventsEvolved(spark, sf0001)
    assert(merged.schema.fieldNames.contains("value"))
    val full = graft.ops.Tables.events(spark, sf0001)
    assert(merged.count() == full.count(), "merge lost rows")
    // value is present EXACTLY on the new batch; history reads as null
    assert(merged.where(col("value").isNotNull).count()
      == full.where(col("event_id") % 10 >= 8).count())
    assert(merged.where(col("value").isNull).count()
      == full.where(col("event_id") % 10 < 8).count())
    // evolution never rewrote history: the directory holds BOTH footer
    // generations — some physical files still carry the narrow schema,
    // some the grown one (per-file reads, no mergeSchema)
    val perFile = merged.inputFiles.toSeq
      .map(f => spark.read.parquet(f).schema.fieldNames.contains("value"))
    assert(perFile.contains(false), "no narrow-schema file left — history was rewritten?")
    assert(perFile.contains(true), "no grown-schema file present")
  }

  test("q_vacuum: compaction + vacuum collapse the directory, preserve the head, destroy sub-horizon reads") {
    // A FRESH root per run: vacuum MUTATES its layout (that is the
    // point), so replaying the lifecycle against the cached declared-
    // query dir would find the pre-vacuum history already reclaimed by
    // the previous JVM's run and fail the pre-vacuum assertions.
    val root = java.nio.file.Files.createTempDirectory("graft_vacuum_spec_").toString
    Partitioned.buildVersioned(spark, sf0001, root, withCompaction = true)
    val full = graft.ops.Tables.events(spark, sf0001).count()

    // pre-vacuum: full history readable, head == table, data dir holds
    // load + append + compaction files
    assert(Partitioned.snapshotRead(spark, root, 1).count() < full)
    assert(Partitioned.snapshotRead(spark, root, 2).count() == full)
    assert(Partitioned.snapshotRead(spark, root, 3).count() == full)

    val (before, after) = Partitioned.vacuum(spark, root, horizon = 3)
    assert(before > after && after == 2,
      s"vacuum must leave exactly the 2 compacted files ($before -> $after)")

    // head still byte-complete; sub-horizon time travel is gone (its
    // files were the reclaimed storage)
    assert(Partitioned.snapshotRead(spark, root, 3).count() == full)
    intercept[Exception] {
      Partitioned.snapshotRead(spark, root, 1).count()
    }

    // idempotent: nothing left to reclaim
    val (b2, a2) = Partitioned.vacuum(spark, root, horizon = 3)
    assert(b2 == 2 && a2 == 2)
  }

  test("buildAtomically: a lost race discards the loser's build and never touches the winner") {
    val root = java.nio.file.Files.createTempDirectory("graft_atomic_spec_")
    val out = root.resolve("layout").toString
    // winner publishes first
    Partitioned.buildAtomically(spark, out) { tmp =>
      spark.range(3).toDF("winner").write.parquet(tmp)
    }
    val winnerFiles = new java.io.File(out).listFiles().map(_.getName).toSet
    // loser builds a DIFFERENT layout against the same target
    Partitioned.buildAtomically(spark, out) { tmp =>
      spark.range(100).toDF("loser").write.parquet(tmp)
    }
    // winner untouched byte-for-byte (same file set, same schema), no
    // .build- temp dirs left, nothing nested inside the layout
    assert(new java.io.File(out).listFiles().map(_.getName).toSet == winnerFiles)
    assert(spark.read.parquet(out).columns.toSeq == Seq("winner"))
    assert(!root.toFile.listFiles().exists(_.getName.contains(".build-")),
      "loser's temp build dir not cleaned up")
  }

  test("buildAtomically: a winner appearing between the completeness check and the rename is not corrupted") {
    // Hadoop rename(tmp, existing-dir) moves tmp INSIDE the target and
    // returns true — the loser must detect and delete the nested copy.
    // Simulate the race window with a side-effecting completeness
    // predicate: it publishes the winner DURING the loser's pre-rename
    // check, so the loser's rename lands on an occupied target.
    val root = java.nio.file.Files.createTempDirectory("graft_atomic_race_")
    val out = root.resolve("layout").toString
    var checks = 0
    val complete = () => {
      checks += 1
      val exists = Partitioned.successExists(spark, out)
      if (!exists && checks == 1) {
        // the racing winner publishes now (post-build, pre-rename)
        spark.range(5).toDF("winner").write.parquet(out)
        false // loser still believes the target is free
      } else exists
    }
    Partitioned.buildAtomically(spark, out, complete) { tmp =>
      spark.range(200).toDF("loser").write.parquet(tmp)
    }
    // winner's layout intact and readable; the loser's nested duplicate
    // (out/<tmp-basename>) was detected and removed
    assert(spark.read.parquet(out).columns.toSeq == Seq("winner"))
    assert(spark.read.parquet(out).count() == 5)
    assert(!new java.io.File(out).listFiles().exists(_.getName.contains(".build-")),
      "loser's build nested inside the published layout")
  }

  test("commit CAS: put-if-absent — first writer wins, loser sees false, content is the winner's") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_cas_")
    val target = s"$root/v00001.txt"
    assert(Partitioned.casCreate(spark, target, "winner".getBytes("UTF-8")))
    assert(!Partitioned.casCreate(spark, target, "loser".getBytes("UTF-8")),
      "second put-if-absent of the same version must fail")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target)), "UTF-8") == "winner")
    graft.FsUtil.deleteRecursively(root)
  }

  test("commit loop: a CAS loss rebases onto the new head — the loser's retry lands winner+batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_retry_")
    val log = s"$root/_graft_log"
    assert(Partitioned.commitAppend(spark, log, Seq("base.parquet")) == 1)
    // deterministic race window: the "winner" takes v2 directly, so the
    // protocol-level attempt at v2 must CAS-fail...
    assert(Partitioned.tryCommit(spark, log, 2,
      Partitioned.manifestFiles(spark, log, 1), Seq("winner.parquet")))
    assert(!Partitioned.tryCommit(spark, log, 2,
      Partitioned.manifestFiles(spark, log, 1), Seq("loser.parquet")),
      "v2 is taken; the loser's attempt must fail, never overwrite")
    // ...and the loop retries to v3 REBASED on v2: the winner's file is
    // in the loser's manifest
    assert(Partitioned.commitAppend(spark, log, Seq("loser.parquet")) == 3)
    val head = Partitioned.manifestFiles(spark, log, 3)
    assert(head.toSet == Set("base.parquet", "winner.parquet", "loser.parquet"))
    graft.FsUtil.deleteRecursively(root)
  }

  test("commit protocol under a real 8-writer race: dense linear history, every batch exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_race_")
    val log = s"$root/_graft_log"
    val n = 8
    val start = new java.util.concurrent.CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        try { start.await(); Partitioned.commitAppend(spark, log, Seq(s"batch_$i.parquet")) }
        catch { case t: Throwable => failures.add(t) }
      }, s"cc-race-$i")
    }
    threads.foreach(_.start())
    start.countDown() // all writers fire at once — maximal contention
    threads.foreach(_.join())
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek())}")
    // dense versions 1..n: no gaps (a gap = a lost commit), no extras
    assert(Partitioned.headVersion(spark, log) == n)
    val lists = (1 to n).map(v => Partitioned.manifestFiles(spark, log, v).toSet)
    // linear history: each version adds EXACTLY ONE batch to its parent
    (1 until n).foreach { v =>
      assert(lists(v - 1).subsetOf(lists(v)), s"v${v + 1} dropped files of v$v")
      assert((lists(v) -- lists(v - 1)).size == 1,
        s"v${v + 1} added ${(lists(v) -- lists(v - 1)).size} batches, not 1")
    }
    // exactly-once: the head is all n batches, none duplicated (sets
    // can't show dups — re-check via the raw manifest line count)
    assert(lists(n - 1) == (0 until n).map(i => s"batch_$i.parquet").toSet)
    assert(Partitioned.manifestFiles(spark, log, n).size == n)
    graft.FsUtil.deleteRecursively(root)
  }

  test("snapshot isolation under the race: a reader pinned at v1 sees the identical file list while 8 writers commit") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_iso_")
    val log = s"$root/_graft_log"
    assert(Partitioned.commitAppend(spark, log, Seq("base.parquet")) == 1)
    val pinned = Partitioned.manifestFiles(spark, log, 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until 8).map { i =>
      new Thread(() => {
        try { start.await(); Partitioned.commitAppend(spark, log, Seq(s"w$i.parquet")) }
        catch { case t: Throwable => failures.add(t) }
      })
    }
    val reader = new Thread(() => {
      try { start.await(); (0 until 32).foreach { _ =>
        reads.add(Partitioned.manifestFiles(spark, log, 1)) } }
      catch { case t: Throwable => failures.add(t) }
    })
    (writers :+ reader).foreach(_.start())
    start.countDown()
    (writers :+ reader).foreach(_.join())
    assert(failures.isEmpty, s"thread failed: ${Option(failures.peek())}")
    // a committed version is immutable: every concurrent read of v1 is
    // byte-identical to the pre-race read, regardless of 8 commits
    // landing around it (manifests are never rewritten, only appended)
    reads.forEach(r => assert(r == pinned, "pinned-version read changed during the race"))
    assert(Partitioned.headVersion(spark, log) == 9)
    graft.FsUtil.deleteRecursively(root)
  }

  test("q_concurrent_commit layout: two racing writers land v2 and v3; head == base + both batches exactly once") {
    val root = Partitioned.concurrentCommitLayout(spark, sf0001)
    val head = Partitioned.commitHeadRead(spark, root)
    val full = graft.ops.Tables.events(spark, sf0001)
    assert(head.count() == full.count(), "head must hold every row exactly once")
    assert(head.select("event_id").distinct().count() == full.count())
  }

  test("rewrite commit: both interleavings of append vs compaction converge, head never resurrects a retired file") {
    // order 1 — REWRITE WINS: the append's blind rebase must pick up the
    // compacted list, not re-add retired inputs
    val r1 = java.nio.file.Files.createTempDirectory("graft_cc_rw1_")
    val log1 = s"$r1/_graft_log"
    assert(Partitioned.commitAppend(spark, log1, Seq("f1.parquet", "f2.parquet")) == 1)
    assert(Partitioned.commitRewrite(spark, log1,
      retired = Seq("f1.parquet", "f2.parquet"), produced = Seq("compact.parquet")) == 2)
    assert(Partitioned.versionOp(spark, log1, 2) == "rewrite")
    assert(Partitioned.commitAppend(spark, log1, Seq("batch.parquet")) == 3)
    assert(Partitioned.manifestFiles(spark, log1, 3).toSet ==
      Set("compact.parquet", "batch.parquet"),
      "append over a rewrite head must not resurrect retired files")
    graft.FsUtil.deleteRecursively(r1)

    // order 2 — APPEND WINS: the rewrite's conflict check finds its
    // inputs intact (appends commute) and its rebase carries the
    // append's batch through
    val r2 = java.nio.file.Files.createTempDirectory("graft_cc_rw2_")
    val log2 = s"$r2/_graft_log"
    assert(Partitioned.commitAppend(spark, log2, Seq("f1.parquet", "f2.parquet")) == 1)
    assert(Partitioned.commitAppend(spark, log2, Seq("batch.parquet")) == 2)
    assert(Partitioned.commitRewrite(spark, log2,
      retired = Seq("f1.parquet", "f2.parquet"), produced = Seq("compact.parquet")) == 3)
    assert(Partitioned.manifestFiles(spark, log2, 3).toSet ==
      Set("compact.parquet", "batch.parquet"),
      "rewrite losing to an append must keep the append's batch")
    graft.FsUtil.deleteRecursively(r2)
  }

  test("rewrite commit: a rewrite whose inputs were retired by a concurrent rewrite aborts loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_rwc_")
    val log = s"$root/_graft_log"
    assert(Partitioned.commitAppend(spark, log, Seq("f1.parquet", "f2.parquet")) == 1)
    // rewrite A wins and retires both inputs
    assert(Partitioned.commitRewrite(spark, log,
      retired = Seq("f1.parquet", "f2.parquet"), produced = Seq("a.parquet")) == 2)
    // rewrite B planned against v1 over the SAME inputs: committing it
    // would resurrect data A deleted — must throw, never rebase
    val e = intercept[java.util.ConcurrentModificationException] {
      Partitioned.commitRewrite(spark, log,
        retired = Seq("f1.parquet", "f2.parquet"), produced = Seq("b.parquet"))
    }
    assert(e.getMessage.contains("f1.parquet"))
    assert(Partitioned.headVersion(spark, log) == 2, "the aborted rewrite must not commit")
    assert(Partitioned.manifestFiles(spark, log, 2).toSet == Set("a.parquet"))
    graft.FsUtil.deleteRecursively(root)
  }

  test("append vs compaction under a real latch race: linear history, converged head, no resurrection") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_rwrace_")
    val log = s"$root/_graft_log"
    assert(Partitioned.commitAppend(spark, log, Seq("f1.parquet", "f2.parquet")) == 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try { start.await(); Partitioned.commitAppend(spark, log, Seq("batch.parquet")) }
      catch { case t: Throwable => failures.add(t) }
    }, "cc-rw-append")
    val compactor = new Thread(() => {
      try {
        start.await()
        Partitioned.commitRewrite(spark, log,
          retired = Seq("f1.parquet", "f2.parquet"), produced = Seq("compact.parquet"))
      } catch { case t: Throwable => failures.add(t) }
    }, "cc-rw-compact")
    Seq(appender, compactor).foreach(_.start())
    start.countDown()
    Seq(appender, compactor).foreach(_.join())
    // appends never conflict and the compactor's inputs can only be
    // taken by another REWRITE (there is none) — both must commit
    assert(failures.isEmpty, s"racer failed: ${Option(failures.peek())}")
    assert(Partitioned.headVersion(spark, log) == 3)
    assert(Partitioned.manifestFiles(spark, log, 3).toSet ==
      Set("compact.parquet", "batch.parquet"),
      "either race order must converge to compact+batch with nothing resurrected")
    graft.FsUtil.deleteRecursively(root)
  }

  test("incremental log: a commit's body is O(batch), not O(table)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_delta_")
    val log = s"$root/_graft_log"
    val wide = (0 until 500).map(i => f"wide_$i%03d.parquet")
    assert(Partitioned.commitAppend(spark, log, wide) == 1)
    assert(Partitioned.commitAppend(spark, log, Seq("one_more.parquet")) == 2)
    // the v2 body must record the ACTION, not re-list the 501-file table
    val body = Partitioned.versionBody(spark, log, 2)
    assert(body.count(!_.startsWith("#")) == 1, s"delta body re-lists the table: $body")
    assert(body.contains("+one_more.parquet"))
    assert(Partitioned.manifestFiles(spark, log, 2).size == 501)
    graft.FsUtil.deleteRecursively(root)
  }

  test("checkpoint at the cadence: reconstruction survives deleting every version below it") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_")
    val log = s"$root/_graft_log"
    for (i <- 1 to 13) assert(Partitioned.commitAppend(spark, log, Seq(s"f$i.parquet")) == i)
    // v10 published its snapshot; truncate v1..v9
    assert(Partitioned.truncateLog(spark, log) == 9)
    // head reconstructs from checkpoint + 3 delta replays
    assert(Partitioned.manifestFiles(spark, log, 13).toSet ==
      (1 to 13).map(i => s"f$i.parquet").toSet)
    // a pinned read AT the checkpoint version still works...
    assert(Partitioned.manifestFiles(spark, log, 10).size == 10)
    // ...but below it the history is gone and must fail LOUDLY
    val e = intercept[IllegalArgumentException](Partitioned.manifestFiles(spark, log, 5))
    assert(e.getMessage.contains("truncated"))
    graft.FsUtil.deleteRecursively(root)
  }

  test("checkpoint content includes rewrite removes; legacy full-snapshot bodies read as bases") {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_mixed_")
    val log = s"$root/_graft_log"
    // legacy full-snapshot v1 (the pre-r14 body shape)
    assert(Partitioned.tryCommit(spark, log, 1, Seq.empty, Seq("a.parquet", "b.parquet")))
    // delta commits on top of the legacy base
    assert(Partitioned.commitAppend(spark, log, Seq("c.parquet")) == 2)
    assert(Partitioned.commitRewrite(spark, log,
      retired = Seq("a.parquet", "b.parquet"), produced = Seq("ab.parquet")) == 3)
    assert(Partitioned.manifestFiles(spark, log, 3).toSet == Set("ab.parquet", "c.parquet"))
    // push to the checkpoint cadence; the snapshot must NOT resurrect a/b
    for (i <- 4 to 10)
      assert(Partitioned.commitAppend(spark, log, Seq(s"f$i.parquet")) == i)
    assert(Partitioned.truncateLog(spark, log) == 9)
    val head = Partitioned.manifestFiles(spark, log, 10).toSet
    assert(head == Set("ab.parquet", "c.parquet") ++ (4 to 10).map(i => s"f$i.parquet"),
      s"checkpoint through a rewrite must retire a/b for good, got $head")
    graft.FsUtil.deleteRecursively(root)
  }

  test("bloom skip: dramatic pruning on the bucket-evolved layout, no false negative for ANY user") {
    val layout = Partitioned.eventsBloomLayout(spark, sf0001)
    // the probe user lives in exactly one bucket per epoch: ≤ 2 true
    // files of 24, plus at most a couple of false positives
    val (scan, selected, total) = Partitioned.bloomSkipScan(spark, layout, 7L)
    // 8 + 16 buckets, minus epoch-2 buckets empty at this sf (15 users)
    assert(total >= 10 && total <= 24, s"bucket-evolved layout shape off: $total files")
    assert(selected <= 4, s"bloom selected $selected of $total files — not skipping")
    val expected = Tables.events(spark, sf0001).where(col("user_id") === 7).count()
    assert(scan.count() == expected)
    // no false negatives: every user's rows survive the pruned scan
    val users = Tables.events(spark, sf0001).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val counts = Tables.events(spark, sf0001).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    users.foreach { u =>
      val (s2, _, _) = Partitioned.bloomSkipScan(spark, layout, u)
      assert(s2.count() == counts(u), s"bloom lost rows for user $u")
    }
  }

  test("bloom skip: absent keys mostly prune to zero files (fpp sanity)") {
    val layout = Partitioned.eventsBloomLayout(spark, sf0001)
    val picks = (0 until 40).map { i =>
      val (s2, selected, total) = Partitioned.bloomSkipScan(spark, layout, 1000000L + i)
      assert(s2.count() == 0, "absent key returned rows")
      selected.toDouble / total
    }
    // k=6, 8 bits/row sizing → per-file fpp ≈ 2%; allow generous slack
    assert(picks.sum / picks.size < 0.15,
      f"mean selected-file fraction ${picks.sum / picks.size}%.3f too high for the bloom sizing")
  }

  test("q_commit_checkpoint layout: head == all 14 single-file appends exactly once, early log gone") {
    val root = Partitioned.checkpointCommitLayout(spark, sf0001)
    val log = s"$root/_graft_log"
    val head = Partitioned.headVersion(spark, log)
    assert(head > Partitioned.CheckpointInterval)
    // truncation really happened: v1 is gone, the checkpoint remains
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$log/v00001.txt")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      f"$log/v${Partitioned.CheckpointInterval}%05d.ckpt")))
    // exactly-once: the reconstructed read equals the raw table
    val got = Partitioned.commitHeadRead(spark, root).count()
    assert(got == Tables.events(spark, sf0001).count())
  }
}
