package graft.ingest

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import graft.SparkSpec

/** Hardens the COPY stage-and-promote protocol beyond single-retry call
  * sequences: a stateful in-memory "database" applies the protocol's
  * SQL for real (tables, per-connection transaction buffering, COPY
  * appends), so these specs assert FINAL TARGET CONTENTS — not call
  * logs — under
  *  1. a REAL Spark task retry (`local[4,2]`) whose first attempt dies
  *     mid-COPY and leaves partial rows in its staging table, and
  *  2. two concurrent loads whose promote transactions commit in the
  *     OPPOSITE order of their staging.
  * (Speculative duplicate ATTEMPTS racing each other on one staging
  * table remain out of protocol per the CopySink scaladoc —
  * `spark.speculation=false` is a documented requirement.)
  */
class CopyRetryStormSpec extends SparkSpec {
  import CopyRetryStormSpec._

  private val T = "public.storm_target"
  private def sink() = CopySink(T, Seq("a", "b", "c"), () => new DbTarget)

  test("mid-COPY task failure: retry TRUNCATEs the partial attempt, target gets rows exactly once") {
    Db.reset(T)
    Db.failFirstCopyOfPidSuffix = Some("_0")
    try {
      import spark.implicits._
      val df = (1 to 8).map(i => (f"r$i%02d", "v", "w")).toDF("a", "b", "c").repartition(2)
      sink().append(df)
    } finally Db.failFirstCopyOfPidSuffix = None

    val expected = (1 to 8).map(i => f"r$i%02d,v,w").sorted
    assert(Db.rows(T).sorted == expected, "every input row exactly once — no loss, no duplication")
    // the storm was real: some staging table saw two COPY attempts...
    assert(Db.copyAttempts.values().stream().anyMatch(_.get() >= 2),
      "the injected first attempt must actually have failed and retried")
    // ...and the retry's TRUNCATE really wiped persisted partial rows
    assert(Db.truncateWipedStagedRows.get(),
      "retry idempotence must come from wiping the failed attempt's partial rows")
    // no staged leftovers
    assert(Db.tableNames.forall(!_.contains("_stg_")), "staging tables must be dropped")
  }

  test("out-of-order promotes: first-staged load commits last, both loads land exactly once") {
    Db.reset(T)
    import spark.implicits._
    val dfA = (1 to 4).map(i => (s"a$i", "x", "y")).toDF("a", "b", "c").coalesce(1)
    val dfB = (1 to 4).map(i => (s"b$i", "x", "y")).toDF("a", "b", "c").coalesce(1)

    val aStaged = new CountDownLatch(1) // A reached its promote BEGIN (staging done)
    val bDone = new CountDownLatch(1)   // B fully committed
    Db.onBegin = () =>
      if (Thread.currentThread().getName == "loadA") {
        aStaged.countDown()
        assert(bDone.await(60, TimeUnit.SECONDS), "gate timed out")
      }
    val aErr = new AtomicReference[Throwable]
    val ta = new Thread(
      () => try sink().append(dfA) catch { case t: Throwable => aErr.set(t) },
      "loadA")
    try {
      ta.start()
      assert(aStaged.await(60, TimeUnit.SECONDS), "load A never reached promote")
      sink().append(dfB) // B stages AND promotes while A sits before BEGIN
      bDone.countDown()
      ta.join(60000)
      assert(!ta.isAlive, "load A did not finish")
      assert(aErr.get() == null, s"load A failed: ${aErr.get()}")
    } finally {
      Db.onBegin = null
      bDone.countDown()
    }

    val expected = ((1 to 4).map(i => s"a$i,x,y") ++ (1 to 4).map(i => s"b$i,x,y")).sorted
    assert(Db.rows(T).sorted == expected,
      "inverted promote order must not lose or duplicate either load")
    assert(Db.tableNames.forall(!_.contains("_stg_")))
  }

  test("promote rollback under the stateful db leaves the target untouched") {
    Db.reset(T)
    Db.seed(T, Vector("pre,1,2"))
    Db.failInsert = true
    try {
      import spark.implicits._
      val df = Seq(("x", "y", "z")).toDF("a", "b", "c").coalesce(1)
      intercept[RuntimeException] { sink().append(df) }
    } finally Db.failInsert = false
    assert(Db.rows(T) == Vector("pre,1,2"), "rolled-back promote must not mutate the target")
    assert(Db.tableNames.forall(!_.contains("_stg_")), "aborted load must drop staged tables")
  }
}

object CopyRetryStormSpec {

  /** Minimal transactional table store. All statics: foreachPartition
    * closures deserialize on local-mode executor threads, which share
    * this JVM.
    */
  object Db {
    private val tables = scala.collection.mutable.Map[String, Vector[String]]()
    val copyAttempts = new ConcurrentHashMap[String, AtomicInteger]()
    val truncateWipedStagedRows = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var failFirstCopyOfPidSuffix: Option[String] = None
    @volatile var failInsert: Boolean = false
    @volatile var onBegin: () => Unit = null

    def reset(targets: String*): Unit = tables.synchronized {
      tables.clear()
      targets.foreach(t => tables(t) = Vector.empty)
      copyAttempts.clear()
      truncateWipedStagedRows.set(false)
      failFirstCopyOfPidSuffix = None
      failInsert = false
      onBegin = null
    }

    def seed(t: String, rows: Vector[String]): Unit = tables.synchronized { tables(t) = rows }
    def rows(t: String): Vector[String] = tables.synchronized { tables.getOrElse(t, Vector.empty) }
    def tableNames: Set[String] = tables.synchronized { tables.keySet.toSet }

    def createLike(t: String, like: String): Unit = tables.synchronized {
      require(tables.contains(like), s"CREATE LIKE of missing $like")
      if (!tables.contains(t)) tables(t) = Vector.empty
    }
    def truncate(t: String): Unit = tables.synchronized {
      require(tables.contains(t), s"TRUNCATE of missing table $t")
      if (t.contains("_stg_") && tables(t).nonEmpty) truncateWipedStagedRows.set(true)
      tables(t) = Vector.empty
    }
    def append(t: String, rows: Seq[String]): Unit = tables.synchronized {
      require(tables.contains(t), s"COPY into missing table $t")
      tables(t) = tables(t) ++ rows
    }
    def insertSelect(target: String, from: String): Unit = tables.synchronized {
      require(tables.contains(target) && tables.contains(from), s"INSERT $from -> $target")
      tables(target) = tables(target) ++ tables(from)
    }
    def drop(t: String): Unit = tables.synchronized { tables.remove(t): Unit }
    def atomically(ops: Seq[() => Unit]): Unit = tables.synchronized { ops.foreach(_.apply()) }
  }

  private val CreateLike = """CREATE TABLE IF NOT EXISTS (\S+) \(LIKE (\S+)\)""".r
  private val Trunc = """TRUNCATE TABLE (\S+)""".r
  private val Insert = """INSERT INTO (\S+) \(.+\) SELECT .+ FROM (\S+)""".r
  private val Drop = """DROP TABLE IF EXISTS (\S+)""".r
  private val Copy = """COPY (\S+) \(.+\) FROM STDIN.*""".r

  /** CopyTarget over [[Db]] with per-connection BEGIN/COMMIT/ROLLBACK
    * buffering: statements inside a transaction take effect atomically
    * at COMMIT, never at ROLLBACK — so out-of-order commits and failed
    * promotes exercise real transactional visibility.
    */
  final class DbTarget extends CopyTarget {
    private var txn: Vector[() => Unit] = null

    private def run(op: () => Unit): Unit =
      if (txn != null) txn :+= op else op()

    def execute(sql: String): Unit = sql.trim match {
      case "BEGIN" =>
        val hook = Db.onBegin
        if (hook != null) hook()
        txn = Vector.empty
      case "COMMIT" =>
        val ops = txn; txn = null; Db.atomically(ops)
      case "ROLLBACK" =>
        txn = null
      case CreateLike(t, like) => run(() => Db.createLike(t, like))
      case Trunc(t)            => run(() => Db.truncate(t))
      case Insert(target, from) =>
        if (Db.failInsert) throw new RuntimeException("injected promote failure")
        run(() => Db.insertSelect(target, from))
      case Drop(t) => run(() => Db.drop(t))
      case other   => throw new IllegalArgumentException(s"unmodeled SQL: $other")
    }

    def copyIn(sql: String, lines: Iterator[String]): Long = {
      val t = sql match {
        case Copy(name) => name
        case other      => throw new IllegalArgumentException(s"unmodeled COPY: $other")
      }
      val attempt = Db.copyAttempts.computeIfAbsent(t, _ => new AtomicInteger).incrementAndGet()
      val doomed = Db.failFirstCopyOfPidSuffix.exists(t.endsWith) && attempt == 1
      if (doomed) {
        // persist a PARTIAL batch, then die — the wire state a mid-COPY
        // task failure leaves behind
        Db.append(t, lines.take(2).map(_.stripLineEnd).toVector)
        throw new RuntimeException("injected mid-COPY task failure")
      }
      val all = lines.map(_.stripLineEnd).toVector
      Db.append(t, all)
      all.size.toLong
    }

    def close(): Unit = ()
  }
}
