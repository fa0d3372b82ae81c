package graft.sources

import java.util
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The BROKER stand-in behind [[QueueSource]]: a named, rate-limited,
  * ack-dropping row queue — the single-JVM test double for a message
  * broker (the CopySinkSpec stream-capturing-fake discipline applied to
  * streaming ingest; at production scale this process is Kafka, and the
  * source's offset/commit/no-relist contract below is exactly Kafka's).
  *
  * Two queue kinds share the contract:
  *
  *  - [[QueueBroker.Queue]] — a single driver-fed iterator queue for
  *    arbitrary `Iterator[Row]` feeds (the contract-law fixture). Its
  *    memory is bounded by the un-acked window and `ack` physically
  *    drops rows, but ADMISSION is one driver thread — fine for laws,
  *    a scale-killer as a corpus feed (r12 VERDICT: 257 s for 10 M rows
  *    at sf10, ~39 k rows/s through one `toLocalIterator`).
  *  - [[QueueBroker.LogQueue]] — the PARTITION-PARALLEL kind (r13):
  *    N shards, each a local log file in the engine's own wire format
  *    (length-prefixed [[UnsafeRow]] bytes) WRITTEN EXECUTOR-SIDE by
  *    [[QueueBroker.stageShards]] — Kafka's partitioned log made
  *    literal. Driver-side admission is O(1) offset arithmetic per
  *    shard (no row ever crosses the driver); each micro-batch plans
  *    ONE [[QueueLogBatch]] per shard and executors read their shard's
  *    slice directly from its log, in parallel, with zero row
  *    conversion (the log already holds the engine's unsafe format).
  *
  * Contract (both kinds): offsets only advance; `commit` (ack) makes
  * everything below it un-servable — a replay of acked history is
  * REFUSED loudly, the property that distinguishes a queue from the
  * file source every other replay rides (Structured Streaming must
  * process each offset range exactly once from its own checkpointed
  * state, because the source cannot re-list the past). Un-acked ranges
  * MAY be re-fetched (a task retry) — exactly Kafka's consumer-seek
  * semantics within the retained log. A fully-acked shard log is
  * deleted: the physical drop.
  *
  * Single-JVM assumption (test double): readers resolve the broker by
  * name from the shared process. On a real cluster this lookup is the
  * Kafka consumer fetching (topic, partition, offset-range) from the
  * broker — the same law surface, different transport.
  */
object QueueBroker {
  final class Queue(val schema: StructType, it: Iterator[Row], val rowsPerBatch: Int)
      extends BrokerQueue {
    private var acked = 0L
    private var revealed = 0L
    // rows [acked, revealed) — the un-acked window, ≤ a few batches
    private val ring = scala.collection.mutable.ArrayDeque.empty[Row]

    /** One trigger's admission: reveal ≤ rowsPerBatch more rows (the
      * rate limit), returning the new high-water offset.
      */
    def pullMore(): Long = synchronized {
      var n = 0
      while (n < rowsPerBatch && it.hasNext) { ring.append(it.next()); n += 1 }
      revealed += n
      revealed
    }

    /** Serve [start, end) from the un-acked window. start < acked means
      * the engine asked for history the broker no longer has — refuse,
      * never silently serve wrong data.
      */
    def slice(start: Long, end: Long): Array[Row] = synchronized {
      require(start >= acked,
        s"queue cannot replay history: batch start $start precedes acked offset $acked")
      require(end <= revealed,
        s"batch end $end beyond revealed offset $revealed")
      // the ring is index-addressed: an un-acked window ≥ 2^31 rows
      // would wrap the Int narrowing below into silently-wrong slices
      // (r12 ADVICE) — fail loudly instead (a window that large means
      // acks stopped flowing, which is the real bug to surface)
      require(end - acked <= Int.MaxValue,
        s"un-acked window [${acked}, $end) exceeds 2^31 rows; acks are not flowing")
      ring.slice((start - acked).toInt, (end - acked).toInt).toArray
    }

    /** Commit: drop everything below `end` — the ack that makes history
      * physically unavailable.
      */
    def ack(end: Long): Unit = synchronized {
      while (acked < end && ring.nonEmpty) { ring.removeHead(); acked += 1 }
    }

    def ackedOffset: Long = synchronized(acked)

    override def nShards: Int = 1
    override def pullMoreVec(): Vector[Long] = Vector(pullMore())
    override def ackVec(end: Vector[Long]): Unit = ack(end.head)
    override def close(): Unit = ()
  }

  /** The queue surface the [[QueueMicroBatchStream]] drives — a vector
    * of per-shard offsets (length 1 for the legacy single queue).
    */
  sealed trait BrokerQueue {
    def schema: StructType
    def nShards: Int
    /** One trigger's admission across all shards: per-shard revealed
      * high-water offsets after revealing ≤ the per-shard rate limit.
      */
    def pullMoreVec(): Vector[Long]
    /** Commit the per-shard offsets: history below them becomes
      * un-servable (and, for log shards, eventually deleted).
      */
    def ackVec(end: Vector[Long]): Unit
    def close(): Unit
  }

  /** One shard of a [[LogQueue]]: a local log file of length-prefixed
    * UnsafeRow bytes plus three offsets — `acked` (committed, below it
    * is gone), `revealed` (admitted, the rate-limit frontier) and
    * `readPos` (the open stream's position). Admission is offset
    * arithmetic only; rows move executor-side in [[read]].
    */
  final class LogShard(val path: java.nio.file.Path, val total: Long, nFields: Int) {
    private var acked = 0L
    private var revealed = 0L
    private var readPos = 0L
    private var in: java.io.DataInputStream = null
    private var deleted = false

    def reveal(k: Int): Long = reveal(k, total)

    /** Reveal ≤ k more rows, never beyond `cap` (the drain-barrier
      * hook: a queue holding back terminal control records caps at
      * total − 1 until every shard's real rows are out).
      */
    def reveal(k: Int, cap: Long): Long = synchronized {
      revealed = math.min(math.max(cap, revealed), revealed + k)
      revealed
    }
    def revealedOffset: Long = synchronized(revealed)
    def ackedOffset: Long = synchronized(acked)

    /** Plan-time law check for [start, end): no replay of acked
      * history, no read beyond the revealed frontier.
      */
    def validate(start: Long, end: Long): Unit = synchronized {
      require(start >= acked,
        s"queue shard cannot replay history: batch start $start precedes acked offset $acked")
      require(end <= revealed,
        s"batch end $end beyond revealed offset $revealed")
    }

    private def open(): Unit = {
      in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(path), 1 << 20))
      readPos = 0L
    }

    private def skipTo(target: Long): Unit = {
      while (readPos < target) {
        val len = in.readInt()
        var left = len.toLong
        while (left > 0) {
          val k = in.skip(left)
          // skip() returns 0 at EOF rather than throwing — a truncated
          // or corrupt shard log must fail loudly (the fail-loud
          // contract above), never spin (r13 ADVICE)
          if (k <= 0)
            throw new java.io.EOFException(
              s"truncated shard log $path: $left bytes of row $readPos missing")
          left -= k
        }
        readPos += 1
      }
    }

    /** Serve [start, end) as UnsafeRows, executor-side. start ≥ readPos
      * streams forward; start < readPos (a task retry re-fetching an
      * un-acked range — Kafka's consumer seek) reopens the log and
      * skips, legal exactly down to `acked`. Bounded: a slice is at
      * most one micro-batch's per-shard admission.
      */
    def read(start: Long, end: Long): Array[UnsafeRow] = synchronized {
      validate(start, end)
      require(!deleted, s"shard log $path already dropped")
      if (in == null || start < readPos) { if (in != null) in.close(); open() }
      skipTo(start)
      val out = new Array[UnsafeRow]((end - start).toInt)
      var i = 0
      while (readPos < end) {
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        val row = new UnsafeRow(nFields)
        row.pointTo(buf, len)
        out(i) = row
        i += 1
        readPos += 1
      }
      out
    }

    /** Commit through `end`; once the whole log is acked the file is
      * DELETED — the physical drop (Kafka's retention at segment
      * granularity: this double keeps one segment per shard).
      */
    def ack(end: Long): Unit = synchronized {
      acked = math.max(acked, math.min(end, revealed))
      if (acked == total) drop()
    }

    def drop(): Unit = synchronized {
      if (in != null) { in.close(); in = null }
      if (!deleted) { java.nio.file.Files.deleteIfExists(path); deleted = true }
    }
  }

  /** N-sharded log queue: per-trigger admission reveals ≤
    * ceil(rowsPerBatch / nShards) rows on EACH shard (so a trigger
    * admits ≈ rowsPerBatch total, the `maxOffsetsPerTrigger` shape),
    * and each shard serves its slices executor-side from its own log.
    *
    * `holdLastUntilDrained` is the DRAIN BARRIER for terminal control
    * records (per-shard far-future sentinel rows that close a drained
    * watermarked aggregation): Spark's watermark is the GLOBAL MAX
    * event time minus delay — not Flink's min-across-partitions — so a
    * shard that exhausts early and reveals its sentinel would slam the
    * watermark past every other shard's in-flight rows (measured: the
    * second half of the corpus dropped as late). Under the barrier,
    * every shard's LAST row is withheld until all shards have revealed
    * total − 1; then the sentinels release together, after every real
    * row is already admitted.
    */
  final class LogQueue(val schema: StructType, shards: IndexedSeq[LogShard],
      val perShardBatch: Int, holdLastUntilDrained: Boolean = false) extends BrokerQueue {
    override def nShards: Int = shards.length
    override def pullMoreVec(): Vector[Long] =
      if (!holdLastUntilDrained) shards.map(_.reveal(perShardBatch)).toVector
      else {
        val allRealOut =
          shards.forall(s => s.revealedOffset >= math.max(0L, s.total - 1))
        shards.map(s => s.reveal(perShardBatch,
          if (allRealOut) s.total else math.max(0L, s.total - 1))).toVector
      }
    override def ackVec(end: Vector[Long]): Unit =
      shards.indices.foreach(i => shards(i).ack(end(i)))
    override def close(): Unit = shards.foreach(_.drop())
    def shard(i: Int): LogShard = shards(i)
  }

  private val queues = new java.util.concurrent.ConcurrentHashMap[String, BrokerQueue]()

  def register(name: String, schema: StructType, rowsPerBatch: Int,
      it: Iterator[Row]): Unit =
    queues.put(name, new Queue(schema, it, rowsPerBatch))

  /** Stage `df` into the broker as a [[LogQueue]] — the feed path that
    * never serializes a row through the driver. One log file per input
    * partition, written by the partition's own task (`foreachPartition`
    * over the executed plan's InternalRows, projected to UnsafeRow and
    * written length-prefixed); the caller shapes sharding and per-shard
    * order first (e.g. `repartition(n, key).sortWithinPartitions(ts)` —
    * Kafka's keyed partitioning + per-partition append order). A
    * `.count` sidecar per shard carries the row total back to the
    * driver; registration reads N sidecars, never data.
    */
  def stageShards(name: String, df: DataFrame, rowsPerBatch: Int,
      dir: java.nio.file.Path, holdLastUntilDrained: Boolean = false): Unit = {
    val nShards = writeShardLogs(df, dir.toString)
    registerStaged(name, df.schema, dir.toString, nShards, rowsPerBatch,
      holdLastUntilDrained)
  }

  /** The staging WRITE half of [[stageShards]]: one log file per input
    * partition, written by the partition's own task. Returns the shard
    * count. Split out so a caller can stage ONCE into a content-keyed
    * cache and [[registerStaged]] over (hard-linked copies of) the
    * logs on every replay — the ack-drop contract deletes served logs,
    * so the broker must never consume the cached inodes' names.
    */
  def writeShardLogs(df: DataFrame, dirStr: String): Int = {
    val schema = df.schema
    val rdd = df.queryExecution.toRdd
    rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val f = java.nio.file.Paths.get(dirStr, f"shard-$pid%05d.log")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(f), 1 << 20))
      val proj = UnsafeProjection.create(schema)
      val writeBuffer = new Array[Byte](1 << 16)
      var n = 0L
      while (it.hasNext) {
        val u = proj(it.next())
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, writeBuffer)
        n += 1
      }
      out.close()
      // sidecar written AFTER the log closes: its presence certifies a
      // complete shard (a retried task truncate-rewrites both)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dirStr, f"shard-$pid%05d.count"),
        n.toString.getBytes("UTF-8"))
    }
    rdd.getNumPartitions
  }

  /** The REGISTRATION half of [[stageShards]]: build the per-shard
    * offset state over already-staged logs and publish the queue.
    * Registration reads N sidecars, never data.
    */
  def registerStaged(name: String, schema: StructType, dirStr: String,
      nShards: Int, rowsPerBatch: Int, holdLastUntilDrained: Boolean): Unit = {
    val nFields = schema.length
    val shards = (0 until nShards).map { i =>
      val log = java.nio.file.Paths.get(dirStr, f"shard-$i%05d.log")
      val cnt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dirStr, f"shard-$i%05d.count")), "UTF-8").trim.toLong
      new LogShard(log, cnt, nFields)
    }
    // rowsPerBatch ≤ 0 = derive the rate limit from the staged totals
    // (⌈n/5⌉ capped at the 500 k q_stream_join slice target) — the
    // sidecars already carry n, so callers never pay a separate
    // corpus-scale count() just to size the trigger
    val effBatch =
      if (rowsPerBatch > 0) rowsPerBatch.toLong
      else {
        val n = shards.map(_.total).sum
        math.min(500000L, math.max(1L, (n + 4) / 5))
      }
    val perShard = math.max(1L, (effBatch + nShards - 1) / nShards).toInt
    queues.put(name, new LogQueue(schema, shards, perShard, holdLastUntilDrained))
  }

  def get(name: String): BrokerQueue = {
    val q = queues.get(name)
    require(q != null, s"no queue registered under '$name'")
    q
  }

  def remove(name: String): Unit = {
    val q = queues.remove(name)
    if (q != null) q.close()
  }
}

/** DataSource V2 MICRO-BATCH streaming source over a [[QueueBroker]]
  * queue: `spark.readStream.format(QueueSource.Name)
  * .option("queue", name).load()`.
  *
  * Every other streaming replay in the engine rides the file source,
  * which can always re-list its input directory; this source proves the
  * state machinery (watermarks, dedup state, checkpointed offsets)
  * against a source that CANNOT — offsets only advance, commits drop
  * data, and the rate limit (`rowsPerBatch` at registration) fixes the
  * micro-batch admission the way `maxOffsetsPerTrigger` does on Kafka.
  * The offset is a per-shard vector; each micro-batch plans ONE
  * InputPartition per shard (Kafka's partition↦task 1:1 mapping), so a
  * [[QueueBroker.LogQueue]] feed is read by all executors in parallel.
  */
class QueueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueBroker.get(options.get("queue")).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new QueueTable(schema, properties.get("queue"))

  override def supportsExternalMetadata(): Boolean = true
}

object QueueSource {
  val Name = "graft.sources.QueueSource"
}

final class QueueTable(tableSchema: StructType, queueName: String)
    extends Table with SupportsRead {
  override def name(): String = s"queue($queueName)"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def schema(): StructType = tableSchema

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def description(): String = s"queue scan of $queueName"
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new QueueMicroBatchStream(queueName, tableSchema)
    }
}

/** Per-shard offset vector — `[r0,r1,…]`; length 1 for the legacy
  * single queue. A Vector so equality is structural (Spark compares
  * offsets to decide whether a trigger has new data).
  */
final case class QueueOffset(v: Vector[Long]) extends Offset {
  override def json(): String = v.mkString("[", ",", "]")
}

object QueueOffset {
  def parse(json: String): QueueOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    QueueOffset(
      if (body.isEmpty) Vector.empty
      else body.split(",").iterator.map(_.trim.toLong).toVector)
  }
}

final class QueueMicroBatchStream(queueName: String, schema: StructType)
    extends MicroBatchStream {
  private def q = QueueBroker.get(queueName)

  override def initialOffset(): Offset = QueueOffset(Vector.fill(q.nShards)(0L))
  // each trigger admits ≤ the per-shard rate limit on every shard
  override def latestOffset(): Offset = QueueOffset(q.pullMoreVec())
  override def deserializeOffset(json: String): Offset = QueueOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[QueueOffset].v
    val e0 = end.asInstanceOf[QueueOffset].v
    q match {
      case lq: QueueBroker.LogQueue =>
        // one partition per shard: the slice descriptor ships (name,
        // shard, range) — a few dozen bytes; the rows move
        // executor-side in the reader, all shards in parallel
        (0 until lq.nShards).iterator
          .filter(i => e0(i) > s0(i))
          .map { i =>
            lq.shard(i).validate(s0(i), e0(i)) // plan-time law check
            QueueLogBatch(queueName, i, s0(i), e0(i)): InputPartition
          }
          .toArray
      case sq: QueueBroker.Queue =>
        if (e0.head <= s0.head) Array.empty
        else Array(QueueBatch(sq.slice(s0.head, e0.head)))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new QueueReaderFactory(schema)

  override def commit(end: Offset): Unit =
    q.ackVec(end.asInstanceOf[QueueOffset].v)

  override def stop(): Unit = ()
}

/** One micro-batch's rows for the legacy single queue, shipped inside
  * the partition descriptor — bounded by rowsPerBatch (a Kafka fetch's
  * shape), never corpus-sized.
  */
final case class QueueBatch(rows: Array[Row]) extends InputPartition

/** One shard's slice of one micro-batch for a [[QueueBroker.LogQueue]]:
  * a descriptor only — the reader task pulls the rows from the shard's
  * log itself (executor-side, parallel across shards).
  */
final case class QueueLogBatch(queue: String, shard: Int, start: Long, end: Long)
    extends InputPartition

final class QueueReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case QueueLogBatch(name, shard, start, end) =>
        // the log already holds the engine's wire format: serve the
        // UnsafeRows as-is, zero conversion in the hot path
        val rows = QueueBroker.get(name).asInstanceOf[QueueBroker.LogQueue]
          .shard(shard).read(start, end)
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      case QueueBatch(rows) =>
        new PartitionReader[InternalRow] {
          private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = conv(rows(i)).asInstanceOf[InternalRow]
          override def close(): Unit = ()
        }
    }
}
