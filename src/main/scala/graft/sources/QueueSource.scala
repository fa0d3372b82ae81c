package graft.sources

import java.util
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
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
  * Memory is bounded by construction, never corpus-sized: the broker
  * holds ONLY the un-acked window — `pullMore` admits at most
  * `rowsPerBatch` rows per trigger from a LAZY iterator (the declared
  * query feeds `toLocalIterator`, which streams one partition at a
  * time), and [[Queue.ack]] physically drops every committed row. A
  * replay of acked history is REFUSED loudly ([[Queue.slice]]) — the
  * property that distinguishes a queue from the file source every other
  * replay rides: Structured Streaming must process each offset range
  * exactly once from its own checkpointed state, because the source
  * cannot re-list the past.
  */
object QueueBroker {
  final class Queue(val schema: StructType, it: Iterator[Row], val rowsPerBatch: Int) {
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
      ring.slice((start - acked).toInt, (end - acked).toInt).toArray
    }

    /** Commit: drop everything below `end` — the ack that makes history
      * physically unavailable.
      */
    def ack(end: Long): Unit = synchronized {
      while (acked < end && ring.nonEmpty) { ring.removeHead(); acked += 1 }
    }

    def ackedOffset: Long = synchronized(acked)
  }

  private val queues = new java.util.concurrent.ConcurrentHashMap[String, Queue]()

  def register(name: String, schema: StructType, rowsPerBatch: Int,
      it: Iterator[Row]): Unit =
    queues.put(name, new Queue(schema, it, rowsPerBatch))

  def get(name: String): Queue = {
    val q = queues.get(name)
    require(q != null, s"no queue registered under '$name'")
    q
  }

  def remove(name: String): Unit = queues.remove(name)
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
  * One InputPartition per micro-batch (queue order is the delivery
  * order; the stateful operator downstream shuffles by key anyway —
  * a partitioned broker would map partitions 1:1 here like Kafka's).
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

final case class QueueOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class QueueMicroBatchStream(queueName: String, schema: StructType)
    extends MicroBatchStream {
  private def q = QueueBroker.get(queueName)

  override def initialOffset(): Offset = QueueOffset(0L)
  // each trigger admits ≤ rowsPerBatch more rows — the rate limit
  override def latestOffset(): Offset = QueueOffset(q.pullMore())
  override def deserializeOffset(json: String): Offset = QueueOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[QueueOffset].n
    val e0 = end.asInstanceOf[QueueOffset].n
    if (e0 <= s0) Array.empty
    else Array(QueueBatch(q.slice(s0, e0)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new QueueReaderFactory(schema)

  override def commit(end: Offset): Unit =
    q.ack(end.asInstanceOf[QueueOffset].n)

  override def stop(): Unit = ()
}

/** One micro-batch's rows, shipped inside the partition descriptor —
  * bounded by rowsPerBatch (a Kafka fetch's shape), never corpus-sized.
  */
final case class QueueBatch(rows: Array[Row]) extends InputPartition

final class QueueReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[QueueBatch].rows
    new PartitionReader[InternalRow] {
      private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = conv(rows(i)).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
