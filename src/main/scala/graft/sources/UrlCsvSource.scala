package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.ingest.PPComplete

/** DataSource V2 batch source for the reference's op-1 (HTTP download,
  * `main.py:135-171`) as a REAL Spark source instead of a driver-side
  * fetch: `spark.read.format("graft.sources.UrlCsvSource")
  * .option("url", "https://…/pp-complete.txt").load()`.
  *
  * Reads a headerless CSV from any `http(s)://` or `file://` URL with
  * the reference's exact NULL discipline (§1.5: quoted-empty stays '',
  * the bare token `\N` is the only NULL) straight into the 16-column
  * all-string pp-complete schema. Unlike the driver-side
  * `Ingest.fetchToLocal` + `spark.read.csv` two-step, the transfer
  * happens inside an executor task.
  *
  * Scale notes: a single URL is one InputPartition — a remote CSV
  * stream has no split points (no range requests assumed, and quoted
  * CSV cannot be split blindly anyway). The scale path for 100 TB is
  * many URLs = many partitions (`urls` option, one partition each),
  * which is exactly how bulk HTTP corpora (e.g. web-crawl dumps) ship.
  * Retry wraps the whole task (Spark re-schedules failed tasks —
  * op-2's retry loop becomes the scheduler's).
  */
class UrlCsvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PPComplete.rawSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val urls = UrlCsvSource.urlsFrom(properties)
    new UrlCsvTable(schema, urls)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object UrlCsvSource {
  val Name = "graft.sources.UrlCsvSource"

  def urlsFrom(properties: util.Map[String, String]): Seq[String] = {
    val single = Option(properties.get("url")).toSeq
    val multi = Option(properties.get("urls")).toSeq.flatMap(_.split(',').map(_.trim)).filter(_.nonEmpty)
    val all = single ++ multi
    require(all.nonEmpty, "UrlCsvSource requires option 'url' or 'urls'")
    all
  }
}

final class UrlCsvTable(tableSchema: StructType, urls: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"url_csv(${urls.mkString(",")})"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def schema(): StructType = tableSchema

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        urls.map(u => UrlPartition(u): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new UrlCsvReaderFactory(tableSchema.length)
    }
}

final case class UrlPartition(url: String) extends InputPartition

final class UrlCsvReaderFactory(nCols: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UrlCsvReader(partition.asInstanceOf[UrlPartition].url, nCols)
}

/** Streaming CSV reader over one URL — runs INSIDE the executor task.
  * Univocity (Spark's own bundled CSV parser) handles quoting; the §1.5
  * discipline is applied per field: null ⇔ the unquoted token `\N`,
  * everything else (including quoted empty) is the literal string.
  */
final class UrlCsvReader(url: String, nCols: Int) extends PartitionReader[InternalRow] {
  import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}

  private val in = {
    // Bounded connect/read timeouts (reference op-1/2 downloads are
    // bounded attempts, `main.py:93-132`): a stalled server FAILS the
    // task so Spark's scheduler retry — the distributed analogue of the
    // reference's retry loop — actually triggers, instead of hanging
    // the executor forever.
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(60000)
    new java.io.BufferedInputStream(
      conn.getInputStream, 8 * 1024 * 1024 // op-1's 8 MiB chunks
    )
  }
  private val parser: CsvParser = {
    val s = new CsvParserSettings
    s.setMaxColumns(nCols + 8)
    // Univocity's null/empty settings SUBSTITUTE values for missing
    // fields (they do not recognize tokens). Reference §1.5 semantics
    // (`main.py:208`): QUOTED empty → '' (setEmptyValue), UNQUOTED
    // empty → '' too (setNullValue — univocity's native null is the
    // unquoted-empty field), and the bare token `\N` is the ONLY null
    // (recognized in get()). This is exactly pandas
    // `read_csv(dtype=str, keep_default_na=False, na_values=['\N'])`,
    // and goes BEYOND the builtin-CSV ingest path, whose parser cannot
    // express unquoted-empty ≠ null (documented in Ingest.readRaw).
    s.setEmptyValue("")
    s.setNullValue("")
    // match Spark's CSV defaults: unquoted whitespace is significant
    s.setIgnoreLeadingWhitespaces(false)
    s.setIgnoreTrailingWhitespaces(false)
    val p = new CsvParser(s)
    p.beginParsing(new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    p
  }
  private var row: Array[String] = _

  override def next(): Boolean = {
    row = parser.parseNext()
    row != null
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](nCols)
    var i = 0
    while (i < nCols) {
      // §1.5: the literal token \N is the ONLY null; '' (quoted or
      // unquoted — both arrive as "" via the parser settings) stays ''.
      // row(i) == null survives only for short rows (missing trailing
      // columns), which are genuinely absent → null.
      vals(i) =
        if (i >= row.length || row(i) == null || row(i) == "\\N") null
        else UTF8String.fromString(row(i))
      i += 1
    }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  override def close(): Unit = {
    parser.stopParsing()
    in.close()
  }
}
