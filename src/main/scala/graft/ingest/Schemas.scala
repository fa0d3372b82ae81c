package graft.ingest

import org.apache.spark.sql.types._

/** Canonical schema of the UK Land Registry "Price Paid complete" dump.
  *
  * Mirrors the reference's fixed 16-name positional column list
  * (`lib_land_registry_data/lib_dataframe.py:1-18`) and its all-string
  * read discipline (`main.py:207`, `dtype=str`). The CSV is headerless;
  * names are applied positionally after read (`main.py:217`).
  *
  * Scale note: an explicit schema avoids Spark's CSV inference pass — at
  * 100 TB an inference pre-scan would double the read. All columns string
  * at scan time; typing happens as a single projected cast afterwards,
  * which whole-stage codegen fuses into the scan.
  */
object PPComplete {

  /** Column order from `lib_dataframe.py:1-18` (reference, read-only). */
  val columns: Seq[String] = Seq(
    "transaction_unique_id",
    "price",
    "transaction_date",
    "postcode",
    "property_type",
    "new_tag",
    "lease",
    "primary_address_object_name",
    "secondary_address_object_name",
    "street",
    "locality",
    "town_city",
    "district",
    "county",
    "ppd_cat",
    "record_op"
  )

  /** All-string scan schema (reference `dtype=str`, `main.py:207`). */
  val rawSchema: StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))

  /** Post-ingest (typed) schema: `transaction_date` becomes a UTC
    * timestamp (`main.py:218-222`), `price` stays string at scan and is
    * typed by consumers — matching the reference, which loads price as
    * text through COPY and lets Postgres coerce (`lib_db.py:25`).
    */
  val typedSchema: StructType = StructType(rawSchema.map {
    case StructField("transaction_date", _, _, m) =>
      StructField("transaction_date", TimestampType, nullable = true, m)
    case f => f
  })

  /** Strict input datetime format (`main.py:218-222`): malformed input
    * must abort the run, never silently null (reference §1.6 semantics).
    */
  val dateTimeFormat = "yyyy-MM-dd HH:mm"
}

/** Run-provenance row — the reference's `pp_complete_metadata` table
  * (`lib_db.py:44-58`). Durations are stored as microseconds `Long`
  * instead of SQL INTERVAL (awkward in Parquet/DuckDB — SURVEY §7.4).
  */
case class RunMeta(
    auto_date: java.sql.Date,
    download_size_MB: Long,
    process_start_timestamp: java.sql.Timestamp,
    process_complete_timestamp: java.sql.Timestamp,
    process_duration_us: Long,
    download_duration_us: Long,
    read_duration_us: Long,
    datetime_convert_duration_us: Long,
    write_duration_us: Long,
    upload_duration_us: Long
)

object RunMeta {
  /** Column order for explicit-column-list sinks ([[CopySink]]). */
  val columns: Seq[String] = Seq(
    "auto_date", "download_size_MB", "process_start_timestamp",
    "process_complete_timestamp", "process_duration_us",
    "download_duration_us", "read_duration_us",
    "datetime_convert_duration_us", "write_duration_us",
    "upload_duration_us"
  )
}
