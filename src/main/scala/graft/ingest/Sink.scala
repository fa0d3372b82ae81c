package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** Sink abstraction (SURVEY §7.1): isolates the reference's two write
  * targets — the TRUNCATE+COPY full refresh of `pp_complete_data`
  * (ops 10-11, `main.py:194-251`) and the append-only metadata insert
  * (op-12, `main.py:274-295`) — so a JDBC/COPY implementation can drop
  * in where Parquet stands in for Postgres.
  */
trait Sink {
  /** Full-refresh write (reference: TRUNCATE + COPY in one txn). */
  def overwrite(df: DataFrame): Unit

  /** Append write (reference: single-row ORM insert). */
  def append(df: DataFrame): Unit
}

/** Parquet sink — the engine's native store (object storage at scale).
  * `Overwrite` is the TRUNCATE+reload equivalent: atomic swap of the
  * directory contents, partition-parallel write.
  */
final case class ParquetSink(path: String) extends Sink {
  def overwrite(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
}

/** JDBC sink shape for real-Postgres parity. Plain JDBC batching for
  * appends; the full refresh uses the writer's `truncate` option
  * (reference op-11). For true `COPY FROM STDIN` speed use [[CopySink]].
  */
final case class JdbcSink(cfg: Config, table: String) extends Sink {
  def overwrite(df: DataFrame): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true") // TRUNCATE + reload, not DROP+CREATE
      .jdbc(cfg.jdbcUrl, table, cfg.jdbcProperties)

  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(cfg.jdbcUrl, table, cfg.jdbcProperties)
}

/** One executor-side COPY channel. The pgjdbc adapter is
  * `new CopyManager(conn).copyIn(sql, reader)` behind this trait (the
  * jar isn't on this classpath, and specs inject a capturing fake).
  * The factory, not the connection, is shipped to executors — a
  * connection is opened per partition, like the reference opens one
  * COPY per run (`main.py:194-200`) but partition-parallel.
  */
trait CopyTarget extends Serializable {
  /** Driver-side DDL/utility statement (TRUNCATE). */
  def execute(sql: String): Unit

  /** Stream CSV lines into `COPY ... FROM STDIN`; returns rows written. */
  def copyIn(sql: String, lines: Iterator[String]): Long

  def close(): Unit
}

/** The reference's CSV-for-COPY byte convention (`main.py:234-243`:
  * pandas `to_csv(index=False, header=False)` feeding
  * `COPY ... WITH (FORMAT csv, NULL '\N')`):
  *  - QUOTE_MINIMAL: a field is quoted only if it contains a comma,
  *    quote, CR or LF; inner quotes are doubled;
  *  - empty string → empty unquoted field (loads as '', §1.5 — only
  *    the bare token `\N` is NULL);
  *  - SQL NULL → `\N`;
  *  - timestamps → `yyyy-MM-dd HH:mm:ss+00:00` (the §1.6 normalized
  *    round-trip form pandas emits for tz-aware UTC datetimes);
  *  - `\n` line terminator.
  */
object CopyFormat {
  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss'+00:00'")
    .withZone(java.time.ZoneOffset.UTC)

  private def quoteMinimal(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def field(v: Any): String = v match {
    case null                    => "\\N"
    case ts: java.sql.Timestamp  => tsFmt.format(ts.toInstant)
    case other                   => quoteMinimal(other.toString)
  }

  def line(r: Row): String =
    (0 until r.length).map(i => field(r.get(i))).mkString(",") + "\n"

  def lines(rows: Iterator[Row]): Iterator[String] = rows.map(line)
}

/** COPY-speed sink (ops 10-11 at real-Postgres parity): TRUNCATE on the
  * driver, then one `COPY ... FROM STDIN` stream per partition with
  * [[CopyFormat]] serialization — the reference's chunk loop
  * (`main.py:194-251`) with partitions in place of 50k-row chunks.
  *
  * Transactionality differs by necessity: the reference runs TRUNCATE +
  * every chunk in ONE transaction; partition-parallel COPYs are one
  * transaction each. At scale the atomic equivalent is COPY into a
  * staging table and swap (ALTER TABLE RENAME) on success.
  */
final case class CopySink(
    qualifiedTable: String,
    columns: Seq[String],
    connect: () => CopyTarget
) extends Sink {

  def copySql: String =
    s"COPY $qualifiedTable (${columns.mkString(", ")}) " +
      "FROM STDIN WITH (FORMAT csv, NULL '\\N')"

  def overwrite(df: DataFrame): Unit = {
    val c = connect()
    try c.execute(s"TRUNCATE TABLE $qualifiedTable")
    finally c.close()
    append(df)
  }

  def append(df: DataFrame): Unit = {
    val sql = copySql
    val mk = connect // ship the factory, not a connection
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = mk()
        try { c.copyIn(sql, CopyFormat.lines(it)); () }
        finally c.close()
      }
    }
  }
}
