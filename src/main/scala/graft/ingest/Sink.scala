package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}

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
  * (reference op-11). True `COPY FROM STDIN` speed needs
  * `foreachPartition` + pgjdbc `CopyManager`, serializing each
  * partition as CSV exactly like the reference's chunk loop
  * (`main.py:234-243`) — per-partition instead of per-50k-rows. Not
  * executable in this environment (no database, no pgjdbc jar), so the
  * COPY body is left unimplemented; the surrounding dataflow is the
  * production shape.
  */
final case class JdbcSink(cfg: Config, table: String) extends Sink {
  def overwrite(df: DataFrame): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true") // TRUNCATE + reload, not DROP+CREATE
      .jdbc(cfg.jdbcUrl, table, cfg.jdbcProperties)

  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(cfg.jdbcUrl, table, cfg.jdbcProperties)

  /** COPY-speed path: one CopyManager stream per partition.
    * Requires org.postgresql:postgresql on the classpath.
    */
  def copyOverwrite(df: DataFrame): Unit = {
    val _ = df
    throw new UnsupportedOperationException(
      "COPY sink requires a live Postgres + pgjdbc; see scaladoc for the " +
        "foreachPartition + CopyManager implementation shape"
    )
  }
}
