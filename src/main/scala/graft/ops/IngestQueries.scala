package graft.ops

import org.apache.spark.sql.functions._
import graft.ingest.{Ingest, PPComplete}

/** E9 — the reference pipeline itself as declared queries. The flagship
  * reads the committed pp-complete-shaped fixture (FIXTURES.md §F2) with
  * the reference's exact CSV semantics (§1.5/§1.6) and types the
  * datetime; the DuckDB oracle re-reads the same file.
  */
object IngestQueries {

  val fixturePath = "/root/repo/src/test/resources/pp_complete.csv"

  /** Headerless all-string scan → positional names → strict timestamp.
    * Empty fields stay '' (never NULL); `\N` is the only NULL token.
    */
  val qIngestPp = Q(
    "q_ingest_pp",
    (s, _) =>
      Ingest
        .typed(Ingest.readRaw(s, fixturePath))
        .orderBy("transaction_unique_id"),
    Some {
      val renames = PPComplete.columns.zipWithIndex.map {
        case ("transaction_date", i) =>
          f"CAST(strptime(column$i%02d, '%%Y-%%m-%%d %%H:%%M') AS TIMESTAMP) AS transaction_date"
        case (name, i) => f"column$i%02d AS $name"
      }
      s"""SELECT ${renames.mkString(", ")}
          FROM read_csv('$fixturePath', header=false, all_varchar=true, nullstr='\\N')
          ORDER BY transaction_unique_id"""
    }
  )

  /** auto_date over the fixture: ops 7+8 end-to-end (max ts → date). */
  val qIngestAutoDate = Q(
    "q_ingest_auto_date",
    (s, _) =>
      Ingest
        .typed(Ingest.readRaw(s, fixturePath))
        .agg(max(col("transaction_date")).cast("date").as("auto_date")),
    Some(s"""SELECT CAST(max(CAST(strptime(column02, '%Y-%m-%d %H:%M') AS TIMESTAMP)) AS DATE) AS auto_date
             FROM read_csv('$fixturePath', header=false, all_varchar=true, nullstr='\\N')""")
  )

  /** The same flagship ingest through the DSv2 URL source (op-1 as a
    * real Spark source, `graft.sources.UrlCsvSource`) — the shared
    * oracle proves the source's CSV/NULL semantics match the file path.
    */
  val qUrlSource = Q(
    "q_url_source",
    (s, _) =>
      Ingest
        .typed(
          s.read
            .format(graft.sources.UrlCsvSource.Name)
            .option("url", s"file://$fixturePath")
            .load()
        )
        .orderBy("transaction_unique_id"),
    qIngestPp.oracle
  )

  val all: Seq[Q] = Seq(qIngestPp, qIngestAutoDate, qUrlSource)
}
