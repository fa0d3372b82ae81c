package graft.ingest

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType, TimestampType}

/** WIRE-PROOF of the COPY sink (SURVEY op-10, the round-4 carryover):
  * the full stage-and-promote protocol run against a LIVE PostgreSQL
  * through [[PsqlCopyTarget]] — DDL, per-partition staging COPY,
  * single-transaction promote, §1.5 ''-vs-NULL discipline, and the
  * timestamp round trip, all parsed by the real server.
  *
  * ENV-GATED: the spec bootstraps its own throwaway cluster from the
  * installed postgres binaries (initdb + pg_ctl on a private unix
  * socket, no TCP — it can never collide with a real server) and
  * cancels, not fails, when the binaries are absent. Under root it
  * drops privileges to a dedicated system user, since postgres refuses
  * to run as root.
  */
class CopyWireSpec extends SparkSpec {

  import scala.sys.process._

  private val pgBin: Option[String] =
    Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
      "/usr/lib/postgresql/17/bin", "/usr/local/pgsql/bin")
      .find(d => new File(d, "initdb").exists && new File(d, "pg_ctl").exists)

  private def quiet = ProcessLogger(_ => (), _ => ())

  test("stage-and-promote COPY against a live PostgreSQL (env-gated)") {
    assume(pgBin.nonEmpty, "postgres server binaries not installed")
    assume(Seq("sh", "-c", "command -v psql >/dev/null").! == 0, "psql not installed")
    val bin = pgBin.get
    val root = java.nio.file.Files.createTempDirectory("graft-pg-wire-").toFile
    val sock = root.getAbsolutePath
    val isRoot = Seq("sh", "-c", "[ \"$(id -u)\" = 0 ]").! == 0
    val pgUser = if (isRoot) "graftpg" else System.getProperty("user.name")
    // postgres refuses root; under root, run the server as a system user
    def pg(cmd: String): Int =
      if (isRoot) Seq("su", "-s", "/bin/sh", pgUser, "-c", cmd).!(quiet)
      else Seq("sh", "-c", cmd).!(quiet)
    try {
      if (isRoot) {
        Seq("sh", "-c", s"id -u $pgUser >/dev/null 2>&1 || useradd -r $pgUser").!(quiet)
        assume(Seq("chown", "-R", pgUser, sock).!(quiet) == 0, "cannot chown pg dir")
      }
      assume(pg(s"$bin/initdb -D $sock/data -E UTF8 --no-locale -U $pgUser >/dev/null 2>&1") == 0,
        "initdb failed")
      assume(pg(s"""$bin/pg_ctl -D $sock/data -l $sock/log -o "-k $sock -c listen_addresses=''" start >/dev/null 2>&1""") == 0,
        "pg_ctl start failed")
      try runProtocol(Seq("-h", sock, "-U", pgUser, "-d", "postgres"))
      finally pg(s"$bin/pg_ctl -D $sock/data stop -m immediate >/dev/null 2>&1")
    } finally Seq("sh", "-c", s"rm -rf '$sock'").!(quiet)
  }

  /** The actual protocol proof, given psql connection args. */
  private def runProtocol(args: Seq[String]): Unit = {
    def target() = new PsqlCopyTarget(args)

    // DDL through the adapter itself (reference op-17's create path)
    val ddl = target()
    try {
      ddl.execute("CREATE SCHEMA land_registry")
      ddl.execute(
        "CREATE TABLE land_registry.pp (id integer, txt text, note text, ts timestamptz)")
    } finally ddl.close()

    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("txt", StringType),
      StructField("note", StringType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(Int.box(1), "plain", "", new java.sql.Timestamp(1706756280000L)), // 02:58:00Z
      Row(Int.box(2), "has,comma", "has\"quote", new java.sql.Timestamp(1706756280123L)),
      Row(Int.box(3), "line\nbreak", null, new java.sql.Timestamp(1706756281000L)),
      Row(Int.box(4), "end", "x", null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema
    ).repartition(3) // multi-partition: several staging tables, one promote txn
    val sink = CopySink("land_registry.pp", Seq("id", "txt", "note", "ts"), () => target())

    // overwrite, then overwrite again (idempotent full refresh), then append
    sink.overwrite(df)
    sink.overwrite(df)
    sink.append(df)

    // read-back goes through a one-shot psql -c (the adapter redirects
    // its stdout to a file; queries want it captured)
    def q(sql: String): String = {
      val out = new StringBuilder
      val cmd = Seq("psql", "-X", "-A", "-t") ++ args ++ Seq("-c", sql)
      val code = cmd.!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      assert(code == 0, s"query failed: $sql")
      out.toString
    }

    // row counts: 4 from the refresh + 4 appended
    assert(q("SELECT count(*) FROM land_registry.pp").trim == "8")

    // §1.5 discipline survived the wire: '' is a VALUE, \N is NULL
    assert(q("SELECT count(*) FROM land_registry.pp WHERE note = ''").trim == "2")
    assert(q("SELECT count(*) FROM land_registry.pp WHERE note IS NULL").trim == "2")
    assert(q("SELECT count(*) FROM land_registry.pp WHERE ts IS NULL").trim == "2")

    // QUOTE_MINIMAL fields parsed back to their exact values
    assert(q("SELECT txt FROM land_registry.pp WHERE id = 2 LIMIT 1").trim == "has,comma")
    assert(q("SELECT note FROM land_registry.pp WHERE id = 2 LIMIT 1").trim == "has\"quote")
    assert(q("SELECT count(*) FROM land_registry.pp WHERE txt = E'line\\nbreak'").trim == "2")

    // timestamp round trip incl. the sub-second pandas form, read back
    // in UTC as epoch micros (engine-independent form)
    assert(q("SELECT count(*) FROM land_registry.pp " +
      "WHERE extract(epoch FROM ts) = 1706756280.123").trim == "2")
    assert(q("SELECT count(*) FROM land_registry.pp " +
      "WHERE ts = TIMESTAMPTZ '2024-02-01 02:58:00+00'").trim == "2")

    // no staging tables survive the loads
    assert(q("SELECT count(*) FROM information_schema.tables " +
      "WHERE table_name LIKE 'pp_stg%'").trim == "0")

    // promote atomicity on the wire: a mid-transaction failure (insert
    // into a dropped target) leaves the committed table untouched
    val bad = CopySink("land_registry.gone", Seq("id"), () => target())
    val one = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(Row(Int.box(9)))).asJava),
      StructType(Seq(StructField("id", IntegerType)))).coalesce(1)
    intercept[Exception] { bad.overwrite(one) }
    assert(q("SELECT count(*) FROM land_registry.pp").trim == "8",
      "failed load must not disturb committed data")
  }
}
