package graft.ingest

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** op-10 COPY sink: the per-partition `COPY ... FROM STDIN` body
  * serialized with the reference's exact byte convention
  * (`main.py:194-251`: pandas to_csv QUOTE_MINIMAL feeding
  * `FORMAT csv, NULL '\N'`), exercised against a stream-capturing fake
  * in place of pgjdbc's CopyManager (no database in this environment).
  */
class CopySinkSpec extends SparkSpec {

  import CopySinkSpec._

  private def sink(table: String = "land_registry_simple.pp_complete_data",
                   cols: Seq[String] = Seq("a", "b", "c")) =
    CopySink(table, cols, () => new FakeTarget)

  test("copy statement matches the reference form") {
    val s = CopySink(
      "land_registry_simple.pp_complete_data",
      graft.ingest.PPComplete.columns,
      () => new FakeTarget
    )
    assert(s.copySql ==
      "COPY land_registry_simple.pp_complete_data (transaction_unique_id, " +
        "price, transaction_date, postcode, property_type, new_tag, lease, " +
        "primary_address_object_name, secondary_address_object_name, street, " +
        "locality, town_city, district, county, ppd_cat, record_op) " +
        "FROM STDIN WITH (FORMAT csv, NULL '\\N')")
  }

  test("overwrite = stage-and-promote: COPY to staging, one promote txn with TRUNCATE inside") {
    FakeTarget.reset()
    import spark.implicits._
    val df = Seq(("x", "y", "z")).toDF("a", "b", "c").coalesce(1)
    sink().overwrite(df)
    val t = "land_registry_simple.pp_complete_data"
    val ex = FakeTarget.executed.toArray.toSeq.map(_.toString)
    // each task creates, then truncates (retry idempotence), its own
    // LOAD-SCOPED staging table before the COPY
    val stg = s"${java.util.regex.Pattern.quote(t)}_stg_[0-9a-f]{12}_0"
    assert(ex.exists(_.matches(s"CREATE TABLE IF NOT EXISTS $stg \\(LIKE ${java.util.regex.Pattern.quote(t)}\\)")))
    assert(ex.count(_.matches(s"TRUNCATE TABLE $stg")) == 1)
    // the COPY streams into STAGING, never directly into the target
    assert(FakeTarget.payloads().map(_._1).forall(_.contains("_stg_")))
    assert(FakeTarget.payloads().map(_._2) == Seq("x,y,z\n"))
    // promote: the reference's single-txn TRUNCATE+load atomicity
    val begin = ex.indexOf("BEGIN")
    val commit = ex.indexOf("COMMIT")
    assert(begin >= 0 && commit > begin)
    val inTxn = ex.slice(begin + 1, commit)
    assert(inTxn.head == s"TRUNCATE TABLE $t")
    assert(inTxn.length == 2 &&
      inTxn(1).matches(s"INSERT INTO ${java.util.regex.Pattern.quote(t)} \\(a, b, c\\) SELECT a, b, c FROM $stg"))
    // staged tables are dropped after the load, success or failure
    assert(ex.drop(commit + 1).count(_.matches(s"DROP TABLE IF EXISTS $stg")) == 1)
  }

  test("append: no target TRUNCATE anywhere; promote txn only inserts") {
    FakeTarget.reset()
    import spark.implicits._
    val df = Seq(("x", "y", "z")).toDF("a", "b", "c").coalesce(1)
    sink().append(df)
    val ex = FakeTarget.executed.toArray.toSeq.map(_.toString)
    assert(!ex.contains("TRUNCATE TABLE land_registry_simple.pp_complete_data"))
    assert(ex.contains("BEGIN") && ex.contains("COMMIT"))
  }

  test("serialization: '' vs \\N, QUOTE_MINIMAL, timestamp normalization") {
    FakeTarget.reset()
    val rows = Seq(
      org.apache.spark.sql.Row("plain", "", null),
      org.apache.spark.sql.Row("has,comma", "has\"quote", "line\nbreak"),
      org.apache.spark.sql.Row("\\N", "end", "x") // a LITERAL backslash-N string
    )
    val schema = org.apache.spark.sql.types.StructType(
      Seq("a", "b", "c").map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))
    )
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema
    ).coalesce(1)
    sink().append(df)
    val payload = FakeTarget.payloads().map(_._2).mkString
    assert(payload.contains("plain,,\\N\n"))        // '' empty field; NULL → \N
    // QUOTE_MINIMAL: comma/quote/newline fields quoted, quotes doubled,
    // the embedded newline kept verbatim inside the quotes
    assert(payload.contains("\"has,comma\",\"has\"\"quote\",\"line\nbreak\"\n"))
    // NOTE: the literal string \N serializes unquoted and would load as
    // NULL — the same lossy corner the reference has (pandas to_csv
    // writes it bare too); §1.5 data never contains it.
    assert(payload.contains("\\N,end,x\n"))
  }

  test("timestamps serialize as the reference's normalized round-trip form") {
    FakeTarget.reset()
    import spark.implicits._
    val df = Seq("2024-02-01 02:58")
      .toDF("raw")
      .select(to_timestamp(col("raw"), "yyyy-MM-dd HH:mm").as("ts"), lit(7).as("n"))
      .coalesce(1)
    sink(cols = Seq("ts", "n")).append(df)
    assert(FakeTarget.payloads().map(_._2) == Seq("2024-02-01 02:58:00+00:00,7\n"))
  }

  test("sub-second timestamps serialize with pandas' 6-digit fractional form") {
    FakeTarget.reset()
    import spark.implicits._
    // millisecond-precision instant — the RunMeta process timestamps'
    // shape; pandas to_csv emits '.123000+00:00' for it
    val df = Seq(new java.sql.Timestamp(1706756280123L))
      .toDF("ts")
      .coalesce(1)
    sink(cols = Seq("ts")).append(df)
    assert(FakeTarget.payloads().map(_._2) == Seq("2024-02-01 02:58:00.123000+00:00\n"))
  }

  test("promote failure rolls back and still drops the staged tables") {
    FakeTarget.reset()
    FakeTarget.failOnInsert = true
    try {
      import spark.implicits._
      val df = Seq(("x", "y", "z")).toDF("a", "b", "c").coalesce(1)
      intercept[RuntimeException] { sink().append(df) }
      val ex = FakeTarget.executed.toArray.toSeq.map(_.toString)
      assert(ex.contains("ROLLBACK"), "failed promote txn must roll back")
      assert(!ex.contains("COMMIT"))
      assert(ex.exists(_.startsWith("DROP TABLE IF EXISTS")),
        "aborted load must not leak staged rows")
    } finally FakeTarget.failOnInsert = false
  }

  test("concurrent loads use disjoint load-scoped staging tables") {
    FakeTarget.reset()
    import spark.implicits._
    val df = Seq(("x", "y", "z")).toDF("a", "b", "c").coalesce(1)
    sink().append(df)
    sink().append(df)
    val stagingNames = FakeTarget.payloads().map(_._1)
      .map(sql => sql.split(" ")(1)) // COPY <table> (...
    assert(stagingNames.distinct.size == 2,
      s"two loads must stage into different tables: $stagingNames")
  }

  test("one COPY channel per non-empty partition") {
    FakeTarget.reset()
    import spark.implicits._
    val df = (1 to 8).map(i => (s"r$i", "v", "w")).toDF("a", "b", "c").repartition(4)
    sink().append(df)
    val ps = FakeTarget.payloads()
    assert(ps.size == 4)
    assert(ps.map(_._2).mkString.split("\n").length == 8)
    assert(ps.forall(_._1.startsWith("COPY land_registry_simple")))
  }

  test("ingest runs end-to-end through the COPY sink") {
    FakeTarget.reset()
    val url = "file://" + IngestSpecFixture.path
    val data = sink(table = "land_registry_simple.pp_complete_data",
      cols = PPComplete.columns)
    val meta = sink(table = "land_registry_simple.pp_complete_metadata",
      cols = RunMeta.columns)
    val r = Ingest.run(spark, url, data, meta)
    assert(r.rowCount == 200)
    val rows = FakeTarget.payloads()
      .filter(_._1.contains("pp_complete_data"))
      .map(_._2).mkString.split("\n").filter(_.nonEmpty)
    assert(rows.length == 200)
    // §1.6 normalization reached the wire format
    assert(rows.forall(_.matches(".*\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\+00:00.*")))
    assert(FakeTarget.executed.toArray.toSeq
      .contains("TRUNCATE TABLE land_registry_simple.pp_complete_data"))
  }
}

object CopySinkSpec {
  /** Capturing fake CopyTarget — static queues because foreachPartition
    * closures deserialize on (local-mode) executors.
    */
  final class FakeTarget extends CopyTarget {
    def execute(sql: String): Unit = {
      FakeTarget.executed.add(sql)
      if (FakeTarget.failOnInsert && sql.startsWith("INSERT INTO"))
        throw new RuntimeException("injected promote failure")
    }
    def copyIn(sql: String, lines: Iterator[String]): Long = {
      val payload = lines.mkString
      FakeTarget.copied.add(sql -> payload)
      payload.count(_ == '\n').toLong
    }
    def close(): Unit = ()
  }

  object FakeTarget {
    val executed = new ConcurrentLinkedQueue[String]()
    val copied = new ConcurrentLinkedQueue[(String, String)]()
    @volatile var failOnInsert: Boolean = false
    def reset(): Unit = { executed.clear(); copied.clear(); failOnInsert = false }
    def payloads(): Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      copied.asScala.toSeq.sortBy(_._2)
    }
  }
}
