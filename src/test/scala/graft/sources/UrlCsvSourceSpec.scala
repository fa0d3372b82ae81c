package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.ingest.Ingest

/** DSv2 URL source == the file-based CSV read path, byte for byte. */
class UrlCsvSourceSpec extends SparkSpec {

  private val fixture = "/root/repo/src/test/resources/pp_complete.csv"

  test("reads the fixture over file:// identically to Ingest.readRaw") {
    val viaSource = spark.read
      .format(UrlCsvSource.Name)
      .option("url", s"file://$fixture")
      .load()
      .orderBy("transaction_unique_id")
      .collect()
    val viaFile = Ingest
      .readRaw(spark, fixture)
      .orderBy("transaction_unique_id")
      .collect()
    assert(viaSource.length == 200)
    assert(viaSource.toSeq == viaFile.toSeq)
  }

  test("§1.5 semantics: quoted/unquoted empty '', bare \\N the only NULL (DSv2 exact)") {
    val f = Files.createTempFile("urlcsv-", ".csv")
    // locality (col 11) is UNQUOTED empty; postcode/secondary quoted empty
    Files.writeString(
      f,
      Seq(
        "\"{1}\",\"1\",\"2024-02-01 02:58\",\"\",\"D\",\"Y\",\"F\",\"1\",\"\",\"S\",,\"T\",\"D\",\"C\",\\N,\"A\""
      ).mkString("\n")
    )
    val viaSource = spark.read
      .format(UrlCsvSource.Name)
      .option("url", s"file://$f")
      .load()
      .collect()
    assert(viaSource.length == 1)
    // the DSv2 source carries the reference's exact discipline
    // (`main.py:208`): EVERY empty field is '', the bare token \N is
    // the ONLY null
    assert(viaSource(0).getAs[String]("postcode") == "")  // quoted empty → ''
    assert(viaSource(0).getAs[String]("locality") == "")  // unquoted empty → ''
    assert(viaSource(0).getAs[String]("ppd_cat") == null) // \N token → NULL
    // builtin CSV path: unquoted-empty is indistinguishable from null at
    // parser level — the documented residual divergence (Ingest.readRaw)
    val viaFile = Ingest.readRaw(spark, f.toString).collect()
    assert(viaFile(0).getAs[String]("postcode") == "")
    assert(viaFile(0).getAs[String]("locality") == null)
    assert(viaFile(0).getAs[String]("ppd_cat") == null)
  }

  test("column pruning: a 2-column projection reaches the custom scan's ReadSchema") {
    val df = spark.read
      .format(UrlCsvSource.Name)
      .option("url", s"file://$fixture")
      .load()
      .select("transaction_unique_id", "price")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    // the same standard QueriesPlanSpec pins for the parquet path: the
    // scan itself reads 2 columns, not all 16
    assert(p.contains("ReadSchema: struct<transaction_unique_id:string,price:string>"), p)
    assert(df.queryExecution.executedPlan.toString
      .contains("[transaction_unique_id#"), "scan output not pruned to 2 columns")
    assert(df.count() == 200)
    assert(df.collect().forall(_.length == 2))
  }

  test("filter pushdown: §1.5-aware predicates drop rows inside the reader") {
    val base = spark.read
      .format(UrlCsvSource.Name)
      .option("url", s"file://$fixture")
      .load()
    val eq = base.where("property_type = 'D'").select("transaction_unique_id", "property_type")
    val pEq = eq.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(pEq.contains("EqualTo(property_type,D)") && pEq.contains("IsNotNull(property_type)"), pEq)
    // the filter is fully absorbed — no post-scan Filter node remains
    assert(!eq.queryExecution.executedPlan.toString.contains("Filter "), pEq)
    // results agree with the unpushed evaluation
    val expected = Ingest.readRaw(spark, fixture)
      .where("property_type = 'D'").count()
    assert(eq.count() == expected && expected > 0)
    // IsNull must match the \N token (null AFTER §1.5 normalization)
    val nulls = base.where("ppd_cat IS NULL")
    val expNulls = Ingest.readRaw(spark, fixture).where("ppd_cat IS NULL").count()
    assert(nulls.count() == expNulls)
    // non-string-pushable predicates stay post-scan and stay correct
    val gt = base.where("price > '0'")
    assert(gt.count() == Ingest.readRaw(spark, fixture).where("price > '0'").count())
  }

  test("multiple urls become multiple partitions") {
    val df = spark.read
      .format(UrlCsvSource.Name)
      .option("urls", s"file://$fixture,file://$fixture")
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 400)
  }
}
