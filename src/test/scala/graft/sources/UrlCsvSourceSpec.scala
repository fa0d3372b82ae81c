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

  test("multiple urls become multiple partitions") {
    val df = spark.read
      .format(UrlCsvSource.Name)
      .option("urls", s"file://$fixture,file://$fixture")
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 400)
  }
}
