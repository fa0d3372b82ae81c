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

  test("§1.5 semantics: quoted-empty '', bare \\N NULL, unquoted-empty NULL — both paths agree") {
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
    val viaFile = Ingest.readRaw(spark, f.toString).collect()
    for (rows <- Seq(viaSource, viaFile)) {
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("postcode") == "")   // quoted empty → ''
      assert(rows(0).getAs[String]("ppd_cat") == null)  // \N token → NULL
      assert(rows(0).getAs[String]("locality") == null) // unquoted empty → NULL
    }
    assert(viaSource.toSeq == viaFile.toSeq)
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
