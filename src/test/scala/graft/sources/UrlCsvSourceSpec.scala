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

  test("§1.5 semantics: quoted-empty is '', bare \\N is NULL") {
    val f = Files.createTempFile("urlcsv-", ".csv")
    Files.writeString(
      f,
      Seq(
        "\"{1}\",\"1\",\"2024-02-01 02:58\",\"\",\"D\",\"Y\",\"F\",\"1\",\"\",\"S\",\"\",\"T\",\"D\",\"C\",\\N,\"A\""
      ).mkString("\n")
    )
    val rows = spark.read
      .format(UrlCsvSource.Name)
      .option("url", s"file://$f")
      .load()
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("postcode") == "")   // quoted empty → ''
    assert(rows(0).getAs[String]("ppd_cat") == null)  // \N token → NULL
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
