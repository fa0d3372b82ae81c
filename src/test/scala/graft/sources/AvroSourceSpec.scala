package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Laws for the engine's own Avro container source/sink
  * ([[AvroIo]]/[[AvroSource]]): type-map round trips beyond what the
  * declared q_avro_roundtrip query exercises (nulls, date, binary,
  * int/float/boolean), schema self-description, write fan-out, and
  * reader-side column pruning.
  */
class AvroSourceSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("avro-spec-").toString
    AvroIo.write(df, dir)
    spark.read.format(AvroSource.Name).option("path", dir).load()
  }

  test("full type map round-trips bit-exact including nulls (long/int/double/float/boolean/string/binary/ts/date)") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "hej", Array[Byte](1, 2, 3),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789123"),
        java.sql.Date.valueOf("2024-03-01")),
      Row(null, null, null, null, null, null, null, null, null),
      Row(Long.MinValue, Int.MaxValue, Double.MinPositiveValue, Float.NaN, false,
        "", Array.emptyByteArray,
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1970-01-01")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val back = roundTrip(df)
    assert(back.schema == schema, s"schema drifted: ${back.schema} vs $schema")
    // canonicalize: byte arrays to seqs, NaN to a token (NaN != NaN
    // would fail set equality on a correct round trip)
    def canon(r: Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte]          => b.toSeq
      case f: Float if f.isNaN     => "float-nan"
      case d: Double if d.isNaN    => "double-nan"
      case x                       => x
    }
    val a = df.collect().map(canon).toSet
    val b = back.collect().map(canon).toSet
    assert(a == b, s"round trip drifted:\n$a\nvs\n$b")
  }

  test("write fans out one container per partition; scan plans one partition per container") {
    val dir = java.nio.file.Files.createTempDirectory("avro-fan-").toString
    AvroIo.write(spark.range(0, 100).select(col("id")).repartition(5), dir)
    val files = AvroIo.listAvro(dir)
    assert(files.size == 5, s"expected 5 containers, got ${files.map(_.getName)}")
    val back = spark.read.format(AvroSource.Name).option("path", dir).load()
    assert(back.rdd.getNumPartitions == 5)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 100L).sum)
  }

  test("schema is self-describing: inferred read without an explicit schema matches the writer frame") {
    val back = roundTrip(graft.ops.Tables.events(spark, sf0001).limit(50))
    assert(back.schema.fieldNames.toSeq ==
      graft.ops.Tables.events(spark, sf0001).schema.fieldNames.toSeq)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.count() == 50)
  }

  test("column pruning reaches the reader: ReadSchema in the scan description shrinks to the projection") {
    val dir = java.nio.file.Files.createTempDirectory("avro-prune-").toString
    AvroIo.write(graft.ops.Tables.events(spark, sf0001).limit(20), dir)
    val pruned = spark.read.format(AvroSource.Name).option("path", dir).load()
      .select("event_id", "value")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("ReadSchema: struct<event_id:bigint,value:double>"),
      s"pruned projection did not reach the scan:\n$desc")
    // and the pruned read returns the right values
    val full = spark.read.format(AvroSource.Name).option("path", dir).load()
      .select("event_id", "value").collect().toSet
    assert(pruned.collect().toSet == full)
  }
}
