package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. Small parallelism: unit-test scale
  * (sf0.001) needs no fan-out, and one JVM-wide session keeps `sbt test`
  * fast. Same configs as the driver mains (UTC, nanosAsLong).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed Aggregators (TopK) degrade badly on the 128-group sort-based
      // fallback; plenty of memory for object hash aggregation here
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
