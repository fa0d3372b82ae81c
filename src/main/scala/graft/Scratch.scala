package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed Aggregators (TopK) degrade badly on the 128-group sort-based
      // fallback; plenty of memory for object hash aggregation here
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ops.Relational.qRollup.fn(spark, "/root/testdata/sf0.01")
    df.show(40, false)
    spark.stop()
  }
}
