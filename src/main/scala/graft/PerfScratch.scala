package graft
import org.apache.spark.sql.SparkSession
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed Aggregators (TopK) degrade badly on the 128-group sort-based
      // fallback; plenty of memory for object hash aggregation here
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); val n = fn(spark, d).count()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
