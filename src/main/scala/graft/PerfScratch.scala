package graft
import org.apache.spark.sql.SparkSession
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
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
