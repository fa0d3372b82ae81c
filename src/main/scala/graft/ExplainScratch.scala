package graft
import org.apache.spark.sql.SparkSession
object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
