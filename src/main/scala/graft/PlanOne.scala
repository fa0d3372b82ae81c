package graft
import org.apache.spark.sql.execution.ExplainMode
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val p = SparkEntry.queries(args(0))(spark, d)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    println(p)
    spark.stop()
  }
}
