package graft
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print one declared query's formatted physical plan.
  * `runMain graft.PlanOne <query> [sfDir]` — the per-query sibling of
  * [[PlanDump]] for iterating on a single plan shape.
  */
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
