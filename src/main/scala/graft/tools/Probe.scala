package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Scratch dev probe — timing + final AQE plan for one query at an
  * arbitrary sf dir. Not part of the shipped surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(f"RUN$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == 2)
        println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
