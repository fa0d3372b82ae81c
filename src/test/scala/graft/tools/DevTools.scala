package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev tools (test scope — not part of the shipped engine):
  * `sbt "Test/runMain graft.tools.PerfTool q_agg_hash ..."` times
  * queries at sf0.1; `ExplainTool` dumps one formatted plan.
  */
object PerfTool {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries(args(0))(spark, d).explain("formatted")
    spark.stop()
  }
}
