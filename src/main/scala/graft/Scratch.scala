package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = ops.Relational.qRollup.fn(spark, "/root/testdata/sf0.01")
    df.show(40, false)
    spark.stop()
  }
}
