package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Typed Aggregator ≡ builtin max (SURVEY §5.2 item 3) and the chunk-order
  * invariance the reference's running max relies on (`main.py:228-230`).
  */
class AutoDateAggSpec extends SparkSpec {

  test("Aggregator result == builtin max(ts).cast(date) on events") {
    val ev = Tables.events(spark, sf0001)
    val viaAgg =
      AutoDateAgg.qAutoDateAgg.fn(spark, sf0001).head.getDate(0)
    val viaBuiltin =
      ev.agg(max(col("ts")).cast("date")).head.getDate(0)
    assert(viaAgg == viaBuiltin)
  }

  test("partition-count invariance (reference chunk-order independence)") {
    val ev = Tables.events(spark, sf0001).select("ts")
    val agg = udaf(AutoDateAgg, org.apache.spark.sql.Encoders.TIMESTAMP)
    val results = Seq(1, 3, 32).map { n =>
      ev.repartition(n).agg(agg(col("ts"))).head.getDate(0)
    }
    assert(results.distinct.size == 1)
  }

  test("empty input → null auto_date (no rows, like an empty download)") {
    val empty = Tables
      .events(spark, sf0001)
      .where(lit(false))
      .select("ts")
    val agg = udaf(AutoDateAgg, org.apache.spark.sql.Encoders.TIMESTAMP)
    assert(empty.agg(agg(col("ts"))).head.isNullAt(0))
  }
}
