package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_quantiles error bound: percentile_approx with accuracy 10000 must
  * land within rank-error 1/10000 of the exact percentile — on sf0.001
  * group sizes that means exact or next-neighbor values.
  */
class QuantileSpec extends SparkSpec {

  test("approx quantiles within one rank of exact") {
    val rows = Relational.qQuantiles.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf0001)
    rows.foreach { r =>
      val flag = r.getString(0)
      val approx = (1 to 4).map(r.getDouble) // p25, p50, p75, p99 scalars
      val vals = li
        .where(col("l_returnflag") === flag)
        .select("l_extendedprice")
        .collect()
        .map(_.getDouble(0))
        .sorted
      for ((q, got) <- Seq(0.25, 0.5, 0.75, 0.99).zip(approx)) {
        val rank = math.ceil(q * vals.length).toInt.max(1) - 1
        // within ±2 ranks of the exact order statistic
        val lo = vals(math.max(0, rank - 2))
        val hi = vals(math.min(vals.length - 1, rank + 2))
        assert(got >= lo && got <= hi, s"flag=$flag q=$q got=$got window=[$lo,$hi]")
      }
    }
  }
}
