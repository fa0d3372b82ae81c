package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted join ≡ plain join, row-for-row. */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain equi-join on lineitem⋈orders") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val plain = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    val salted = Skew
      .saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8, col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    assert(plain.nonEmpty)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltCol is deterministic and in range") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("x")
    val salts = df.select(Skew.saltCol(col("x"), 8).as("s"))
    val vals = salts.as[Int].collect()
    assert(vals.forall(s => s >= 0 && s < 8))
    assert(vals.toSet.size == 8) // all buckets used
    assert(salts.collect().toSeq == df.select(Skew.saltCol(col("x"), 8)).collect().toSeq)
  }
}
