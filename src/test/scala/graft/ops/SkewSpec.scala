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

  test("AQE splits a skewed sort-merge join at runtime (the automatic complement)") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the skew thresholds so unit-test-sized skew triggers the
      // same split a multi-GB hot partition would at production defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force the shuffle join
    )
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~90% of the left side
      val left = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(100).select(col("id").as("rk"), lit("dim").as("tag"))
      val joined = left.join(right, col("k") === col("rk"))
      // collect() (not count()) so THIS Dataset's own adaptive plan
      // executes and finalizes — count() builds a separate QueryExecution
      assert(joined.collect().length == 180000 + 10) // hot key + ids 0,10,...,90
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q_join_skew_aqe: the declared body's executed SMJ carries skew=true, and the result equals the plain join") {
    // the EXECUTED adaptive plan of the exact join body the declared
    // query materializes — the lazy-plan pins in QueriesPlanSpec cannot
    // see an AQE decision, so this is the query's plan audit
    val joined = Skew.withSkewAqe(spark, Skew.dirBytes(spark, s"$sf0001/lineitem.parquet")) {
      val j = Relational.skewAqeJoin(spark, sf0001)
      assert(j.collect().nonEmpty)
      j
    }
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"OptimizeSkewedJoin did not split the crafted hot partition:\n$finalPlan")
    // end-to-end: the declared query equals the unsplit join's result
    val got = Relational.qJoinSkewAqe.fn(spark, sf0001).collect().toSeq
    val plain = Relational.skewAqeJoin(spark, sf0001)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(28,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == plain, "AQE split changed rows, not just the schedule")
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
