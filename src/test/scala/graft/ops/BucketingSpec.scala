package graft.ops

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located join (the "pre-partitioning/bucketing" scale
  * technique from the 100 TB design notes): writing both fact tables
  * bucketed by the join key lets Spark join them with ZERO exchanges —
  * at 100 TB that deletes the dominant cost of every fact-fact join
  * that repeats across a pipeline.
  */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle") {
    val db = "graft_bucket_spec"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    // a crashed previous run can leave the location without the catalog
    // entry — Spark then refuses the CREATE; clear the directory too
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(s"spark-warehouse/$db.db"))
    spark.sql(s"CREATE DATABASE $db")
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(s"$db.li_b")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(s"$db.ord_b")

    val joined = spark.table(s"$db.li_b")
      .hint("merge") // force the shuffle-sensitive strategy (no broadcast)
      .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and it computes the same result as the unbucketed join
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
    spark.sql(s"DROP DATABASE $db CASCADE")
  }
}
