package graft.ops

import graft.SparkSpec

/** fanOut's split-aware guard: it exists to fix a single-split local
  * scan, and must NOT insert a full round-robin shuffle when the input
  * is already parallel (a real cluster scan has thousands of splits —
  * repartitioning a 100 TB fact before every shingle pipeline would be
  * a gratuitous full-corpus shuffle).
  */
class TablesSpec extends SparkSpec {

  test("fanOut repartitions an under-split input up to defaultParallelism") {
    val single = Tables.documents(spark, sf0001).coalesce(1)
    assert(single.rdd.getNumPartitions == 1)
    val fanned = Tables.fanOut(single)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("fanOut is a no-op (no added Exchange) on a pre-split input") {
    val n = spark.sparkContext.defaultParallelism
    val preSplit = Tables.documents(spark, sf0001).repartition(n)
    val out = Tables.fanOut(preSplit)
    // same plan object — no extra round-robin exchange layered on top
    assert(out eq preSplit)
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange RoundRobinPartitioning"))
    assert(exchanges == 1, "only the test's own repartition may exchange")
  }
}
