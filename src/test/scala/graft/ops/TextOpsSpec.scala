package graft.ops

import graft.SparkSpec

/** TextOps plan-economy regressions. The family's per-query semantics
  * are oracled (t2); what specs must pin is the job structure — the
  * round-3 q_tfidf ran an EAGER count() while BUILDING the plan (a
  * whole extra corpus scan as a separate job before the real one).
  */
class TextOpsSpec extends SparkSpec {

  test("q_tfidf: building the plan schedules zero jobs (corpus-size scan is fused)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // Baseline: a bare table read also schedules jobs at build time
    // (parquet footer/schema reads) — measure the DELTA, not zero.
    Tables.documents(spark, sf0001)
    spark.sparkContext.addSparkListener(l)
    try {
      val base = {
        Tables.documents(spark, sf0001); Tables.documents(spark, sf0001)
        Tables.documents(spark, sf0001)
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val now = jobs.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        jobs.get
      }
      jobs.set(0)
      val df = TextOps.qTfidf.fn(spark, sf0001) // build only — no action
      // listener bus is async; wait for the count to go quiet
      // (IngestSpec pattern)
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = jobs.get
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      assert(jobs.get <= base,
        s"plan construction ran ${jobs.get} job(s) vs $base for the bare reads — the eager count() is back")
      assert(df.columns.sameElements(Array("doc_id", "term", "tf", "df", "score")))
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
