package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Per-query MEDIAN of n runs: single-shot numbers on this host swing
    // 2-3× (documented in BASELINE.md), which round 1 paid for with one
    // unexplainable 10 s outlier. Medians of 3 suppress one-off spikes.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Sessions.local(cpus.toInt)

    // Full materialization, no output: count() would let Spark prune every
    // column and elide final sorts, timing a different (cheaper) plan.
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Warm the session (codegen compiler, parquet footer reads, shuffle
    // machinery) so per-query numbers are steady-state.
    exec("q_filter"); exec("q_dedup_exact")

    // Optional comma-separated subset (profiling aid): bench only these.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Round-robin over the whole suite `runs` times (not back-to-back
    // repeats of one query) so a transient host stall hits at most one
    // sample of each query.
    val samples: Seq[Seq[Double]] =
      (1 to runs).map(_ => names.map(exec))
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0
      else ok.sorted.apply((ok.size - 1) / 2)
    }
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> median(samples.map(_(i)))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"stat":"median"}""")
    spark.stop()
  }
}
