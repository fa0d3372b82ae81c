package graft
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (r14 optimization round): dump `.explain("formatted")` for a
  * comma-separated list of declared queries to an output directory —
  * the per-round before/after plan artifacts under `plans/rNN/`.
  *
  *   sbt "runMain graft.PlanSnap <outDir> <suffix> q1,q2,..."
  *
  * Unlike [[PlanDump]] (the curated PLANS.md audit), this writes one
  * `<query>_<suffix>.txt` per query so a reviewer can diff exact plans
  * across an optimization.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val plan = SparkEntry.queries(n)(spark, d).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"WROTE ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
