package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-layout cache discipline: the /tmp partitioned copy is keyed
  * by source path + size + mtime, so regenerated source data can never
  * be served from a stale layout (which would silently diverge from the
  * oracle reading the live file).
  */
class PartitionedSpec extends SparkSpec {

  test("partitioned layout invalidates when the source file is regenerated") {
    val dir = Files.createTempDirectory("prune-src-")
    val src = Paths.get(s"$sf0001/events.parquet")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val full = Partitioned.qPartitionPrune.fn(spark, dir.toString).count()
    assert(full > 0)

    // regenerate the source at the SAME path: halve the rows (raw nanos
    // schema — rewrite preserves the long ts column)
    val halvedDir = Files.createTempDirectory("prune-halved-")
    spark.read
      .schema(graft.streaming.Replay.rawSchema)
      .parquet(dir.resolve("events.parquet").toString)
      .where(col("event_id") % 2 === 0)
      .coalesce(1)
      .write.mode("overwrite").parquet(halvedDir.toString)
    val listing = Files.list(halvedDir)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
    Files.move(part, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val halved = Partitioned.qPartitionPrune.fn(spark, dir.toString).count()
    assert(halved < full, s"stale layout served: $halved rows vs $full before regeneration")
  }
}
