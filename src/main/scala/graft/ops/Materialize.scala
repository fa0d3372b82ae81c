package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization point for iterative / multi-consumer pipelines
  * (connected-components rounds, signature tables read by both sides
  * of a self-join).
  *
  * Default is `localCheckpoint()`: executor-memory-resident, cheap,
  * and correct on `local[*]` or any job that can tolerate a full
  * re-run on executor loss. Setting `spark.graft.checkpoint.reliable`
  * to `true` switches every site to reliable `checkpoint()` — each
  * round is persisted to the SparkContext checkpoint directory
  * (HDFS / object storage on a real cluster), so losing an executor
  * mid-iteration recovers from storage instead of facing a truncated
  * lineage that no longer exists. The caller must have called
  * `SparkContext.setCheckpointDir` first; we fail loudly rather than
  * silently degrade to the non-fault-tolerant mode.
  */
object Materialize {
  val RELIABLE_CONF = "spark.graft.checkpoint.reliable"

  def apply(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val reliable =
      session.conf.getOption(RELIABLE_CONF).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      require(
        session.sparkContext.getCheckpointDir.nonEmpty,
        s"$RELIABLE_CONF=true requires SparkContext.setCheckpointDir(...) to be set first"
      )
      df.checkpoint()
    } else {
      df.localCheckpoint()
    }
  }
}
