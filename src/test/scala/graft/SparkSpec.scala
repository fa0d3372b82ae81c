package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. Small parallelism: unit-test scale
  * (sf0.001) needs no fan-out, and one JVM-wide session keeps `sbt test`
  * fast. Same configs as the driver mains (UTC, nanosAsLong).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // local[4,2]: 4 threads, maxFailures=2 — lets specs exercise REAL
    // task retries (CopyRetryStormSpec); passing tasks behave identically
    val s = Sessions.builder("local[4,2]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
