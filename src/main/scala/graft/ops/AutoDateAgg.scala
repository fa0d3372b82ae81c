package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.{col, udaf}
import java.sql.{Date, Timestamp}

/** Typed `Aggregator` mirror of the reference's hand-rolled partial/final
  * max ("auto_date", `main.py:184,228-230`): the reference computes a
  * per-chunk max then folds a running max across chunks; this Aggregator
  * is the same algebra — `reduce` = per-partition partial, `merge` =
  * cross-partition final — executed in parallel by Spark.
  *
  * Exists as a parity demonstration of the UDAF surface; the builtin
  * `max(col).cast("date")` plans identically and is what q_auto_date
  * uses. AutoDateAggSpec asserts the two agree.
  */
object AutoDateAgg extends Aggregator[Timestamp, Long, Date] {
  // buffer = max epoch-MICROS seen (full TimestampType precision — a
  // millis buffer would order two timestamps in the same millisecond
  // equal and silently truncate the advertised max-timestamp parity);
  // Long.MinValue = "nothing yet"
  def zero: Long = Long.MinValue
  private def micros(ts: Timestamp): Long =
    math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) + ts.getNanos / 1000
  def reduce(buf: Long, ts: Timestamp): Long =
    if (ts == null) buf else math.max(buf, micros(ts))
  def merge(a: Long, b: Long): Long = math.max(a, b)
  def finish(buf: Long): Date =
    if (buf == Long.MinValue) null
    else // floor in UTC explicitly — immune to the JVM default timezone
      Date.valueOf(
        java.time.Instant
          .ofEpochSecond(Math.floorDiv(buf, 1000000L), Math.floorMod(buf, 1000000L) * 1000)
          .atZone(java.time.ZoneOffset.UTC)
          .toLocalDate
      )
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Date] = Encoders.DATE

  /** Declared query: same semantics as q_auto_date, via the Aggregator. */
  val qAutoDateAgg = Q(
    "q_auto_date_agg",
    (s, d) => {
      val agg = udaf(AutoDateAgg, Encoders.TIMESTAMP)
      Tables.events(s, d).agg(agg(col("ts")).as("auto_date"))
    },
    Some("SELECT CAST(max(ts) AS DATE) AS auto_date FROM events")
  )
}
