package graft.cal

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Business-calendar family — reference ops 20-24
  * (`lib_land_registry_data/lib_datetime_not_used.py:14-132`): HM Land
  * Registry's "publish on the 20th working day" schedule.
  *
  * IMPORTANT semantics quirk, preserved bit-for-bit: the reference's walk
  * (`lib_datetime_not_used.py:26-40`) starts its counter at 1 *before*
  * inspecting any day and returns the day *after* (nth-1) weekdays have
  * elapsed since the 1st. Consequences:
  *   - nth=1 returns the 1st even if it is a weekend;
  *   - the result can itself be a Saturday (counter hits nth just after
  *     the 5th weekday of a week).
  * Formally: result = min d ≥ month-start with |{weekdays in [start,d)}|
  * = nth-1, and the walk raises if that d falls outside the month
  * (`lib_datetime_not_used.py:39-40`).
  *
  * Two implementations: the literal walk (parity artifact, used by unit
  * tests) and a closed form used as a NATIVE column expression — pure
  * date/int arithmetic on builtin functions, so it stays inside
  * whole-stage codegen (no UDF in the hot path; at 100 TB a boxed UDF
  * on every row is a real cost).
  */
object WorkingDays {

  /** op-20, literal port of the reference walk (raises like `:39-40`). */
  def nthWorkingDayWalk(currentDate: LocalDate, nth: Int): LocalDate = {
    val monthStart = currentDate.withDayOfMonth(1)
    var theDate = monthStart
    var weekdayCount = 1
    while (true) {
      if (weekdayCount == nth) return theDate
      if (theDate.getDayOfWeek.getValue <= 5) weekdayCount += 1
      theDate = theDate.plusDays(1)
      if (theDate.getMonthValue != monthStart.getMonthValue)
        throw new RuntimeException(
          s"$nth weekday of month starting at date $monthStart does not exist"
        )
    }
    sys.error("unreachable")
  }

  /** op-20, closed form. O(1) vs the walk's O(31); same raise behavior. */
  def nthWorkingDay(currentDate: LocalDate, nth: Int): LocalDate = {
    val first = currentDate.withDayOfMonth(1)
    val w = first.getDayOfWeek.getValue - 1 // Mon=0 .. Sun=6
    val k = offsetDays(w, nth)
    val res = first.plusDays(k)
    if (res.getMonthValue != first.getMonthValue)
      throw new RuntimeException(
        s"$nth weekday of month starting at date $first does not exist"
      )
    res
  }

  /** Days from the 1st (weekday w, Mon=0..Sun=6) to the quirky nth
    * working day: the smallest k with exactly (nth-1) weekdays in the
    * half-open [month-start, month-start + k).
    */
  private def offsetDays(w: Int, nth: Int): Int = {
    val m = nth - 1 // weekdays that must elapse before the result
    if (m == 0) 0
    else if (w <= 4) {
      val lead = 5 - w // weekdays remaining in the first partial week
      if (m <= lead) m
      else {
        val mp = m - lead // weekdays beyond the first partial week
        (7 - w) + 7 * ((mp - 1) / 5) + ((mp - 1) % 5) + 1
      }
    } else {
      val skip = 7 - w // leading weekend: Sat→2, Sun→1 days to Monday
      skip + 7 * ((m - 1) / 5) + ((m - 1) % 5) + 1
    }
  }

  /** op-20 as a native Column over a DATE column (fixed literal nth).
    * Builtin expressions only — codegen-fused, no UDF in the hot path.
    */
  def nthWorkingDayCol(d: Column, nth: Int): Column =
    nthWorkingDayColFrom(trunc(d, "month"), nth)

  /** Internal: nth working day given the month-start column. `nth` is a
    * literal, so the per-weekday offset is PRECOMPUTED with the same
    * Scala closed form ([[offsetDays]]) and emitted as a 7-way CASE on
    * weekday(first) — the Column form is identical to the Scala form by
    * construction.
    *
    * Where the Scala forms RAISE (nth beyond the month, possible only
    * for nth ≥ 21), the Column form yields NULL — a per-row throw has no
    * SQL equivalent; callers use nth=20, which always exists.
    */
  private def nthWorkingDayColFrom(first: Column, nth: Int): Column = {
    val offs = (0 to 6).map(offsetDays(_, nth))
    val res =
      if (offs.distinct.size == 1) date_add(first, offs.head)
      else {
        val w = weekdayCol(first) // Mon=0..Sun=6
        val k = (0 to 5).foldRight(lit(offs(6)): Column) { (wv, acc) =>
          when(w === wv, offs(wv)).otherwise(acc)
        }
        date_add(first, k)
      }
    if (nth <= 20) res // max offset 27 < shortest month: always in-month
    else when(trunc(res, "month") === first, res) // else NULL, like the raise
  }

  /** Spark `weekday()` (Mon=0..Sun=6) — exists in the SQL registry but has
    * no Scala `functions` wrapper; derive from dayofweek (Sun=1..Sat=7).
    */
  private def weekdayCol(d: Column): Column =
    pmod(dayofweek(d) + lit(5), lit(7))

  /** op-21: threshold → publish = 20th working day of the NEXT month
    * (`lib_datetime_not_used.py:43-68`).
    */
  def thresholdToPublish(d: LocalDate): LocalDate =
    nthWorkingDay(d.withDayOfMonth(1).plusMonths(1), 20)

  def thresholdToPublishCol(d: Column): Column =
    nthWorkingDayColFrom(add_months(trunc(d, "month"), 1), 20)

  /** op-22: current date → publish date (`lib_datetime_not_used.py:71-114`):
    * if day-of-month < day of this month's 20th working day, use the
    * PREVIOUS month's (January wraps to December of prior year); else this
    * month's.
    */
  def toPublishDate(d: LocalDate): LocalDate = {
    val nth = nthWorkingDay(d, 20)
    if (d.getDayOfMonth < nth.getDayOfMonth)
      nthWorkingDay(d.withDayOfMonth(1).minusMonths(1), 20)
    else nth
  }

  def toPublishDateCol(d: Column): Column = {
    val first = trunc(d, "month")
    val nth = nthWorkingDayColFrom(first, 20)
    when(
      dayofmonth(d) < dayofmonth(nth),
      nthWorkingDayColFrom(add_months(first, -1), 20)
    ).otherwise(nth)
  }

  /** op-23: last day of month (`lib_datetime_not_used.py:117-127`). */
  def lastDayOfMonth(d: LocalDate): LocalDate = {
    val nextMonth = d.withDayOfMonth(28).plusDays(4)
    nextMonth.minusDays(nextMonth.getDayOfMonth.toLong)
  }

  /** op-24: current → threshold = last_day(publish(d))
    * (`lib_datetime_not_used.py:130-132`).
    */
  def toThresholdDate(d: LocalDate): LocalDate = lastDayOfMonth(toPublishDate(d))

  def toThresholdDateCol(d: Column): Column = last_day(toPublishDateCol(d))

  /** Register the walk versions as UDFs (UDF surface demo — queries use
    * the native column forms above; UDFs exist for parity and tests).
    */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register(
      "nth_working_day",
      (d: java.sql.Date, nth: Int) => java.sql.Date.valueOf(nthWorkingDayWalk(d.toLocalDate, nth))
    )
    spark.udf.register(
      "publish_date",
      (d: java.sql.Date) => java.sql.Date.valueOf(toPublishDate(d.toLocalDate))
    )
  }
}
