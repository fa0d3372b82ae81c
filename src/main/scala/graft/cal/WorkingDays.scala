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

  /** Days from the 1st (weekday w, Mon=0) to the quirky nth working day. */
  private def offsetDays(w: Int, nth: Int): Int = {
    val m = nth - 1       // weekdays to pass
    val f = m / 5         // full weeks
    val r = m % 5
    if (r == 0) 7 * f
    else {
      val skip = if (w == 5) 2 else if (w == 6) 1 else 0 // hop a leading weekend
      val wp = if (w >= 5) 0 else w
      val extra = r + (if (r > 5 - wp) 2 else 0)         // cross a mid-window weekend
      7 * f + skip + extra
    }
  }

  /** op-20 as a native Column over a DATE column (fixed literal nth).
    * Same closed form in builtin expressions only — codegen-fused.
    */
  def nthWorkingDayCol(d: Column, nth: Int): Column =
    nthWorkingDayColFrom(trunc(d, "month"), nth)

  /** Internal: nth working day given the month-start column. */
  private def nthWorkingDayColFrom(first: Column, nth: Int): Column = {
    val m = nth - 1
    val f = m / 5
    val r = m % 5
    if (r == 0) date_add(first, 7 * f)
    else {
      val w = weekdayCol(first) // Mon=0..Sun=6
      val skip = when(w === 5, 2).when(w === 6, 1).otherwise(0)
      val wp = when(w >= 5, 0).otherwise(w)
      val extra = lit(r) + when(lit(r) > lit(5) - wp, 2).otherwise(0)
      date_add(first, lit(7 * f) + skip + extra)
    }
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
