package graft.cal

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Calendar family (reference ops 20-24,
  * `lib_datetime_not_used.py:14-132`) — SURVEY §5.2 item 3.
  *
  * The literal walk [[WorkingDays.nthWorkingDayWalk]] is the semantic
  * ground truth (a line-by-line port); the closed form and the native
  * Column form must agree with it everywhere.
  */
class WorkingDaysSpec extends AnyFunSuite {

  private val allDays2020to2026: Seq[LocalDate] = {
    val start = LocalDate.of(2020, 1, 1)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.getYear <= 2026).toSeq
  }

  test("closed form == literal walk for every day 2020-2026, nth 1..21") {
    for (d <- allDays2020to2026; nth <- 1 to 21) {
      val walk =
        try Some(WorkingDays.nthWorkingDayWalk(d, nth))
        catch { case _: RuntimeException => None }
      val closed =
        try Some(WorkingDays.nthWorkingDay(d, nth))
        catch { case _: RuntimeException => None }
      assert(closed == walk, s"d=$d nth=$nth")
    }
  }

  test("quirk preserved: nth=1 returns the 1st even on a weekend") {
    // 2023-01-01 is a Sunday; reference walk returns it for nth=1.
    assert(
      WorkingDays.nthWorkingDay(LocalDate.of(2023, 1, 15), 1) ==
        LocalDate.of(2023, 1, 1)
    )
  }

  test("quirk preserved: result can be a Saturday") {
    // Month starting Monday: 6th 'working day' per the reference counter
    // lands on Saturday (counter increments before weekend check).
    // May 2023 starts Monday; walk(nth=6) = 2023-05-06 (Saturday).
    val r = WorkingDays.nthWorkingDay(LocalDate.of(2023, 5, 10), 6)
    assert(r == LocalDate.of(2023, 5, 6))
    assert(r.getDayOfWeek == java.time.DayOfWeek.SATURDAY)
  }

  test("nonexistent nth raises (reference lib_datetime_not_used.py:39-40)") {
    // February 2023 (28 days) has 20 weekdays; nth=23 cannot fit.
    assertThrows[RuntimeException] {
      WorkingDays.nthWorkingDay(LocalDate.of(2023, 2, 10), 23)
    }
    assertThrows[RuntimeException] {
      WorkingDays.nthWorkingDayWalk(LocalDate.of(2023, 2, 10), 23)
    }
  }

  test("toPublishDate January wrap (lib_datetime_not_used.py:87-98)") {
    // Early January before the 20th working day → previous month =
    // December of the PREVIOUS year.
    val d = LocalDate.of(2024, 1, 3)
    val r = WorkingDays.toPublishDate(d)
    assert(r.getYear == 2023 && r.getMonthValue == 12, s"got $r")
    assert(r == WorkingDays.nthWorkingDay(LocalDate.of(2023, 12, 1), 20))
  }

  test("toPublishDate on/after the 20th working day uses current month") {
    val d = LocalDate.of(2024, 1, 31)
    assert(
      WorkingDays.toPublishDate(d) ==
        WorkingDays.nthWorkingDay(LocalDate.of(2024, 1, 1), 20)
    )
  }

  test("lastDayOfMonth (day-28+4 trick) across leap/non-leap") {
    assert(WorkingDays.lastDayOfMonth(LocalDate.of(2024, 2, 10)) == LocalDate.of(2024, 2, 29))
    assert(WorkingDays.lastDayOfMonth(LocalDate.of(2023, 2, 10)) == LocalDate.of(2023, 2, 28))
    assert(WorkingDays.lastDayOfMonth(LocalDate.of(2023, 12, 1)) == LocalDate.of(2023, 12, 31))
  }

  test("toThresholdDate = lastDay(publish(d))") {
    val d = LocalDate.of(2024, 6, 15)
    assert(
      WorkingDays.toThresholdDate(d) ==
        WorkingDays.lastDayOfMonth(WorkingDays.toPublishDate(d))
    )
  }
}

/** The native Column forms must match the Scala forms row-for-row. */
class WorkingDaysColumnSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("Column forms == Scala forms over 7 years of dates") {
    import spark.implicits._
    val days = Iterator
      .iterate(LocalDate.of(2020, 1, 1))(_.plusDays(1))
      .takeWhile(_.getYear <= 2026)
      .map(java.sql.Date.valueOf)
      .toSeq
    val df = days.toDF("d")
    val got = df
      .select(
        col("d"),
        WorkingDays.nthWorkingDayCol(col("d"), 20).as("nth20"),
        WorkingDays.toPublishDateCol(col("d")).as("pub"),
        WorkingDays.toThresholdDateCol(col("d")).as("thr")
      )
      .collect()
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getDate(1).toLocalDate == WorkingDays.nthWorkingDay(d, 20), s"nth20 $d")
      assert(r.getDate(2).toLocalDate == WorkingDays.toPublishDate(d), s"pub $d")
      assert(r.getDate(3).toLocalDate == WorkingDays.toThresholdDate(d), s"thr $d")
    }
  }

  test("Column form yields NULL where the Scala form raises (nth=23, Feb)") {
    import spark.implicits._
    val df = Seq(java.sql.Date.valueOf("2023-02-10")).toDF("d")
    val r = df.select(WorkingDays.nthWorkingDayCol(col("d"), 23)).head
    assert(r.isNullAt(0))
  }

  test("registered UDFs agree with native columns") {
    import spark.implicits._
    WorkingDays.registerUdfs(spark)
    val df = Seq("2024-01-03", "2024-06-28", "2023-05-10")
      .map(java.sql.Date.valueOf)
      .toDF("d")
    df.createOrReplaceTempView("cal_udf_spec")
    val rows = spark
      .sql(
        """SELECT d, nth_working_day(d, 20) u_nth, publish_date(d) u_pub
           FROM cal_udf_spec"""
      )
      .collect()
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getDate(1).toLocalDate == WorkingDays.nthWorkingDay(d, 20))
      assert(r.getDate(2).toLocalDate == WorkingDays.toPublishDate(d))
    }
  }
}
