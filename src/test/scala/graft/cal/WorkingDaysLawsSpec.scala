package graft.cal

import java.time.LocalDate
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based calendar laws — SURVEY §5.2 item 4. */
object WorkingDaysLawsSpec extends Properties("WorkingDays") {

  private val genDate: Gen[LocalDate] = for {
    y <- Gen.choose(1990, 2040)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, LocalDate.of(y, m, 1).lengthOfMonth())
  } yield LocalDate.of(y, m, d)

  private val genNth: Gen[Int] = Gen.choose(1, 23)

  private def attempt(f: => LocalDate): Option[LocalDate] =
    try Some(f)
    catch { case _: RuntimeException => None }

  property("closedForm == literalWalk (incl. raise behavior)") =
    Prop.forAll(genDate, genNth) { (d, nth) =>
      attempt(WorkingDays.nthWorkingDay(d, nth)) ==
        attempt(WorkingDays.nthWorkingDayWalk(d, nth))
    }

  property("result stays within the month when defined") =
    Prop.forAll(genDate, genNth) { (d, nth) =>
      attempt(WorkingDays.nthWorkingDay(d, nth)).forall { r =>
        r.getYear == d.getYear && r.getMonth == d.getMonth
      }
    }

  property("monotone (strictly increasing) in nth when both defined") =
    Prop.forAll(genDate, Gen.choose(1, 22)) { (d, nth) =>
      (attempt(WorkingDays.nthWorkingDay(d, nth)),
       attempt(WorkingDays.nthWorkingDay(d, nth + 1))) match {
        case (Some(a), Some(b)) => a.isBefore(b)
        case _                  => true
      }
    }

  property("independent of which day-of-month anchors the call") =
    Prop.forAll(genDate, genNth) { (d, nth) =>
      attempt(WorkingDays.nthWorkingDay(d, nth)) ==
        attempt(WorkingDays.nthWorkingDay(d.withDayOfMonth(1), nth))
    }

  property("lastDayOfMonth is idempotent and month-preserving") =
    Prop.forAll(genDate) { d =>
      val l = WorkingDays.lastDayOfMonth(d)
      l.getMonth == d.getMonth &&
      WorkingDays.lastDayOfMonth(l) == l &&
      l.getDayOfMonth == d.lengthOfMonth()
    }

  property("publish date is <= its threshold date (op-24 composition)") =
    Prop.forAll(genDate) { d =>
      val pub = WorkingDays.toPublishDate(d)
      !WorkingDays.toThresholdDate(d).isBefore(pub)
    }
}
