package graft.calendar

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters._

/** Rule-based regular-holiday generation for NYSE and LSE — the two
  * calendars whose holidays the reference materializes as flags
  * (`session_detector.py:159-178`; consumed at
  * `clickhouse_ohlc_generator.py:265-286`). The reference delegates to the
  * `exchange_calendars` library; offline we re-derive the *regular* rules
  * (nth-weekday, Easter-based, observed-shift). One-off closures (state
  * funerals, hurricanes) are out of scope — documented fidelity subset,
  * validated against the scenarios in
  * `docs/validation/E2E_VALIDATION_RESULTS_v1.6.0.md:66-99`.
  */
object Holidays {

  /** Gregorian Easter Sunday (anonymous/Meeus algorithm). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1).`with`(dayOfWeekInMonth(n, dow))

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate =
    LocalDate.of(year, month, 1).`with`(lastInMonth(dow))

  /** US-market observed shift: Saturday → Friday before, Sunday → Monday. */
  private def usObserved(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY   => d.plusDays(1)
    case _                  => d
  }

  /** UK bank-holiday shift: weekend → following Monday (or next free
    * weekday when two holidays collide, e.g. Christmas/Boxing Day).
    */
  private def ukObservedPair(d1: LocalDate, d2: LocalDate): (LocalDate, LocalDate) = {
    def nextWeekday(d: LocalDate): LocalDate = d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => d.plusDays(2)
      case DayOfWeek.SUNDAY   => d.plusDays(1)
      case _                  => d
    }
    val o1 = nextWeekday(d1)
    var o2 = nextWeekday(d2)
    if (!o2.isAfter(o1)) o2 = o1.plusDays(1)
    if (o2.getDayOfWeek == DayOfWeek.SATURDAY) o2 = o2.plusDays(2)
    if (o2.getDayOfWeek == DayOfWeek.SUNDAY) o2 = o2.plusDays(1)
    (o1, o2)
  }

  /** NYSE regular holidays for a year (rules per exchange_calendars XNYS:
    * New Year (Sun→Mon only), MLK, Washington's Birthday, Good Friday,
    * Memorial Day, Juneteenth (2022+), Independence Day, Labor Day,
    * Thanksgiving, Christmas).
    */
  def nyse(year: Int): Seq[(LocalDate, String)] = {
    val newYear = {
      val d = LocalDate.of(year, 1, 1)
      if (d.getDayOfWeek == DayOfWeek.SUNDAY) Some(d.plusDays(1))
      else if (d.getDayOfWeek == DayOfWeek.SATURDAY) None // not observed
      else Some(d)
    }
    val juneteenth =
      if (year >= 2022) Some(usObserved(LocalDate.of(year, 6, 19))) else None
    (newYear.map(_ -> "New Year's Day").toSeq ++
      juneteenth.map(_ -> "Juneteenth").toSeq ++ Seq(
        nthWeekday(year, 1, DayOfWeek.MONDAY, 3) -> "Martin Luther King Jr. Day",
        nthWeekday(year, 2, DayOfWeek.MONDAY, 3) -> "Washington's Birthday",
        easterSunday(year).minusDays(2) -> "Good Friday",
        lastWeekday(year, 5, DayOfWeek.MONDAY) -> "Memorial Day",
        usObserved(LocalDate.of(year, 7, 4)) -> "Independence Day",
        nthWeekday(year, 9, DayOfWeek.MONDAY, 1) -> "Labor Day",
        nthWeekday(year, 11, DayOfWeek.THURSDAY, 4) -> "Thanksgiving",
        usObserved(LocalDate.of(year, 12, 25)) -> "Christmas"
      )).sortBy(_._1.toEpochDay)
  }

  /** LSE regular holidays for a year (XLON rules: New Year observed, Good
    * Friday, Easter Monday, Early May, Spring and Summer bank holidays,
    * Christmas + Boxing Day with collision shifting).
    */
  def lse(year: Int): Seq[(LocalDate, String)] = {
    def nextWeekday(d: LocalDate): LocalDate = d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => d.plusDays(2)
      case DayOfWeek.SUNDAY   => d.plusDays(1)
      case _                  => d
    }
    val easter = easterSunday(year)
    val (xmas, boxing) =
      ukObservedPair(LocalDate.of(year, 12, 25), LocalDate.of(year, 12, 26))
    Seq(
      nextWeekday(LocalDate.of(year, 1, 1)) -> "New Year's Day",
      easter.minusDays(2) -> "Good Friday",
      easter.plusDays(1) -> "Easter Monday",
      nthWeekday(year, 5, DayOfWeek.MONDAY, 1) -> "Early May Bank Holiday",
      lastWeekday(year, 5, DayOfWeek.MONDAY) -> "Spring Bank Holiday",
      lastWeekday(year, 8, DayOfWeek.MONDAY) -> "Summer Bank Holiday",
      xmas -> "Christmas",
      boxing -> "Boxing Day"
    ).sortBy(_._1.toEpochDay)
  }

  def holidaySet(exchangeKey: String, years: Range): Set[LocalDate] =
    exchangeKey match {
      case "nyse" => years.flatMap(nyse(_).map(_._1)).toSet
      case "lse"  => years.flatMap(lse(_).map(_._1)).toSet
      case _      => Set.empty // other exchanges: weekday-only fidelity subset
    }
}
