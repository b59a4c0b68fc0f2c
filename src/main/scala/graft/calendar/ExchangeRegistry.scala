package graft.calendar

/** Registry of the 10 exchanges the reference enriches OHLC bars with
  * (values from `exchanges.py:53-166`; lunch breaks from
  * `session_detector.py:24-27`: Tokyo 11:30–12:30 JST, Hong Kong and
  * Singapore 12:00–13:00 local).
  */
final case class Exchange(
    key: String,
    mic: String,
    name: String,
    currency: String,
    timezone: String,
    country: String,
    openHour: Int,
    openMinute: Int,
    closeHour: Int,
    closeMinute: Int,
    lunch: Option[(Int, Int, Int, Int)] // startH, startM, endH, endM (local)
)

object ExchangeRegistry {

  val all: Seq[Exchange] = Seq(
    Exchange("nyse", "XNYS", "New York Stock Exchange", "USD",
      "America/New_York", "United States", 9, 30, 16, 0, None),
    Exchange("lse", "XLON", "London Stock Exchange", "GBP",
      "Europe/London", "United Kingdom", 8, 0, 16, 30, None),
    Exchange("xswx", "XSWX", "SIX Swiss Exchange", "CHF",
      "Europe/Zurich", "Switzerland", 9, 0, 17, 30, None),
    Exchange("xfra", "XFRA", "Frankfurt Stock Exchange", "EUR",
      "Europe/Berlin", "Germany", 9, 0, 17, 30, None),
    Exchange("xtse", "XTSE", "Toronto Stock Exchange", "CAD",
      "America/Toronto", "Canada", 9, 30, 16, 0, None),
    Exchange("xnze", "XNZE", "New Zealand Exchange", "NZD",
      "Pacific/Auckland", "New Zealand", 10, 0, 16, 45, None),
    Exchange("xtks", "XTKS", "Tokyo Stock Exchange", "JPY",
      "Asia/Tokyo", "Japan", 9, 0, 15, 0, Some((11, 30, 12, 30))),
    Exchange("xasx", "XASX", "Australian Securities Exchange", "AUD",
      "Australia/Sydney", "Australia", 10, 0, 16, 0, None),
    Exchange("xhkg", "XHKG", "Hong Kong Stock Exchange", "HKD",
      "Asia/Hong_Kong", "Hong Kong", 9, 30, 16, 0, Some((12, 0, 13, 0))),
    Exchange("xses", "XSES", "Singapore Exchange", "SGD",
      "Asia/Singapore", "Singapore", 9, 0, 17, 0, Some((12, 0, 13, 0)))
  )

  val byKey: Map[String, Exchange] = all.map(e => e.key -> e).toMap

  def apply(key: String): Exchange =
    byKey.getOrElse(key,
      throw new IllegalArgumentException(
        s"Unknown exchange: $key. Available: ${all.map(_.key).mkString(", ")}"))

  /** Effective-dated session-hour override: on days in [from, until]
    * (until=None → open-ended) the exchange trades openHour:openMinute –
    * closeHour:closeMinute instead of its registry defaults. Lunch breaks
    * are unaffected.
    */
  final case class SessionOverride(
      exchange: String,
      from: java.time.LocalDate,
      until: Option[java.time.LocalDate],
      openHour: Int,
      openMinute: Int,
      closeHour: Int,
      closeMinute: Int)

  /** Seeded with the reference's flagship validation case: Tokyo's close
    * moved 15:00 → 15:30 effective 2024-11-05
    * (`docs/validation/E2E_VALIDATION_RESULTS_v1.6.0.md:205-232`). Later
    * overrides win when ranges overlap.
    */
  val overrides: Seq[SessionOverride] = Seq(
    SessionOverride("xtks", java.time.LocalDate.of(2024, 11, 5), None, 9, 0, 15, 30))

  /** (openHour, openMinute, closeHour, closeMinute) in force for `ex` on
    * day `d` — the last matching override, else the registry defaults.
    */
  def effectiveHours(ex: Exchange, d: java.time.LocalDate): (Int, Int, Int, Int) =
    overrides.reverseIterator
      .find(o => o.exchange == ex.key && !d.isBefore(o.from) &&
        o.until.forall(u => !d.isAfter(u)))
      .map(o => (o.openHour, o.openMinute, o.closeHour, o.closeMinute))
      .getOrElse((ex.openHour, ex.openMinute, ex.closeHour, ex.closeMinute))
}
