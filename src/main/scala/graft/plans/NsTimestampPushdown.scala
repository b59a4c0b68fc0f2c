package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Push comparison predicates through the events-table timestamp
  * normalization, whichever physical layout the file has.
  *
  * `catalog.Tables.events` normalizes `ts` to a µs session-TZ TimestampType
  * from one of two stored domains:
  *
  *   - TIMESTAMP(NANOS) read as a raw long, converted with
  *     `timestamp_micros(ts div 1000)`;
  *   - native µs TIMESTAMP_NTZ, converted with `cast(ts as timestamp)`
  *     (an exact micros reinterpretation when the session zone is UTC).
  *
  * A user filter on the CONVERTED column cannot cross either conversion,
  * so without help the parquet scan reads everything and Spark filters
  * post-conversion. Both conversions are monotone, so every comparison
  * against a timestamp literal has an exact stored-domain equivalent. For
  * the ns long domain the bounds shift to account for the non-injective
  * floor truncation:
  *
  *   ts >= L  ⟺  raw >= µs(L)·1000          ts > L  ⟺  raw >= (µs(L)+1)·1000
  *   ts <= L  ⟺  raw <  (µs(L)+1)·1000      ts < L  ⟺  raw <  µs(L)·1000
  *   ts = L   ⟺  both bounds
  *
  * For the NTZ µs domain the conversion is an injective reinterpretation
  * (UTC session zone only — checked), so each comparison maps verbatim with
  * the literal re-typed to TIMESTAMP_NTZ at the same micros count.
  *
  * By the time user rules run, Spark's own predicate pushdown has already
  * substituted the alias through the Project, leaving
  * `Filter(cmp(convert(raw), lit))` directly above the relation — stuck
  * there, because the comparison wraps the scan column in an expression the
  * parquet reader can't evaluate. This rule appends the equivalent
  * BARE-COLUMN conjunct (`cmp'(raw, lit')`), which FileSourceStrategy then
  * turns into a pushed parquet filter (row-group pruning via min/max
  * stats). The original predicate stays — the derived one is an exact
  * implication, so results are unchanged.
  *
  * `Tables.events(start, end)` does this translation by hand for the
  * engine's own query paths; the rule extends the same guarantee to every
  * ad-hoc DataFrame/SQL filter once `GraftExtensions` is installed. On
  * plans with neither conversion shape the rule matches nothing and is a
  * no-op.
  */
object NsTimestampPushdown extends Rule[LogicalPlan] {

  private sealed trait Domain
  private case object NsLong extends Domain // raw ns long, floor-truncated to µs
  private case object MicrosNtz extends Domain // native µs NTZ, reinterpreted in UTC

  private def isUtc(tz: Option[String]): Boolean =
    tz.exists(id =>
      try java.time.ZoneId.of(id).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false })

  /** Matches the session-timestamp conversion and yields the stored column. */
  private object SessionTs {
    def unapply(e: Expression): Option[(Expression, Domain)] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right.semanticEquals(Literal(1000L, LongType)) =>
        Some((d.left, NsLong))
      case c: Cast
          if c.dataType == TimestampType && c.child.dataType == TimestampNTZType &&
            isUtc(c.timeZoneId) =>
        Some((c.child, MicrosNtz))
      case _ => None
    }
  }

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]

  private def ntz(l: Literal): Literal = Literal(micros(l), TimestampNTZType)

  /** Smallest raw ns value whose `div 1000` (TRUNCATE toward zero, not
    * floor) is >= m. For m > 0 that is m·1000, but for m <= 0 truncation
    * rounds negative raws UP, so the threshold extends 999 ns lower —
    * without this, pre-epoch rows would be wrongly excluded by the
    * derived bounds.
    *
    * None when µs·1000 overflows Long (timestamp literals outside the
    * ns-representable ~1677-2262 range): a WRAPPED threshold is an
    * arbitrary number, not a bound — `ts <= timestamp'3000-01-01'` used
    * to derive `raw < -4.39e18`, silently dropping every row — and a
    * CLAMPED one is not exact either (`raw < Long.MaxValue` excludes a
    * legitimate raw == MaxValue). No derivation just means no extra
    * pushdown; the original predicate still filters correctly.
    */
  private def minRawNs(m: Long): Option[Long] =
    try {
      val p = Math.multiplyExact(m, 1000L)
      Some(if (m > 0) p else Math.subtractExact(p, 999L))
    } catch { case _: ArithmeticException => None }

  private def plusOne(m: Long): Option[Long] =
    if (m == Long.MaxValue) None else Some(m + 1)

  /** Stored-domain implication of one conjunct, if derivable. All ns
    * bounds are expressed through [[minRawNs]] thresholds (trunc is
    * monotone, so each comparison has a single exact raw threshold).
    */
  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(SessionTs(r, dom), l @ Literal(_, TimestampType)) =>
      dom match {
        case NsLong =>
          minRawNs(micros(l)).map(t => GreaterThanOrEqual(r, Literal(t)))
        case MicrosNtz => Some(GreaterThanOrEqual(r, ntz(l)))
      }
    case GreaterThan(SessionTs(r, dom), l @ Literal(_, TimestampType)) =>
      dom match {
        case NsLong =>
          plusOne(micros(l)).flatMap(minRawNs)
            .map(t => GreaterThanOrEqual(r, Literal(t)))
        case MicrosNtz => Some(GreaterThan(r, ntz(l)))
      }
    case LessThanOrEqual(SessionTs(r, dom), l @ Literal(_, TimestampType)) =>
      dom match {
        case NsLong =>
          plusOne(micros(l)).flatMap(minRawNs)
            .map(t => LessThan(r, Literal(t)))
        case MicrosNtz => Some(LessThanOrEqual(r, ntz(l)))
      }
    case LessThan(SessionTs(r, dom), l @ Literal(_, TimestampType)) =>
      dom match {
        case NsLong => minRawNs(micros(l)).map(t => LessThan(r, Literal(t)))
        case MicrosNtz => Some(LessThan(r, ntz(l)))
      }
    case EqualTo(SessionTs(r, dom), l @ Literal(_, TimestampType)) =>
      dom match {
        case NsLong =>
          for {
            lo <- minRawNs(micros(l))
            hi <- plusOne(micros(l)).flatMap(minRawNs)
          } yield And(
            GreaterThanOrEqual(r, Literal(lo)), LessThan(r, Literal(hi)))
        case MicrosNtz => Some(EqualTo(r, ntz(l)))
      }
    // mirrored literal-first forms — guarded non-literal on the other
    // side: two timestamp literals (possible when the rule runs before
    // constant folding, e.g. direct application in tests or a changed
    // extraOptimizations order) would otherwise mutually recurse forever
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), a)
        if !a.isInstanceOf[Literal] =>
      derive(LessThanOrEqual(a, l))
    case GreaterThan(l @ Literal(_, TimestampType), a)
        if !a.isInstanceOf[Literal] =>
      derive(LessThan(a, l))
    case LessThanOrEqual(l @ Literal(_, TimestampType), a)
        if !a.isInstanceOf[Literal] =>
      derive(GreaterThanOrEqual(a, l))
    case LessThan(l @ Literal(_, TimestampType), a)
        if !a.isInstanceOf[Literal] =>
      derive(GreaterThan(a, l))
    case EqualTo(l @ Literal(_, TimestampType), a)
        if !a.isInstanceOf[Literal] =>
      derive(EqualTo(a, l))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val derived = existing
        .flatMap(derive(_))
        .flatMap(conjuncts)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else f.copy(condition = And(cond, derived.reduce(And)))
  }
}
