package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Push comparison predicates through the ns→µs timestamp normalization.
  *
  * The events table stores TIMESTAMP(NANOS), which the engine reads as a
  * raw long and converts with `timestamp_micros(ts div 1000)`
  * (`catalog.Tables.events`). A user filter on the CONVERTED column cannot
  * cross that Project, so without help the parquet scan reads everything
  * and Spark filters post-conversion. The conversion is monotone
  * non-decreasing, so every comparison against a timestamp literal has an
  * exact raw-domain equivalent:
  *
  *   ts >= L  ⟺  raw >= µs(L)·1000          ts > L  ⟺  raw >= (µs(L)+1)·1000
  *   ts <= L  ⟺  raw <  (µs(L)+1)·1000      ts < L  ⟺  raw <  µs(L)·1000
  *   ts = L   ⟺  both bounds
  *
  * By the time user rules run, Spark's own predicate pushdown has already
  * substituted the alias through the Project, leaving
  * `Filter(cmp(timestamp_micros(raw div 1000), lit))` directly above the
  * relation — stuck there, because the comparison wraps the scan column in
  * an expression the parquet reader can't evaluate. This rule appends the
  * equivalent BARE-COLUMN conjunct (`cmp'(raw, lit')`), which
  * FileSourceStrategy then turns into a pushed parquet filter (row-group
  * pruning via min/max stats). The original predicate stays — the derived
  * one is an exact implication, so results are unchanged.
  *
  * `Tables.events(start, end)` does this translation by hand for the
  * engine's own query paths; the rule extends the same guarantee to every
  * ad-hoc DataFrame/SQL filter once `GraftExtensions` is installed.
  */
object NsTimestampPushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(raw div 1000)` and yields `raw`. */
  private object NsToMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right.semanticEquals(Literal(1000L, LongType)) =>
        Some(d.left)
      case _ => None
    }
  }

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]

  /** Raw-domain implication of one conjunct, if derivable. */
  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(NsToMicros(r), l @ Literal(_, TimestampType)) =>
      Some(GreaterThanOrEqual(r, Literal(micros(l) * 1000L)))
    case GreaterThan(NsToMicros(r), l @ Literal(_, TimestampType)) =>
      Some(GreaterThanOrEqual(r, Literal((micros(l) + 1) * 1000L)))
    case LessThanOrEqual(NsToMicros(r), l @ Literal(_, TimestampType)) =>
      Some(LessThan(r, Literal((micros(l) + 1) * 1000L)))
    case LessThan(NsToMicros(r), l @ Literal(_, TimestampType)) =>
      Some(LessThan(r, Literal(micros(l) * 1000L)))
    case EqualTo(NsToMicros(r), l @ Literal(_, TimestampType)) =>
      Some(And(
        GreaterThanOrEqual(r, Literal(micros(l) * 1000L)),
        LessThan(r, Literal((micros(l) + 1) * 1000L))))
    // mirrored literal-first forms
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), a) =>
      derive(LessThanOrEqual(a, l))
    case GreaterThan(l @ Literal(_, TimestampType), a) =>
      derive(LessThan(a, l))
    case LessThanOrEqual(l @ Literal(_, TimestampType), a) =>
      derive(GreaterThanOrEqual(a, l))
    case LessThan(l @ Literal(_, TimestampType), a) =>
      derive(GreaterThan(a, l))
    case EqualTo(l @ Literal(_, TimestampType), a) =>
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
