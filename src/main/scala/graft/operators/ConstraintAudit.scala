package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: evaluate a set of constraints over a
  * table and return one row per constraint with its violation count — the
  * ingest gate a production corpus build runs before promoting a batch
  * (the Deequ/"unit tests for data" shape, expressed as plain Catalyst
  * aggregations).
  *
  * Cost model: all ROW-LOCAL constraints (not-null, range, custom
  * predicate) fold into ONE aggregation pass over the table — a single
  * scan producing one `sum(violates)` per constraint, no shuffle beyond
  * the final 1-row combine. Uniqueness adds one groupBy on its key
  * (partial-aggregated shuffle); referential integrity adds one
  * left-anti join per foreign key (broadcast when the parent is a
  * dimension). Nothing is driver-side; the audited table is scanned once
  * for the row-local battery regardless of how many such constraints are
  * registered.
  */
object ConstraintAudit {

  sealed trait Constraint { def name: String }
  /** `col IS NULL` is a violation. */
  final case class NotNull(name: String, column: String) extends Constraint
  /** Value outside [lo, hi] (inclusive) is a violation; NULL passes
    * (compose with [[NotNull]] to reject NULLs). */
  final case class InRange(name: String, column: String, lo: Double, hi: Double)
    extends Constraint
  /** Row where the predicate is false is a violation; NULL passes. */
  final case class Check(name: String, predicate: Column) extends Constraint
  /** Key tuple occurring more than once: every EXTRA occurrence counts
    * (n occurrences → n − 1 violations, so a clean table audits to 0). */
  final case class Unique(name: String, columns: Seq[String]) extends Constraint
  /** Child value absent from the parent's key column; NULL child passes. */
  final case class ForeignKey(name: String, column: String,
      parent: DataFrame, parentColumn: String) extends Constraint

  /** @return (constraint, n_violations), one row per constraint, in
    *         registration order (stable for oracle comparison) */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraints must be non-empty")
    // names key the result rows AND the registration-order re-join below —
    // a duplicate would silently fan out both, doubling reported counts
    require(constraints.map(_.name).distinct.size == constraints.size,
      s"constraint names must be unique: ${constraints.map(_.name).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = constraints.collect {
      case NotNull(n, c) => n -> col(c).isNull
      case InRange(n, c, lo, hi) => n -> (col(c) < lo || col(c) > hi)
      case Check(n, p) => n -> !coalesce(p, lit(true))
    }
    val aggs = rowLocal.map { case (n, v) => sum(v.cast("long")).as(n) }
    val local: DataFrame =
      if (rowLocal.isEmpty) spark.emptyDataFrame
      else df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rowLocal.map { case (n, _) =>
          struct(lit(n).as("constraint"),
            coalesce(col(n), lit(0L)).as("n_violations")) }: _*)).as("r"))
        .select(col("r.constraint"), col("r.n_violations"))

    val keyed = constraints.collect {
      case Unique(n, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
          .select(lit(n).as("constraint"), col("n_violations"))
      case ForeignKey(n, c, parent, pc) =>
        df.filter(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(n).as("constraint"), col("n_violations"))
    }

    val parts = (if (rowLocal.isEmpty) Nil else Seq(local)) ++ keyed
    val all = parts.reduce(_.unionByName(_))
    // re-attach registration order (unions don't guarantee it)
    val order = constraints.map(_.name).zipWithIndex.toDF("constraint", "__ord")
    all.join(broadcast(order), "constraint")
      .orderBy("__ord").select("constraint", "n_violations")
  }
}
