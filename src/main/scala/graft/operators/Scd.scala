package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build and CDC-style merge —
  * the warehouse-maintenance pair every curated training corpus sits on
  * top of (provenance tables, license states, source registries change
  * over time; reproducible dataset builds need "state as of" semantics).
  *
  * Spark-first: both operators are single window/aggregation dataflows —
  * no iterative driver loop, no collect. The history build is two window
  * functions over one `(keys, ts)` shuffle (Catalyst plans both over the
  * SAME Exchange since partitioning and ordering agree); the merge is one
  * per-key argmax (`max_by` over a (ts, tiebreak) struct — a partially
  * aggregated shuffle, no window sort) joined full-outer against the
  * current table. Both scale by key-hash partitioning with no skew
  * hotspots beyond the key distribution itself.
  */
object Scd {

  /** Collapse an append-only change log into SCD2 validity intervals.
    *
    * A row opens an interval when its attribute tuple differs from the
    * key's previous row (change detection — no-op updates collapse);
    * `valid_to` is the next interval's `valid_from` (half-open intervals,
    * NULL on the current row, `is_current` flags it).
    *
    * @param log      change records
    * @param keys     dimension key columns
    * @param ts       event-time column (interval ordering)
    * @param tiebreak orders same-ts rows within a key; (ts, tiebreak)
    *                 must be unique per key for determinism
    * @param attrs    tracked attribute columns; rows equal to their
    *                 predecessor on ALL of these are dropped
    */
  def scd2FromChangeLog(
      log: DataFrame,
      keys: Seq[String],
      ts: String,
      tiebreak: Seq[String],
      attrs: Seq[String]
  ): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((ts +: tiebreak).map(col): _*)
    val tup = struct(attrs.map(col): _*)
    val opens = log
      .select((keys ++ (ts +: tiebreak) ++ attrs).distinct.map(col): _*)
      .withColumn("__prev", lag(tup, 1).over(w))
      // null-safe: first row per key has __prev = NULL and always opens
      .filter(!(col("__prev") <=> tup))
      .withColumnRenamed(ts, "valid_from")
    // second window: same partition keys, compatible ordering prefix →
    // reuses the first window's Exchange (one shuffle for the whole build).
    // The tiebreak MUST ride along: two opens sharing valid_from would
    // otherwise chain in partition-dependent order (nondeterministic SCD2
    // history for same-timestamp changes)
    val w2 = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("valid_from") +: tiebreak.map(col)): _*)
    opens
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Apply a CDC change batch to a current-state table: per key, the
    * latest change wins (`max_by` over (ts, tiebreak) — no window sort);
    * an upsert replaces/creates the row, a delete removes it, untouched
    * current rows pass through.
    *
    * @param current  current-state table (one row per key)
    * @param changes  change batch with an `opCol` of "U" (upsert) or "D"
    *                 (delete); other values are rejected at runtime via
    *                 `assert_true` folded into the projection (a silent
    *                 pass-through would corrupt the merge)
    * @param payload  columns carried from the winning upsert into the
    *                 merged row (must exist in `current` too)
    */
  def applyChanges(
      current: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      ts: String,
      tiebreak: Seq[String],
      opCol: String,
      payload: Seq[String]
  ): DataFrame = {
    val ord = struct((ts +: tiebreak).map(col): _*)
    val row = struct((Seq(opCol) ++ payload).map(col): _*)
    val latest = changes
      .withColumn("__opck",
        assert_true(col(opCol).isin("U", "D"),
          lit(s"$opCol must be 'U' or 'D'")))
      .filter(col("__opck").isNull) // always true; keeps the assert alive
      .groupBy(keys.map(col): _*)
      .agg(max_by(row, ord).as("__w"))
      .select(keys.map(col) :+ col("__w.*"): _*)
    val cur = current.select((keys ++ payload).map(col): _*)
    // full outer on key: NULL op = untouched current row
    cur.as("c").join(latest.as("l"), keys, "full_outer")
      .filter(coalesce(col(s"l.$opCol"), lit("U")) =!= "D")
      .select(keys.map(col) ++ payload.map(p =>
        when(col(s"l.$opCol").isNotNull, col(s"l.$p"))
          .otherwise(col(s"c.$p")).as(p)): _*)
  }
}
