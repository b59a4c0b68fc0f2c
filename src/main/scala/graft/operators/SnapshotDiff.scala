package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff of two table snapshots — the audit primitive behind
  * dataset versioning (what changed between corpus build N and N+1) and
  * the validation step after any backfill/migration.
  *
  * One full-outer join on the key, classification and per-column change
  * detection in the projection — a single shuffle on the key hash, no
  * window, no collect. `changed_cols` is built null-safely (`<=>`), so a
  * NULL↔value transition registers as a change and NULL↔NULL does not.
  * At 100 TB both sides shuffle-hash/sort-merge on the same key
  * partitioning; if one snapshot is a small delta it broadcasts.
  */
object SnapshotDiff {

  /** @param before earlier snapshot (one row per key)
    * @param after  later snapshot (one row per key)
    * @param keys   join key columns
    * @param cols   compared columns (must exist in both frames)
    * @return (keys..., change ∈ added|removed|changed, changed_cols
    *         comma-joined column names, NULL unless changed) — unchanged
    *         rows are omitted
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      cols: Seq[String]
  ): DataFrame = {
    // membership flags survive the outer join even when all payload
    // columns are NULL on one side
    val b = before
      .select((keys ++ cols).map(col) :+ lit(true).as("__inb"): _*).as("b")
    val a = after
      .select((keys ++ cols).map(col) :+ lit(true).as("__ina"): _*).as("a")
    val joined = b.join(a, keys, "full_outer")
    val changedCols = concat_ws(",",
      cols.map(c => when(!(col(s"b.$c") <=> col(s"a.$c")), lit(c))): _*)
    joined.select(
      keys.map(col) ++ Seq(
        when(col("__inb").isNull, "added")
          .when(col("__ina").isNull, "removed")
          .otherwise("changed").as("change"),
        when(col("__inb").isNotNull && col("__ina").isNotNull, changedCols)
          .as("changed_cols")): _*)
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
      .withColumn("changed_cols",
        when(col("change") === "changed", col("changed_cols")))
  }
}
