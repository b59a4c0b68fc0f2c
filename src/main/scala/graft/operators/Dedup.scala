package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * [[replacingDedup]] reproduces the reference's ReplacingMergeTree
  * semantics (`clickhouse_manager.py:159-161`: dedup key
  * `(instrument, timestamp)`, merge-time row replacement) — but strictly, at
  * write/query time, instead of eventually at background-merge time
  * (`processor.py:155-159` documents the reference's eventual behavior).
  *
  * [[exactText]] is the exact-duplicate detector of the LLM-pipeline
  * extension surface: hash-groupBy on a content digest.
  *
  * Scale: both are single-shuffle hash aggregations/windows on the dedup
  * key; partial aggregation (for exactText) and AQE skew handling apply.
  * No driver-side state.
  */
object Dedup {

  /** Keep exactly one row per key group, the winner being the row with the
    * minimal `order` tuple (deterministic — important for oracle parity).
    */
  def replacingDedup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[replacingDedup]] as a hash AGGREGATION instead of a sort-window:
    * `min_by(struct(row), struct(order))` keeps the winning row per key
    * with map-side partial aggregation and no sort at all. Identical
    * result for ascending `order` columns with unique tuples — but at
    * scale the shuffle carries one pre-combined row per (key, map task)
    * rather than every input row through a full sort (the 100×-data probe
    * measured 48× window-form cost vs ~6× for aggregation-shaped
    * operators; this closes that gap). Prefer this form; the window form
    * remains for order specs that aren't plain ascending columns.
    */
  def replacingDedupAgg(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    val ordStruct = struct(order.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(rowStruct, ordStruct).as("__best"))
      .select(df.columns.map(c => col(s"__best.`$c`").as(c)).toIndexedSeq: _*)
  }

  /** Exact-duplicate groups by content digest: one row per distinct text with
    * the representative (minimal) id and the group size. MD5 is used because
    * it is bit-identical across engines (Spark `md5` == DuckDB `md5`),
    * making the operator oracle-checkable.
    */
  def exactText(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count")
      )
}
