package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level manifest of a written dataset: one row per data file with its
  * row count and the min/max of a chosen key — the delivery artifact a
  * large export ships NEXT TO the data so consumers can route, resume, and
  * verify without listing directories or reading parquet footers (at 100 TB
  * an export is ~10^5–10^6 files; a manifest read is one small scan).
  *
  * The manifest lives under `<path>/_manifest`. Underscore-prefixed paths
  * are hidden from Spark/Hadoop input listings (the `_SUCCESS` convention),
  * so readers of `<path>` are untouched by it (asserted in ManifestSpec).
  *
  * Built with ONE distributed scan over the written files
  * (`input_file_name()` + an aggregation, partially combined map-side) —
  * no driver-side file loop, no per-file footer round-trips. For
  * [[RangeWriter]] outputs the manifest doubles as a correctness witness:
  * sorted-by-min files must have non-overlapping [min,max] ranges.
  */
object Manifest {

  /** One row per file of the dataset at `path`:
    * (file, rows, min_key, max_key, key_col), ordered by min_key then file.
    * `key_col` records WHICH column the min/max describe — self-describing,
    * and it lets [[Compactor]] rebuild a manifest after a rewrite without
    * being told the key (the carried stats would be stale for new files).
    */
  def build(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
      .withColumn("key_col", lit(keyCol))
      .orderBy("min_key", "file")

  /** Write the manifest as JSON under `<path>/_manifest` (one part file —
    * the manifest is O(files), always driver-small relative to the data).
    */
  def write(spark: SparkSession, path: String, keyCol: String): Unit =
    build(spark, path, keyCol)
      .coalesce(1)
      .write.mode("overwrite").json(s"$path/_manifest")

  /** Read a manifest previously written by [[write]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(s"$path/_manifest")
}
