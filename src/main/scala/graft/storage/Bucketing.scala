package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage for co-located joins.
  *
  * The reference keeps ticks physically ordered by `(instrument, timestamp)`
  * so month-scoped scans and merges never re-sort
  * (reference `docs/DATABASE_SCHEMA.md:759-764`, ReplacingMergeTree ORDER BY).
  * Spark's equivalent for JOIN locality is bucketing: both fact tables are
  * hash-bucketed into the same number of buckets on the join key at WRITE
  * time, so a later join reads bucket i of each side into the same task —
  * the shuffle disappears from every downstream join on that key.
  *
  * At 100 TB this is the difference between an O(data) network shuffle per
  * join and zero shuffle: the two largest tables (ticks ⋈ bars, orders ⋈
  * lineitem) pay one bucketed write, then every recurring join — daily
  * regeneration, validation joins, incremental appends — is exchange-free.
  * Bucket count is chosen once per table pair (here: tests use 8; a cluster
  * sizes it to ~128 MB per bucket file).
  *
  * `sortBy` on the bucket key additionally makes each bucket file
  * internally sorted, so the sort-merge join's per-task sort is a cheap
  * near-sorted pass (Spark still inserts the Sort operator; it does no
  * work on sorted runs).
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketKeys: Seq[String],
      sortKeys: Seq[String] = Nil
  ): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides in the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
