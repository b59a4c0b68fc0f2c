package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Globally ordered bulk output without a global sort bottleneck.
  *
  * A full-table `.orderBy(...).write` plans a single total ordering whose
  * final stage is fine for bounded results but pathological for bulk dumps.
  * The scalable form (SCALE.md "known bottlenecks" #2) is range
  * partitioning: sample the sort key to pick `numFiles − 1` boundary
  * values, hash rows to their range, and sort within each partition. The
  * output is a set of files where file i's key range lies entirely below
  * file i+1's — a consumer reading files in index order sees a fully
  * sorted dataset, yet every stage ran with `numFiles`-way parallelism.
  *
  * This is the Spark-native equivalent of the reference's
  * `ORDER BY (instrument, timestamp)` clustered storage
  * (`docs/DATABASE_SCHEMA.md:759-764`): range-clustered files whose
  * min/max statistics make point/range scans prune to O(1) files.
  */
object RangeWriter {

  def writeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      numFiles: Int
  ): Unit = {
    require(sortCols.nonEmpty && numFiles >= 1)
    val cols: Seq[Column] = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order-clustered bulk output: range-partition + sort by the Morton
    * interleave of TWO dimensions ([[graft.functions.ZOrderKernel]]), so
    * every file's parquet min/max statistics are tight in BOTH columns and
    * scans filtering on either prune to a few files — where a plain
    * lexicographic sort only prunes on its leading column. The z key is
    * computed on the fly (masked to `bits`) and not written.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int,
      numFiles: Int
  ): Unit = {
    require(numFiles >= 1)
    val z = graft.functions.exprs.zValue(
      pmod(col(xCol).cast("long"), lit(1L << bits)),
      pmod(col(yCol).cast("long"), lit(1L << bits)),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
