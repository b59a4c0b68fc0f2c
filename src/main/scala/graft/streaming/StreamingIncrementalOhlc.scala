package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ohlc.IncrementalOhlc

/** Streaming OHLC bar maintenance: a `foreachBatch` sink folding each
  * tick micro-batch into the persisted partial-bar state with
  * [[graft.ohlc.IncrementalOhlc.applyBatch]] — bars stay queryable and
  * exact at all times (no watermark-delayed emission, no append-mode
  * finality: a late tick in batch N+k simply re-merges its bar, which the
  * witness-struct algebra makes order-insensitive). Complements
  * [[StreamingOhlc]]'s watermarked append pipeline: that shape emits
  * finalized bars for downstream streams; this one maintains a
  * continuously-correct materialized view.
  *
  * State storage follows the versioned `v=N` contract of
  * [[StreamingDedup]] (Hadoop FS, `_SUCCESS`-gated reads, compaction):
  * batch replay after a crash reads the intact previous version and
  * regenerates deterministically.
  */
object StreamingIncrementalOhlc {

  /** Wire with `ticks.writeStream.foreachBatch(
    * StreamingIncrementalOhlc.updateBatch(path, Seq("instrument"), "ts",
    * "price", "tick_id")).start()`.
    */
  def updateBatch(
      statePath: String,
      keys: Seq[String],
      time: String,
      value: String,
      tiebreak: String,
      minutes: Int = 1,
      keepVersions: Option[Int] = Some(3)
  ): (DataFrame, Long) => Unit = {
    // see StreamingDedup.incrementalDedupBatch: replay reads v=batchId-1
    require(keepVersions.forall(_ >= 2),
      "keepVersions must be >= 2 (crash replay reads the previous version)")
    (batch, batchId) =>
    val spark = batch.sparkSession
    // strictly below batchId (see StreamingDedup.latestVersion): replay
    // must fold the batch into the same input version as the first
    // attempt, never into its own committed output
    def write(next: DataFrame): Unit =
      next.write.mode(SaveMode.Overwrite).parquet(s"$statePath/v=$batchId")
    StreamingDedup.latestVersion(spark, statePath, below = batchId) match {
      case Some(v) =>
        // applyBatch pins the batch aggregation for the write and releases
        // it after — nothing accumulates in the block manager across
        // triggers of a long-running stream
        IncrementalOhlc.applyBatch(
          spark.read.parquet(s"$statePath/v=$v"), batch,
          keys, time, value, tiebreak, minutes)(write)
      case None =>
        write(IncrementalOhlc.partialBars(batch, keys, time, value, tiebreak, minutes))
    }
    keepVersions.foreach(k => StreamingDedup.compactIndex(spark, statePath, k))
  }

  /** Current bars ([[graft.ohlc.Ohlc.bars]] schema) from the stored state.
    *
    * @param emptySchema bars schema to use BEFORE the first version commits
    *        (the state is caller-shaped — key column names — so a fresh
    *        path cannot derive it); without it the pre-first-batch result
    *        is the zero-column emptyDataFrame, whose column references
    *        throw AnalysisException instead of returning zero rows
    */
  def readBars(
      spark: SparkSession,
      statePath: String,
      emptySchema: Option[org.apache.spark.sql.types.StructType] = None
  ): DataFrame =
    StreamingDedup.latestVersion(spark, statePath) match {
      case Some(v) =>
        IncrementalOhlc.finalBars(spark.read.parquet(s"$statePath/v=$v"))
      case None => emptySchema
        .map(s => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
        .getOrElse(spark.emptyDataFrame)
    }
}
