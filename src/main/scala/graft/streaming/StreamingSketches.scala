package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sketches

/** Streaming maintenance of the corpus sketches ([[graft.operators.Sketches]]):
  * `foreachBatch` sinks that fold each micro-batch into a persisted
  * Count-Min sketch / HLL register table — continuous token-frequency and
  * distinct-count statistics over an unbounded stream in fixed state
  * (`d·w` cells / `m` registers, whatever the stream length).
  *
  * Both sketches merge associatively (cell-count SUM / register MAX), so
  * a batch update is: sketch the batch, union with the stored version,
  * re-aggregate — one bounded-size job per batch, O(batch + sketch).
  *
  * Storage follows [[StreamingDedup]]'s versioned contract: one `v=N`
  * directory per micro-batch written through the Hadoop FileSystem API,
  * `_SUCCESS`-gated reads ([[StreamingDedup.latestVersion]]), so a
  * mid-write crash falls back to the intact previous version and batch
  * replay regenerates deterministically; [[StreamingDedup.compactIndex]]
  * prunes old versions past the replay horizon.
  */
object StreamingSketches {

  private val cmsSchema = StructType(Seq(
    StructField("j", IntegerType),
    StructField("bucket", IntegerType),
    StructField("cnt", LongType)))

  private val hllSchema = StructType(Seq(
    StructField("bucket", LongType),
    StructField("reg", LongType)))

  private def stored(
      spark: SparkSession, path: String, schema: StructType,
      below: Long = Long.MaxValue): DataFrame =
    StreamingDedup.latestVersion(spark, path, below) match {
      case Some(v) => spark.read.parquet(s"$path/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** foreachBatch function maintaining a CMS over a streaming item column:
    * wire with `stream.writeStream.foreachBatch(StreamingSketches
    * .cmsUpdateBatch(path, "token", d, w)).start()`.
    */
  def cmsUpdateBatch(
      sketchPath: String,
      itemCol: String,
      d: Int,
      w: Int,
      keepVersions: Option[Int] = Some(3)
  ): (DataFrame, Long) => Unit = {
    // see StreamingDedup.incrementalDedupBatch: replay reads v=batchId-1
    require(keepVersions.forall(_ >= 2),
      "keepVersions must be >= 2 (crash replay reads the previous version)")
    (batch, batchId) =>
    val spark = batch.sparkSession
    // strictly below batchId (see StreamingDedup.latestVersion): a
    // replayed batch must merge into the same input version as its first
    // attempt — reading its own committed v=batchId would double-count
    // the batch and overwrite the directory being read
    val merged = stored(spark, sketchPath, cmsSchema, below = batchId)
      .unionByName(Sketches.cmsSketch(batch, itemCol, d, w))
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    merged.write.mode(SaveMode.Overwrite).parquet(s"$sketchPath/v=$batchId")
    keepVersions.foreach(k => StreamingDedup.compactIndex(spark, sketchPath, k))
  }

  /** foreachBatch function maintaining HLL registers over a streaming item
    * column; read the current distinct-count estimate at any time with
    * [[readHllEstimate]].
    */
  def hllUpdateBatch(
      sketchPath: String,
      itemCol: String,
      m: Int,
      keepVersions: Option[Int] = Some(3)
  ): (DataFrame, Long) => Unit = {
    // see StreamingDedup.incrementalDedupBatch: replay reads v=batchId-1
    require(keepVersions.forall(_ >= 2),
      "keepVersions must be >= 2 (crash replay reads the previous version)")
    (batch, batchId) =>
    val spark = batch.sparkSession
    val merged = stored(spark, sketchPath, hllSchema, below = batchId)
      .unionByName(Sketches.hllRegisters(batch, itemCol, m))
      .groupBy("bucket").agg(max(col("reg")).as("reg"))
    merged.write.mode(SaveMode.Overwrite).parquet(s"$sketchPath/v=$batchId")
    keepVersions.foreach(k => StreamingDedup.compactIndex(spark, sketchPath, k))
  }

  /** Current CMS frequency estimates for `candidates` from the stored
    * sketch (reader side; any time, stream running or not).
    */
  def readCmsEstimate(
      spark: SparkSession,
      sketchPath: String,
      candidates: DataFrame,
      itemCol: String,
      d: Int,
      w: Int
  ): DataFrame =
    Sketches.cmsEstimate(stored(spark, sketchPath, cmsSchema),
      candidates, itemCol, d, w)

  /** Current HLL cardinality estimate from the stored registers. */
  def readHllEstimate(spark: SparkSession, sketchPath: String, m: Int): DataFrame =
    Sketches.hllEstimate(stored(spark, sketchPath, hllSchema), m)
}
