package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming incremental near-dup labeling: a `foreachBatch` sink that
  * labels each micro-batch of documents against the persisted LSH bucket
  * index ([[graft.text.MinHash.nearDupGroupsIncremental]]) and advances
  * the index — the streaming form of append-only corpus dedup. Per batch
  * the fixpoint touches only the index slice the batch's buckets hit
  * (O(batch), independent of corpus size), so the sink's cost does not
  * grow as the corpus accumulates.
  *
  * The index is VERSIONED (one subdirectory per batch id) rather than
  * overwritten in place: the update reads version N while writing N+1, so
  * a mid-write failure leaves version N intact and Structured Streaming's
  * batch replay regenerates N+1 deterministically (same batch → same
  * labels → same index). Labels append to `labelsPath`; replayed batches
  * overwrite their own partition (idempotent via batch_id partitioning).
  */
object StreamingDedup {

  private val indexSchema = StructType(Seq(
    StructField("group_rep", LongType),
    StructField("band", IntegerType),
    StructField("bh", LongType)))

  /** Highest COMPLETE index version under `indexPath`, or None.
    *
    * Listing goes through the Hadoop FileSystem API so the index can live
    * on any supported store (file://, hdfs://, s3a://) — `java.io.File`
    * would silently return None off the local disk and every batch would
    * be labeled against an empty index. A version counts only if its
    * directory carries the `_SUCCESS` marker Spark writes on commit, so a
    * mid-write crash (partial v=N) falls back to the intact previous
    * version, matching the replay contract in the class doc.
    */
  private[streaming] def latestVersion(spark: SparkSession, indexPath: String): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(indexPath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted.lastOption
  }

  /** The foreachBatch function: wire with
    * `docsStream.writeStream.foreachBatch(StreamingDedup.incrementalDedupBatch(...))`.
    */
  def incrementalDedupBatch(
      indexPath: String,
      labelsPath: String,
      idCol: String,
      textCol: String
  ): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val index = latestVersion(spark, indexPath) match {
      case Some(v) => spark.read.parquet(s"$indexPath/v=$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
    }
    val (labels, updated) = graft.text.MinHash
      .nearDupGroupsIncremental(index, batch, idCol, textCol)
    labels.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(labelsPath)
    updated.write.mode(SaveMode.Overwrite).parquet(s"$indexPath/v=$batchId")
  }
}
