package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.text.{MinHash, TextFunctions}

/** Streaming decontamination: a `foreachBatch` sink that drops, from each
  * micro-batch of training documents, every doc that near-duplicates a doc
  * of a STATIC benchmark set ([[graft.text.MinHash.crossNearDupPairs]]
  * semantics) — the streaming form of eval-overlap removal, for pipelines
  * that ingest and filter continuously rather than in one batch pass.
  *
  * The benchmark side is prepared ONCE ([[prepare]]): its shingle and
  * banded-bucket frames are computed and persisted up front, so each
  * micro-batch pays only its own shingling plus a broadcast bucket join
  * against the (dimension-table-sized) benchmark — per-batch cost is
  * O(batch), independent of how long the stream has been running, and the
  * batch side never shuffles for candidate generation.
  *
  * Clean docs land under `outPath` partitioned by `batch_id`; a replayed
  * batch overwrites its own partition (dynamic partition overwrite), so
  * Structured Streaming's at-least-once `foreachBatch` contract yields
  * exactly-once output, the same idempotence scheme as
  * [[StreamingDedup.incrementalDedupBatch]].
  */
object StreamingDecontaminate {

  /** Benchmark frames reused across batches: (id, shingles) and the
    * exploded (band, bh, id) bucket rows, both persisted.
    */
  final case class PreparedBenchmark(
      sh: DataFrame,
      banded: DataFrame,
      shingleN: Int,
      k: Int,
      bands: Int) {
    def unpersist(): Unit = {
      sh.unpersist(blocking = false)
      banded.unpersist(blocking = false)
    }
  }

  def prepare(
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 8
  ): PreparedBenchmark = {
    require(k % bands == 0, "k must be divisible by bands")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = benchmark.select(
      col(idCol).as("id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("sh")).persist(lvl)
    val banded = MinHash.bandRows(sh, k, bands).persist(lvl)
    banded.count() // materialize both once, before the stream starts
    PreparedBenchmark(sh, banded, shingleN, k, bands)
  }

  /** One batch's clean subset: drop batch docs whose verified Jaccard
    * against ANY benchmark doc reaches `threshold`. Scoped like
    * [[graft.ohlc.IncrementalOhlc.applyBatch]]: `run` materializes the
    * clean frame (e.g. writes it), after which the batch's pinned
    * hit-id checkpoint is released — a long-running stream accumulates
    * nothing in the block manager across triggers.
    */
  def decontaminateBatch[A](
      batch: DataFrame,
      prep: PreparedBenchmark,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8
  )(run: DataFrame => A): A = {
    // the batch's shingle frame feeds TWO plan branches (banding + the
    // verify join) — persist it so each micro-batch shingles once, then
    // materialize the (bounded-by-batch) hit-id set with a lineage cut so
    // the cache can be released before this function returns
    val shL = batch.select(
        col(idCol).as("id"),
        TextFunctions.wordShingles(col(textCol), prep.shingleN).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandedL = MinHash.bandRows(shL, prep.k, prep.bands)
    val hits = bandedL
      .join(broadcast(prep.banded.select(
        col("band"), col("bh"), col("id").as("right_id"))), Seq("band", "bh"))
      .select(col("id").as("left_id"), col("right_id"))
      .dropDuplicates("left_id", "right_id")
      .join(shL.select(col("id").as("left_id"), col("sh").as("sh_a")), Seq("left_id"))
      .join(broadcast(prep.sh.select(col("id").as("right_id"), col("sh").as("sh_b"))),
        Seq("right_id"))
      .filter(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) >= threshold)
      .select(col("left_id").as(idCol)).distinct()
    val (cutHits, hitsRdd) = org.apache.spark.sql.graft.bridge.cutLineageTracked(hits)
    cutHits.count()
    shL.unpersist(blocking = false)
    try run(batch.join(broadcast(cutHits), Seq(idCol), "left_anti"))
    finally hitsRdd.unpersist(blocking = false)
  }

  /** The foreachBatch function: wire with
    * `docs.writeStream.foreachBatch(StreamingDecontaminate.sink(...))`.
    */
  def sink(
      prep: PreparedBenchmark,
      idCol: String,
      textCol: String,
      outPath: String,
      threshold: Double = 0.8
  ): (DataFrame, Long) => Unit = { (batch, batchId) =>
    decontaminateBatch(batch, prep, idCol, textCol, threshold) { clean =>
      clean
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(outPath)
    }
  }
}
