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
  *
  * Versions are keyed by batch id, so an index/state path is bound to ONE
  * streaming checkpoint lineage: updaters read the newest complete
  * version STRICTLY BELOW their own batch id (see [[latestVersion]]), and
  * restarting against the same path with a fresh checkpoint (batch ids
  * reset to 0) would ignore and then clobber accumulated versions — use a
  * new path, or seed it via [[reconcile]].
  */
object StreamingDedup {

  private val indexSchema = StructType(Seq(
    StructField("group_rep", LongType),
    StructField("band", IntegerType),
    StructField("bh", LongType)))

  /** Highest COMPLETE index version strictly below `below` under
    * `indexPath`, or None.
    *
    * Listing goes through the Hadoop FileSystem API so the index can live
    * on any supported store (file://, hdfs://, s3a://) — `java.io.File`
    * would silently return None off the local disk and every batch would
    * be labeled against an empty index. A version counts only if its
    * directory carries the `_SUCCESS` marker Spark writes on commit, so a
    * mid-write crash (partial v=N) falls back to the intact previous
    * version, matching the replay contract in the class doc.
    *
    * `below`: every versioned foreachBatch updater reads with
    * `below = batchId`. Reading the ABSOLUTE latest is wrong for an
    * updater — in the crash window where v=batchId committed but the
    * streaming checkpoint did not, the replayed batch would read its own
    * previous output (folding the batch in twice for merge-style state
    * like the sketches) and then OVERWRITE the very directory its plan is
    * lazily reading. Strictly-below makes replay re-derive v=batchId from
    * the same input version the first attempt used: idempotent, and never
    * self-overwriting. Readers (queries) use the default unbounded form.
    */
  private[graft] def latestVersion(
      spark: SparkSession,
      indexPath: String,
      below: Long = Long.MaxValue): Option[Long] = {
    val path = new org.apache.hadoop.fs.Path(indexPath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      // strictly numeric after the prefix: a non-numeric v=* sibling
      // (external tooling, a leftover temp dir) must be ignored, not
      // crash every subsequent read with NumberFormatException
      .filter(st => st.isDirectory && isVersionDir(st.getPath.getName))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ < below)
      .sorted.lastOption
  }

  private def isVersionDir(name: String): Boolean = {
    val digits = name.stripPrefix("v=")
    name.startsWith("v=") && digits.nonEmpty && digits.length <= 18 &&
      digits.forall(_.isDigit)
  }

  /** The foreachBatch function: wire with
    * `docsStream.writeStream.foreachBatch(StreamingDedup.incrementalDedupBatch(...))`.
    *
    * @param keepVersions compact the index after each batch, keeping this
    *        many complete versions (default 3 — replay horizon + headroom,
    *        see [[compactIndex]]); pass None to keep every version (e.g.
    *        for time-travel debugging) and compact externally
    */
  def incrementalDedupBatch(
      indexPath: String,
      labelsPath: String,
      idCol: String,
      textCol: String,
      keepVersions: Option[Int] = Some(3)
  ): (DataFrame, Long) => Unit = {
    // fail at WIRING time, not after N batches: replay reads v=batchId-1,
    // so keeping a single version would let compaction delete the only
    // state a crash-replayed batch can read — it would silently relabel
    // against an empty index
    require(keepVersions.forall(_ >= 2),
      "keepVersions must be >= 2 (crash replay reads the previous version)")
    (batch, batchId) =>
    val spark = batch.sparkSession
    // strictly below batchId: see latestVersion — a replayed batch must
    // label against the same input version its first attempt used, never
    // against (and then over) its own committed output
    val index = latestVersion(spark, indexPath, below = batchId) match {
      case Some(v) => spark.read.parquet(s"$indexPath/v=$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
    }
    // scoped: both writes join against the batch's band edges — the scoped
    // form keeps that cache alive across them (and releases it after), so
    // the micro-batch is shingled once, not once per output
    graft.text.MinHash.nearDupGroupsIncrementalScoped(
      index, batch, idCol, textCol) { (labels, updated) =>
      labels.withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(labelsPath)
      updated.write.mode(SaveMode.Overwrite).parquet(s"$indexPath/v=$batchId")
    }
    keepVersions.foreach(k => compactIndex(spark, indexPath, k))
  }

  /** Prune old index versions — the versioning scheme accumulates one
    * `v=N` directory per micro-batch, which at a long-running stream is
    * an unbounded copy-count of the (bounded-size) index. Keeps the
    * newest `keep` COMPLETE versions (`_SUCCESS` present) plus anything
    * NEWER than the newest complete version (a possibly in-flight write
    * must never be deleted); everything older goes, including partial
    * crash leftovers. Replay safety: Structured Streaming replays at
    * most the last uncommitted batch, which reads version batchId-1 —
    * `keep >= 2` therefore always suffices; the default keeps headroom.
    *
    * @return the deleted version numbers (ascending)
    */
  def compactIndex(spark: SparkSession, indexPath: String, keep: Int = 3): Seq[Long] = {
    require(keep >= 2, "keep >= 2: batch replay reads the previous version")
    val path = new org.apache.hadoop.fs.Path(indexPath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) return Nil
    val versioned = fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && isVersionDir(st.getPath.getName))
      .map(st => (st.getPath.getName.stripPrefix("v=").toLong, st.getPath))
      .sortBy(-_._1)
    val complete = versioned.filter { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
    if (complete.isEmpty) return Nil
    val keepSet = complete.take(keep).map(_._1).toSet
    val newestComplete = complete.head._1
    val toDelete = versioned
      .filter { case (v, _) => v < newestComplete && !keepSet.contains(v) }
    toDelete.foreach { case (_, p) => fs.delete(p, true) }
    toDelete.map(_._1).sorted
  }

  /** Batch-mode reconciliation entry for a streamed label store: runs
    * [[graft.text.MinHash.reconcileIncremental]] over the full corpus
    * against the accumulated labels (e.g. `spark.read.parquet(labelsPath)`
    * — the (id, group_rep) columns of the per-batch label dump), REPLACES
    * the index with the fresh one as a new version (so the next
    * micro-batch labels against ground truth), and returns the repair
    * delta (id, old_rep, new_rep) to apply to the label store. Run it
    * with the stream stopped (or between micro-batches) on the cadence
    * bridge merges accumulate; follow with [[compactIndex]].
    */
  def reconcile(
      corpus: DataFrame,
      staleLabels: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val spark = corpus.sparkSession
    // REPLACE the newest complete version rather than appending latest+1:
    // micro-batch updaters read strictly below their own batch id, and on
    // a resumed stream the next batch id is latest+1 — an index written AT
    // latest+1 would be invisible to that batch and then destroyed when
    // the batch overwrites v=batchId. The replacement is staged through a
    // temp directory (invisible to [[latestVersion]] — no `v=` prefix) and
    // swapped in RENAME-FIRST: the live version is renamed aside
    // (v=target -> _reconcile_old), the staged dir renamed in, and only
    // then is the old copy deleted — a complete, discoverable v=target
    // exists at every step. (The earlier delete-then-rename order had a
    // crash window with NO v=target at all: the next micro-batch would
    // silently label against stale v=target-1 while the fresh index sat
    // unreferenced in the temp dir.) A crash between the two renames
    // leaves latestVersion at target-1 with both _reconcile_old and the
    // complete staged dir on disk for recovery — stale but loud, never
    // half-written. NOTE: on object stores (s3a) "rename" is copy+delete,
    // not a metadata op — these windows widen proportionally to index
    // size; an s3a deployment should commit via a version manifest
    // instead of directory renames. Run with the stream stopped (class
    // doc): a live updater's lazy read of v=target still races the swap
    // itself.
    val target = latestVersion(spark, indexPath).getOrElse(0L)
    val (_, freshIndex, repairs) = graft.text.MinHash
      .reconcileIncremental(corpus, staleLabels, idCol, textCol)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexPath/_reconcile_tmp")
    val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
    freshIndex.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val tgt = new org.apache.hadoop.fs.Path(s"$indexPath/v=$target")
    val old = new org.apache.hadoop.fs.Path(s"$indexPath/_reconcile_old")
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    val hadLive = fs.exists(tgt)
    if (hadLive) require(fs.rename(tgt, old), s"rename $tgt -> $old failed")
    require(fs.rename(tmp, tgt), s"rename $tmp -> $tgt failed")
    if (hadLive) fs.delete(old, true)
    repairs
  }
}
