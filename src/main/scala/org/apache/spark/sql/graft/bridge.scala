package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters (Spark 4
  * moved `Column` to sql-api; classic conversions live behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Lives in the
  * org.apache.spark.sql namespace solely to satisfy the access qualifier —
  * the standard pattern for libraries that define custom Catalyst
  * expressions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built LogicalPlan (classic `Dataset.ofRows`). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Lineage cut for iterative algorithms: compile `df` to an RDD, mark it
    * for local checkpointing, and rewrap as a fresh [[LogicalRDD]] — like
    * `Dataset.localCheckpoint(eager = false)` but WITHOUT carrying the
    * origin plan's `Statistics` into the new leaf. `localCheckpoint`
    * propagates the pre-cut size estimate (`originStats`), and in a
    * fixpoint loop each round's estimate is a *product* over the previous
    * round's (`SizeInBytesOnlyStatsPlanVisitor.visitJoin` multiplies
    * children), so `sizeInBytes` compounds to BigInts with ~3^round digits
    * and Catalyst stats visits start burning minutes of driver CPU per
    * round by round ~10. A fresh leaf restores the default (conservative,
    * never-broadcast) estimate each round: constant-cost planning at any
    * round count. Physical output partitioning and ordering ARE preserved,
    * so a following same-key join or aggregation doesn't re-shuffle. The
    * RDD materializes (and truncates lineage) at the caller's next action.
    */
  def cutLineage(df: DataFrame): DataFrame = cutLineageTracked(df)._1

  /** [[cutLineage]] plus the underlying checkpointed RDD, so fixpoint
    * loops can `unpersist` round N's blocks once round N+1 has
    * materialized (localCheckpoint persists MEMORY_AND_DISK and nothing
    * else ever frees it — a 25-round fixpoint would otherwise hold 25
    * dead label frames in the block manager). Only unpersist AFTER an
    * action has fully materialized every downstream frame that reads the
    * RDD: local checkpointing truncates the consumer's lineage at its own
    * materialization, after which the old blocks are unreachable anyway.
    */
  def cutLineageTracked(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val ds = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    val physical = qe.executedPlan
    val rdd = physical.execute().map(_.copy())
    // EXPLICIT spill-safe storage level (r16): localCheckpoint's default is
    // MEMORY_AND_DISK today, but the cut's safety at 100× — a matched
    // overlap-join output larger than executor memory must spill, not OOM —
    // must not hang off a default that a Spark upgrade or a caller's prior
    // persist() could change (localCheckpoint REUSES any pre-set level).
    // Pinning it here makes every cut's materialization disk-backed by
    // construction; ScaleProbe's overlapleft section measures the spill.
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.localCheckpoint()
    // a PartitioningCollection can reference attributes the analyzed output
    // doesn't expose; keep its first leaf, as Dataset.checkpoint does
    def firstLeaf(p: org.apache.spark.sql.catalyst.plans.physical.Partitioning)
        : org.apache.spark.sql.catalyst.plans.physical.Partitioning = p match {
      case c: org.apache.spark.sql.catalyst.plans.physical.PartitioningCollection =>
        firstLeaf(c.partitionings.head)
      case other => other
    }
    val cut = classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD(
        qe.analyzed.output, rdd, firstLeaf(physical.outputPartitioning),
        physical.outputOrdering, isStreaming = false)(spark))
    (cut, rdd)
  }
}
