package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join operator (SURVEY.md §4: the one candidate for a custom
  * physical strategy; reference semantics `clickhouse_ohlc_generator.py:
  * 187-190` — for each left row, the latest right row with
  * right.time <= left.time within the same key group, NULLs otherwise).
  *
  * Compared to the union+window rewrite in [[graft.operators.AsofJoin]]:
  * both shuffle once on the keys, but the window form sorts the
  * *concatenation* of both sides and carries a payload struct through the
  * window machinery, while this operator sorts each side independently
  * (required child orderings) and then streams an O(n+m) single-pass
  * merge per partition with one retained right row — no window state, no
  * union materialization. Equal-time ties resolve to the greatest
  * (time, payload) right row, matching the window form bit-for-bit.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute] // right-side attributes to attach (nullable out)
) extends BinaryNode {
  // The exec's comparators are built from the LEFT side's data types and
  // applied to both sides' projected rows — mismatched types would read
  // the right rows' storage with the wrong accessor and produce garbage
  // matches instead of an error. Fail at plan construction instead.
  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    s"as-of join key types must match pairwise: " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")
  // ClusteredDistribution(Nil) fails deep inside physical planning with an
  // opaque "requirement failed" — surface the limitation here instead
  require(leftKeys.nonEmpty,
    "native as-of join requires at least one key column; for a keyless " +
      "(global) as-of use the window rewrite AsofJoin.leftAsof")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute]
) extends BinaryExecNode {

  private val payloadAttrs: Seq[Attribute] =
    payload.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // the merge streams left partitions 1:1 (rows in order, payload appended),
  // so the left child's partitioning and this node's required left ordering
  // SURVIVE the join. Without these overrides the exec reported
  // UnknownPartitioning and downstream same-key operators — the flagship's
  // as-of → groupBy(instrument) OHLC aggregation — inserted a second full
  // shuffle and sort of data already partitioned and sorted correctly.
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // each side sorted by (keys, time[, payload]) within its partitions; the
  // trailing payload order on the right makes equal-time winners the max
  // payload — the same deterministic tie-break as the window rewrite
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending),
        SortOrder(CreateStruct.create(payload), Ascending))
  )

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val numPayload = payload.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val resultProj = UnsafeProjection.create(output, left.output ++ payloadAttrs)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))

      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(numPayload)

      // single retained right state: last right row (projected payload)
      // whose (key, time) is <= the current left cursor
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null
      var pendingR: InternalRow = if (rIter.hasNext) rIter.next() else null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow).copy()
        // advance the right side to the last row at-or-before (lKey, lTime)
        var advancing = true
        while (advancing && pendingR != null) {
          val rKey = rKeyProj(pendingR)
          val kc = keyOrdering.compare(rKey, lKey)
          val rTime = rTimeProj(pendingR)
          // a NULL right time can never satisfy time >= rightTime (SQL
          // three-valued comparison), but the natural ascending ordering
          // sorts NULL smallest — untreated, such a row would be consumed
          // as "before everything" and its payload would fill left rows
          // the window rewrite correctly leaves NULL. Skip it without
          // touching the retained state.
          val take =
            kc < 0 || (kc == 0 && timeOrdering.compare(rTime, lTime) <= 0)
          if (take) {
            if (kc == 0 && !rTime.isNullAt(0)) {
              lastKey = rKey.copy()
              lastPayload = payloadProj(pendingR).copy()
            } else if (kc != 0) {
              // right row belongs to an earlier key group: drop state
              lastKey = null; lastPayload = null
            }
            pendingR = if (rIter.hasNext) rIter.next() else null
          } else advancing = false
        }
        val matched =
          lastKey != null && keyOrdering.compare(lastKey, lKey) == 0
        resultProj(joined(lRow, if (matched) lastPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}
