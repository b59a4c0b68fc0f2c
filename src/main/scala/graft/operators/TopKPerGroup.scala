package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-bounded top-k per group.
  *
  * The plain formulation — `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` — shuffles EVERY row to its group's reducer and sorts there.
  * At 100 TB that is the whole table through the network for a result of
  * k·|groups| rows. This operator inserts a partition-local pre-filter
  * first: each input partition keeps at most k rows per group (bounded
  * min-heaps, one pass), so the shuffle then carries at most
  * k·|groups|·|partitions| rows — independent of table size. A final
  * window rank over the survivors produces exactly the same result as the
  * plain form (any row a partition evicts is beaten by k rows of the same
  * group in that partition, so it cannot be in the global top k).
  *
  * Same algebra as Spark's own `TakeOrderedAndProject` (global top-k),
  * lifted to per-group semantics that Spark has no physical operator for.
  *
  * Determinism: ties on `ord` break by ascending `tiebreak`, which must be
  * unique within a group for a stable result (the q_topk/OHLC convention).
  */
object TopKPerGroup {

  /** Top `k` rows per `keys` group by `ord` DESC, ties by `tiebreak` ASC. */
  def topK(
      df: DataFrame,
      keys: Seq[String],
      ord: String,
      tiebreak: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(ord)
    val tieIdx = schema.fieldIndex(tiebreak)
    // (ord DESC, tiebreak ASC) priority: the heap keeps the k BEST rows,
    // so its ordering puts the worst survivor at the head for eviction.
    // Comparison is EXACT per type (same-class Comparable), never via a
    // double round-trip — doubleValue() collapses distinct longs above
    // 2^53, which could evict the true top-k row before the exact final
    // window ever sees it (and ClassCastExceptions on timestamp ords).
    def cmpVal(a: Any, b: Any): Int = (a, b) match {
      case (x: Comparable[_], y) if x.getClass == y.getClass =>
        x.asInstanceOf[Comparable[Any]].compareTo(y)
      case (x: Number, y: Number) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case _ => throw new IllegalArgumentException(
        s"non-comparable ord/tiebreak values: $a / $b")
    }
    val worstFirst: Ordering[Row] = (r1: Row, r2: Row) => {
      val c = cmpVal(r1.get(ordIdx), r2.get(ordIdx)) // asc: smallest ord = worst
      if (c != 0) c else -cmpVal(r1.get(tieIdx), r2.get(tieIdx)) // larger tiebreak = worse
    }
    val enc = Encoders.row(schema)
    val pruned = df.mapPartitions { rows =>
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val key: Seq[Any] = keyIdx.map(r.get)
        val h = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty(worstFirst.reverse)) // min-heap of best k
        if (h.size < k) h.enqueue(r)
        else if (worstFirst.gt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(enc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ord).desc, col(tiebreak))
    pruned
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
