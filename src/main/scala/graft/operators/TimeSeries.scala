package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Sequential per-key time-series recursions.
  *
  * EWMA (`y_t = α·x_t + (1−α)·y_{t−1}`) is not an algebraic aggregate — each
  * row depends on the full ordered prefix — so it cannot be a window
  * aggregate without an O(prefix) frame. This is the one shape SURVEY §7.3
  * reserves for the `mapPartitions` escape hatch: repartition by key, sort
  * within partitions by (key, time, tiebreak), then one sequential scan per
  * partition carrying ONE double of state per open key.
  *
  * Scale shape: one shuffle (hash by key), then map-side-only streaming; no
  * window buffers, no driver collect. State per task is a single (key,
  * accumulator) pair, so a 10⁹-row key costs memory O(1) — a skewed key
  * costs TIME in its one task; if that bites, split the series into coarse
  * time buckets and stitch boundaries like AsofJoin.leftAsofBucketed.
  */
object TimeSeries {

  /** Appends an `ewma` column to `df`.
    *
    * @param key      partition key column name (series id)
    * @param time     ordering column within the key
    * @param tiebreak total-order tiebreak within equal times
    * @param value    numeric column to smooth
    * @param alpha    smoothing factor in (0, 1]; the first row of each key
    *                 seeds the state with its own value
    */
  def ewma(
      df: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      value: String,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    // nullable output: a NULL input value yields a NULL ewma for that row
    // and is skipped by the recursion (it neither seeds nor decays the
    // state) — a single NULL must not NPE a full-table pass
    val outSchema = df.schema.add("ewma", DoubleType, nullable = true)
    val enc = Encoders.row(outSchema)
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(value)
    df.repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(tiebreak))
      .mapPartitions { it =>
        var curKey: Any = null
        var state = 0.0
        var open = false
        it.map { r =>
          val k = r.get(keyIdx)
          if (k != curKey) { curKey = k; open = false }
          val n = r.getAs[Number](valIdx)
          if (n == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val x = n.doubleValue()
            if (!open) { state = x; open = true }
            else state = alpha * x + (1.0 - alpha) * state
            Row.fromSeq(r.toSeq :+ state)
          }
        }
      }(enc)
  }

  /** Per-key cumulative product via the same scan (e.g. compounding
    * returns); included as a second recursion over the shared machinery.
    */
  def cumprod(
      df: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      value: String
  ): DataFrame = {
    val outSchema = df.schema.add("cumprod", DoubleType, nullable = true)
    val enc = Encoders.row(outSchema)
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(value)
    df.repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(tiebreak))
      .mapPartitions { it =>
        var curKey: Any = null
        var state = 1.0
        var open = false
        it.map { r =>
          val k = r.get(keyIdx)
          if (k != curKey) { curKey = k; open = false }
          val n = r.getAs[Number](valIdx)
          if (n == null) Row.fromSeq(r.toSeq :+ null)
          else {
            val x = n.doubleValue()
            if (!open) { state = x; open = true }
            else state = state * x
            Row.fromSeq(r.toSeq :+ state)
          }
        }
      }(enc)
  }
}
