package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cheap decision probes shared by the auto-dispatching operators
  * ([[AsofJoin.leftAsofAuto]], [[SkewJoin.autoInnerJoin]]). A dispatcher's
  * decision scan must cost strictly less than the cheapest plan it can pick,
  * at every scale — these probes are single narrow jobs with no shuffle.
  */
object Probes {

  /** Row count of `df`, capped at `cap + 1` per partition: each split stops
    * iterating once it alone has seen more than `cap` rows, so the job's
    * cost is bounded by splits × cap regardless of input size.
    *
    * This is deliberately NOT `LIMIT n + count`, whose physical plan
    * (LocalLimit → single-partition exchange → GlobalLimit) funnels up to
    * splits × n rows through one task on a big cluster. The capped sum
    * understates the true total only when some split hit its cap — i.e.
    * exactly when the total already exceeds `cap` — so a `<= cap` test on
    * the returned value is exact.
    */
  def cappedCount(df: DataFrame, cap: Long): Long =
    df.select(lit(1).as("__one")).rdd
      .mapPartitions { it =>
        var n = 0L
        while (it.hasNext && n <= cap) { it.next(); n += 1 }
        Iterator.single(n)
      }
      .collect()
      .sum
}
