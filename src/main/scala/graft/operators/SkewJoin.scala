package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant salted equi-join.
  *
  * At 100 TB a single hot join key (one instrument, one degenerate user_id)
  * turns a hash-partitioned shuffle join into one straggler task. Salting
  * splits every fact-side key into `salts` sub-keys and replicates the other
  * side across all salt values, so the hot key's rows spread over `salts`
  * tasks. AQE's skew-join handles the *sort-merge* case adaptively; this
  * operator is the explicit, planner-independent form (and works for
  * shuffled-hash joins and pre-AQE plans).
  *
  * The salt is deterministic — `xxhash64` over the whole fact row — so the
  * join result is bit-identical to the unsalted join (the salt only routes
  * rows, it never changes the match set), which is exactly what the DuckDB
  * oracle checks.
  */
object SkewJoin {

  /** Inner equi-join `left.leftKey == right.rightKey` with fact-side salting.
    *
    * @param left  large, potentially key-skewed side (gets the salt column)
    * @param right smaller side (replicated `salts`-fold before the shuffle)
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int
  ): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // hash the full row, not the key: salting the key alone would keep every
    // row of a hot key in one bucket, which is the skew we're breaking up
    val l = left.withColumn(
      "__salt_l",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val r = right.withColumn(
      "__salt_r",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(
        r,
        l(leftKey) === r(rightKey) && l("__salt_l") === r("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
