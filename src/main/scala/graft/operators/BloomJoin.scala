package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** Bloom-prefiltered semi join — the DIY form of Spark's runtime row-level
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as
  * an explicit operator so it also applies when the build side is the output
  * of an arbitrary sub-pipeline the optimizer can't see through.
  *
  * Shape at scale: one pass over the build side produces a single small
  * bloom sketch (map-side partial aggregation, bytes to the driver, constant
  * size regardless of row count); the sketch rides back into the probe-side
  * scan as a literal predicate, discarding non-matching probe rows BEFORE
  * the semi-join shuffle. False positives are removed by the exact semi join
  * that follows, so the result is identical to the plain semi join — which
  * is what the DuckDB oracle checks.
  */
object BloomJoin {

  /** Build a bloom sketch over `xxhash64(df.key)`; None when `df` is empty. */
  def keyBloom(
      df: DataFrame,
      key: String,
      expectedItems: Long,
      numBits: Long
  ): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(bridge.expression(col(key)))),
      Literal(expectedItems),
      Literal(numBits)
    ).toAggregateExpression()
    val row = df.select(bridge.column(agg).as("bf")).head()
    Option(row.getAs[Array[Byte]]("bf"))
  }

  /** Predicate: bloom (from [[keyBloom]]) might contain `key`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    bridge.column(
      BloomFilterMightContain(
        Literal(bloom),
        new XxHash64(Seq(bridge.expression(key)))))

  /** `left SEMI JOIN right ON leftKey == rightKey`, with the probe side
    * pre-filtered by a bloom of the build-side keys.
    */
  def bloomSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L
  ): DataFrame = {
    // qualify both sides of the condition: with leftKey == rightKey (the
    // natural call) an unqualified col(name) is ambiguous, and on shared
    // lineage it can resolve both sides to the SAME attribute — a
    // trivially-true condition that would void the exact semi join
    val r = right.select(col(rightKey).as("__bloom_rk")).distinct()
    def semi(l: DataFrame) = l.join(r, col(leftKey) === col("__bloom_rk"), "left_semi")
    keyBloom(right, rightKey, expectedItems, numBits) match {
      case Some(bf) => semi(left.filter(mightContain(bf, col(leftKey))))
      case None =>
        // empty build side: semi join is empty; keep the plan shape
        semi(left)
    }
  }
}
