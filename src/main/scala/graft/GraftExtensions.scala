package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get them
  * too:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT poly_base(text), cosine_sim(a, b) FROM ...")
  *
  * For an already-built session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.NsTimestampPushdown)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("poly_base",
      info("poly_base", "poly_base(str) - rolling polynomial hash base (mod 1e9+7)"),
      (es: Seq[Expression]) => PolyBase(es.head)),
    ("poly_base2",
      info("poly_base2",
        "poly_base2(str) - independent second rolling hash (base 137 mod 998244353)"),
      (es: Seq[Expression]) => PolyBase2(es.head)),
    ("poly_pow",
      info("poly_pow", "poly_pow(str) - 131^length(str) mod 1e9+7"),
      (es: Seq[Expression]) => PolyPow(es.head)),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - sequential double dot product of float arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of float arrays"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))),
    ("dot_product_long",
      info("dot_product_long",
        "dot_product_long(a, b) - exact integer dot product of bigint arrays"),
      (es: Seq[Expression]) => DotProductLong(es.head, es(1))),
    ("l2_sq",
      info("l2_sq", "l2_sq(a, b) - sequential double squared-L2 distance of float arrays"),
      (es: Seq[Expression]) => L2Sq(es.head, es(1))),
    ("ohlc_agg",
      info("ohlc_agg",
        "ohlc_agg(value, ord) - fused (open, high, low, close, n) aggregate over ord order"),
      (es: Seq[Expression]) => OhlcAgg(es.head, es(1)).toAggregateExpression()),
    ("hyperplane_buckets",
      info("hyperplane_buckets",
        "hyperplane_buckets(vec, nbits, tables) - multi-table random-hyperplane LSH bucket ids"),
      (es: Seq[Expression]) => {
        def intOf(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        HyperplaneBuckets(es.head, intOf(es(1)), intOf(es(2)))
      }),
    ("z_value",
      info("z_value",
        "z_value(x, y, bits) - Z-order (Morton) interleave of the low bits of two bigints"),
      (es: Seq[Expression]) => {
        def intOf(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        ZValue(es.head, es(1), intOf(es(2)))
      })
  )

  /** Register the functions on an existing session (temp functions), plus
    * the optimizer rule and the as-of planner strategy via the
    * experimental hooks (idempotent) — the same surface `withExtensions`
    * installs at session build.
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NsTimestampPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NsTimestampPushdown
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
