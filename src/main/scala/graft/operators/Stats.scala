package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed robust statistics: MAD outlier detection and group-wise
  * OLS trend fitting — the profiling/anomaly layer a data-quality
  * pipeline runs next to the constraint audit (is this batch's value
  * distribution shaped like last batch's? is a source drifting?).
  *
  * Scale shape: both are aggregation-only dataflows. MAD is two exact
  * percentile aggregations with the (tiny) per-group medians broadcast
  * back between them — no window over the full table. OLS is ONE pass
  * of integer moment sums (n, Σx, Σy, Σxy, Σx²) per group — map-side
  * combinable and order-independent because the sums are exact BIGINTs —
  * followed by closed-form arithmetic on the 5 moments; the rows are
  * never touched again.
  */
object Stats {

  /** Median / MAD (median absolute deviation) per group, plus the count
    * of |x − median| > k·MAD outliers — the robust alternative to
    * z-scores (one wild value shifts a mean/stddev fence, not a median
    * fence). Exact percentile semantics (Spark `percentile`, DuckDB
    * `quantile_cont`): both interpolate identically on identical
    * doubles, the parity the q_percentile_cont oracle already pins.
    *
    * @return (group..., n_rows, med, mad, n_outliers)
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Double = 3.0
  ): DataFrame = {
    val g = groupCols.map(col)
    val medians = df.groupBy(g: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(medians), groupCols)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mads = dev.groupBy(g: _*)
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    dev.join(broadcast(mads), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"), first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum((col("__ad") > lit(k) * col("mad")).cast("long")).as("n_outliers"))
  }

  /** Per-group simple linear regression y ~ x by exact integer moments:
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), emitted e6-scaled after one
    * signed truncating division (Spark `div` ≡ DuckDB `//`, the
    * [[LinearProbe]] parity). `xCol`/`yCol` must already be integral and
    * offset near zero at the caller (e.g. hours since the period start,
    * centi-units of the measure): with |x| ≤ X, |y| ≤ Y over n rows per
    * group the worst moment product is n²XY (+ n²X² for the
    * denominator), which must stay under 2^62 — e.g. X=720 h, Y=4e3,
    * n=1e6 rows/group ⇒ 3e15, comfortably inside. The final ·1e6
    * scaling runs in DECIMAL(38,0) (DuckDB HUGEINT), so it cannot
    * overflow even at those bounds.
    *
    * @return (group..., n, slope_e6, intercept_e6); groups with a
    *         degenerate x spread (denominator 0) are dropped
    */
  def groupOls(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column
  ): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ xCol.cast("long").as("__x") :+ yCol.cast("long").as("__y"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
      .withColumn("__num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("__den") =!= 0L)
      .withColumn("slope_e6", expr(
        "CAST(CAST(__num AS DECIMAL(38,0)) * 1000000 div CAST(__den AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("__inum", col("sy") * col("sxx") - col("sx") * col("sxy"))
      .withColumn("intercept_e6", expr(
        "CAST(CAST(__inum AS DECIMAL(38,0)) * 1000000 div CAST(__den AS DECIMAL(38,0)) AS BIGINT)"))
      .select(g ++ Seq(col("n"), col("slope_e6"), col("intercept_e6")): _*)
  }
}
