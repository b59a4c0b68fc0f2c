package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, shuffle-free sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is irreproducible across runs/partitionings
  * and un-checkable against an oracle. Everything here derives from an exact
  * modular hash of a stable key, so (a) the same row set is selected on any
  * cluster layout, at any scale, on re-run, (b) samples are refinable —
  * `1/20` is a strict subset of `1/10` when `denom` doubles with the same
  * numerator test, and (c) a SQL engine reproduces the selection
  * bit-for-bit.
  *
  * Scale shape: [[hashSample]] and [[splitLabel]] are pure per-row
  * projections/filters — no shuffle, fully pushdown-friendly, codegen'd
  * arithmetic. [[stratifiedEqualize]] adds one window shuffle on the
  * stratum key plus a broadcast of the per-stratum minimum.
  */
object Sampling {

  /** Knuth-style multiplicative hash in exact modular arithmetic: both
    * factors stay < 2^31 and < P, so the product is < 2^62 — no overflow in
    * any engine. DuckDB twin:
    * `((key % 1000000007) * 2654435761) % 1000000007`.
    */
  def detHash(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))

  /** Keep rows whose hash lands in `[0, num)` of `denom` residue classes —
    * a deterministic `num/denom` sample.
    */
  def hashSample(df: DataFrame, key: String, num: Int, denom: Int): DataFrame = {
    require(num >= 1 && denom > num, "need 1 <= num < denom")
    df.filter(pmod(detHash(col(key)), lit(denom.toLong)) < num)
  }

  /** Deterministic train/val/test label from the key hash (per-mille
    * boundaries, e.g. 800/100 → 80% train, 10% val, 10% test).
    */
  def splitLabel(key: Column, trainPm: Int = 800, valPm: Int = 100): Column = {
    val r = pmod(detHash(key), lit(1000L))
    when(r < trainPm, "train")
      .when(r < trainPm + valPm, "val")
      .otherwise("test")
  }

  /** Class-balanced downsampling: every stratum is cut to the size of the
    * smallest one, choosing rows by hash order (deterministic, unbiased
    * w.r.t. the hash). One window shuffle on `stratum`; the global minimum
    * broadcasts.
    */
  def stratifiedEqualize(df: DataFrame, stratum: String, key: String): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(detHash(col(key)), col(key))
    val ranked = df.withColumn("__rk", row_number().over(w))
    val minN = ranked.groupBy(stratum).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__minn"))
    ranked.crossJoin(broadcast(minN))
      .filter(col("__rk") <= col("__minn"))
      .drop("__minn")
      .withColumnRenamed("__rk", "rk")
  }
}
