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

  /** The hash needs an integral key: a non-numeric column would cast to
    * NULL and silently EMPTY every sample / mislabel every split. The
    * DataFrame entry points validate loudly instead; hash string keys
    * first (e.g. `xxhash64(col)`) and sample on that.
    */
  private def requireNumericKey(df: DataFrame, key: String, op: String): Unit = {
    val dt = df.schema(key).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op key '$key' must be numeric, got $dt — hash non-numeric keys first (xxhash64)")
  }

  /** Keep rows whose hash lands in `[0, num)` of `denom` residue classes —
    * a deterministic `num/denom` sample.
    */
  def hashSample(df: DataFrame, key: String, num: Int, denom: Int): DataFrame = {
    require(num >= 1 && denom > num, "need 1 <= num < denom")
    requireNumericKey(df, key, "hashSample")
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

  /** Domain-mixture sampling: keep each row with a per-stratum rate (per
    * mille), the "3× Wikipedia, 0.5× CommonCrawl" weighting step of a
    * training-data mix. Same exact-hash selection as [[hashSample]], so the
    * chosen row set is layout-independent, refinable (raising a stratum's
    * rate only ADDS rows), and SQL-reproducible. Pure per-row filter — no
    * shuffle; the rate lookup is a literal CASE chain (fine for the tens of
    * domains a mixture spec names; a broadcast join would replace it for
    * thousands).
    *
    * Rates > 1000‰ mean "keep everything" (upsampling beyond 1× is epoch
    * repetition, a reader-side concern, not a filter).
    */
  def mixtureSample(
      df: DataFrame,
      key: String,
      stratum: String,
      ratesPm: Map[String, Int],
      defaultPm: Int = 0
  ): DataFrame = {
    requireNumericKey(df, key, "mixtureSample")
    val rate = ratesPm.toSeq.sortBy(_._1).foldLeft(lit(defaultPm): Column) {
      case (acc, (s, pm)) => when(col(stratum) === s, lit(pm)).otherwise(acc)
    }
    df.filter(pmod(detHash(col(key)), lit(1000L)) < rate)
  }

  /** Deterministic per-epoch global shuffle key: order the corpus by this
    * (then by `key` for total order) to get a reproducible, epoch-varying
    * permutation. `orderBy` over it is a range-partitioned sort — the
    * scale-correct global shuffle (sampled range boundaries, no single-task
    * bottleneck), unlike a row_number window. Exact modular arithmetic
    * (products < 2^60), so any SQL engine reproduces the permutation.
    *
    * The epoch varies the MULTIPLIER, not an additive offset: adding a
    * constant mod P shifts every key equally and leaves the sort order
    * untouched except at the wraparound (caught by SamplingSpec), whereas
    * multiplication by a nonzero constant mod prime P is a genuine
    * permutation of the residues.
    */
  def epochShuffleKey(key: Column, epoch: Int): Column = {
    val m = (2654435761L + 40503L * epoch) % 1000000007L
    pmod(
      pmod(key.cast("long"), lit(1000000007L)) * lit(m) + lit(epoch.toLong),
      lit(1000000007L))
  }

  /** Per-row weighted Bernoulli sample: keep each row with probability
    * `min(w, cap)/cap` for an integer weight column (e.g. a quality score
    * or length) — the "keep good documents more often" downsampling step,
    * continuous-weight counterpart of [[mixtureSample]]'s per-stratum
    * rates. Same exact-hash selection: deterministic across layouts and
    * re-runs, monotone in the weight (raising a row's weight can only add
    * it, never drop others), SQL-reproducible, and a pure per-row filter —
    * no shuffle, pushdown-friendly.
    */
  def weightedSample(df: DataFrame, key: String, weightCol: String, cap: Long): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    requireNumericKey(df, key, "weightedSample")
    df.filter(pmod(detHash(col(key)), lit(cap)) <
      least(greatest(col(weightCol).cast("long"), lit(0L)), lit(cap)))
  }

  /** Class-balanced downsampling: every stratum is cut to the size of the
    * smallest one, choosing rows by hash order (deterministic, unbiased
    * w.r.t. the hash). One window shuffle on `stratum`; the global minimum
    * broadcasts.
    */
  def stratifiedEqualize(df: DataFrame, stratum: String, key: String): DataFrame = {
    requireNumericKey(df, key, "stratifiedEqualize")
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
