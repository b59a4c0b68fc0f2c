package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.{PolyMod, PolyMod2}

/** Fixed-memory frequency/cardinality sketches for corpus statistics at
  * 100 TB, built so the sketch STATE is exact cross-engine arithmetic.
  *
  * At scale, "count every token" and "count distinct everything" stop
  * fitting anywhere: the exact token-frequency table of a web corpus is
  * itself a large table, and exact distinct counts need a full shuffle of
  * the keys. The two classic answers — Count-Min (Cormode & Muthukrishnan
  * 2005) for frequencies, HyperLogLog (Flajolet et al. 2007) for
  * cardinality — are both one-pass, mergeable (counter-sum / register-max
  * are associative, so map-side partial aggregation applies), and bounded
  * at `d·w` counters / `m` registers regardless of input size.
  *
  * Unlike library sketches (whose hash seeds and register layouts are
  * engine-private, forcing rows-only checks — cf. the q_hll_distinct
  * caveat), these are built on the repo's deterministic polynomial hashes,
  * so every counter, register, and the HLL raw estimate itself are
  * reproduced bit-for-bit by a SQL engine and hash-oracled.
  */
object Sketches {

  /** Pairwise-independent row hash for CMS row `j`, over a token's
    * polynomial fingerprint `fp` ∈ [0, PolyMod): `((a_j·fp + b_j) mod P)
    * mod w` with per-row constants `a_j = (2654435761 + 40503·j) mod P`,
    * `b_j = (2246822519·j) mod P` — the standard universal family `ax+b
    * mod p mod w`. Seeding the VALUE hash per row (rather than folding the
    * string with a different seed) matters: a seeded poly fold only shifts
    * same-length strings by a common constant, so row hashes would collide
    * together and the min over rows would never repair a collision.
    * All products < 2^60 — exact in any 64-bit engine.
    */
  def cmsCell(fp: Column, j: Column, w: Int): Column = {
    val aj = pmod(lit(2654435761L) + lit(40503L) * j, lit(PolyMod))
    val bj = pmod(lit(2246822519L) * j, lit(PolyMod))
    pmod(pmod(aj * fp + bj, lit(PolyMod)), lit(w.toLong))
  }

  private def fingerprint(item: Column): Column =
    graft.text.TextFunctions.polyHash(item, lit(0L))

  /** Build a `d×w` Count-Min sketch over an item stream: rows `(j, bucket,
    * cnt)` with `cnt` the number of stream occurrences hashing to that
    * cell (absent cells are zero). One explode (d rows per item) and one
    * partial-aggregating groupBy over at most `d·w` distinct cells — the
    * reduce side is sketch-sized, not corpus-sized, so the shuffle is
    * O(partitions·d·w) regardless of stream length. Sketches over corpus
    * shards merge by summing cell counts (plain unionByName + re-groupBy).
    */
  def cmsSketch(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, "need d >= 1 rows and w >= 2 buckets")
    items
      .select(fingerprint(col(itemCol)).as("__fp"))
      .select(col("__fp"), explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .select(col("j").cast("int").as("j"),
        cmsCell(col("__fp"), col("j"), w).cast("int").as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate item frequencies from a CMS: `est(x) = min_j
    * cnt[j, h_j(x)]` — an overestimate of the true count by at most the
    * collision mass (never an underestimate). The sketch is ≤ `d·w` rows
    * BY CONSTRUCTION, so it broadcasts; the estimate is a per-item map-side
    * lookup plus a d-row min — no shuffle of the candidate set beyond its
    * own groupBy.
    */
  def cmsEstimate(
      sketch: DataFrame,
      items: DataFrame,
      itemCol: String,
      d: Int,
      w: Int
  ): DataFrame = {
    val cells = items
      .select(col(itemCol).as("item"), fingerprint(col(itemCol)).as("__fp"))
      .select(col("item"), col("__fp"),
        explode(sequence(lit(0L), lit(d - 1L))).as("j"))
      .select(col("item"), col("j").cast("int").as("j"),
        cmsCell(col("__fp"), col("j"), w).cast("int").as("bucket"))
    cells
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HLL register table over an item stream: `m` rows `(bucket, reg)`.
    *
    * Hash: the repo's 59-bit pair `h = base(s)·PolyMod2 + base2(s)` packs
    * two poly folds ([[graft.text.MinHash.bandHashes]]'s construction),
    * then — crucially — h's DECIMAL-DIGIT string is re-folded to produce
    * the bucket (`base(digits) mod m`) and the rank source
    * (`v = base2(digits)`). The re-fold is the avalanche step: poly folds
    * are linear over the modulus, so correlated inputs (sequential ids,
    * shared prefixes) leave the packed value's bit pattern correlated —
    * measured +73% cardinality bias on `id_0..id_19999` without the
    * re-fold; within ±7% with it. Digit extraction is nonlinear over Z_P,
    * and `CAST(h AS STRING)` is engine-identical for non-negative
    * integers, so the mix stays exactly SQL-mirrorable where a wrapping
    * 64-bit multiply finalizer (splitmix-style) would not be (DuckDB
    * BIGINT multiply errors on overflow rather than wrapping).
    *
    * Register observable: the TRAILING-zero rank `rho(v) = tz(v) + 1`
    * (Flajolet's PCSA convention; geometric with P(rho = k) = 2^-k like
    * the leading-zero form). tz is computed EXACTLY as `log2(v & -v)`:
    * `v & -v` isolates the lowest set bit, a power of two, and IEEE
    * `log2` of a power of two is exact in any engine — no float latitude
    * anywhere. `v = 0` (probability ~2^-30) pins rho to 53. Register =
    * max rho per bucket; shard sketches merge by register max.
    */
  def hllRegisters(items: DataFrame, itemCol: String, m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two >= 2")
    items
      .select((graft.functions.exprs.polyBase(col(itemCol)) * lit(PolyMod2) +
        graft.functions.exprs.polyBase2(col(itemCol)))
        .cast("string").as("d"))
      .select(
        pmod(graft.functions.exprs.polyBase(col("d")), lit(m.toLong)).as("bucket"),
        graft.functions.exprs.polyBase2(col("d")).as("v"))
      .select(col("bucket"),
        when(col("v") === 0L, lit(53L))
          .otherwise(log2(expr("v & -v")).cast("long") + lit(1L)).as("rho"))
      .groupBy("bucket")
      .agg(max(col("rho")).as("reg"))
  }

  /** Per-group HLL register tables: one `m`-register sketch per value of
    * `groupCols` — the "distinct tokens per language / per source" shape
    * of a corpus data card, in `|groups|·m` state instead of a
    * vocab-sized distinct per group. Same partial-aggregating register
    * max, keyed by (group, bucket).
    */
  def hllRegistersBy(
      items: DataFrame,
      itemCol: String,
      groupCols: Seq[String],
      m: Int
  ): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two >= 2")
    items
      .select(col("*"),
        (graft.functions.exprs.polyBase(col(itemCol)) * lit(PolyMod2) +
          graft.functions.exprs.polyBase2(col(itemCol)))
          .cast("string").as("__d"))
      .select((groupCols.map(col) :+
        pmod(graft.functions.exprs.polyBase(col("__d")), lit(m.toLong)).as("bucket") :+
        graft.functions.exprs.polyBase2(col("__d")).as("__v")): _*)
      .select((groupCols.map(col) :+ col("bucket") :+
        when(col("__v") === 0L, lit(53L))
          .otherwise(log2(expr("__v & -__v")).cast("long") + lit(1L)).as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Per-group estimates from [[hllRegistersBy]] output: same exact
    * integer harmonic sum and IEEE-deterministic estimate as
    * [[hllEstimate]], one row per group.
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 512,
      "m must be a power of two in [2, 512] (BIGINT-exact harmonic sum)")
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(expr("shiftleft(1L, CAST(53 - reg AS INT))")).as("__zp"))
      .select((groupCols.map(col) :+ col("n_buckets_used") :+
        (col("__zp") +
          (lit(m.toLong) - col("n_buckets_used")) * lit(1L << 53)).as("z_scaled")): _*)
      .withColumn("hll_est",
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
          lit((m.toDouble * m.toDouble)) * lit(9007199254740992.0)) /
          col("z_scaled").cast("double"))
  }

  /** Raw HLL estimate from a register table, exact-deterministically.
    *
    * The harmonic sum Σ 2^-reg is kept in INTEGER arithmetic:
    * `z_scaled = Σ 2^(53-reg) + (m - present)·2^53` (every term ≤ 2^53,
    * sum < m·2^53 ≤ 2^63 for m ≤ 512 — BIGINT-exact, order-independent,
    * so Spark's partial-agg order can't perturb it, and a SQL engine
    * reproduces it bit-for-bit). The only float step is the final
    * `alpha_m · m² · 2^53 / z_scaled`, built from correctly-rounded IEEE
    * ops on literals, identical across engines when the expression is
    * mirrored with the same association.
    *
    * Returns one row: (n_buckets_used, z_scaled, hll_est). Raw estimate
    * only — the small/large-range corrections need `ln`/linear counting
    * branches that are float-laden and unnecessary for the sketch's
    * oracle; apply them reader-side if needed.
    */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 512,
      "m must be a power of two in [2, 512] (BIGINT-exact harmonic sum)")
    registers
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(expr("shiftleft(1L, CAST(53 - reg AS INT))")).as("__zp"))
      .select(col("n_buckets_used"),
        (col("__zp") +
          (lit(m.toLong) - col("n_buckets_used")) * lit(1L << 53)).as("z_scaled"))
      .withColumn("hll_est",
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
          lit((m.toDouble * m.toDouble)) * lit(9007199254740992.0)) /
          col("z_scaled").cast("double"))
  }
}
