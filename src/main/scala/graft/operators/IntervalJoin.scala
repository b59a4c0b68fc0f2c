package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join for two LARGE interval sets — the
  * non-equi shape `l.key = r.key AND l.start < r.end AND r.start < l.end`
  * (half-open [start, end) overlap). Catalyst executes that shape as a
  * join on the key alone with the range predicate as a RESIDUAL filter:
  * every (l, r) pair sharing a key is enumerated and then filtered — a
  * per-key cross product, quadratic in per-key rows (and a full
  * broadcast nested loop when there is no key at all). Fine when one
  * side broadcasts and keys are selective (the engine's q_range_join is
  * exactly that shape); hopeless when both sides are big and keys are
  * hot — one instrument's month of intervals against another's is
  * |L_k| × |R_k| comparisons.
  *
  * Here the join key is WIDENED to (keys, coarse time bucket) plus an
  * exact refine — the same decomposition the bucketed as-of form uses
  * ([[AsofJoin.leftAsofBucketed]]), applied to overlap semantics. Only
  * pairs sharing a bucket are enumerated, so per-key work drops from
  * |L_k| × |R_k| to Σ_buckets |L_kb| × |R_kb| — linear-ish when interval
  * length is bounded relative to the key's time span:
  *
  *   1. each interval explodes to the buckets it covers
  *      (`floor(start/B) .. floor((end-1µs)/B)` — ceil(len/B)+1 rows,
  *      bounded when `bucketSeconds` ≈ the longest interval);
  *   2. hash-join on (keys, bucket) — shuffle-partitioned, no broadcast,
  *      no nested loop, AQE-skew-splittable like any equi join;
  *   3. refine with the exact overlap predicate;
  *   4. emit each qualifying pair EXACTLY ONCE without a dedup shuffle:
  *      a pair spanning several shared buckets is attributed to the
  *      bucket of `greatest(l.start, r.start)` — a bucket both sides
  *      provably cover (overlap means maxStart < min(l.end, r.end), so
  *      its bucket lies inside both covered ranges).
  *
  * Scale: replication factor per row is ceil(len/B)+1 (callers size
  * `bucketSeconds` to their longest interval → ≤ 2); cost is one shuffle
  * of each (replicated) side — the same class as an equi join, at any
  * left:right ratio. Intervals must be well-formed (start < end):
  * zero-length and NULL-bounded intervals are empty sets under half-open
  * semantics, match nothing, and are dropped up front (the naive
  * residual predicate would CLAIM a zero-length [t, t) overlaps an
  * interval containing t — `s < e_r && s_r < e` silently assumes
  * well-formedness; this operator makes the assumption explicit).
  *
  * Result rows equal the naive theta join's exactly (randomized
  * equivalence spec vs the broadcast nested-loop plan), so the choice is
  * purely physical — the oracle for `q_interval_overlap` runs the plain
  * non-equi SQL in DuckDB.
  */
object IntervalJoin {

  /** Inner overlap join: all left columns, plus the right side's
    * non-key columns suffixed with `suffix`.
    *
    * @param on            equi key columns (present in both sides)
    * @param leftStart/End half-open interval bounds on the left
    * @param rightStart/End half-open interval bounds on the right
    * @param bucketSeconds coarse bucket width; size to the LONGEST
    *                      interval so replication stays ≤ 2 rows per input
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      suffix: String = "_r",
      bucketSeconds: Long = 3600L
  ): DataFrame = {
    require(on.nonEmpty, "overlapJoin needs at least one equi key column")
    require(bucketSeconds >= 1L, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val bMicros = bucketSeconds * 1000000L
    def micros(c: String): Column = unix_micros(col(c).cast("timestamp"))
    def bucketsOf(start: String, end: String): Column =
      sequence(floor(micros(start) / bMicros).cast("long"),
        floor((micros(end) - 1L) / bMicros).cast("long"))

    val l = left
      .filter(col(leftStart).isNotNull && col(leftEnd).isNotNull &&
        micros(leftStart) < micros(leftEnd))
      .withColumn("__b", explode(bucketsOf(leftStart, leftEnd)))
    val rCols = right.columns.filterNot(on.contains)
    val r = right
      .filter(col(rightStart).isNotNull && col(rightEnd).isNotNull &&
        micros(rightStart) < micros(rightEnd))
      .select(on.map(col) ++ rCols.map(c => col(c).as(c + suffix)): _*)
      .withColumn("__b", explode(bucketsOf(rightStart + suffix, rightEnd + suffix)))

    l.join(r, on :+ "__b")
      // exact overlap refine (half-open): the bucket match is only a
      // coarse filter — adjacent intervals share a bucket without overlap
      .filter(micros(leftStart) < micros(rightEnd + suffix) &&
        micros(rightStart + suffix) < micros(leftEnd))
      // emit-once: attribute the pair to the later start's bucket, which
      // both covered ranges contain
      .filter(col("__b") ===
        floor(greatest(micros(leftStart), micros(rightStart + suffix)) / bMicros)
          .cast("long"))
      .drop("__b")
  }

  /** [[overlapJoin]] with the bucket width MEASURED instead of guessed:
    * one narrow no-shuffle probe ([[Probes.maxIntervalSeconds]]) finds the
    * longest interval on either side, and the bucket is sized to it — the
    * width that bounds replication at ceil(len/B)+1 ≤ 2 rows per input.
    * Same dispatch philosophy as [[AsofJoin.leftAsofAuto]]: the decision
    * scan is a single max-aggregation over two derived columns, constant
    * next to the join it fronts at any scale, and the width is purely
    * physical (equivalence holds at ANY width — spec-pinned), so probe
    * error can only move cost, never rows.
    */
  def overlapJoinAuto(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      suffix: String = "_r"
  ): DataFrame = {
    val maxLen = math.max(
      Probes.maxIntervalSeconds(left, leftStart, leftEnd),
      Probes.maxIntervalSeconds(right, rightStart, rightEnd))
    // degenerate inputs (empty, or nothing well-formed) join to nothing —
    // any width is equivalent, take the hour default
    val width = if (maxLen <= 0L) 3600L else maxLen
    overlapJoin(left, right, on, leftStart, leftEnd, rightStart, rightEnd,
      suffix, width)
  }
}
