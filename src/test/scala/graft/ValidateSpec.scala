package graft

import org.apache.spark.sql.functions._

/** [[Validate.compareStores]] against fixture store pairs: identical
  * stores pass; each reference failure class (row-count drift beyond
  * 0.1%, price mismatch beyond 1e-10, min/max key drift, empty side)
  * trips its own error.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(Long, Double, Double)]) =
    rows.toDF("ts", "bid", "ask")

  private val base = ticks((1L to 2000L).map(i =>
    (i, 1.0 + i * 1e-4, 1.0005 + i * 1e-4)))

  test("identical stores pass with full match accounting") {
    val r = Validate.compareStores(base, base)
    assert(r.passed, r.errors.mkString("; "))
    assert(r.leftRows == 2000 && r.rightRows == 2000)
    assert(r.matchingRows == 2000 && r.onlyLeft == 0 && r.onlyRight == 0)
    assert(r.leftMinKey == r.rightMinKey && r.leftMaxKey == r.rightMaxKey)
    assert(r.columns.map(_.column).toSet == Set("bid", "ask"))
    assert(r.columns.forall(_.mismatches == 0))
  }

  test("sub-tolerance price noise still passes; beyond-tolerance fails with samples") {
    val noisy = base.withColumn("bid", col("bid") + lit(1e-12))
    assert(Validate.compareStores(base, noisy).passed)
    // 3 rows pushed past 1e-10 on bid only
    val bad = base.withColumn("bid",
      when(col("ts") <= 3, col("bid") + lit(1e-6)).otherwise(col("bid")))
    val r = Validate.compareStores(base, bad)
    assert(!r.passed)
    val bidRep = r.columns.find(_.column == "bid").get
    assert(bidRep.mismatches == 3)
    assert(bidRep.samples.map(_._1) == Seq("1", "2", "3")) // earliest keys
    assert(r.columns.find(_.column == "ask").get.mismatches == 0)
    assert(r.errors.exists(_.contains("bid")))
  }

  test("row-count drift: within 0.1% passes, beyond fails; key-range drift fails") {
    // 1 row of 2000 = 0.05% -> within tolerance, but dropping an interior
    // row must not shift min/max
    val drop1 = base.filter(col("ts") =!= 1000L)
    val r1 = Validate.compareStores(base, drop1)
    assert(r1.passed, r1.errors.mkString("; "))
    assert(r1.onlyLeft == 1 && r1.matchingRows == 1999)
    // 5 rows = 0.25% -> row-count failure (interior rows: range unchanged)
    val drop5 = base.filter(!col("ts").between(1000L, 1004L))
    val r5 = Validate.compareStores(base, drop5)
    assert(!r5.passed && r5.errors.exists(_.contains("row count")))
    // dropping the last row trips BOTH accounting and the exact max-key rule
    val dropMax = base.filter(col("ts") =!= 2000L)
    val rMax = Validate.compareStores(base, dropMax)
    assert(!rMax.passed && rMax.errors.exists(_.contains("max ts")))
  }

  test("empty sides and explicit column selection") {
    val empty = ticks(Nil)
    val rE = Validate.compareStores(base, empty)
    assert(!rE.passed && rE.errors.exists(_.contains("right store")))
    // explicit valueCols restricts the comparison: ask-only ignores bid drift
    val badBid = base.withColumn("bid", col("bid") + 1.0)
    val rAsk = Validate.compareStores(base, badBid, valueCols = Seq("ask"))
    assert(rAsk.passed, rAsk.errors.mkString("; "))
  }

  test("NULL keys are reported as NULL keys, not misdiagnosed as duplicates") {
    // advisor r9: countDistinct ignores NULL, so pre-fix N null-keyed rows
    // read as "N duplicate keys" — and two IDENTICAL stores with NULL keys
    // failed with that misleading error
    val withNulls = Seq(
      (Option(1L), 1.0, 1.1), (Option(2L), 1.0, 1.1),
      (Option.empty[Long], 1.0, 1.1), (Option.empty[Long], 1.0, 1.1))
      .toDF("ts", "bid", "ask")
    val r = Validate.compareStores(withNulls, withNulls)
    assert(!r.passed)
    assert(r.errors.count(_.contains("NULL ts keys")) === 2) // both sides
    assert(!r.errors.exists(_.contains("duplicate")))
  }

  test("genuine duplicate keys are still detected alongside NULL keys") {
    val dupAndNull = Seq(
      (Option(1L), 1.0, 1.1), (Option(1L), 2.0, 2.1),
      (Option.empty[Long], 1.0, 1.1))
      .toDF("ts", "bid", "ask")
    val r = Validate.compareStores(dupAndNull, ticks(Seq((1L, 1.0, 1.1), (2L, 1.0, 1.1), (3L, 1.0, 1.1))))
    assert(!r.passed)
    assert(r.errors.exists(e => e.contains("left store has 1 duplicate")))
    assert(r.errors.exists(e => e.contains("left store has 1 NULL ts keys")))
  }

  test("identical stores carrying NaN rows still pass; NaN-vs-number fails") {
    // pre-fix: abs(NaN - NaN) > tol reads TRUE under Spark's
    // NaN-is-largest ordering, so two byte-identical stores failed on
    // every shared NaN row (numpy's abs(nan-nan) > tol is False — the
    // reference validator passes them)
    val withNaN = ticks(Seq((1L, 1.0, 1.0005), (2L, Double.NaN, 1.0006),
      (3L, 1.2, Double.NaN)))
    val same = Validate.compareStores(withNaN, withNaN)
    assert(same.passed, same.errors.mkString("; "))
    assert(same.columns.forall(_.mismatches == 0))
    // a one-sided NaN is still a genuine mismatch
    val other = ticks(Seq((1L, 1.0, 1.0005), (2L, 1.1, 1.0006),
      (3L, 1.2, Double.NaN)))
    val diff = Validate.compareStores(withNaN, other)
    assert(!diff.passed)
    assert(diff.columns.find(_.column == "bid").get.mismatches == 1)
    assert(diff.columns.find(_.column == "ask").get.mismatches == 0)
  }
}
