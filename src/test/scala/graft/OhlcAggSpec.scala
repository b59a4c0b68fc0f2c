package graft

import org.apache.spark.sql.functions._

import graft.functions.OhlcAgg

class OhlcAggSpec extends SparkSpec {

  test("fused ohlc_agg equals the composed min_by/max_by aggregates") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    val ord = struct(col("ts"), col("event_id")) // unique total order
    val grouped = e.groupBy(col("event_type"),
      date_trunc("minute", col("ts")).as("minute"))

    val fused = grouped
      .agg(OhlcAgg(col("value"), ord).as("b"))
      .select(col("event_type"), col("minute"),
        col("b.open"), col("b.high"), col("b.low"), col("b.close"), col("b.n"))

    val composed = grouped
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(col("value")).as("n"))

    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
  }

  test("ohlc_agg null handling matches the composition slot by slot") {
    import spark.implicits._
    // r12 contract (the class doc's load-bearing equivalence): open/close
    // ≙ min_by/max_by — skip only null-ORD rows, may RETURN null when the
    // winning row's value is null; high/low ≙ max/min — skip only null
    // VALUES; n ≙ count(1) — every row (the flagship's tick_count).
    // The pre-fix single skip dropped a null-value row everywhere, so
    // open read 3.0 where the composition returns NULL.
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, None, Some(1L)),      // wins open: null VALUE, earliest ord
      (1L, Some(3.0), Some(2L)),
      (1L, Some(5.0), Some(3L)), // wins close
      (1L, Some(9.0), None),     // null ORD: high only, not open/close
      (2L, None, Some(1L))       // single null-value row
    ).toDF("k", "v", "o")
    val out = df.groupBy("k").agg(OhlcAgg(col("v"), col("o")).as("b"))
      .orderBy("k")
      .select("b.open", "b.close", "b.high", "b.low", "b.n").collect()
    assert(out(0).isNullAt(0), "open: winning row's null value returned")
    assert(out(0).getDouble(1) == 5.0, "close skips the null-ord row")
    assert(out(0).getDouble(2) == 9.0, "high includes the null-ord row")
    assert(out(0).getDouble(3) == 3.0)
    assert(out(0).getLong(4) == 4L, "n counts every row")
    assert(out(1).isNullAt(0) && out(1).isNullAt(2) && out(1).getLong(4) == 1L)
    // bit-for-bit vs the actual composition on the same data
    val composed = df.groupBy("k").agg(
        min_by(col("v"), col("o")).as("open"),
        max_by(col("v"), col("o")).as("close"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        count(lit(1)).as("n"))
      .orderBy("k").select("open", "close", "high", "low", "n").collect()
    assert(out.map(_.toString).sameElements(composed.map(_.toString)))
  }

  test("ohlc_agg merge path: many partitions, per-partition partials combine") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i % 7L, (i * 37 % 1000).toDouble, i.toLong))
      .toDF("k", "v", "o").repartition(16)
    val fused = df.groupBy("k").agg(OhlcAgg(col("v"), col("o")).as("b"))
      .select(col("k"), col("b.open"), col("b.close"), col("b.high"), col("b.low"), col("b.n"))
    val composed = df.groupBy("k").agg(
      min_by(col("v"), col("o")).as("open"), max_by(col("v"), col("o")).as("close"),
      max(col("v")).as("high"), min(col("v")).as("low"), count(col("v")).as("n"))
      .select("k", "open", "close", "high", "low", "n")
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
  }
}
