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

  test("ohlc_agg ignores null values and returns null struct for empty groups") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(3.0), 1L), (1L, None, 2L), (1L, Some(5.0), 3L),
      (2L, None, 1L)
    ).toDF("k", "v", "o")
    val out = df.groupBy("k").agg(OhlcAgg(col("v"), col("o")).as("b"))
      .orderBy("k").select("b.open", "b.close", "b.n").collect()
    assert(out(0).getDouble(0) == 3.0 && out(0).getDouble(1) == 5.0 && out(0).getLong(2) == 2L)
    assert(out(1).isNullAt(0) && out(1).isNullAt(2) == false || out(1).isNullAt(0))
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
