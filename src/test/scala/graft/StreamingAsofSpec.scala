package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.streaming.StreamingGate

class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  /** Batch twin in the gate's (k, t, ord, v, rt, rv, rord) shape. */
  private def batchAsof(left: DataFrame, right: DataFrame): Array[String] =
    AsofJoin.leftAsof(left, right, on = Seq("k"),
        leftTime = "t", rightTime = "t",
        rightPayload = Seq("v", "ord"), suffix = "_r")
      .select(col("k"), col("t"), col("ord"), col("v"),
        col("t_r").as("rt"), col("v_r").as("rv"), col("ord_r").as("rord"))
      .orderBy("k", "t", "ord")
      .collect().map(_.toString)

  /** Gate output with the single-payload arrays unpacked back to scalars,
    * matching the batch twin's shape. */
  private def streamAsofDf(left: DataFrame, right: DataFrame): DataFrame =
    StreamingGate.asofAvailableNow(spark, left, right)
      .select(col("k"), col("t"), col("ord"), element_at(col("v"), 1).as("v"),
        col("rt"), element_at(col("rv"), 1).as("rv"), col("rord"))

  private def streamAsof(left: DataFrame, right: DataFrame): Array[String] =
    streamAsofDf(left, right).collect().map(_.toString)

  test("streaming as-of equals the batch operator on real event data") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    def side(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("value").as("v"), col("event_id").as("ord"))
    val left = side("purchase")
    val right = side("click")
    val b = batchAsof(left, right)
    val s = streamAsof(left, right)
    assert(b.length == left.count() && s.length == b.length,
      s"row counts: batch ${b.length}, stream ${s.length}")
    assert(s.sameElements(b))
  }

  test("left rows before any right are NULL-filled; inclusive tR == tL; max-payload tie") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    val left = df(Seq(
      (7L, "2024-01-10 09:00:00", 1.0, 1L),   // before every right → NULLs
      (7L, "2024-01-10 10:00:00", 2.0, 2L),   // tL == tR of two rights (tie)
      (7L, "2024-01-10 11:00:00", 3.0, 3L),   // after both
      (9L, "2024-01-10 10:30:00", 4.0, 4L)))  // other key: only its own rights
    val right = df(Seq(
      (7L, "2024-01-10 10:00:00", 10.0, 11L), // equal-time pair: max (v, ord)
      (7L, "2024-01-10 10:00:00", 20.0, 12L), //   → this one must win
      (9L, "2024-01-10 10:15:00", 30.0, 13L)))
    val b = batchAsof(left, right)
    val s = streamAsof(left, right)
    assert(s.sameElements(b))
    // spot-pin the semantics themselves, not just twin agreement
    val byOrd = streamAsofDf(left, right)
      .collect().map(r => r.getLong(2) -> r).toMap
    assert(byOrd(1L).isNullAt(4) && byOrd(1L).isNullAt(5) && byOrd(1L).isNullAt(6))
    assert(byOrd(2L).getDouble(5) == 20.0 && byOrd(2L).getLong(6) == 12L)
    assert(byOrd(3L).getDouble(5) == 20.0)
    assert(byOrd(4L).getDouble(5) == 30.0 && byOrd(4L).getLong(6) == 13L)
  }

  test("streaming medallion chain reproduces the 27-column enriched bars exactly") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    def ticks(tpe: String) = e.filter(col("event_type") === tpe)
      .select(
        when(col("user_id") % 2 === 0, "EURUSD").otherwise("GBPUSD").as("instrument"),
        col("ts").as("timestamp"),
        (floor(col("value") * 64) / 64).as("bid"),
        (floor(col("value") * 64) / 64 + lit(0.25) * (lit(1) + col("event_id") % 3)).as("ask"))
    val raw = ticks("purchase")
    val std = ticks("click")
    val batch = graft.ohlc.OhlcGenerator.generate(raw, std)
      .orderBy("instrument", "timestamp").collect().map(_.toString)
    val stream = StreamingGate
      .ohlcEnrichedAvailableNow(spark, raw, std, Seq("EURUSD", "GBPUSD"))
      .collect().map(_.toString)
    assert(stream.length == batch.length,
      s"bar counts: batch ${batch.length}, stream ${stream.length}")
    assert(stream.sameElements(batch))
  }

  test("lefts inside the trailing watermark window still flush (sentinel path)") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    // every left within 2 minutes of the stream max: nothing would emit
    // without the sentinel-driven timeout flush
    val left = df(Seq(
      (1L, "2024-03-01 12:00:00", 1.0, 1L),
      (1L, "2024-03-01 12:00:30", 2.0, 2L),
      (1L, "2024-03-01 12:01:00", 3.0, 3L)))
    val right = df(Seq((1L, "2024-03-01 12:00:10", 5.0, 9L)))
    val s = streamAsof(left, right)
    assert(s.length == 3)
    assert(s.sameElements(batchAsof(left, right)))
  }
}
