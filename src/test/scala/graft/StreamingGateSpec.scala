package graft

import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.ohlc.Ohlc
import graft.streaming.StreamingGate

/** The streaming driver gate: a real watermark/append/AvailableNow run of
  * the streaming 1m OHLC must agree with the batch `Ohlc.bars` bar-for-bar
  * (they also share ONE DuckDB oracle as q_stream_ohlc_1m / q_ohlc_1m).
  * This spec pins the agreement locally, including the trailing windows
  * that append mode holds back until the watermark passes them — the part
  * a sentinel-less bounded run would silently drop.
  */
class StreamingGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming 1m OHLC equals the batch bars exactly, trailing windows included") {
    assume(new java.io.File(sf).isDirectory)
    val events = Tables.events(spark, sf)
    val streamed = StreamingGate.ohlc1mAvailableNow(
      spark, events, keyCol = "event_type", time = "ts",
      value = "value", tiebreak = "event_id").collect()
    val batch = Ohlc.bars(events, Seq("event_type"), "ts", "value",
        "event_id", 1)
      .select("event_type", "bar_ts", "open", "high", "low", "close",
        "tick_count")
      .orderBy("event_type", "bar_ts")
      .collect()
    assert(streamed.length === batch.length, "bar counts differ")
    assert(streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s === b, s"streaming bar $s != batch bar $b")
    }
    // the LAST bar per key must be present: it is exactly the window the
    // watermark can only pass via the sentinel flush
    val lastBatch = batch.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getTimestamp(1)).max).toMap
    val lastStream = streamed.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getTimestamp(1)).max).toMap
    assert(lastStream === lastBatch)
  }

  test("the reserved flush key never leaks into the output and is rejected on input") {
    assume(new java.io.File(sf).isDirectory)
    val events = Tables.events(spark, sf)
    val out = StreamingGate.ohlc1mAvailableNow(
      spark, events, "event_type", "ts", "value", "event_id")
    assert(out.filter(col("event_type") === "__flush").head(1).isEmpty)
    val polluted = events.unionByName(
      events.limit(1).withColumn("event_type", lit("__flush")))
    val e = intercept[IllegalArgumentException](
      StreamingGate.ohlc1mAvailableNow(
        spark, polluted, "event_type", "ts", "value", "event_id"))
    assert(e.getMessage.contains("__flush"))
  }
}
