package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ohlc.Ohlc
import graft.streaming.StreamingIncrementalOhlc

class StreamingIncrementalOhlcSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streamed bar state equals the one-shot bars, including a LATE tick revising a closed bar") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ohlc_stream").toString
    val mem = MemoryStream[(String, Timestamp, Double, Long)]
    val q = mem.toDF.toDF("instrument", "ts", "price", "tick_id")
      .writeStream
      .foreachBatch(StreamingIncrementalOhlc.updateBatch(
        dir, Seq("instrument"), "ts", "price", "tick_id"))
      .start()
    val all = scala.collection.mutable.ArrayBuffer[(String, Timestamp, Double, Long)]()
    def feed(rows: (String, Timestamp, Double, Long)*): Unit = {
      all ++= rows; mem.addData(rows: _*); q.processAllAvailable()
    }
    try {
      feed(("EUR", t("2024-01-01 00:00:01"), 1.10, 1L),
           ("EUR", t("2024-01-01 00:00:30"), 1.13, 2L),
           ("EUR", t("2024-01-01 00:01:10"), 1.09, 3L))
      feed(("EUR", t("2024-01-01 00:02:05"), 1.20, 4L),
           ("GBP", t("2024-01-01 00:00:40"), 0.85, 5L))
      // LATE tick into the long-closed 00:00 minute — earlier ts and
      // earlier tiebreak than every tick seen so far, so it must become
      // that bar's new OPEN and LOW
      feed(("EUR", t("2024-01-01 00:00:00"), 1.05, 0L))
    } finally q.stop()
    val streamed = StreamingIncrementalOhlc.readBars(spark, dir)
    val oneShot = Ohlc.bars(all.toSeq.toDF("instrument", "ts", "price", "tick_id"),
      Seq("instrument"), "ts", "price", "tick_id", 1)
    assert(streamed.exceptAll(oneShot).isEmpty && oneShot.exceptAll(streamed).isEmpty)
    val bar0 = streamed.filter(col("instrument") === "EUR" &&
      col("bar_ts") === t("2024-01-01 00:00:00"))
      .select("open", "low", "tick_count").collect().head
    assert(bar0.getDouble(0) === 1.05 && bar0.getDouble(1) === 1.05 &&
      bar0.getLong(2) === 3L)
  }

  test("batch replay after its version committed does not double-fold ticks") {
    // crash-window idempotence (see StreamingDedup.latestVersion): the
    // replayed batch must fold into the version its first attempt read,
    // not into its own committed output (which would double tick_count
    // and self-overwrite the directory being read)
    val dir = Files.createTempDirectory("ohlc_replay").toString
    val update = StreamingIncrementalOhlc.updateBatch(
      dir, Seq("instrument"), "ts", "price", "tick_id")
    def batch(rows: (String, Timestamp, Double, Long)*) =
      rows.toSeq.toDF("instrument", "ts", "price", "tick_id")
    val b0 = batch(("EUR", t("2024-01-01 00:00:01"), 1.10, 1L))
    val b1 = batch(("EUR", t("2024-01-01 00:00:30"), 1.13, 2L),
      ("EUR", t("2024-01-01 00:01:10"), 1.09, 3L))
    update(b0, 0L); update(b1, 1L)
    def bars() = StreamingIncrementalOhlc.readBars(spark, dir)
      .orderBy("bar_ts").collect().map(_.toString).toSeq
    val before = bars()
    update(b1, 1L) // replay batch 1 with v=1 already committed
    assert(bars() === before)
    val counts = StreamingIncrementalOhlc.readBars(spark, dir)
      .select("tick_count").as[Long].collect().sorted.toSeq
    assert(counts === Seq(1L, 2L)) // not doubled
  }
}
