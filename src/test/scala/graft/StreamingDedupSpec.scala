package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOhlc

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val deduped = StreamingOhlc.dedupWithinWatermark(
      mem.toDF.toDF("id", "ts", "v"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, t("2024-01-01 00:00:00"), 1.0),
                  (2L, t("2024-01-01 00:00:01"), 2.0))
      q.processAllAvailable()
      // same ids again in a LATER batch, still within the watermark horizon
      mem.addData((1L, t("2024-01-01 00:00:05"), 9.0),
                  (3L, t("2024-01-01 00:00:06"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val enriched = StreamingOhlc.enrichStatic(
      mem.toDF.toDF("id", "v"), dim, Seq("id"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      mem.addData((1L, 10.0), (2L, 20.0), (9L, 90.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select("id", "tier").as[(Long, Option[String])].collect().toMap
      assert(rows(1L).contains("gold"))
      assert(rows(2L).contains("silver"))
      assert(rows(9L).isEmpty) // left join keeps unmatched stream rows
    } finally q.stop()
  }
}
