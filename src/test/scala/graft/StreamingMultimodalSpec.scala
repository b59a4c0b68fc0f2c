package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.StreamingOhlc

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("streaming 1m OHLC emits closed windows past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF.toDF("ts", "sym", "v")
    val bars = StreamingOhlc.bars1m(stream, Seq("sym"), "ts", "v",
      watermark = "1 minute")
    val q = bars.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("bars_out")
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      mem.addData(
        (t("2024-01-01 00:00:05"), "A", 10.0),
        (t("2024-01-01 00:00:20"), "A", 12.0),
        (t("2024-01-01 00:00:40"), "A", 11.0))
      q.processAllAvailable()
      // advance event time far enough to close the 00:00 window
      mem.addData((t("2024-01-01 00:05:00"), "A", 99.0))
      q.processAllAvailable()
      val out = spark.table("bars_out").collect()
      assert(out.length === 1)
      val b = out.head
      assert(b.getAs[Double]("open") === 10.0)
      assert(b.getAs[Double]("high") === 12.0)
      assert(b.getAs[Double]("close") === 11.0)
      assert(b.getAs[Long]("tick_count") === 3L)
    } finally q.stop()
  }

  test("stateful sessionization (flatMapGroupsWithState, batch mode)") {
    val gap = 30L * 60 * 1000000 // 30 min in micros
    val pts = Seq(
      StreamingOhlc.Point(1L, 0L, 1.0),
      StreamingOhlc.Point(1L, 10L * 60 * 1000000, 1.0), // same session
      StreamingOhlc.Point(1L, 60L * 60 * 1000000, 1.0), // new session
      StreamingOhlc.Point(2L, 0L, 1.0)
    ).toDS()
    val sessions = StreamingOhlc.sessionize(pts, gap).collect()
    // batch mode emits only *closed* sessions; the trailing session of each
    // key stays in (discarded) state — key 1 closes one session
    assert(sessions.length === 1)
    assert(sessions.head.key === 1L)
    assert(sessions.head.nEvents === 2L)
  }

  test("multimodal: real PNG decode + resize via javax.imageio") {
    import spark.implicits._
    // build genuine PNG payloads: solid-color 8x6 images
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, rgb)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "png", Some(8), Some(6), None, png(0xFF0000)),
      Multimodal.MediaRow(2L, "image", "png", Some(8), Some(6), None, png(0x0000FF)),
      Multimodal.MediaRow(3L, "audio", "bin", None, None, Some(1000L),
        Array[Byte](1, 2, 3)) // not an image -> dropped by decode
    ).toDS()

    val decoded = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(decoded.length == 2)
    assert(decoded(0).width == 8 && decoded(0).height == 6)
    assert(decoded(0).mean_r == 255.0 && decoded(0).mean_b == 0.0)
    assert(decoded(1).mean_b == 255.0 && decoded(1).mean_r == 0.0)

    val resized = Multimodal.resizeImages(media, 4, 4).collect().sortBy(_.media_id)
    val r1 = Multimodal.decodeImages(Seq(resized(0)).toDS()).head()
    assert(r1.width == 4 && r1.height == 4 && r1.mean_r == 255.0)
    // non-image rows pass through untouched
    assert(resized(2).data.toSeq == Seq[Byte](1, 2, 3))
  }

  test("multimodal: stub feature extraction preserves batch shape") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 30)
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // normalized histogram
      assert(f.n_bytes >= 128)
    }
  }

  test("multimodal: frame sampling explodes video rows only") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    val videos = media.collect().count(_.kind == "video")
    assert(frames.length === videos * 4) // 4000ms / 1000ms
    assert(frames.forall(_.data.nonEmpty))
  }

  test("multimodal: parquet round-trip with binary payload + column pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.syntheticMedia(spark, 10).toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10)
    // metadata-only projection must not read the payload column
    val plan = back.select("media_id", "kind").queryExecution.executedPlan.toString
    assert(!plan.contains("data"), "payload column not pruned from scan")
  }
}
