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

  test("sessionize absorbs cross-batch late events and drops watermark-expired ones") {
    // pre-fix: the gap test had no lower bound, so a late event ASSIGNED
    // lastMicros backwards (corrupting the next on-time gap test and
    // emitting end < start); an event older than the whole open session
    // merged into it instead of being dropped
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOhlc.Point]
    val q = StreamingOhlc.sessionize(mem.toDS(), gapMicros = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late_out").start()
    try {
      // batch 1: open session [1000, 1050]
      mem.addData(StreamingOhlc.Point(1L, 1000L, 1.0),
        StreamingOhlc.Point(1L, 1050L, 1.0))
      q.processAllAvailable()
      // batch 2: an expired point (500 < start - gap: dropped), a LATE
      // in-session point (960: absorbed, lowers start, cannot regress
      // end), then a far point that closes the session
      mem.addData(StreamingOhlc.Point(1L, 500L, 1.0),
        StreamingOhlc.Point(1L, 960L, 1.0),
        StreamingOhlc.Point(1L, 5000L, 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_late_out")
        .as[StreamingOhlc.Session].collect()
      assert(out.length === 1)
      assert(out.head.startMicros === 960L)
      assert(out.head.endMicros === 1050L)
      assert(out.head.nEvents === 3L) // 2 on-time + the absorbed late one
    } finally q.stop()
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

  test("multimodal: real WAV PCM decode (RIFF parse, RMS, zero crossings)") {
    import spark.implicits._
    // synthesize a genuine 16-bit mono PCM WAV: 440 Hz square wave,
    // 8000 Hz sample rate, 0.5 s -> 4000 samples, amplitude 16384 (=0.5)
    val rate = 8000; val n = 4000; val amp = 16384
    val dataBytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(dataBytes)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.writeBytes("RIFF"); le32(36 + n * 2); out.writeBytes("WAVE")
    out.writeBytes("fmt "); le32(16); le16(1); le16(1) // PCM, mono
    le32(rate); le32(rate * 2); le16(2); le16(16)
    out.writeBytes("data"); le32(n * 2)
    // square wave: period 8000/440 ~ 18.18 samples; use exact period 20
    // (400 Hz) so crossings are exactly 2 per period * 200 periods
    (0 until n).foreach(i => le16(if ((i / 10) % 2 == 0) amp else -amp))
    val wav = dataBytes.toByteArray

    val media = Seq(
      Multimodal.MediaRow(1L, "audio", "wav", None, None, None, wav),
      Multimodal.MediaRow(2L, "audio", "bin", None, None, None,
        Array[Byte](9, 9, 9))).toDS()
    val decoded = Multimodal.decodeWavPcm(media).collect()
    assert(decoded.length == 1) // non-WAV payload dropped
    val a = decoded.head
    assert(a.sample_rate == rate && a.channels == 1 && a.bits == 16)
    assert(a.n_samples == n && a.duration_ms == 500)
    assert(math.abs(a.rms - 0.5) < 1e-3) // square wave at half amplitude
    // 400 Hz square over 0.5 s: a sign flip every 10 samples (399 interior
    // flips across 4000 samples)
    assert(a.zero_crossings == 399, s"got ${a.zero_crossings}")
  }

  test("multimodal: MP3/ADTS frame-header probe (rates, frames, duration, kbps)") {
    import spark.implicits._
    // hand-built MPEG1 Layer III CBR stream: 44100 Hz, 128 kbps, stereo,
    // no padding → frame length 144*128000/44100 = 417 bytes, 3 frames
    def mp3Frame(): Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte // sync | MPEG1 | L3 | no CRC
      f(2) = 0x90.toByte // bitrate idx 9 (128k), 44100, no padding
      f(3) = 0x00 // stereo
      f
    }
    val mp3 = mp3Frame() ++ mp3Frame() ++ mp3Frame()
    // same stream behind an ID3v2 tag (10-byte header + 10-byte body)
    val id3 = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10) ++ mp3
    // hand-built AAC ADTS: 48000 Hz (idx 3), AAC-LC, 2 channels, frame
    // length 200, 1 raw block (1024 samples), 2 frames
    def adtsFrame(): Array[Byte] = {
      val f = new Array[Byte](200)
      f(0) = 0xff.toByte; f(1) = 0xf1.toByte // sync | MPEG-4 | layer 00
      f(2) = 0x4c.toByte // LC profile, freq idx 3, chanCfg high bit 0
      f(3) = 0x80.toByte // chanCfg low bits 10, frameLen top bits 00
      f(4) = 0x19.toByte // frameLen mid byte (200 >> 3)
      f(5) = 0x00; f(6) = 0x00 // frameLen low 3 = 0; 1 raw block
      f
    }
    val aac = adtsFrame() ++ adtsFrame()
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", "mp3", None, None, None, mp3),
      Multimodal.MediaRow(2L, "audio", "mp3", None, None, None, id3),
      Multimodal.MediaRow(3L, "audio", "aac", None, None, None, aac),
      Multimodal.MediaRow(4L, "audio", "bin", None, None, None,
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))).toDS()
    val probed = Multimodal.probeCompressedAudio(media).collect()
      .map(p => p.media_id -> p).toMap
    assert(probed.keySet === Set(1L, 2L, 3L)) // garbage payload dropped
    for (id <- Seq(1L, 2L)) {
      val p = probed(id)
      assert(p.codec == "mp3" && p.sample_rate == 44100 && p.channels == 2)
      assert(p.n_frames == 3 && p.n_samples == 3456)
      assert(p.duration_ms == 78) // 3456 / 44100 s
      assert(p.bitrate_kbps == 128)
    }
    val a = probed(3L)
    assert(a.codec == "aac" && a.sample_rate == 48000 && a.channels == 2)
    assert(a.n_frames == 2 && a.n_samples == 2048)
    assert(a.duration_ms == 42) // 2048 / 48000 s
    assert(a.bitrate_kbps == 75) // 400 bytes over 2048 samples at 48 kHz
  }

  test("multimodal: real MP4 box probe (ftyp brand, mvhd duration, trak count)") {
    import spark.implicits._
    // synthesize a minimal ISO-BMFF tree: ftyp(isom) + moov{mvhd v0, trak, trak}
    val bb = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bb)
    def be32(v: Int): Unit = o.writeInt(v)
    // ftyp: size 16, brand isom, minor 0
    be32(16); o.writeBytes("ftyp"); o.writeBytes("isom"); be32(0)
    // mvhd v0 body: ver/flags, ctime, mtime, timescale=1000, duration=7250
    val mvhdBody = 4 + 4 + 4 + 4 + 4
    val mvhd = 8 + mvhdBody
    val trak = 8 // empty trak boxes
    val moov = 8 + mvhd + trak + trak
    be32(moov); o.writeBytes("moov")
    be32(mvhd); o.writeBytes("mvhd")
    be32(0); be32(0); be32(0); be32(1000); be32(7250)
    be32(trak); o.writeBytes("trak")
    be32(trak); o.writeBytes("trak")
    val mp4 = bb.toByteArray

    val media = Seq(
      Multimodal.MediaRow(7L, "video", "mp4", None, None, None, mp4),
      Multimodal.MediaRow(8L, "video", "bin", None, None, None,
        Array[Byte](1, 2, 3, 4))).toDS()
    val probes = Multimodal.probeMp4(media).collect()
    assert(probes.length == 1)
    val p = probes.head
    assert(p.brand == "isom" && p.timescale == 1000L)
    assert(p.duration_ms == 7250L && p.n_tracks == 2)
  }

  test("multimodal: undecodable payloads fall back to the byte histogram") {
    // syntheticMedia payloads are junk bytes — no decoder parses them, so
    // every row takes the documented non-perceptual fallback
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 30)
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // normalized histogram
      assert(f.n_bytes >= 128)
    }
  }

  private def cosineOf(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("multimodal: perceptual features — image re-encodes collide, distinct images don't") {
    import spark.implicits._
    // a patterned (non-solid) image so the perceptual hash has structure
    def pattern(invert: Boolean): java.awt.image.BufferedImage = {
      // blocks aligned to the 8x8 hash grid (8x6 px per cell) so cell
      // means sit far from the grand mean — JPEG ringing at block edges
      // then cannot flip perceptual-hash bits
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val bright = ((x / 8) + (y / 6)) % 2 == 0
        val on = if (invert) !bright else bright
        img.setRGB(x, y, if (on) 0xE0D040 else 0x102030)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "png", None, None, None, enc(pattern(false), "png")),
      Multimodal.MediaRow(2L, "image", "bmp", None, None, None, enc(pattern(false), "bmp")),
      Multimodal.MediaRow(3L, "image", "jpg", None, None, None, enc(pattern(false), "jpg")),
      Multimodal.MediaRow(4L, "image", "png", None, None, None, enc(pattern(true), "png"))).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r.features).toMap
    f.values.foreach(v => assert(v.length === 88)) // all took the decoded path
    // lossless re-encode (PNG vs BMP): identical pixels -> identical vector
    assert(f(1L).toSeq === f(2L).toSeq)
    // lossy re-encode (JPEG): same content within a tight cosine ball
    assert(cosineOf(f(1L), f(3L)) > 0.95)
    // the inverted pattern flips every perceptual-hash bit: clearly apart
    assert(cosineOf(f(1L), f(4L)) < 0.5)
  }

  test("multimodal: embed → near-dup pipeline groups re-encodes, separates distinct media") {
    import spark.implicits._
    def pattern(invert: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val bright = ((x / 8) + (y / 6)) % 2 == 0
        val on = if (invert) !bright else bright
        img.setRGB(x, y, if (on) 0xE0D040 else 0x102030)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "png", None, None, None, enc(pattern(false), "png")),
      Multimodal.MediaRow(2L, "image", "bmp", None, None, None, enc(pattern(false), "bmp")),
      Multimodal.MediaRow(3L, "image", "jpg", None, None, None, enc(pattern(false), "jpg")),
      Multimodal.MediaRow(4L, "image", "png", None, None, None, enc(pattern(true), "png"))).toDS()
    // features feed the engine's semantic-dedup operator unchanged: the
    // multimodal near-dup path IS the embedding near-dup path
    val embedded = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"),
        expr("transform(features, x -> CAST(x AS FLOAT))").as("embedding"))
    val out = graft.vector.VectorFunctions
      .semDedup(embedded, "media_id", "embedding", k = 2, trainIters = 1, tau = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val groupOf = out.map(t => t._1 -> t._2).toMap
    // the three re-encodes of one image form a single group...
    assert(groupOf(1L) === groupOf(2L) && groupOf(2L) === groupOf(3L))
    // ...the inverted image stays apart, and each group keeps one rep
    assert(groupOf(4L) !== groupOf(1L))
    assert(out.count(_._3) === 2)
  }

  test("multimodal: perceptual features — audio codings collide, distinct signals don't") {
    import spark.implicits._
    val rate = 8000; val n = 4000
    // two spectrally distinct signals: low mix (300+700 Hz) vs high (3000 Hz)
    def sig(freqs: Seq[Double]): Array[Double] = Array.tabulate(n) { i =>
      freqs.map(fr => 0.4 * math.sin(2 * math.Pi * fr * i / rate)).sum
    }
    def wavPcm16(s: Array[Double]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bo)
      def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.writeBytes("RIFF"); le32(36 + n * 2); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(16); le16(1); le16(1)
      le32(rate); le32(rate * 2); le16(2); le16(16)
      o.writeBytes("data"); le32(n * 2)
      s.foreach(v => le16(math.max(-32768, math.min(32767,
        math.round(v * 32767).toInt))))
      bo.toByteArray
    }
    def wavMuLaw(s: Array[Double]): Array[Byte] = {
      // nearest-expansion µ-law compressor (256-entry search per sample —
      // test-only; exercises the G.711 decode path on a real re-coding)
      def compress(v: Double): Int = {
        val lin = math.max(-32768, math.min(32767, math.round(v * 32767).toInt))
        (0 until 256).minBy(b => math.abs(Multimodal.MuLawTable(b) - lin))
      }
      val bo = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bo)
      def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.writeBytes("RIFF"); le32(36 + n); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(16); le16(7); le16(1) // µ-law, mono
      le32(rate); le32(rate); le16(1); le16(8)
      o.writeBytes("data"); le32(n)
      s.foreach(v => o.write(compress(v)))
      bo.toByteArray
    }
    val low = sig(Seq(300.0, 700.0))
    val high = sig(Seq(3000.0))
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", "wav", None, None, None, wavPcm16(low)),
      Multimodal.MediaRow(2L, "audio", "wav", None, None, None, wavMuLaw(low)),
      Multimodal.MediaRow(3L, "audio", "wav", None, None, None, wavPcm16(high))).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r.features).toMap
    f.values.foreach(v => assert(v.length === 8)) // all took the decoded path
    // same waveform, different coding: companding noise only
    assert(cosineOf(f(1L), f(2L)) > 0.99)
    // spectrally distinct signals separate decisively
    assert(cosineOf(f(1L), f(3L)) < 0.5)
  }

  test("multimodal: frame sampling explodes video rows only") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    val videos = media.collect().count(_.kind == "video")
    assert(frames.length === videos * 4) // 4000ms / 1000ms
    assert(frames.forall(_.data.nonEmpty))
  }

  test("multimodal: frame sampling emits REAL demuxed frames for AVI payloads") {
    import spark.implicits._
    val fs = Seq(jpegBytes(0xFF0000), jpegBytes(0x00FF00), jpegBytes(0x0000FF))
    val media = Seq(Multimodal.MediaRow(
      1L, "video", "avi", None, None, Some(120L), buildAvi(fs))).toDS()
    // frames sit at their true container offsets 0/40/80 ms
    val at40 = Multimodal.sampleFrames(media, everyMs = 40L).collect().sortBy(_.frame_idx)
    assert(at40.map(_.offset_ms).toSeq === Seq(0L, 40L, 80L))
    assert(at40.zip(fs).forall { case (s, f) => s.data.toSeq == f.toSeq })
    // off-grid sampling picks the latest frame at-or-before each instant
    val at50 = Multimodal.sampleFrames(media, everyMs = 50L).collect().sortBy(_.frame_idx)
    assert(at50.map(_.offset_ms).toSeq === Seq(0L, 50L, 100L))
    assert(at50(0).data.toSeq == fs(0).toSeq)
    assert(at50(1).data.toSeq == fs(1).toSeq) // 40ms frame covers t=50
    assert(at50(2).data.toSeq == fs(2).toSeq) // 80ms frame covers t=100
  }

  test("multimodal: resizeMeta re-encodes image payloads, passes others through") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x3070B0)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "png", Some(16), Some(12), None, png(16, 12)),
      Multimodal.MediaRow(2L, "audio", "bin", None, None, None, Array[Byte](1, 2, 3)))
      .toDS().toDF()
    val out = Multimodal.resizeMeta(media, 4, 4).as[Multimodal.MediaRow]
    val resized = Multimodal.decodeImages(out).collect()
    assert(resized.length === 1) // only the image row decodes
    assert(resized.head.width === 4 && resized.head.height === 4)
    // the undecodable row is untouched — no fabricated metadata
    val other = out.collect().find(_.media_id == 2L).get
    assert(other.width.isEmpty && other.data.toSeq == Seq[Byte](1, 2, 3))
  }

  test("multimodal: G.711 expansion tables agree bit-for-bit with the JDK codec") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    def jdkDecode(enc: AudioFormat.Encoding, bytes: Array[Byte]): Array[Short] = {
      val src = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), bytes.length.toLong)
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val conv = AudioSystem.getAudioInputStream(dst, src)
      val out = conv.readAllBytes()
      Array.tabulate(out.length / 2)(i =>
        ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort)
    }
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val mu = jdkDecode(AudioFormat.Encoding.ULAW, codes)
    val al = jdkDecode(AudioFormat.Encoding.ALAW, codes)
    assert(mu.length == 256 && al.length == 256)
    for (b <- 0 until 256) {
      assert(mu(b) == Multimodal.MuLawTable(b), s"ulaw code $b")
      assert(al(b) == Multimodal.ALawTable(b), s"alaw code $b")
    }
  }

  test("multimodal: G.711 µ-law WAV decodes through the RIFF walk") {
    import spark.implicits._
    val bb = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bb)
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    val n = 800
    o.writeBytes("RIFF"); le32(36 + n); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(7); le16(1) // µ-law, mono
    le32(8000); le32(8000); le16(1); le16(8)
    o.writeBytes("data"); le32(n)
    val code = 0x12 // arbitrary µ-law byte
    (0 until n).foreach(_ => o.write(code))
    val media = Seq(Multimodal.MediaRow(1L, "audio", "wav", None, None, None,
      bb.toByteArray)).toDS()
    val a = Multimodal.decodeWavPcm(media).collect().head
    assert(a.sample_rate == 8000 && a.channels == 1 && a.bits == 8)
    assert(a.n_samples == n && a.duration_ms == 100)
    val expected = math.abs(Multimodal.MuLawTable(code) / 32768.0)
    assert(math.abs(a.rms - expected) < 1e-12)
    assert(a.zero_crossings == 0)
  }

  test("multimodal: IMA ADPCM WAV decode (mono exact sequence, stereo interleave)") {
    import spark.implicits._
    def wav(channels: Int, blockAlign: Int, samplesPerBlock: Int,
        payload: Array[Byte]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bb)
      def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.writeBytes("RIFF"); le32(40 + payload.length); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(20); le16(0x11); le16(channels)
      le32(8000); le32(4000); le16(blockAlign); le16(4)
      le16(2); le16(samplesPerBlock) // cbSize + wSamplesPerBlock
      o.writeBytes("data"); le32(payload.length)
      o.write(payload)
      bb.toByteArray
    }
    // mono block: predictor 0, index 0, nibbles (low first) 4,4,12,2,0,0,0,0
    // hand-stepped through the IMA tables:
    //   step 7: +4 -> 7 (idx 2);  step 9: +4 -> 17 (idx 4)
    //   step 11: -12 -> 5 (idx 6); step 13: +2 -> 12 (idx 5)
    //   then four 0-nibbles: +step>>3 each -> 13, 14, 15, 16
    val mono = wav(1, 8, 9,
      Array[Byte](0, 0, 0, 0, 0x44, 0x2c, 0, 0))
    val expected = Seq(0, 7, 17, 5, 12, 13, 14, 15, 16)
    val a = Multimodal.decodeWavPcm(
      Seq(Multimodal.MediaRow(1L, "audio", "wav", None, None, None, mono)).toDS())
      .collect().head
    assert(a.bits == 4 && a.n_samples == 9)
    val rms = math.sqrt(expected.map(v => v * v.toDouble).sum / 9) / 32768.0
    assert(math.abs(a.rms - rms) < 1e-12)
    // stereo: ch0 predictor 8192 + zero nibbles stays flat at 8192; the
    // ch1 header/word (0xFF everywhere) must be skipped by the interleave
    val stereoPayload =
      Array[Byte](0, 0x20, 0, 0) ++ // ch0 header: predictor 8192, idx 0
        Array.fill[Byte](4)(0xff.toByte) ++ // ch1 header
        Array.fill[Byte](4)(0) ++ // ch0 word: 8 zero nibbles
        Array.fill[Byte](4)(0xff.toByte) // ch1 word
    val s = Multimodal.decodeWavPcm(
      Seq(Multimodal.MediaRow(2L, "audio", "wav", None, None, None,
        wav(2, 16, 9, stereoPayload))).toDS())
      .collect().head
    assert(s.channels == 2 && s.n_samples == 9)
    assert(math.abs(s.rms - 0.25) < 1e-12) // every ch0 sample = 8192
    assert(s.zero_crossings == 0)
  }

  private def jpegBytes(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  /** Minimal MJPEG AVI: hdrl with 40000 µs/frame, movi with `frames`. */
  private def buildAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bb)
    def le32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    // LIST hdrl { avih(56 bytes, dwMicroSecPerFrame=40000) }
    o.writeBytes("LIST"); le32(4 + 8 + 56); o.writeBytes("hdrl")
    o.writeBytes("avih"); le32(56); le32(40000)
    o.write(new Array[Byte](52))
    // LIST movi { 00dc frames, word-aligned }
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    o.writeBytes("LIST"); le32(moviSize); o.writeBytes("movi")
    frames.foreach { f =>
      o.writeBytes("00dc"); le32(f.length); o.write(f)
      if ((f.length & 1) == 1) o.write(0)
    }
    val inner = bb.toByteArray
    val full = new java.io.ByteArrayOutputStream()
    val fo = new java.io.DataOutputStream(full)
    fo.writeBytes("RIFF")
    fo.write((inner.length + 4) & 0xff); fo.write(((inner.length + 4) >> 8) & 0xff)
    fo.write(((inner.length + 4) >> 16) & 0xff); fo.write(((inner.length + 4) >>> 24) & 0xff)
    fo.writeBytes("AVI "); fo.write(inner)
    full.toByteArray
  }

  test("multimodal: AVI demux + MJPEG pixel decode (real JPEG frames)") {
    import spark.implicits._
    val frames = Seq(jpegBytes(0xFF0000), jpegBytes(0x00FF00), jpegBytes(0x0000FF))
    val avi = buildAvi(frames)

    val media = Seq(
      Multimodal.MediaRow(1L, "video", "avi", None, None, None, avi),
      Multimodal.MediaRow(2L, "video", "bin", None, None, None,
        Array[Byte](1, 2, 3, 4))).toDS()
    val extracted = Multimodal.extractAviFrames(media).collect().sortBy(_.frame_idx)
    assert(extracted.length == 3)
    assert(extracted.map(_.offset_ms).toSeq == Seq(0L, 40L, 80L))
    assert(extracted.zip(frames).forall { case (e, f) => e.data.toSeq == f.toSeq })
    val decoded = Multimodal.decodeAviFrames(media).collect().sortBy(_.frame_idx)
    assert(decoded.length == 3)
    decoded.foreach(d => assert(d.width == 8 && d.height == 6))
    // JPEG is lossy: the dominant channel must clearly dominate
    assert(decoded(0).mean_r > 200 && decoded(0).mean_g < 60)
    assert(decoded(1).mean_g > 200 && decoded(1).mean_b < 60)
    assert(decoded(2).mean_b > 200 && decoded(2).mean_r < 60)
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
