package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * payloads as opaque `binary` columns beside typed metadata, with
  * decode/feature-extract/resize/frame-sample as partition-local operators.
  *
  * Image decode/resize are REAL (`javax.imageio` is part of the JDK —
  * [[decodeImages]]/[[resizeImages]] handle PNG/BMP/GIF/JPEG). The
  * container has no audio/video codecs, so those decode kernels are
  * STUBS — deterministic fakes over the raw bytes, clearly marked below.
  * Everything around them is the real Spark shape a production decoder
  * plugs into: explicit schema, `Dataset.mapPartitions` (one JVM decoder
  * instance per partition, amortized init — the same batch shape a Pandas
  * UDF / `mapInPandas` would have in PySpark), and narrow per-row outputs
  * so the binary payload never shuffles unless asked to.
  *
  * Scale: all operators are map-side only (no shuffle); payload bytes stay
  * columnar in Parquet and are pruned away unless the decode column is
  * selected.
  */
object Multimodal {

  /** Media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("format", StringType, nullable = true), // e.g. png, wav, mp4
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("data", BinaryType, nullable = true)))

  final case class MediaRow(
      media_id: Long,
      kind: String,
      format: String,
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long],
      data: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Double])

  final case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, data: Array[Byte])

  /** STUB decode kernel: a real implementation would decode the image/audio
    * payload (e.g. javax.imageio / ffmpeg bindings) and emit model features.
    * The deterministic fake — a normalized 16-bin byte histogram — keeps the
    * pipeline testable end-to-end without codecs.
    */
  private[multimodal] def stubFeatures(data: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    if (data == null || data.isEmpty) return hist
    data.foreach(b => hist((b & 0xff) >> 4) += 1.0)
    val n = data.length.toDouble
    hist.map(_ / n)
  }

  /** Feature extraction: partition-local decode with per-partition decoder
    * init (the pattern a real codec needs — init once, stream rows).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // STUB: real decoder/codec handle would be constructed here, once
      // per partition, and closed at iterator end.
      rows.map(r => MediaFeatures(r.media_id, r.kind, Option(r.data).map(_.length).getOrElse(0),
        stubFeatures(r.data)))
    }
  }

  /** Frame sampling for video payloads: emits every `everyMs` "frame". The
    * STUB slices the raw bytes; a real implementation seeks keyframes.
    * Output is exploded (one row per frame) but still map-side only.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val dur = r.duration_ms.getOrElse(0L)
      val n = ((dur + everyMs - 1) / everyMs).toInt.min(64)
      (0 until n).map { i =>
        // STUB frame extraction: deterministic byte slice per frame index
        val bytes = Option(r.data).getOrElse(Array.emptyByteArray)
        val sliceLen = if (bytes.isEmpty) 0 else (bytes.length / math.max(n, 1)).max(1)
        val from = (i * sliceLen).min(bytes.length)
        val until = ((i + 1) * sliceLen).min(bytes.length)
        Frame(r.media_id, i, i * everyMs, bytes.slice(from, until))
      }
    }
  }

  /** "Resize" metadata transform: pure-column op — the payload is passed
    * through untouched (STUB: a real resize would re-encode `data`).
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))

  /** Decoded image record: true dimensions + channel-mean features. */
  final case class ImageInfo(
      media_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** REAL image decode — `javax.imageio` ships with the JDK, so PNG / BMP /
    * GIF / JPEG payloads decode without any external codec. Partition-local
    * (`mapPartitions`), one pass, no shuffle; rows whose payload ImageIO
    * cannot parse are dropped (audio/video stay with the stub kernels).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.data == null || r.data.isEmpty) None
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
          if (img == null) None
          else {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            Some(ImageInfo(r.media_id, img.getWidth, img.getHeight,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
          }
        }
      }
    }
  }

  /** REAL image resize: decode → bilinear scale via Graphics2D → re-encode
    * PNG. Non-decodable payloads pass through unchanged (their metadata
    * untouched). Map-side only; the payload column is rewritten in place.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          if (r.data == null || r.data.isEmpty) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
        if (decoded == null) r
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(decoded, 0, 0, w, h, null)
          g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          r.copy(width = Some(w), height = Some(h),
            format = "png", data = buf.toByteArray)
        }
      }
    }
  }

  /** Deterministic fake media generator for tests/benchmarks. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = Array.tabulate[Byte](128 + (i % 64).toInt)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i, kind, if (kind == "image") "png" else "bin",
        Some(64), Some(64), Some(4000L), bytes)
    }
  }
}
