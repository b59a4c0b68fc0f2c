package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Drives the STREAMING operators over a bounded fixture and returns their
  * emitted output as a plain batch DataFrame — the bridge that puts the
  * streaming surface under the same DuckDB correctness oracle as the batch
  * operators (q_stream_ohlc_1m shares q_ohlc_1m's oracle SQL verbatim: the
  * two paths must agree bar-for-bar, the reference's semantics at
  * clickhouse_ohlc_generator.py:150-196 regardless of execution mode).
  *
  * The run is a REAL Structured Streaming query — file source, watermark,
  * append-mode stateful aggregation, parquet sink, AvailableNow trigger —
  * not a batch plan dressed up: bars only reach the sink when the
  * watermark passes their window, exactly as they would on an unbounded
  * stream.
  *
  * Append-mode flush: a windowed aggregation emits a bar only once the
  * watermark (max event time of PRIOR batches − delay) passes the window
  * end, so the trailing windows of a bounded run would stay in the state
  * store forever. Two sentinel files carrying a far-future event time for
  * a reserved flush key are processed AFTER the data (modification times
  * pinned, maxFilesPerTrigger=1): the first advances the watermark past
  * every real window, the second flushes bars the first batch's watermark
  * couldn't see yet — deterministic whether or not the engine runs a
  * trailing no-data micro-batch. The flush key's own bar is filtered out.
  */
object StreamingGate {

  private val FlushKey = "__flush"

  /** Streaming 1-minute OHLC over a bounded point frame, emitted through a
    * real watermark/append/AvailableNow run. Output columns match the
    * batch `Ohlc.bars`: (keyCol, bar_ts, open, high, low, close,
    * tick_count), totally ordered.
    *
    * @param keyCol   series identity — a STRING column (the reserved flush
    *                 key must be expressible in it)
    * @param tiebreak column breaking equal-timestamp ties, as in the batch
    */
  def ohlc1mAvailableNow(
      spark: SparkSession,
      points: DataFrame,
      keyCol: String,
      time: String,
      value: String,
      tiebreak: String
  ): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("stream_gate").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val chk = s"$root/chk"

    val src = points.select(Seq(keyCol, time, value, tiebreak).distinct.map(col): _*)
    src.coalesce(1).write.parquet(in)
    val maxTs = src.agg(max(col(time))).head().getTimestamp(0)
    require(!src.head(1).isEmpty && maxTs != null, "streaming gate needs data")
    require(spark.read.parquet(in)
        .filter(col(keyCol) === FlushKey).head(1).isEmpty,
      s"input already uses the reserved flush key $FlushKey")

    def writeSentinel(plusMinutes: Int): Unit = {
      val ts = new java.sql.Timestamp(maxTs.getTime + plusMinutes * 60000L)
      spark.range(1)
        .select(
          lit(FlushKey).cast(src.schema(keyCol).dataType).as(keyCol),
          lit(ts).as(time),
          lit(0.0).cast(src.schema(value).dataType).as(value),
          lit(0L).cast(src.schema(tiebreak).dataType).as(tiebreak))
        .select(src.columns.map(col): _*)
        .coalesce(1).write.mode("append").parquet(in)
    }
    // pin strictly increasing modification times so the file source's
    // snapshot (sorted by mtime) processes data, then sentinel 1, then
    // sentinel 2 — filesystem mtime granularity alone could tie them
    def pinMtimes(base: Long): Set[String] = {
      val fs = new java.io.File(in).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      fs.foreach(_.setLastModified(base))
      fs.map(_.getName).toSet
    }
    val t0 = System.currentTimeMillis() - 300000L
    val dataFiles = pinMtimes(t0)
    writeSentinel(10)
    val withS1 = pinMtimes(t0) // new file appears; re-pin then bump below
    (withS1 -- dataFiles).foreach(n =>
      new java.io.File(s"$in/$n").setLastModified(t0 + 60000L))
    writeSentinel(20)
    val withS2 = new java.io.File(in).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    (withS2 -- withS1).foreach(n =>
      new java.io.File(s"$in/$n").setLastModified(t0 + 120000L))

    val stream = spark.readStream
      .schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val bars = StreamingOhlc.bars1m(
      stream, keys = Seq(keyCol), time = time, value = value,
      watermark = "2 minutes", tiebreak = Some(tiebreak))
    val q = bars.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.read.parquet(out)
      .filter(col(keyCol) =!= FlushKey)
      .select(col(keyCol), col("bar_ts"), col("open"), col("high"),
        col("low"), col("close"), col("tick_count"))
      .orderBy(col(keyCol), col("bar_ts"))
  }
}
