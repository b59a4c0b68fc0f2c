package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tick ingestion (reference `downloader.py` + `tick_loader.py` +
  * `clickhouse_manager.insert_ticks`, SURVEY.md §2.1 S1/S2/S4).
  *
  * The reference downloads monthly ZIPs of `Timestamp,Bid,Ask` CSVs and
  * bulk-inserts them. Here the source is pluggable-local (the engine must
  * run offline): a directory of ZIP or CSV files. ZIP entries are
  * decompressed *distributedly* via `binaryFiles` + ZipInputStream — one
  * task per archive, no driver-side staging — and CSVs with an explicit
  * schema (nothing inferred, `tick_loader.py:61-63`).
  */
object TickIngest {

  val csvSchema: StructType = StructType(Seq(
    StructField("Timestamp", TimestampType, nullable = false),
    StructField("Bid", DoubleType, nullable = false),
    StructField("Ask", DoubleType, nullable = false)))

  /** Read tick CSVs (columns Timestamp,Bid,Ask, header row, µs timestamps
    * treated as UTC) into the normalized (timestamp, bid, ask) frame.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(csvSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)
      .select(
        col("Timestamp").as("timestamp"),
        col("Bid").as("bid"),
        col("Ask").as("ask"))

  /** Read every `*.csv` entry of every ZIP under `path`, decompressing on
    * executors. Returns the same normalized frame as [[readCsv]].
    */
  def readZips(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, stream) =>
        val zis = new ZipInputStream(stream.open())
        val entryLines = Iterator
          .continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
          .flatMap { _ =>
            val r = new BufferedReader(
              new InputStreamReader(zis, StandardCharsets.UTF_8))
            Iterator.continually(r.readLine()).takeWhile(_ != null)
          }
        // close the archive when the iterator exhausts — relying on GC
        // leaks one descriptor per archive per task ("too many open
        // files" on long-lived executors); also guard against tasks that
        // stop early (e.g. the CSV header probe's take(1))
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try zis.close() catch { case _: java.io.IOException => () }))
        new Iterator[String] {
          def hasNext: Boolean = {
            val h = entryLines.hasNext
            if (!h) try zis.close() catch { case _: java.io.IOException => () }
            h
          }
          def next(): String = entryLines.next()
        }
      }
      .toDS()
    val parsed = spark.read
      .schema(csvSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(lines)
    parsed.select(
      col("Timestamp").as("timestamp"),
      col("Bid").as("bid"),
      col("Ask").as("ask"))
  }

  /** Write ticks into the warehouse table for (instrument, variant) with
    * ReplacingMergeTree-equivalent dedup *at write time* on
    * (instrument, timestamp) (`clickhouse_manager.py:159-161,271-330`):
    * constant instrument column, `yyyymm` partition column
    * (≙ PARTITION BY toYYYYMM, `clickhouse_manager.py:160`), duplicate rows
    * collapse keeping the max (bid, ask) tuple deterministically.
    *
    * Dynamic partition overwrite makes re-ingestion of a month idempotent —
    * the reference's eventual merge-time dedup becomes a strict overwrite
    * (SURVEY.md §4 "merge-time dedup" row).
    */
  def writeTicks(
      ticks: DataFrame,
      warehouse: String,
      instrument: String,
      variant: String
  ): Long = {
    val spark = ticks.sparkSession
    // dynamic overwrite scoped to THIS write: leaking it into the shared
    // session would silently change later overwrite-mode partitioned
    // writes from truncate-table to touched-partitions-only semantics
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val keyed = ticks
      .withColumn("instrument", lit(instrument.toUpperCase))
      .withColumn("yyyymm", date_format(col("timestamp"), "yyyyMM"))
    val w = Window
      .partitionBy("instrument", "timestamp")
      .orderBy(col("bid").desc, col("ask").desc)
    val deduped = keyed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // cluster writes per partition and sort by timestamp so Parquet
    // row-group min/max stats give tight range pruning (≙ the reference's
    // ORDER BY (instrument, timestamp) sparse primary index, SURVEY.md §4)
    val out = deduped
      .select("instrument", "timestamp", "bid", "ask", "yyyymm")
      .repartition(col("instrument"), col("yyyymm"))
      .sortWithinPartitions("instrument", "yyyymm", "timestamp")
    try out.write
      .mode("overwrite")
      .option("compression", "zstd") // ≙ reference codec choice (ZSTD cols)
      .partitionBy("instrument", "yyyymm")
      .parquet(s"$warehouse/${variant}_ticks")
    finally prevMode.fold(
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    spark.read.parquet(s"$warehouse/${variant}_ticks")
      .filter(col("instrument") === instrument.toUpperCase)
      .count()
  }

  /** Read a stored tick table, with `yyyymm` partition-pruning predicates
    * derived from the requested timestamp range — the engine-side analogue
    * of the reference's reliance on `PARTITION BY toYYYYMM` pruning
    * (SURVEY.md §4 row 1: Catalyst cannot infer yyyymm bounds from
    * timestamp bounds, so the API layer injects them).
    */
  def readTicks(
      spark: SparkSession,
      warehouse: String,
      variant: String,
      instrument: Option[String] = None,
      start: Option[String] = None,
      end: Option[String] = None
  ): DataFrame = {
    var df = spark.read.parquet(s"$warehouse/${variant}_ticks")
    instrument.foreach(i => df = df.filter(col("instrument") === i.toUpperCase))
    start.foreach { s =>
      df = df.filter(col("timestamp") >= lit(s).cast("timestamp") &&
        col("yyyymm") >= date_format(lit(s).cast("timestamp"), "yyyyMM"))
    }
    end.foreach { e =>
      df = df.filter(col("timestamp") <= lit(e).cast("timestamp") &&
        col("yyyymm") <= date_format(lit(e).cast("timestamp"), "yyyyMM"))
    }
    df
  }
}
