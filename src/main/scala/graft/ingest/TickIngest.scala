package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * Damaged rows are skipped — [[readCsvWithBadRecords]] counts them.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    readCsvWithBadRecords(spark, path).ticks

  /** [[readCsv]] plus malformed-input accounting — the file-source twin of
    * [[readZipsWithBadRecords]] (same damage classes minus ZIP members;
    * per-file header rows are handled by the csv source itself). Without
    * the guard, a truncated or garbled row PERMISSIVE-parses to nulls and
    * flows into the store as a null-priced tick.
    */
  def readCsvWithBadRecords(spark: SparkSession, path: String): ZipIngestResult =
    ZipIngestResult(spark.read
      .schema(csvSchema.add(StructField("_corrupt", StringType, nullable = true)))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path))

  /** Sentinel emitted in place of a ZIP member whose decompression fails
    * (truncated deflate stream, corrupt CEN, bad CRC): the marker can
    * never parse as a tick row, so each corrupt member surfaces as
    * exactly one counted bad record — deterministic across task retries
    * and recomputes, unlike an accumulator.
    */
  private[ingest] val CorruptMemberMarker = "\u0000__graft_corrupt_zip_member__"

  /** Line iterator over one archive's `*.csv` members with PER-MEMBER
    * failure isolation: an IOException mid-member emits one
    * [[CorruptMemberMarker]] for that member and then ATTEMPTS to advance
    * to the next entry — an intact member after a damaged one survives
    * (the pre-r12 guard ended the whole archive at the first failure,
    * silently dropping every later good member while counting one bad
    * record). When advancement itself fails (the usual truncated-download
    * case — there IS nothing after the corruption), the archive ends with
    * exactly the marker already emitted: one underlying corruption is
    * never double-counted. The reference downloader tolerates partial
    * months the same way (`downloader.py:40-83` returns None on failure).
    */
  private final class ArchiveLines(zis: ZipInputStream) extends Iterator[String] {
    private var reader: BufferedReader = _
    private var pending: String = _
    private var finished = false
    private var markers = 0
    private def emitMarker(): Unit = { pending = CorruptMemberMarker; markers += 1 }
    private def openNextEntry(): Unit =
      try {
        var e = zis.getNextEntry
        while (e != null && (e.isDirectory || !e.getName.toLowerCase.endsWith(".csv")))
          e = zis.getNextEntry
        if (e == null) finished = true
        else reader = new BufferedReader(
          new InputStreamReader(zis, StandardCharsets.UTF_8))
      } catch {
        case _: java.io.IOException | _: IllegalArgumentException =>
          // enumeration is broken past this point; the marker is only for
          // archives that die WITHOUT a preceding member marker (corrupt
          // central/local header before any member error) — after a
          // member failure it would double-count the same corruption
          if (markers == 0) emitMarker()
          finished = true
      }
    def hasNext: Boolean = {
      if (pending != null) return true
      while (!finished) {
        if (reader == null) {
          openNextEntry()
          if (pending != null) return true
        } else {
          try {
            val l = reader.readLine()
            if (l == null) reader = null // member exhausted → next entry
            else { pending = l; return true }
          } catch {
            case _: java.io.IOException | _: IllegalArgumentException =>
              reader = null // member damaged → marker, then try to recover
              emitMarker()
              return true
          }
        }
      }
      false
    }
    def next(): String = {
      if (!hasNext) throw new NoSuchElementException("empty archive iterator")
      val l = pending; pending = null; l
    }
  }

  /** An ingest read plus malformed-input accounting ([[readZipsWithBadRecords]],
    * [[readCsvWithBadRecords]]).
    *
    * Backed by ONE parsed frame (`Timestamp,Bid,Ask,_corrupt`); `ticks`
    * and `badRecords` are complementary filters over it, so a caller that
    * needs both (e.g. ingest + damage accounting) can [[cache]] the single
    * underlying plan instead of paying a second input scan — for ZIP
    * spools that second scan re-decompresses every archive.
    */
  final case class ZipIngestResult(parsed: DataFrame) {
    private def bad: Column = col("_corrupt").isNotNull ||
      col("Timestamp").isNull || col("Bid").isNull || col("Ask").isNull
    /** Fully-parsed rows, normalized to (timestamp, bid, ask). */
    def ticks: DataFrame = parsed.filter(!bad).select(
      col("Timestamp").as("timestamp"),
      col("Bid").as("bid"),
      col("Ask").as("ask"))
    /** One `raw` string row per damaged input line / corrupt ZIP member. */
    def badRecords: DataFrame = parsed.filter(bad).select(col("_corrupt").as("raw"))
    /** Materialized bad-record counter (one Spark job). */
    def badRecordCount: Long = badRecords.count()
    /** Cache the shared parsed frame (serves both `ticks` and `badRecords`). */
    def cache(): ZipIngestResult = { parsed.cache(); this }
    def unpersist(): Unit = { parsed.unpersist(); () }
    /** Combine two reads (e.g. the ZIP and CSV halves of a mixed landing
      * directory) into one accounting unit. */
    def union(other: ZipIngestResult): ZipIngestResult =
      ZipIngestResult(parsed.unionByName(other.parsed))
  }

  /** Read every `*.csv` entry of every ZIP under `path`, decompressing on
    * executors, tolerating damaged input: a corrupt ZIP member, a
    * truncated/garbled CSV row, or non-UTF-8 bytes (decoded with U+FFFD
    * replacement, which then fails the typed parse) each become a row of
    * `badRecords` instead of a job failure.
    *
    * `ticks` is the same normalized frame as [[readCsv]], restricted to
    * fully-parsed rows (all three fields non-null). `badRecords` has one
    * `raw` string column: the offending line verbatim for parser
    * rejections (null when only a field-level null slipped through), or
    * [[CorruptMemberMarker]] once per undecodable ZIP member. Both frames
    * re-scan the archives when consumed — count once and cache if the
    * counter is needed repeatedly.
    */
  def readZipsWithBadRecords(spark: SparkSession, path: String): ZipIngestResult = {
    import spark.implicits._
    val lines = spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (_, stream) =>
        // signature probe BEFORE handing the stream to ZipInputStream:
        // the JDK's getNextEntry returns null (not an exception) on a
        // stream that never was a zip, so a stray non-archive file would
        // contribute zero rows AND zero bad records — silent loss with no
        // accounting. Real archives start "PK" (\x03\x04 members,
        // \x05\x06 the empty-zip end record, which legitimately yields
        // no entries and no marker).
        val raw = new java.io.PushbackInputStream(stream.open(), 4)
        val head = new Array[Byte](4)
        var got = 0
        try {
          var r = 0
          while (got < 4 && { r = raw.read(head, got, 4 - got); r > 0 }) got += r
          raw.unread(head, 0, got)
        } catch { case _: java.io.IOException => () }
        if (got < 4 || head(0) != 'P'.toByte || head(1) != 'K'.toByte) {
          try raw.close() catch { case _: java.io.IOException => () }
          Iterator.single(CorruptMemberMarker)
        } else {
          val zis = new ZipInputStream(raw)
          // close the archive when the iterator exhausts — relying on GC
          // leaks one descriptor per archive per task ("too many open
          // files" on long-lived executors); also guard against tasks that
          // stop early (e.g. the CSV header probe's take(1))
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ =>
              try zis.close() catch { case _: java.io.IOException => () }))
          val safe = new ArchiveLines(zis)
          new Iterator[String] {
            def hasNext: Boolean = {
              val h = safe.hasNext
              if (!h) try zis.close() catch { case _: java.io.IOException => () }
              h
            }
            def next(): String = safe.next()
          }
        }
      }
      .toDS()
    // EVERY entry carries its own header row; the old global
    // `header=true` dropped only the first line of the whole union and
    // let later entries' headers fall through as all-null rows. Strip
    // them explicitly (no valid data row starts with a header token).
    // A UTF-8 BOM (Windows tooling) rides in front of the first line and
    // would defeat the header match — one spurious bad record per BOM'd
    // member — so strip it first.
    val dataLines = lines
      .map(l => if (l.nonEmpty && l.charAt(0) == '\uFEFF') l.substring(1) else l)
      .filter(l => !l.toLowerCase.startsWith("timestamp,"))
    ZipIngestResult(spark.read
      .schema(csvSchema.add(StructField("_corrupt", StringType, nullable = true)))
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(dataLines))
  }

  /** Read every `*.csv` entry of every ZIP under `path`, decompressing on
    * executors. Returns the same normalized frame as [[readCsv]]; damaged
    * input is skipped — use [[readZipsWithBadRecords]] to count it.
    */
  def readZips(spark: SparkSession, path: String): DataFrame =
    readZipsWithBadRecords(spark, path).ticks

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
      .withColumn("instrument", lit(instrument.toUpperCase(java.util.Locale.ROOT)))
      .withColumn("yyyymm", date_format(col("timestamp"), "yyyyMM"))
    // dedup as a hash AGGREGATION, not a row_number window: max_by over
    // the (bid, ask) struct keeps the same winner as the old
    // `row_number over (order by bid desc, ask desc) = 1`, but partially
    // aggregates map-side and never sorts the full tick stream — the
    // operators.Dedup.replacingDedupAgg posture applied to the ingest hot
    // path (the 100×-data probe measured window-form dedup at ~8× the
    // aggregation form's wall)
    val allCols = Seq("instrument", "timestamp", "bid", "ask", "yyyymm")
    val deduped = keyed
      .groupBy(col("instrument"), col("timestamp"))
      .agg(max_by(
        struct(allCols.map(col): _*),
        struct(col("bid"), col("ask"))).as("__best"))
      .select(allCols.map(c => col(s"__best.$c").as(c)): _*)
    // the deduped batch feeds THREE consumers below — the partitioned
    // write, the touched-months collect, and the inserted-rows count;
    // without a persist each re-runs the dedup aggregation over the raw
    // batch (three full batch scans per ingest). Cache it around all three.
    deduped.persist()
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
    catch { case e: Throwable => deduped.unpersist(); throw e }
    finally prevMode.fold(
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    // Refresh the _manifest sidecar of each TOUCHED month partition (one
    // small single-column job per month over files just written): the
    // zero-probe dispatch metadata (OhlcGenerator.footerMonthCounts) then
    // answers from one sidecar read per partition instead of one footer
    // round-trip per data file — the difference that matters once batches
    // accumulate files in a month (especially on object stores, where each
    // footer open is a request). Untouched months keep their sidecars
    // byte-identical; a crash between the data write and this refresh
    // leaves a STALE sidecar, which the reader's file-name freshness check
    // rejects in favor of footers — never wrong, only slower.
    // Best-effort: the sidecar is an optimization, and the DATA write above
    // already succeeded — failing the batch over a failed JSON write would
    // be wrong (the reader's freshness check routes a missing/stale sidecar
    // to the footer fallback).
    try {
      val touchedMonths = deduped.select("yyyymm").distinct()
        .collect().map(_.getString(0))
      touchedMonths.foreach { m =>
        // bid/ask secondary zone-map stats ride the same single manifest
        // scan (r17, r16 verdict item 5): zero-spread scans (bid = ask)
        // and price-band filters are documented workloads
        // (`docs/CLICKHOUSE_USER_GUIDE.md:450-454`), and under the
        // per-month timestamp sort prices are locally correlated enough
        // that per-file bid/ask ranges prune band queries to the files
        // that actually traded in the band
        try graft.storage.Manifest.write(spark,
          s"$warehouse/${variant}_ticks/instrument=${instrument.toUpperCase(java.util.Locale.ROOT)}/yyyymm=$m",
          "timestamp", extraCols = Seq("bid", "ask"))
        catch { case scala.util.control.NonFatal(_) => () }
      }
      // inserted-row count = the batch itself, answered from the cache
      // (the Manifest.write jobs above scan the WRITTEN files — that scan
      // per touched month is the sidecar's cost and is unavoidable; the
      // batch-side jobs all reuse the persisted dedup). Reading back the
      // stored table filtered only on instrument counted EVERY month ever
      // ingested — a full-instrument scan per monthly batch (and a wrong
      // "inserted" number once history accumulates).
      deduped.count()
    } finally deduped.unpersist()
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
    instrument.foreach(i => df = df.filter(col("instrument") === i.toUpperCase(java.util.Locale.ROOT)))
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

  /** [[readTicks]] with zone-map FILE skipping on top of its partition
    * pruning: month partitions outside the requested range are dropped by
    * NAME on the driver (never listed), and within each surviving month
    * the `_manifest` sidecar [[graft.storage.PrunedScan.prunedDataFiles]]
    * selects only the files whose timestamp range can intersect the
    * predicate — the Spark-native equivalent of the reference's sparse
    * primary index ORDER BY (instrument, timestamp)
    * (`docs/DATABASE_SCHEMA.md:759-764`): a narrow range over a deep
    * month touches O(range) files, not O(files-in-month).
    *
    * Result-identical to [[readTicks]] (the same exact filters are
    * re-applied; ForexPipelineSpec pins equality): a month without a
    * fresh sidecar reads all its files, and any listing error falls back
    * to [[readTicks]] wholesale — slower, never wrong.
    */
  def readTicksPruned(
      spark: SparkSession,
      warehouse: String,
      variant: String,
      instrument: Option[String] = None,
      start: Option[String] = None,
      end: Option[String] = None,
      extraBounds: Seq[(String, Any, Any)] = Nil,
      overlapPairs: Seq[(String, String)] = Nil
  ): DataFrame = {
    import org.apache.hadoop.fs.Path
    import graft.storage.PrunedScan
    val root = s"$warehouse/${variant}_ticks"
    def exactExtra(df: DataFrame): DataFrame = {
      val banded = extraBounds.foldLeft(df) {
        case (d, (c, lo, hi)) => d.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
      }
      // the equality the overlap pruning is a necessary condition for
      // (r18: zero-spread `bid = ask`) — always re-applied exactly
      overlapPairs.foldLeft(banded) {
        case (d, (a, b)) => d.filter(col(a) === col(b))
      }
    }
    def fallback() =
      exactExtra(readTicks(spark, warehouse, variant, instrument, start, end))
    // month-name bounds mirror readTicks' injected yyyymm predicates; the
    // zone-map bounds widen open ends to sentinels outside any tick data
    // so a one-sided range still prunes on the bounded side. extraBounds
    // (r17: bid/ask price bands) prune files through the sidecars'
    // secondary stats and are re-applied exactly below, so a sidecar
    // without them is slower, never wrong.
    val files: Option[Seq[Path]] = PrunedScan.monthPartitionedFiles(
      spark.sessionState.newHadoopConf(), new Path(root), "timestamp",
      instrument, start.map(PrunedScan.monthOfLo(spark, _)),
      end.map(PrunedScan.monthOfHi(spark, _)),
      PrunedScan.sessionInstant(spark, start.getOrElse("1900-01-01")),
      PrunedScan.sessionInstant(spark, end.getOrElse("9999-01-01")),
      extraBounds, overlapPairs)
    files match {
      case None => fallback()
      case Some(Nil) => fallback().filter(lit(false)) // schema-exact empty
      case Some(paths) =>
        var df = spark.read.option("basePath", root)
          .parquet(paths.map(_.toString): _*)
        instrument.foreach(i => df = df.filter(col("instrument") === i.toUpperCase(java.util.Locale.ROOT)))
        start.foreach(s => df = df.filter(col("timestamp") >= lit(s).cast("timestamp")))
        end.foreach(e => df = df.filter(col("timestamp") <= lit(e).cast("timestamp")))
        exactExtra(df)
    }
  }
}
