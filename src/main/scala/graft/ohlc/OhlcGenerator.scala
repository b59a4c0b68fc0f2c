package graft.ohlc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.calendar.TradingCalendar
import graft.ingest.TickIngest

/** Full 27-column OHLC generation (reference
  * `clickhouse_ohlc_generator.py:65-215` + the session/holiday enrichment
  * round-trip at 217-329, collapsed here into a single Spark plan):
  *
  *   ticks (both variants) → ASOF join → minute agg → tz/session columns →
  *   calendar flag joins → partitioned write.
  *
  * The reference's three regeneration modes (`full` / `append` /
  * `incremental range`, `clickhouse_ohlc_generator.py:78-133`) all become
  * month-scoped dynamic partition overwrite: DELETE + poll-mutations +
  * re-INSERT (`_wait_for_mutations`, 331-353) is replaced by one atomic
  * overwrite of exactly the affected yyyymm partitions (SURVEY.md §2.1 S6).
  */
object OhlcGenerator {

  /** Column order of the ohlc_1m table (`clickhouse_manager.py:196-224`). */
  val Columns: Seq[String] =
    Seq("instrument", "timestamp", "open", "high", "low", "close",
      "raw_spread_avg", "standard_spread_avg",
      "tick_count_raw_spread", "tick_count_standard",
      "ny_hour", "london_hour", "ny_session", "london_session",
      "is_us_holiday", "is_uk_holiday", "is_major_holiday") ++
      graft.calendar.ExchangeRegistry.all.map(e => s"is_${e.key}_session")

  /** Timezone/session projection columns added at generation time
    * (`clickhouse_ohlc_generator.py:164-180`).
    */
  def withSessionColumns(bars: DataFrame): DataFrame = {
    val nyH = hour(from_utc_timestamp(col("timestamp"), "America/New_York"))
    val loH = hour(from_utc_timestamp(col("timestamp"), "Europe/London"))
    bars
      .withColumn("ny_hour", nyH.cast("int"))
      .withColumn("london_hour", loH.cast("int"))
      .withColumn("ny_session",
        when(nyH >= 9 && nyH <= 16, "NY_Session")
          .when(nyH >= 17 && nyH <= 20, "NY_After_Hours")
          .otherwise("NY_Closed"))
      .withColumn("london_session",
        when(loH >= 8 && loH <= 16, "London_Session")
          .otherwise("London_Closed"))
  }

  /** Build the full 27-column 1m OHLC frame from the two tick variants.
    * `asofMode` threads through to the as-of dispatch ([[Ohlc.ticksToOhlc1m]]):
    * "auto" probes the data; callers that already know the shape (e.g.
    * [[regenerate]], which reads it off parquet footers) pass the form.
    */
  def generate(
      rawSpread: DataFrame,
      standard: DataFrame,
      asofMode: String = "auto",
      asofBucketSeconds: Long = 86400L
  ): DataFrame =
    enrichBars(Ohlc.ticksToOhlc1m(rawSpread, standard, asofMode, asofBucketSeconds))

  /** The enrichment HALF of [[generate]] — 1m bars (instrument, timestamp,
    * OHLC, spreads, counts) → the full 27-column frame. Split out so the
    * STREAMING pipeline can apply it per emitted micro-batch
    * ([[graft.streaming.StreamingGate.ohlcEnrichedAvailableNow]]'s
    * foreachBatch): every flag is a per-row function of the bar timestamp,
    * so per-batch application equals the global batch enrichment.
    */
  def enrichBars(bars: DataFrame): DataFrame = {
    val enriched = TradingCalendar.enrich(withSessionColumns(bars), "timestamp")
    enriched.select(Columns.map(col): _*)
  }

  /** Exact stored row counts per month for one (variant, instrument,
    * months-subset), from METADATA only — no Spark job, no data pages.
    * Two tiers per month partition:
    *
    *   1. a `_manifest` sidecar ([[graft.storage.Manifest]]) when one is
    *      present AND its file-name set matches the directory's actual
    *      parquet basenames (Spark writes fresh task-UUID names on every
    *      overwrite, so a name-set match proves freshness): ONE small
    *      sidecar read answers for the whole partition — at
    *      100 TB-warehouse file counts this replaces O(files) footer
    *      round-trips (each a driver-side open, painful on object stores).
    *      Ingest refreshes the sidecar of every month it touches
    *      ([[graft.ingest.TickIngest.writeTicks]]) and the compactor
    *      rebuilds it after rewrites, so on the normal lifecycle this
    *      tier always answers;
    *   2. otherwise one parquet FOOTER read per file (footer row counts
    *      are exact, written by the committing task).
    *
    * Either way the sum equals `readTicks(...).count()` without the scan.
    * `months` empty = all stored months of the instrument. Throws on an
    * unreadable footer (corrupt/zero-length file): the count is then
    * unknowable from metadata, and [[regenerate]] falls back to a probed
    * "auto" dispatch rather than guessing.
    */
  /** Monotone count of parquet FOOTER opens paid by the metadata tiers —
    * the cost the `_manifest` sidecar tier exists to avoid. Specs pin that
    * a freshly-written partition's count answers from its sidecar with
    * ZERO footer opens (ForexPipelineSpec), the way [[Probes.probeJobs]]
    * pins zero decision scans.
    */
  private[graft] val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def footerMonthCounts(
      spark: SparkSession,
      warehouse: String,
      variant: String,
      instrument: String,
      months: Seq[String]
  ): Seq[(String, Long)] =
    tableMonthCounts(spark, warehouse, s"${variant}_ticks", instrument, months)

  /** [[footerMonthCounts]] generalized to any instrument/yyyymm-partitioned
    * warehouse table (tick variants AND `ohlc_1m` — bar-count accounting
    * mirrors `clickhouse_ohlc_generator.py:199-210`).
    */
  private[graft] def tableMonthCounts(
      spark: SparkSession,
      warehouse: String,
      table: String,
      instrument: String,
      months: Seq[String]
  ): Seq[(String, Long)] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val base =
      new Path(s"$warehouse/$table/instrument=${instrument.toUpperCase(java.util.Locale.ROOT)}")
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) return Nil
    val monthDirs =
      if (months.isEmpty)
        fs.listStatus(base).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("yyyymm="))
          .map(_.getPath)
      else months.map(m => new Path(base, s"yyyymm=$m")).filter(fs.exists)
    monthDirs.map { dir =>
      val month = dir.getName.stripPrefix("yyyymm=")
      val parquetFiles = fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val names = parquetFiles.map(_.getPath.getName).toSet
      val fromManifest = graft.storage.Manifest.fileRowCounts(conf, dir)
        .filter(_.keySet == names) // stale/partial sidecar → footers
        .map(_.values.sum)
      val rows = fromManifest.getOrElse {
        parquetFiles.iterator.map { s =>
          footerReads.incrementAndGet()
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(s, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      }
      month -> rows
    }
  }

  /** Seconds spanned by a set of yyyymm month labels: from the first
    * day of the earliest month to the first day of the month AFTER the
    * latest (calendar-exact, so a 31-day month counts its 31 days). Feeds
    * [[graft.operators.AsofJoin.bucketWidthFor]] with the span the stored
    * rows actually cover. Empty input → 0 (the width sizer then falls
    * back to its day default).
    */
  private[graft] def monthSpanSeconds(months: Seq[String]): Long =
    if (months.isEmpty) 0L
    else {
      val yms = months.map(m =>
        java.time.YearMonth.parse(m.take(4) + "-" + m.drop(4)))
      val lo = yms.min.atDay(1).atStartOfDay(java.time.ZoneOffset.UTC)
      val hi = yms.max.plusMonths(1).atDay(1)
        .atStartOfDay(java.time.ZoneOffset.UTC)
      java.time.Duration.between(lo, hi).getSeconds
    }

  /** Sum of [[footerMonthCounts]] — the exact stored row count for one
    * (variant, instrument, months-subset) without touching data pages.
    */
  private[graft] def footerTickCount(
      spark: SparkSession,
      warehouse: String,
      variant: String,
      instrument: String,
      months: Seq[String]
  ): Long =
    footerMonthCounts(spark, warehouse, variant, instrument, months)
      .map(_._2).sum

  /** Regenerate OHLC months into the warehouse. `months` empty = full
    * regeneration; non-empty = only those yyyymm partitions are rebuilt
    * (append / incremental-range modes), others untouched.
    *
    * Equivalence between the modes: the ASOF join carries the LAST
    * standard tick at-or-before each raw tick, so an incremental rebuild
    * must see the standard ticks of the month BEFORE each rebuilt month —
    * otherwise the first bars of a rebuilt month lose their carry-in
    * standard quote and diverge from a full rebuild of the same data. The
    * raw side stays month-filtered (it alone decides which bars exist);
    * only the standard side widens, and only by the immediately preceding
    * months.
    */
  def regenerate(
      spark: SparkSession,
      warehouse: String,
      instrument: String,
      months: Seq[String] = Nil
  ): Long = {
    def prevMonth(m: String): String =
      java.time.YearMonth.parse(m.take(4) + "-" + m.drop(4)).minusMonths(1)
        .toString.replace("-", "")
    def monthFiltered(variant: String, keep: Seq[String]): DataFrame = {
      var df = TickIngest.readTicks(spark, warehouse, variant, Some(instrument))
      if (keep.nonEmpty) df = df.filter(col("yyyymm").isin(keep: _*))
      df
    }
    val stdMonths =
      if (months.isEmpty) Nil else (months ++ months.map(prevMonth)).distinct
    // As-of dispatch verdict from CATALOG metadata, not a probe job: both
    // join sides are filtered to ONE instrument and the join key is
    // instrument alone, so the hottest key's row count IS the combined
    // total — and parquet footers (or a Manifest sidecar, when present)
    // already hold the exact per-partition totals. A regeneration batch
    // therefore pays zero decision scans (Probes.probeJobs pins this),
    // where mode="auto" would re-scan the touched months' ticks once per
    // call. The same footers name WHICH months hold rows, so a "bucketed"
    // verdict also gets its width sized from the stored density
    // (AsofJoin.bucketWidthFor) instead of a fixed day. If the metadata
    // is unreadable (corrupt footer, listing error) the count is
    // unknowable without a scan — fall back to mode="auto" and pay the
    // one probe rather than guessing a form.
    val (asofForm, asofWidth) = (try {
      val raw = footerMonthCounts(spark, warehouse, "raw_spread", instrument, months)
      val std = footerMonthCounts(spark, warehouse, "standard", instrument, stdMonths)
      Some((raw, std))
    } catch { case scala.util.control.NonFatal(_) => None }) match {
      case None => ("auto", 86400L)
      case Some((raw, std)) =>
        val total = (raw ++ std).map(_._2).sum
        if (total > graft.operators.AsofJoin.HotKeyCrossover) {
          val byMonth = (raw ++ std).groupMapReduce(_._1)(_._2)(_ + _)
            .filter(_._2 > 0)
          val live = byMonth.keys.toSeq
          // average-density width over the whole stored span, corrected
          // down by the DENSEST month (the footer metadata's burst
          // resolution — month-granular where the probe path's is hourly,
          // but free): a year of sparse history with one packed month
          // must get a width sized for that month, not the year average.
          val target = graft.operators.AsofJoin.HotKeyCrossover
          val avg = graft.operators.AsofJoin
            .bucketWidthFor(total, monthSpanSeconds(live), target)
          val peak = byMonth.map { case (m, n) =>
            graft.operators.AsofJoin
              .bucketWidthFor(n, monthSpanSeconds(Seq(m)), target)
          }.min
          ("bucketed", math.min(avg, peak))
        } else ("plain", 86400L)
    }
    val out = generate(
        monthFiltered("raw_spread", months), monthFiltered("standard", stdMonths),
        asofMode = asofForm, asofBucketSeconds = asofWidth)
      .withColumn("yyyymm", date_format(col("timestamp"), "yyyyMM"))
    // the carry-in widening can produce bars for the lookback months too —
    // they are NOT part of this rebuild; only the requested partitions move
    val scoped =
      if (months.isEmpty) out else out.filter(col("yyyymm").isin(months: _*))
    // dynamic overwrite for month-scoped rebuilds; a FULL rebuild must
    // also clear months that no longer have ticks (static overwrite of
    // the instrument's whole subtree does that). The session conf is
    // restored afterwards — regenerate must not silently change overwrite
    // semantics for unrelated writes on the shared session.
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
      if (months.isEmpty) "static" else "dynamic")
    try {
      if (months.isEmpty) {
        // static mode truncates only the partitions we target: write via
        // the instrument subtree path so other instruments are untouched
        scoped.drop("instrument").write
          .mode("overwrite")
          .option("compression", "zstd")
          .partitionBy("yyyymm")
          .parquet(s"$warehouse/ohlc_1m/instrument=${instrument.toUpperCase(java.util.Locale.ROOT)}")
      } else {
        scoped.write
          .mode("overwrite")
          .option("compression", "zstd")
          .partitionBy("instrument", "yyyymm")
          .parquet(s"$warehouse/ohlc_1m")
      }
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    }
    // Refresh the `_manifest` sidecar of every REWRITTEN ohlc month — the
    // same best-effort pattern as TickIngest.writeTicks: bar-count
    // accounting over ohlc_1m (mirrors `clickhouse_ohlc_generator.py:
    // 199-210`) then answers from one sidecar read per partition instead
    // of a footer round-trip per data file. A month-scoped rebuild touches
    // exactly `months`; a full rebuild replaced the instrument's whole
    // subtree, so every month dir present afterwards is fresh. A failed or
    // skipped refresh (e.g. a requested month that produced no bars and so
    // has no directory) leaves a missing/stale sidecar, which the reader's
    // file-name freshness check routes to footers — never wrong, only
    // slower.
    {
      import org.apache.hadoop.fs.Path
      val ohlcBase = s"$warehouse/ohlc_1m/instrument=${instrument.toUpperCase(java.util.Locale.ROOT)}"
      val touched: Seq[String] =
        if (months.nonEmpty) months
        else try {
          val conf = spark.sessionState.newHadoopConf()
          val base = new Path(ohlcBase)
          val fs = base.getFileSystem(conf)
          if (!fs.exists(base)) Nil
          else fs.listStatus(base).toSeq
            .filter(s => s.isDirectory && s.getPath.getName.startsWith("yyyymm="))
            .map(_.getPath.getName.stripPrefix("yyyymm="))
        } catch { case scala.util.control.NonFatal(_) => Nil }
      touched.foreach { m =>
        try graft.storage.Manifest.write(spark, s"$ohlcBase/yyyymm=$m", "timestamp")
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    spark.read.parquet(s"$warehouse/ohlc_1m")
      .filter(col("instrument") === instrument.toUpperCase(java.util.Locale.ROOT))
      .count()
  }
}
