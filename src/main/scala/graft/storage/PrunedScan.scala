package graft.storage

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map file skipping over [[Manifest]] sidecars.
  *
  * Parquet gives row-group pruning for free, but only AFTER a task has
  * been planned and the file's footer opened: a range scan over a 10^5-file
  * export still lists, plans, and footer-reads every file. The reference
  * gets file-level skipping from its clustered storage engine
  * (`docs/DATABASE_SCHEMA.md:759-764` — `ORDER BY (instrument, timestamp)`
  * makes point/range scans touch O(1) parts); the Spark-native equivalent
  * is the [[Manifest]]'s per-file (min_key, max_key) zone map over a
  * [[RangeWriter]] layout: ONE small sidecar read on the driver selects
  * exactly the files whose key range can intersect the predicate, and the
  * scan is planned over that subset — zero Spark jobs, zero footer opens
  * for skipped files.
  *
  * Correctness never depends on the stats: the exact predicate is
  * re-applied over the surviving files (a false inclusion costs a read,
  * never a wrong row), and a file is skipped only when its manifest range
  * PROVES it empty for the predicate. A missing, stale (file-name set ≠
  * directory contents — Spark's task-UUID names make that a freshness
  * proof), garbled, differently-keyed, or unparseable sidecar falls back
  * to the full scan + filter: slower, never wrong.
  */
object PrunedScan {

  /** Comparable key axis: numeric (BigDecimal), temporal (epoch micros —
    * kept DISTINCT from plain numerics so truncation slack applies only
    * where truncation can exist), or plain string (lexicographic). Axes
    * never compare across kinds — a mixed pair aborts pruning instead of
    * guessing an order.
    */
  private sealed trait Key
  private final case class NumKey(v: BigDecimal) extends Key
  private final case class TimeKey(us: Long) extends Key
  private final case class StrKey(v: String) extends Key

  private def lt(a: Key, b: Key): Option[Boolean] = (a, b) match {
    case (NumKey(x), NumKey(y)) => Some(x < y)
    case (TimeKey(x), TimeKey(y)) => Some(x < y)
    case (StrKey(x), StrKey(y)) => Some(x < y)
    case _ => None
  }

  /** Manifests written before the µs-precision `timestampFormat` (and any
    * writer that formats fractional seconds at millisecond precision)
    * TRUNCATE a stored max toward zero by up to 999 µs. Padding the token
    * side's MAX by that slack before the `max < lo` test keeps such a
    * file when its true max could still reach the bound — at worst ~1 ms
    * of extra data is read; a skip remains a proof. Mins need no slack:
    * a truncated min only UNDERSTATES, which already errs toward keeping.
    */
  private def padMax(k: Key): Key = k match {
    case TimeKey(us) => TimeKey(us + 999L)
    case other => other
  }

  private def instantMicros(i: java.time.Instant): Long =
    Math.addExact(
      Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  /** Temporal string → epoch micros, accepting every form Spark's JSON
    * writer or a caller is likely to hand over: ISO offset
    * ("…T…Z" / "+00:00"), ISO instant, ISO local (TIMESTAMP_NTZ — read as
    * UTC, matching the session timezone the manifests are written under),
    * bare dates, and the space-separated "2024-01-05 00:00:00[.ffffff]"
    * literal form.
    */
  private def temporalMicros(s: String): Option[Long] = {
    import java.time._
    val t = scala.util.Try(OffsetDateTime.parse(s).toInstant)
      .orElse(scala.util.Try(Instant.parse(s)))
      .orElse(scala.util.Try(
        LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)))
      .orElse(scala.util.Try(
        LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)))
      .orElse(scala.util.Try(
        LocalDateTime.parse(s.replace(' ', 'T')).toInstant(ZoneOffset.UTC)))
    t.toOption.map(instantMicros)
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Raw manifest JSON token → [[Key]]. Quoted tokens that parse as
    * temporals take the temporal axis (the manifest writes timestamp keys
    * with explicit offsets, so they resolve to exact instants); other
    * quoted tokens are plain strings. Bare tokens must be numeric;
    * anything else → None (can't prune).
    */
  private def tokenKey(tok: String): Option[Key] = {
    val t = tok.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) {
      val un = unescape(t.substring(1, t.length - 1))
      Some(temporalMicros(un).map(TimeKey).getOrElse(StrKey(un)))
    } else scala.util.Try(BigDecimal(t)).toOption.map(NumKey(_))
  }

  /** Caller-supplied bound → [[Key]]. A String bound is ALWAYS the string
    * axis, even when it would parse as a date: the exact filter compares
    * a string bound against a string column LEXICOGRAPHICALLY, and
    * temporal-parsing it here could order differently (mixed offsets,
    * space-vs-T forms) and wrongly prune. Against a timestamp-keyed
    * manifest a string bound therefore falls back to the full scan —
    * pass Timestamp/Instant bounds to prune temporal keys.
    */
  private def boundKey(v: Any): Option[Key] = v match {
    case null => None
    case d: BigDecimal => Some(NumKey(d))
    case t: java.sql.Timestamp => Some(TimeKey(instantMicros(t.toInstant)))
    case n: java.lang.Number => Some(NumKey(BigDecimal(n.toString)))
    case d: java.sql.Date =>
      Some(TimeKey(instantMicros(
        d.toLocalDate.atStartOfDay.toInstant(java.time.ZoneOffset.UTC))))
    case i: java.time.Instant => Some(TimeKey(instantMicros(i)))
    case l: java.time.LocalDateTime =>
      Some(TimeKey(instantMicros(l.toInstant(java.time.ZoneOffset.UTC))))
    case l: java.time.LocalDate =>
      Some(TimeKey(instantMicros(
        l.atStartOfDay.toInstant(java.time.ZoneOffset.UTC))))
    case s: String => Some(StrKey(s))
    case _ => None
  }

  /** Surviving basenames for [lo, hi] (inclusive both ends), or None when
    * any file's stats are unusable — pruning is all-or-nothing so a single
    * odd file can't silently widen to a partial answer. A file with NO
    * min/max under a matching key_col holds only NULL keys (Spark's JSON
    * writer drops null aggregate fields): provably empty for a range
    * predicate, skipped.
    */
  private def survivors(
      ranges: Map[String, (Option[String], Option[String])],
      lo: Key,
      hi: Key): Option[Seq[String]] = {
    val picks = ranges.toSeq.map {
      case (_, (None, None)) => Some(None) // all-NULL key file: skip
      case (name, (Some(mnTok), Some(mxTok))) =>
        for {
          mnK <- tokenKey(mnTok)
          mxK <- tokenKey(mxTok)
          below <- lt(padMax(mxK), lo) // slack covers ms-truncated sidecars
          above <- lt(hi, mnK)
        } yield if (below || above) None else Some(name)
      case _ => None // half-present stats: the sidecar is suspect
    }
    if (picks.contains(None)) None
    else Some(picks.flatten.flatten.sorted)
  }

  /** Surviving data-file paths for [lo, hi] under ONE flat directory, or
    * None when the zone map cannot be used (missing/stale/garbled sidecar,
    * key_col mismatch, unparseable stats/bounds) — the caller then reads
    * every file and relies on its exact filter. This is the per-leaf
    * primitive; [[readRange]] wraps it for flat tables and partitioned
    * readers (e.g. the tick warehouse) call it per pruned partition.
    */
  private[graft] def prunedDataFiles(
      conf: org.apache.hadoop.conf.Configuration,
      dir: HPath,
      keyCol: String,
      lo: Any,
      hi: Any): Option[Seq[HPath]] =
    try {
      val fs = dir.getFileSystem(conf)
      val dataNames = fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.getName)
      for {
        loK <- boundKey(lo)
        hiK <- boundKey(hi)
        km <- Manifest.fileKeyRanges(conf, dir)
        (mKeyCol, ranges) = km
        if mKeyCol == keyCol          // stats describe a different column
        if ranges.keySet == dataNames.toSet // stale/partial sidecar
        kept <- survivors(ranges, loK, hiK)
      } yield kept.map(n => new HPath(dir, n))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseWallClock(t: String): java.time.LocalDateTime =
    if (t.contains(" ") || t.contains("T"))
      java.time.LocalDateTime.parse(t.replace(' ', 'T'))
    else java.time.LocalDate.parse(t).atStartOfDay

  /** "yyyy-MM-dd[ HH:mm:ss[.ffffff]]" literal → the Instant that
    * `lit(t).cast("timestamp")` resolves to in THIS session — i.e. the
    * wall-clock interpreted in `spark.sql.session.timeZone`. Zone-map
    * bounds MUST go through this (not the JVM default zone, not a
    * hard-coded UTC): the exact filter the pruned read re-applies uses
    * the session zone, and a bound shifted off it by hours would wrongly
    * skip files on any non-UTC session.
    */
  def sessionInstant(spark: SparkSession, t: String): java.time.Instant =
    parseWallClock(t)
      .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .toInstant

  /** Wall-clock yyyymm of a bound literal — the month-partition label the
    * warehouse writers derive via `date_format(..., "yyyyMM")` in the
    * session zone. Zone-free by construction: the partition label is the
    * LITERAL's wall-clock month in that same zone, so LocalDate parsing
    * gives the identical answer for every session zone.
    */
  def monthOf(t: String): String = {
    val d = parseWallClock(t).toLocalDate
    f"${d.getYear}%04d${d.getMonthValue}%02d"
  }

  /** Data files of an instrument/yyyymm-partitioned warehouse table
    * (the tick variants and `ohlc_1m`) for a key range: month partitions
    * outside [loMonth, hiMonth] are dropped BY NAME on the driver (never
    * listed — zero-padded yyyymm orders lexicographically), and each
    * surviving month is zone-mapped through [[prunedDataFiles]]; a month
    * without a usable sidecar contributes all its data files. None on any
    * listing error — the caller falls back to the plain partitioned read.
    */
  def monthPartitionedFiles(
      conf: org.apache.hadoop.conf.Configuration,
      root: HPath,
      keyCol: String,
      instrument: Option[String],
      loMonth: Option[String],
      hiMonth: Option[String],
      lo: Any,
      hi: Any): Option[Seq[HPath]] =
    try {
      val fs = root.getFileSystem(conf)
      val instDirs = instrument match {
        case Some(i) => Seq(new HPath(root, s"instrument=${i.toUpperCase}"))
          .filter(fs.exists)
        case None => fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("instrument="))
          .map(_.getPath)
      }
      val monthDirs = instDirs.flatMap { d =>
        fs.listStatus(d).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("yyyymm="))
          .map(_.getPath)
      }.filter { d =>
        val m = d.getName.stripPrefix("yyyymm=")
        loMonth.forall(_ <= m) && hiMonth.forall(m <= _)
      }
      Some(monthDirs.flatMap { d =>
        prunedDataFiles(conf, d, keyCol, lo, hi).getOrElse {
          fs.listStatus(d).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
              !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith("."))
            .map(_.getPath)
        }
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Inclusive range scan over the dataset at `path` (a flat directory of
    * parquet files — partitioned tables prune partitions first and apply
    * this per leaf), reading ONLY the files whose manifest zone-map range
    * intersects [lo, hi]. Bounds accept numerics, java.sql/java.time
    * temporals, and strings. Fallback (no/stale/garbled sidecar, key_col
    * mismatch, unparseable stats): full scan + the same exact filter.
    */
  def readRange(
      spark: SparkSession,
      path: String,
      keyCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    require(lo != null && hi != null, "readRange bounds must be non-null")
    val exact: Column = col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)
    val picked: Option[Seq[String]] =
      prunedDataFiles(spark.sessionState.newHadoopConf(), new HPath(path),
        keyCol, lo, hi).map(_.map(_.toString))
    picked match {
      case Some(Nil) =>
        // every file proven out of range: empty result, real schema
        val schema = spark.read.parquet(path).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(paths) => spark.read.parquet(paths: _*).filter(exact)
      case None => spark.read.parquet(path).filter(exact)
    }
  }
}
