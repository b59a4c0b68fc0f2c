package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.text.BpeTrainer
import graft.vector.VectorFunctions

/** Regression pins for the round-8 advisor findings: each test fails on the
  * pre-fix code and passes on the fixed code.
  */
class ReviewFixSpec extends SparkSpec {
  import spark.implicits._

  test("BPE training on an empty corpus returns an empty merge table") {
    // pre-fix: sum(length(w)) over zero rows is NULL and head().getLong(0)
    // threw NPE (the nWords <= localWordLimit gate is satisfied by 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val merges = BpeTrainer.train(empty, "doc_id", "text", numMerges = 4)
    assert(merges.count() === 0L)
    // whitespace-only docs aggregate to zero words too
    val blank = Seq((1L, "   "), (2L, "\t\n")).toDF("doc_id", "text")
    assert(BpeTrainer.train(blank, "doc_id", "text", numMerges = 4).count() === 0L)
  }

  test("IVF cell assignment: NULL embeddings rank after real sims, real rows unaffected") {
    // pre-fix: every sim comparison on a NULL cosine is false, so NULL-sim
    // entries interleaved by cell id instead of sorting last. With a NULL
    // vector ALL sims are NULL and the deterministic fallback is the
    // lowest cell id — what matters is (a) no crash, (b) determinism,
    // (c) rows with real vectors still get their true nearest cell.
    val cents = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(-1.0f, 0.0f))).toDF("cell", "cent")
    val rows = Seq(
      (10L, Array(0.9f, 0.1f)),  // nearest cell 0
      (11L, Array(0.1f, 0.9f)),  // nearest cell 1
      (12L, null.asInstanceOf[Array[Float]])) // NULL embedding
      .toDF("id", "vec")
    val assigned = VectorFunctions
      .assignCells(rows, "id", "rid", "vec", cents, keep = 1)
      .select("rid", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(10L) === 0L)
    assert(assigned(11L) === 1L)
    assert(assigned(12L) === 0L) // all-NULL sims fall to the cell tiebreak
    // determinism under repartitioning
    val again = VectorFunctions
      .assignCells(rows.repartition(7), "id", "rid", "vec", cents, keep = 1)
      .select("rid", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === assigned)
  }

  test("q_approx_quantile contract survives heavy ties at the percentile") {
    // 5000 rows of one constant value: p50 estimate IS that value, the
    // inclusive rank count is n (not ~n/2), and the pre-fix one-sided
    // check |count(<=) - 0.5n| <= n/1000 + 1 flipped to false. The
    // two-sided bound (target rank within [count(<), count(<=)] ± slack)
    // stays true.
    val dir = Files.createTempDirectory("graft_ties")
    val base = Timestamp.valueOf("2024-03-01 00:00:00")
    val rows = (0 until 5000).map { i =>
      (i.toLong, new Timestamp(base.getTime + i * 1000L), i.toLong % 7,
        "tied", 42.0, "{}")
    } ++ (0 until 100).map { i =>
      (5000L + i, new Timestamp(base.getTime + i * 500L), i.toLong % 3,
        "spread", i.toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_approx_quantile")(spark, dir.toString)
      .collect().map(r => r.getString(0) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out("tied") === ((true, true)))
    assert(out("spread") === ((true, true)))
  }

  test("availableDates is UTC-stable under a non-UTC JVM default zone") {
    // pre-fix: Timestamp.toLocalDateTime renders in the JVM default zone;
    // at UTC+14 a 14:30 UTC tick reads as the NEXT local day. The engine's
    // Spark session is UTC-pinned, so the API must be too.
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Pacific/Kiritimati")) // UTC+14
      val dir = Files.createTempDirectory("graft_avail")
      val wh = dir.resolve("warehouse").toString
      // zone-independent instants (Timestamp.valueOf would parse in the
      // default zone and cancel out the rendering bug under test)
      def utcTs(s: String): Timestamp =
        Timestamp.from(java.time.Instant.parse(s))
      Seq(("EURUSD", utcTs("2024-01-10T14:30:00Z"), 1.1, 1.2, "202401"),
          ("EURUSD", utcTs("2024-02-05T14:30:00Z"), 1.1, 1.2, "202402"))
        .toDF("instrument", "timestamp", "bid", "ask", "yyyymm")
        .write.partitionBy("yyyymm").parquet(s"$wh/raw_spread_ticks")
      val p = new graft.api.Processor(spark, wh)
      assert(p.availableDates("EURUSD") ===
        ((Some("2024-01-10"), Some("2024-02-05"))))
    } finally java.util.TimeZone.setDefault(tz)
  }

  // ---- round-12 review pins -------------------------------------------

  private val tinyCsv =
    "Timestamp,Bid,Ask\n" +
      "2024-01-10 00:00:00.000000,1.10000,1.10010\n" +
      "2024-02-05 00:00:01.000000,1.10020,1.10030\n"

  private def writeZipFile(path: java.nio.file.Path, entry: String,
      bytes: Array[Byte]): Unit = {
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    zos.putNextEntry(new java.util.zip.ZipEntry(entry))
    zos.write(bytes); zos.closeEntry(); zos.close()
  }

  test("updateData with an empty/all-damaged batch neither rebuilds full history nor poisons a fresh warehouse") {
    // pre-fix: touched=Nil fell through to regenerate(months=Nil) — the
    // FULL-history rebuild — and writeTicks(empty) left _SUCCESS-only
    // table dirs that every later read of the fresh warehouse threw on
    val dir = Files.createTempDirectory("graft_empty_batch")
    val rawDir = dir.resolve("raw"); Files.createDirectories(rawDir)
    val stdDir = dir.resolve("std"); Files.createDirectories(stdDir)
    val wh = dir.resolve("warehouse").toString
    val p = new graft.api.Processor(spark, wh)
    val res = p.updateData("EURUSD", rawDir.toString, stdDir.toString)
    val r = res.toOption.get
    assert(r.monthsProcessed === 0)
    assert(r.ticksInserted === 0L)
    assert(r.barsGenerated === 0L)
    // the fresh warehouse is untouched and still fully queryable
    val cov = p.getCoverage("EURUSD")
    assert(cov.rawSpreadTicks === 0L && cov.ohlcBars === 0L)
    assert(p.missingMonths("EURUSD") === Nil)
    assert(p.availableDates("EURUSD") === ((None, None)))
  }

  test("an uppercase .ZIP file path routes to the zip reader; monthsProcessed counts touched months") {
    val dir = Files.createTempDirectory("graft_upper_zip")
    val zip = dir.resolve("DATA.ZIP")
    writeZipFile(zip, "Exness_EURUSD_2024_01.csv", tinyCsv.getBytes("UTF-8"))
    val stdCsvPath = dir.resolve("std.csv")
    Files.write(stdCsvPath, tinyCsv.getBytes("UTF-8"))
    val wh = dir.resolve("warehouse").toString
    val p = new graft.api.Processor(spark, wh)
    // pre-fix: endsWith(".zip") was case-sensitive, the .ZIP fell to the
    // CSV parser, zero ticks ingested, binary lines counted as damage
    val r = p.updateData("EURUSD", zip.toString, stdCsvPath.toString)
      .toOption.get
    assert(r.ticksInserted === 4L, r)
    // two distinct months ingested -> monthsProcessed 2 (pre-fix it
    // reported the unrelated pre-ingest GAP count)
    assert(r.monthsProcessed === 2)
    assert(r.badRecords === 0L)
  }

  test("a UTF-8 BOM before a ZIP member's header is stripped, not counted as damage") {
    val dir = Files.createTempDirectory("graft_bom_zip")
    val zip = dir.resolve("bom.zip")
    writeZipFile(zip, "m.csv", ("\uFEFF" + tinyCsv).getBytes("UTF-8"))
    val res = graft.ingest.TickIngest.readZipsWithBadRecords(spark, zip.toString)
    assert(res.ticks.count() === 2L)
    assert(res.badRecordCount === 0L, res.badRecords.collect().mkString("; "))
  }

  test("a non-zip garbage file yields exactly one corrupt-member marker and zero ticks") {
    // the JDK's getNextEntry silently returns null on a never-was-a-zip
    // stream (verified), so without the "PK" signature probe a stray
    // non-archive file vanished with zero rows AND zero accounting
    val dir = Files.createTempDirectory("graft_garbage_zip")
    Files.write(dir.resolve("junk.zip"),
      Array.fill[Byte](4096)(0x5a))
    val res = graft.ingest.TickIngest.readZipsWithBadRecords(
      spark, dir.resolve("junk.zip").toString)
    assert(res.ticks.count() === 0L)
    assert(res.badRecordCount === 1L)
  }

  test("a corrupt member does not swallow a later intact member when the stream recovers") {
    // two STORED (uncompressed) members: the first's payload is intact
    // zip structure but its data is garbage text (parses to bad records,
    // stream stays healthy) — the REAL per-member recovery case, a
    // mid-archive deflate error, is stream-state-dependent across JDKs,
    // so this pins the accounting contract on the recoverable layout:
    // later members MUST survive earlier ones' damage
    val dir = Files.createTempDirectory("graft_two_members")
    val zip = dir.resolve("two.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("a.csv"))
    zos.write("Timestamp,Bid,Ask\nnot,a,tick\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("b.csv"))
    zos.write(tinyCsv.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val res = graft.ingest.TickIngest.readZipsWithBadRecords(spark, zip.toString)
    assert(res.ticks.count() === 2L) // b.csv's clean rows survive a.csv's junk
    assert(res.badRecordCount === 1L) // a.csv's junk row, no phantom markers
  }

  test("missingMonths is UTC-stable under a non-UTC JVM default zone") {
    // pre-fix: the series start month came from toLocalDateTime (JVM
    // default zone) — west-of-UTC JVMs read an early-Feb UTC tick as
    // late January and reported a spurious 2024-01 gap
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Pacific/Honolulu")) // UTC-10
      val dir = Files.createTempDirectory("graft_gap_tz")
      val wh = dir.resolve("warehouse").toString
      def utcTs(s: String): Timestamp =
        Timestamp.from(java.time.Instant.parse(s))
      Seq(("EURUSD", utcTs("2024-02-01T05:00:00Z"), 1.1, 1.2, "202402"))
        .toDF("instrument", "timestamp", "bid", "ask", "yyyymm")
        .write.partitionBy("yyyymm").parquet(s"$wh/raw_spread_ticks")
      val p = new graft.api.Processor(spark, wh)
      val gaps = p.missingMonths("EURUSD")
      assert(!gaps.contains("2024-01"), gaps.take(3).toString)
      assert(gaps.contains("2024-03")) // genuine gaps still reported
    } finally java.util.TimeZone.setDefault(tz)
  }
}
