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
}
