package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load sentinel's decision logic, replayed against the recorded
  * r12 contamination episode: the official BENCH_r12.json shipped 23%
  * inflated as `contended:false, passes:1` because the only sentinel was a
  * pure-CPU calibration probe (drift 0.100→0.112, under the 25% threshold)
  * while page-cache/disk load slowed scan-bound queries 3–5×. The walls
  * below are copied verbatim from BENCH_r12.json (contaminated driver run)
  * and tools/bench_runs_r12/final_run_2.json (the committed clean median).
  */
class BenchSentinelSpec extends AnyFunSuite {

  // committed clean medians (final_run_2.json) — the reference band
  private val ref = Map(
    "q1_pricing" -> 0.295, "q_ann_ivf" -> 0.601, "q_asof_join" -> 0.327,
    "q_cosine_topk" -> 0.458, "q_coverage" -> 0.223, "q_cursor_page" -> 0.213,
    "q_dedup" -> 0.409, "q_dedup_exact" -> 0.277, "q_dedup_groups" -> 2.732,
    "q_dedup_incremental" -> 5.542, "q_dedup_multisignal" -> 4.88,
    "q_dedup_reconcile" -> 7.092, "q_doc_fingerprint" -> 0.154,
    "q_ewma" -> 0.479, "q_gap_months" -> 0.426, "q_group_topk" -> 0.37,
    "q_join_agg" -> 0.447, "q_lang_id" -> 0.145, "q_minhash_lsh" -> 1.113,
    "q_ngram_jaccard" -> 0.184, "q_ohlc_1m" -> 0.509,
    "q_ohlc_enriched" -> 1.022, "q_ohlc_resample_15m" -> 0.291,
    "q_quality_filter" -> 0.111, "q_seq_pack" -> 0.13, "q_sessionize" -> 0.554,
    "q_simhash" -> 0.102, "q_sql_q3" -> 1.031, "q_text_stats" -> 0.121,
    "q_tfidf" -> 1.834, "q_ticks_range" -> 0.156, "q_token_freq" -> 0.318,
    "q_top_revenue" -> 0.754, "q_triangles" -> 8.615)

  // the contaminated r12 driver pass (queries ∪ slowest of BENCH_r12.json)
  private val dirty = Map(
    "q1_pricing" -> 0.258, "q_ann_ivf" -> 0.535, "q_asof_join" -> 0.221,
    "q_cosine_topk" -> 0.677, "q_coverage" -> 0.282, "q_cursor_page" -> 0.281,
    "q_dedup" -> 0.514, "q_dedup_exact" -> 0.367, "q_dedup_groups" -> 3.707,
    "q_dedup_incremental" -> 7.131, "q_dedup_multisignal" -> 7.487,
    "q_dedup_reconcile" -> 8.141, "q_doc_fingerprint" -> 0.124,
    "q_ewma" -> 0.379, "q_gap_months" -> 0.295, "q_group_topk" -> 0.336,
    "q_join_agg" -> 0.38, "q_lang_id" -> 0.125, "q_minhash_lsh" -> 1.0,
    "q_ngram_jaccard" -> 0.209, "q_ohlc_1m" -> 0.451,
    "q_ohlc_enriched" -> 0.841, "q_ohlc_resample_15m" -> 0.344,
    "q_quality_filter" -> 0.132, "q_seq_pack" -> 0.177, "q_sessionize" -> 0.614,
    "q_simhash" -> 0.094, "q_sql_q3" -> 1.015, "q_text_stats" -> 0.094,
    "q_tfidf" -> 6.133, "q_ticks_range" -> 0.702, "q_token_freq" -> 1.572,
    "q_top_revenue" -> 2.784, "q_triangles" -> 8.232)

  test("the r12 episode trips the band check (the CPU probe alone did not)") {
    // the CPU probe's actual bracket that round: 12% drift — correctly
    // under threshold, because the load was I/O-shaped, not CPU-shaped
    assert(!BenchSentinel.calibDrift(0.100, 0.112))
    // the reference band catches it: shared-total 1.33× (> 1.2), with the
    // four scan-bound victims surfaced by name
    assert(BenchSentinel.sharedTotalRatio(dirty, ref) > 1.3)
    assert(BenchSentinel.bandContended(dirty, ref))
    assert(BenchSentinel.bandExceeders(dirty, ref) ===
      Seq("q_tfidf", "q_ticks_range", "q_token_freq", "q_top_revenue"))
  }

  test("a clean pass against its own committed record does not trip") {
    assert(!BenchSentinel.bandContended(ref, ref))
    assert(BenchSentinel.bandExceeders(ref, ref).isEmpty)
    assert(BenchSentinel.sharedTotalRatio(ref, ref) === 1.0)
  }

  test("calibDrift: relative threshold with an absolute floor") {
    assert(BenchSentinel.calibDrift(0.10, 0.13))   // 30% and 30 ms
    assert(!BenchSentinel.calibDrift(0.10, 0.112)) // 12%
    // 40% relative but 4 ms absolute — scheduler noise on a tiny probe
    assert(!BenchSentinel.calibDrift(0.010, 0.014))
    // drift direction is symmetric (load can land on either bracket end)
    assert(BenchSentinel.calibDrift(0.30, 0.20))
    assert(!BenchSentinel.calibDrift(0.0, 0.0)) // degenerate, no divide
  }

  test("bandExceeders: floor excludes noise-dominated walls, new queries ignored") {
    val r = Map("tiny" -> 0.05, "mid" -> 0.5, "big" -> 5.0)
    // tiny at 10× its 50 ms wall is still ignored (ref below the 0.1s floor)
    assert(BenchSentinel.bandExceeders(
      Map("tiny" -> 0.5, "mid" -> 0.6, "big" -> 5.5), r).isEmpty)
    assert(BenchSentinel.bandExceeders(
      Map("mid" -> 1.1, "big" -> 11.0, "brand_new" -> 99.0), r) ===
      Seq("big", "mid"))
  }

  test("significantBandExceeders: a sub-noise-floor blip never disqualifies alone (the q_bitwise episode)") {
    // the r16 episode, replayed: q_bitwise 0.113 s committed → 0.28 s in
    // an otherwise-clean 122.7 s run — 2.48× but only 167 ms of excess.
    // It stays in the diagnostic band yet must NOT disqualify the run.
    val r = Map("q_bitwise" -> 0.113, "q_triangles" -> 7.506, "big" -> 5.0)
    val t = Map("q_bitwise" -> 0.28, "q_triangles" -> 7.4, "big" -> 5.1)
    assert(BenchSentinel.bandExceeders(t, r) === Seq("q_bitwise"))
    assert(BenchSentinel.significantBandExceeders(t, r).isEmpty)
    // the r15 q_triangles overwrite-class excess (7.5 → 15.4 s) IS
    // significant — seconds of excess, not a scheduler blip
    val t2 = t.updated("q_triangles", 15.391)
    assert(BenchSentinel.significantBandExceeders(t2, r) === Seq("q_triangles"))
    // boundary: factor cleared but excess exactly at the floor → not
    // significant; just past it → significant
    val r3 = Map("q" -> 0.4)
    assert(BenchSentinel.significantBandExceeders(Map("q" -> 0.9), r3).isEmpty)
    assert(BenchSentinel.significantBandExceeders(Map("q" -> 0.91), r3) === Seq("q"))
  }

  test("bandContended: ≥5 individual exceeders trip even when totals hide them") {
    // 5 small queries at 2.5× inside a big stable suite: total ratio stays
    // under 1.2 but the per-query count trips
    val r = (1 to 5).map(i => s"small_$i" -> 0.2).toMap + ("huge" -> 50.0)
    val t = (1 to 5).map(i => s"small_$i" -> 0.5).toMap + ("huge" -> 50.0)
    assert(BenchSentinel.sharedTotalRatio(t, r, minShared = 2) < 1.2)
    assert(BenchSentinel.bandContended(t, r))
    // 4 exceeders and a quiet total: not contended
    val t4 = t.updated("small_5", 0.2)
    assert(!BenchSentinel.bandContended(t4, r))
  }

  test("excess-sum trip: seconds-deep band excess is contended below the count trip (the r16 run, replayed)") {
    // the official r16 run: THREE band_sig queries totalling +9.4 s of
    // excess (q_linear_probe alone +6.8 s) — under the ≥5 count trip and
    // under the 1.2 total ratio (138.75/129.71 suite), yet seconds-deep.
    // Reference = the committed r16 clean run (archived, in-repo); the
    // run = that reference with the three flagged walls replayed verbatim
    // (q_linear_probe 9.295 from BENCH_r16.json's own `slowest`;
    // q_dedup_keep_best 3.16 / q_histogram 0.84 per the run's band_sig
    // record quoted in VERDICT.md — the full per-query map of that run
    // was a transient bench_run.json, not a committed artifact).
    val refR16 = BenchSentinel.parseQueryTimes(scala.util.Using.resource(
      scala.io.Source.fromFile(
        "tools/bench_runs_r16/final172_w2/clean_run_1.json"))(_.mkString))
    assert(refR16.size >= 170, "fixture file must parse")
    val run = refR16 ++ Map(
      "q_linear_probe" -> 9.295,
      "q_dedup_keep_best" -> 3.16,
      "q_histogram" -> 0.84)
    val sig = BenchSentinel.significantBandExceeders(run, refR16)
    assert(sig.toSet === Set("q_linear_probe", "q_dedup_keep_best", "q_histogram"))
    assert(sig.size < 5, "below the count trip by construction")
    assert(BenchSentinel.sharedTotalRatio(run, refR16) <= 1.2,
      "below the total-ratio trip by construction")
    assert(BenchSentinel.excessSumSec(run, refR16) > 5.0)
    assert(BenchSentinel.bandContended(run, refR16),
      "the r16 run must now verdict contended")

    // synthetic boundaries: one +6 s exceeder trips alone; the same shape
    // at +4.5 s total stays quiet (the trip is depth, not existence)
    val base = (1 to 30).map(i => s"q_$i" -> 1.0).toMap
    assert(BenchSentinel.bandContended(base + ("slow" -> 9.0), base + ("slow" -> 3.0)))
    assert(!BenchSentinel.bandContended(base + ("slow" -> 7.5), base + ("slow" -> 3.0)))
  }

  test("sharedTotalRatio needs enough overlap to mean anything") {
    val r = Map("a" -> 1.0, "b" -> 1.0)
    // only 2 shared queries: ratio pinned to 1.0 (insufficient evidence)
    assert(BenchSentinel.sharedTotalRatio(Map("a" -> 9.0, "b" -> 9.0), r) === 1.0)
    // an empty reference (first round at this SF) never trips anything
    assert(!BenchSentinel.bandContended(dirty, Map.empty))
  }

  test("reference-record guard: filtered/subset/foreign-SF/contended runs never replace") {
    val committed = Some(
      """{"metric":"total","value":119.650,"unit":"sec","queries":{"q1":1.0,"q2":2.0,"q3":3.0},"nq":3,"contended":false,"sf":"/root/testdata/sf0.1"}""")
    val sf = "/root/testdata/sf0.1"
    val full = Set("q1", "q2", "q3")
    // the r13 clobber, replayed: a 2-query filtered timing run
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = true, runContended = false,
      runQueries = Set("q1", "q2"), runSf = sf, committed = committed))
    // even an unfiltered run that lost a query (it errored out) is a subset
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = Set("q1", "q2"), runSf = sf, committed = committed))
    // a full clean run at a DIFFERENT SF would blind the band check too
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = "/root/testdata/sf0.01", committed = committed))
    // a contended run's inflated walls must not become the clean reference
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = true,
      runQueries = full, runSf = sf, committed = committed))
    // the happy path: clean, unfiltered, same SF, covering query set
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full + "q_new_this_round", runSf = sf, committed = committed))
    // first record ever at this checkout: nothing to protect
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = Set("q1"), runSf = sf, committed = None))
    // force re-baselines across SF/coverage but never launders a filtered
    // or contended run
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = Set("q1"), runSf = "/elsewhere", committed = committed,
      force = true))
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = true, runContended = false,
      runQueries = full, runSf = sf, committed = committed, force = true))
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = true,
      runQueries = full, runSf = sf, committed = committed, force = true))
    // SPARK_GRAFT_ITERS>1 keeps min-of-N walls — the other profiling knob;
    // a clean UNFILTERED iters run must still never install its
    // artificially fast walls as the band/level reference (force included)
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = committed,
      itersActive = true))
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = committed, force = true,
      itersActive = true))
  }

  test("reference-record guard refuses band-flagged and lower-backed candidates (the r15 overwrite, replayed)") {
    // The r15 end-of-round episode: the committed reference was the
    // median of 4 archived clean runs (126.98 s, backing_runs:4, band
    // empty); the driver's single-pass 139.31 s run — itself band-flagging
    // q_triangles at 2x — was clean by the contended trip (needs >=5
    // exceeders) and legally overwrote it, downgrading backing 4 -> 1.
    val median4 = Some(
      """{"metric":"total","value":126.983,"unit":"sec","queries":{"q1":1.0,"q_triangles":7.506},"nq":171,"band":[],"contended":false,"backing_runs":4,"sf":"/root/testdata/sf0.1"}""")
    val sf = "/root/testdata/sf0.1"
    val full = Set("q1", "q_triangles")
    // band-flagged candidate: refused even though not contended
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = median4,
      runBand = Seq("q_triangles"), candidateBacking = 1))
    // band-clean but lower-backed: a single pass must not downgrade a
    // median-of-4 record
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = median4,
      runBand = Nil, candidateBacking = 1))
    // equal-or-better backing with a clean band may replace
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = median4,
      runBand = Nil, candidateBacking = 4))
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = median4,
      runBand = Nil, candidateBacking = 5))
    // a pre-r15 reference without the stamp is treated as backing 1
    val unstamped = Some(
      """{"metric":"total","value":126.983,"queries":{"q1":1.0},"contended":false,"sf":"/root/testdata/sf0.1"}""")
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = unstamped,
      runBand = Nil, candidateBacking = 1))
    // force re-baselines across band/backing (accepted regression path)...
    assert(BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = false,
      runQueries = full, runSf = sf, committed = median4, force = true,
      runBand = Seq("q_triangles"), candidateBacking = 1))
    // ...but still never launders a contended or min-of-N run
    assert(!BenchSentinel.mayReplaceReference(
      filterActive = false, runContended = true,
      runQueries = full, runSf = sf, committed = median4, force = true,
      runBand = Nil, candidateBacking = 4))
  }

  test("backing_runs lineage stamp round-trips; absent on pre-r15 records") {
    val stamped = """{"metric":"total","value":129.477,"unit":"sec","queries":{"q1":0.3},"nq":167,"contended":false,"passes":1,"backing_runs":3,"sf":"/root/testdata/sf0.1"}"""
    assert(BenchSentinel.parseBackingRuns(stamped) === Some(3))
    val preR15 = """{"metric":"total","value":129.477,"queries":{"q1":0.3},"sf":"/root/testdata/sf0.1"}"""
    assert(BenchSentinel.parseBackingRuns(preR15) === None)
    assert(BenchSentinel.parseBackingRuns("not json") === None)
  }

  test("level shift: steady load invisible to drift/band checks trips the level check") {
    // The recorded r14 episode: committed clean record 131.52 s with probe
    // levels calib 0.105/0.110, io 0.291/0.290. A run under sustained
    // evening load recorded 157.40 s (ratio 1.197 — one part in three
    // hundred UNDER the 1.2 band-total trip line) with a TIGHT CPU bracket
    // (0.109→0.103, drift silent) — but its io_first sat at 0.343 = 1.18×
    // the committed level. Steady load inflates both bracket ends equally,
    // so only a cross-record level comparison can see it.
    assert(!BenchSentinel.calibDrift(0.109, 0.103))         // drift silent
    assert(!BenchSentinel.levelShift(0.109, 0.103, 0.105, 0.110)) // CPU level fine
    assert(BenchSentinel.levelShift(0.343, 0.279, 0.291, 0.290))  // io_first 1.18×
    // the sibling run: pressure arrived in the SECOND half (io_last 0.339)
    assert(BenchSentinel.levelShift(0.323, 0.339, 0.291, 0.290))
    // a genuinely idle run against the same record trips nothing
    assert(!BenchSentinel.levelShift(0.295, 0.301, 0.291, 0.290))
    // absolute floor: 30 % on a 10 ms probe is scheduler noise
    assert(!BenchSentinel.levelShift(0.013, 0.013, 0.010, 0.010))
    // degenerate committed levels never trip (first record at a checkout)
    assert(!BenchSentinel.levelShift(0.343, 0.339, 0.0, 0.0))
  }

  test("parseCalibLevels round-trips a committed record's probe levels") {
    val line = """{"metric":"total","value":131.523,"unit":"sec","queries":{"q1":0.3},"nq":166,"errors":[],"flaky":[],"calib_first":0.105,"calib_last":0.110,"io_first":0.291,"io_last":0.290,"band":[],"ref_queries":165,"contended":false,"passes":1,"sf":"/root/testdata/sf0.1"}"""
    assert(BenchSentinel.parseCalibLevels(line) ===
      Some((0.105, 0.110, 0.291, 0.290)))
    // a record missing any level (pre-r13 format) yields None — the level
    // check simply stays unarmed rather than tripping on garbage
    assert(BenchSentinel.parseCalibLevels("""{"calib_first":0.1}""") === None)
    assert(BenchSentinel.parseCalibLevels("not json") === None)
  }

  test("parseQueryTimes/recordSf round-trip a bench_full.json line") {
    val line = """{"metric":"total","value":119.650,"unit":"sec","queries":{"q1_pricing":0.295,"q_tfidf":1.834,"q_neg":-0.0},"slowest":{"q_tfidf":1.834},"nq":164,"errors":[],"flaky":[],"calib_first":0.100,"calib_last":0.102,"contended":false,"passes":1,"sf":"/root/testdata/sf0.1"}"""
    val times = BenchSentinel.parseQueryTimes(line)
    assert(times === Map("q1_pricing" -> 0.295, "q_tfidf" -> 1.834, "q_neg" -> 0.0))
    assert(BenchSentinel.recordSf(line) === Some("/root/testdata/sf0.1"))
    assert(BenchSentinel.parseQueryTimes("not json") === Map.empty)
    assert(BenchSentinel.recordSf("{}") === None)
  }
}
