package graft

/** Pure decision logic for [[Bench]]'s load sentinel — factored out of the
  * bench main so every trip-wire is unit-testable against recorded
  * episodes (BenchSentinelSpec replays the r12 contamination byte-for-byte).
  *
  * Three independent signals, any of which marks a pass contended:
  *
  *  1. CPU calibration drift — a fixed no-I/O workload timed before and
  *     after the suite (catches CPU contention: another build stealing
  *     cores mid-suite).
  *  2. I/O calibration drift — a fixed parquet scan+decode timed the same
  *     way (catches what 1 cannot: page-cache eviction / disk contention
  *     slows the scan-heavy suite while the pure-CPU probe drifts <25%.
  *     The r12 official record passed exactly that way: calib 0.100→0.112
  *     while scan-bound queries ran 3–5× their idle walls).
  *  3. Reference band check — per-query walls compared against the last
  *     committed clean record (bench_full.json at invocation time). Load
  *     only ever inflates walls, so ≥5 queries at ≥2× their committed
  *     wall, or the shared-query total at ≥1.2×, is contention (or a real
  *     regression — either way the record must not ship as a clean
  *     one-shot; the re-pass keeps per-query minima, so a genuine
  *     regression survives unchanged and a dirty window is re-measured).
  *
  * Both drift checks carry an ABSOLUTE floor as well as the relative
  * threshold: a 25% swing on a 10 ms probe is scheduler noise, not load.
  */
object BenchSentinel {

  /** Relative disagreement between the pre- and post-suite calibration
    * walls, guarded by an absolute floor (both thresholds must be crossed).
    */
  def calibDrift(
      first: Double,
      last: Double,
      relThreshold: Double = 0.25,
      absFloorSec: Double = 0.02): Boolean = {
    val lo = math.min(first, last)
    val delta = math.abs(last - first)
    lo > 0 && delta > absFloorSec && delta / lo > relThreshold
  }

  /** Names of queries whose wall exceeds `factor`× their committed
    * reference wall. Queries absent from the reference (new this round) or
    * whose reference wall is below `floorSec` (sub-scheduling-floor walls
    * are noise-dominated) never count.
    */
  def bandExceeders(
      times: Map[String, Double],
      ref: Map[String, Double],
      factor: Double = 2.0,
      floorSec: Double = 0.1): Seq[String] =
    times.toSeq.collect {
      case (name, t) if ref.get(name).exists(r => r >= floorSec && t > factor * r) =>
        name
    }.sorted

  /** Ratio of this pass's total wall to the committed total, over the
    * queries BOTH records carry (so new/removed queries can't skew it).
    * NaN-free: returns 1.0 when fewer than `minShared` queries overlap.
    */
  def sharedTotalRatio(
      times: Map[String, Double],
      ref: Map[String, Double],
      minShared: Int = 20): Double = {
    val shared = times.keySet intersect ref.keySet
    if (shared.size < minShared) 1.0
    else shared.toSeq.map(times).sum / shared.toSeq.map(ref).sum
  }

  /** [[bandExceeders]] restricted to entries whose ABSOLUTE excess over
    * the committed wall clears `absExcessSec` — the significance test for
    * decisions that act on a SINGLE exceeder (reference replacement,
    * median-protocol run disqualification). A 2.5× blip on a 110 ms query
    * is scheduler/GC noise (the r16 episode: q_bitwise 0.113 → 0.28 s
    * band-flagged an otherwise-clean 122.7 s run and would have
    * disqualified it from the median protocol), while real contention or
    * a real regression moves seconds. The COLLECTIVE contended verdict
    * ([[bandContended]]) deliberately keeps the unfiltered list: five
    * small queries inflating together is a load signal even when each
    * excess is modest.
    */
  def significantBandExceeders(
      times: Map[String, Double],
      ref: Map[String, Double],
      factor: Double = 2.0,
      floorSec: Double = 0.1,
      absExcessSec: Double = 0.5): Seq[String] =
    bandExceeders(times, ref, factor, floorSec).filter { n =>
      (for (t <- times.get(n); r <- ref.get(n)) yield t - r > absExcessSec)
        .getOrElse(false)
    }

  /** Total seconds of significant band excess: the sum of (wall − ref)
    * over [[significantBandExceeders]]. The depth axis the count trip
    * misses — three queries collectively seconds over their walls is as
    * much a load signal as five queries marginally over.
    */
  def excessSumSec(
      times: Map[String, Double],
      ref: Map[String, Double],
      factor: Double = 2.0,
      floorSec: Double = 0.1,
      absExcessSec: Double = 0.5): Double =
    significantBandExceeders(times, ref, factor, floorSec, absExcessSec)
      .flatMap(n => for (t <- times.get(n); r <- ref.get(n)) yield t - r)
      .sum

  /** The band verdict: ≥ `minCount` individual exceeders, the shared
    * total inflated past `totalFactor`, or (r17, r16 verdict item 6) the
    * SUM of significant excesses past `excessTripSec`. The official r16
    * run carried three band_sig flags totalling +9.4 s of excess
    * (q_linear_probe alone +6.8 s) yet verdicted contended:false because
    * the count trip needs ≥5 — the hardened guard refused to install it,
    * but it still became the round's official snapshot; a run
    * seconds-deep in excess must carry the contended mark itself.
    */
  def bandContended(
      times: Map[String, Double],
      ref: Map[String, Double],
      factor: Double = 2.0,
      floorSec: Double = 0.1,
      minCount: Int = 5,
      totalFactor: Double = 1.2,
      excessTripSec: Double = 5.0): Boolean =
    bandExceeders(times, ref, factor, floorSec).size >= minCount ||
      sharedTotalRatio(times, ref) > totalFactor ||
      excessSumSec(times, ref, factor, floorSec) > excessTripSec

  /** Extract the per-query seconds from a bench_full.json line (the
    * `"queries":{...}` object). Regex-based on purpose: the record is
    * machine-written with a fixed shape, and the bench main must not grow
    * a JSON-library dependency.
    */
  def parseQueryTimes(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) Map.empty
    else {
      val body = json.substring(start + "\"queries\":{".length,
        json.indexOf('}', start))
      val pair = """"([A-Za-z0-9_]+)":(-?[0-9.eE+-]+)""".r
      pair.findAllMatchIn(body).flatMap { m =>
        m.group(2).toDoubleOption.map(m.group(1) -> _)
      }.toMap
    }
  }

  /** The `"sf":"..."` field of a bench_full.json line — band checks only
    * apply when the committed record measured the SAME scale factor.
    */
  def recordSf(json: String): Option[String] =
    """"sf":"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))

  /** The `"backing_runs":N` field of a committed record: how many archived
    * clean full-suite runs the record is the median of. Bench stamps 1 when
    * it self-installs a single clean run; the tools/bench3.sh median
    * installer stamps the count of clean runs in its protocol window. The
    * bench output line echoes it as `ref_backing`, so "median of N" claims
    * about the committed reference are machine-checkable rather than
    * prose (the r14 record claimed a 3-run median while being byte-identical
    * to one of two archived runs). Absent field (pre-r15 record) → None.
    */
  def parseBackingRuns(json: String): Option[Int] =
    """"backing_runs":(\d+)""".r.findFirstMatchIn(json)
      .flatMap(_.group(1).toIntOption)

  /** The committed record's calibration LEVELS:
    * (calib_first, calib_last, io_first, io_last). Feeds [[levelShift]].
    */
  def parseCalibLevels(json: String): Option[(Double, Double, Double, Double)] = {
    def f(k: String): Option[Double] =
      (""""""" + k + """":(-?[0-9.eE+-]+)""").r
        .findFirstMatchIn(json).flatMap(_.group(1).toDoubleOption)
    for (cf <- f("calib_first"); cl <- f("calib_last");
         iof <- f("io_first"); iol <- f("io_last")) yield (cf, cl, iof, iol)
  }

  /** Fourth signal (r14): STEADY-load level check. The drift checks
    * compare a probe against ITSELF across the suite, so load that is
    * constant for the whole run inflates both bracket ends equally and
    * stays invisible; and a uniform ~15–20 % suite inflation slips under
    * the 2×-per-query and 1.2×-total band thresholds. The r14 episode
    * that motivated this: a run whose CPU calib bracket was tight
    * (0.109→0.103) and whose band ratio was 1.197 — one part in three
    * hundred under the trip line — recorded a 157.4 s total against a
    * 131.5 s committed clean record, because sustained page-cache
    * pressure held the I/O probe at 0.343 s vs the committed run's 0.290
    * (1.18×) for the first half of the suite.
    *
    * The committed record carries its own probe levels, measured by the
    * same min-of-5 pre-warmed discipline on the machine the walls are
    * claimed against — so a run whose probe level sits `factor`× above
    * the committed level (EITHER bracket end: load present during either
    * half taints the minima kept from that window) is running on a
    * loaded machine however tight its own bracket. Absolute floor as in
    * [[calibDrift]]: a 30 % swing on a 10 ms probe is scheduler noise.
    */
  def levelShift(
      runFirst: Double,
      runLast: Double,
      refFirst: Double,
      refLast: Double,
      factor: Double = 1.15,
      absFloorSec: Double = 0.02): Boolean = {
    val ref = math.min(refFirst, refLast)
    ref > 0 && Seq(runFirst, runLast).exists(v =>
      v - ref > absFloorSec && v / ref > factor)
  }

  /** May THIS run's record replace the committed reference
    * (bench_full.json)? The reference is the band check's only memory, so
    * replacing it with a narrower or differently-scoped run silently
    * disables the sentinel for every later run — exactly what happened in
    * r13, when a 2-query `--only`-style timing run overwrote the 164-query
    * clean median and the brand-new band check ran its own official bench
    * with `ref_queries:2`.
    *
    * Replacement is allowed only when ALL hold:
    *   - no query filter was active (a filtered run is a profiling aid,
    *     never a reference — even if it happens to select every query);
    *   - no repeat-iterations knob was active (SPARK_GRAFT_ITERS>1 keeps
    *     the MIN-of-N wall per query — the other documented profiling aid;
    *     installing min-of-N walls as the reference would bias the band
    *     and level sentinels into false contended verdicts on every later
    *     honest 1-shot run — the same clobber class as a filtered run);
    *   - the run measured the same SF as the committed record (a full run
    *     at a smaller SF would blind the sentinel just as thoroughly);
    *   - the run's successful query set COVERS the committed record's
    *     (names may be added, never silently dropped — a query that
    *     errored out of this run must not vanish from the reference).
    *
    *   - the run itself came back CLEAN (a contended run's walls are
    *     inflated; installing them as the band reference would make every
    *     later equally-contended run look clean);
    *
    *   - (r16) the run's own BAND verdict is empty. A run with 1-4 band
    *     exceeders escapes the contended trip (that needs >=5) yet carries
    *     walls the sitting reference itself calls suspect; installing it
    *     resets the band memory to the inflated walls. The r15 end-of-round
    *     episode was exactly this: a single-pass 139.31 s run, itself
    *     flagging q_triangles at 2x, legally overwrote the 126.98 s
    *     median-of-4;
    *
    *   - (r16) the run's backing does not DOWNGRADE the sitting
    *     reference's. A single clean pass (backing 1) must not replace a
    *     median-of-N record (backing N>1): the median is strictly better
    *     evidence of the true walls, and the downgrade silently widens the
    *     band sentinel's tolerance to one run's noise.
    *
    * `force` (env SPARK_GRAFT_RECORD=replace) overrides the SF, coverage,
    * band, and backing checks for deliberate re-baselining (suite renamed,
    * SF changed, accepted perf regression); it does NOT override the
    * filter, iters, or contended checks — there is no legitimate reason
    * for a filtered, min-of-N, or dirty run to become the reference.
    */
  def mayReplaceReference(
      filterActive: Boolean,
      runContended: Boolean,
      runQueries: Set[String],
      runSf: String,
      committed: Option[String],
      force: Boolean = false,
      itersActive: Boolean = false,
      runBand: Seq[String] = Nil,
      candidateBacking: Int = 1): Boolean = {
    if (filterActive || itersActive || runContended) return false
    if (force) return true
    if (runBand.nonEmpty) return false
    committed match {
      case None => true
      case Some(rec) =>
        parseBackingRuns(rec).getOrElse(1) <= candidateBacking && {
          val refNames = parseQueryTimes(rec).keySet
          recordSf(rec).forall(_ == runSf) && refNames.subsetOf(runQueries)
        }
    }
  }
}
