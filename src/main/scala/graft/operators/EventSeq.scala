package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, ts, event) log: funnel depth,
  * cohort retention, and ordered-pattern matching — the ClickHouse
  * `windowFunnel`/`retention`/`sequenceMatch` family re-expressed as
  * plain Spark aggregations (the reference's engine ships these as
  * specialized aggregate functions; here each is a short declarative
  * dataflow Catalyst optimizes like any other query).
  *
  * All three are LINEAR: no self-join over the event log, no window sort
  * except where an explicit per-user ordering is the semantics. Funnel =
  * k chained (filter → per-user min) aggregations, each over a
  * step-filtered slice, joined on user (the per-user frames are tiny
  * relative to the log and co-partition on the user key). Retention =
  * one groupBy(user) + one groupBy(cohort). Pattern match = one
  * per-user sorted-array aggregation + a regex.
  */
object EventSeq {

  /** Funnel depth anchored at each user's EARLIEST step-1 event: level j
    * is reached if steps 2..j occur in order after it, all within
    * `windowSec` of the anchor (greedy-earliest chain: each step takes
    * its minimum qualifying timestamp). This "time-to-convert from first
    * exposure" semantic is deliberately simpler than sliding-window
    * funnels (which track a chain per step-1 occurrence); it is exactly
    * reproducible in portable SQL, which sliding variants are not
    * without the same specialized aggregate.
    *
    * @param steps ordered step predicates over the event row
    * @return (user, level, t_1..t_k) — level ∈ [0, k], t_j the step-j
    *         chain timestamp (NULL beyond the reached level); users with
    *         no step-1 event are absent
    */
  def anchoredFunnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      steps: Seq[Column],
      windowSec: Long
  ): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val u = col(userCol)
    var acc = events.filter(steps.head)
      .groupBy(u.as("uid")).agg(min(col(tsCol)).as("t_1"))
    for (j <- 2 to steps.size) {
      val prev = s"t_${j - 1}"
      val stepMin = events.filter(steps(j - 1))
        .select(u.as("uid"), col(tsCol).as("__ts"))
        .join(acc.select(col("uid"), col(prev), col("t_1").as("__a")), "uid")
        .filter(col("__ts") > col(prev) &&
          col("__ts") <= col("__a") + expr(s"INTERVAL $windowSec SECOND"))
        .groupBy("uid").agg(min(col("__ts")).as(s"t_$j"))
      acc = acc.join(stepMin, Seq("uid"), "left")
    }
    // ascending fold so the DEEPEST level is the outermost when-branch
    // (each wrap shadows the previous): level = first non-null t_j from k down
    val level = (1 to steps.size).foldLeft(lit(0)) { (e, j) =>
      when(col(s"t_$j").isNotNull, lit(j)).otherwise(e)
    }
    acc.select(col("uid") +: level.as("level") +:
      (1 to steps.size).map(j => col(s"t_$j")): _*)
  }

  /** Cohort retention matrix: users grouped by the period of their FIRST
    * event; each later activity period counts the cohort's distinct
    * active users. `periodExpr` maps a timestamp column to its period
    * index (e.g. epoch-week) — any integer bucketing works as long as it
    * is portable SQL.
    *
    * @return (cohort, period_offset, n_active) — offset 0 is the cohort
    *         period itself (n_active = cohort size)
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodExpr: Column => Column
  ): DataFrame = {
    val first = events.groupBy(col(userCol).as("uid"))
      .agg(min(periodExpr(col(tsCol))).as("cohort"))
    events.select(col(userCol).as("uid"), periodExpr(col(tsCol)).as("p"))
      .distinct()
      .join(first, "uid")
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("period_offset"))
      .agg(countDistinct(col("uid")).as("n_active"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * one lag window per user (the ordering IS the semantics) + one
    * pairwise count aggregation; probabilities are exact integers
    * (`n·1e6 div row_total`) so the matrix is oracle-checkable.
    *
    * @return (from_state, to_state, n, p_e6) — p_e6 sums to ≤ 1e6 per
    *         from_state (floor division)
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tiebreak: String,
      stateCol: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreak))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tiebreak),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_state").agg(sum(col("n")).as("__t"))
    pairs.join(broadcast(totals), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000L div __t").as("p_e6"))
  }

  /** Ordered-pattern match over each user's event-symbol sequence: events
    * map to single-character symbols via `symExpr`, the per-user string
    * is built in (ts, tiebreak) order (sort_array over collected structs —
    * deterministic, unlike a bare collect_list), and `pattern` is a
    * regular expression over that string. Keep symbols and pattern in the
    * RE2-compatible subset so any engine's regex agrees.
    *
    * @return (user, seq, matched)
    */
  def sequenceMatch(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tiebreak: String,
      symExpr: Column,
      pattern: String
  ): DataFrame =
    events
      .select(col(userCol).as("uid"),
        struct(col(tsCol), col(tiebreak), symExpr.as("sym")).as("__e"))
      .groupBy("uid")
      .agg(concat_ws("",
        expr("transform(sort_array(collect_list(__e)), e -> e.sym)"))
        .as("seq"))
      .withColumn("matched", col("seq").rlike(pattern))
}
