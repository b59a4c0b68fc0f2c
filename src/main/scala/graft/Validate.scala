package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing store validation (≙ `scripts/validate_migration_data.py:
  * 330-473` in the reference): full-outer-join two tick/OHLC stores on
  * their timestamp key and report, with the reference's tolerances —
  * per-price absolute tolerance 1e-10, row-count tolerance 0.1%, exact
  * min/max timestamp equality.
  *
  * Spark-first shape: ONE full-outer join on the key and ONE aggregation
  * over it produce every verdict input (row counts per side, matched /
  * left-only / right-only counts, per-column mismatch counts, per-side
  * min/max key) — no collect of either store, no per-column pass. The
  * join shuffles both sides once on the key; at 100 TB both stores are
  * date-partitioned so a date-scoped validation prunes to the partition
  * before the shuffle. Sample mismatches (first 5 by key, the reference's
  * report shape) are a bounded top-k per column.
  */
object Validate {

  /** Per-column mismatch detail: count + up to 5 earliest samples. Sides
    * are Options because a NULL-vs-value disagreement IS a mismatch and
    * must be reportable, not a crash.
    */
  final case class ColumnReport(
      column: String,
      mismatches: Long,
      samples: Seq[(String, Option[Double], Option[Double])]) // (key, left, right)

  final case class ValidationResult(
      leftRows: Long,
      rightRows: Long,
      matchingRows: Long,
      onlyLeft: Long,
      onlyRight: Long,
      leftMinKey: Option[String],
      leftMaxKey: Option[String],
      rightMinKey: Option[String],
      rightMaxKey: Option[String],
      columns: Seq[ColumnReport],
      errors: Seq[String]) {
    def passed: Boolean = errors.isEmpty
    def report: String = {
      val b = new StringBuilder
      b ++= s"rows: left=$leftRows right=$rightRows " +
        s"(matched=$matchingRows onlyLeft=$onlyLeft onlyRight=$onlyRight)\n"
      b ++= s"key range: left=[${leftMinKey.getOrElse("-")}, " +
        s"${leftMaxKey.getOrElse("-")}] right=[${rightMinKey.getOrElse("-")}, " +
        s"${rightMaxKey.getOrElse("-")}]\n"
      columns.foreach { c =>
        b ++= s"column ${c.column}: ${c.mismatches} mismatches beyond tolerance\n"
        c.samples.foreach { case (k, l, r) =>
          def fmt(v: Option[Double]) = v.map(d => f"$d%.12g").getOrElse("NULL")
          val diff = for (lv <- l; rv <- r) yield f"${lv - rv}%.3g"
          b ++= s"  $k: left=${fmt(l)} right=${fmt(r)} diff=${diff.getOrElse("-")}\n"
        }
      }
      if (passed) b ++= "PASSED\n"
      else b ++= s"FAILED: ${errors.mkString("; ")}\n"
      b.result()
    }
  }

  /** Compare two stores on `keyCol`; `valueCols` default to every numeric
    * column the two schemas share (minus the key).
    */
  def compareStores(
      left: DataFrame,
      right: DataFrame,
      keyCol: String = "ts",
      valueCols: Seq[String] = Nil,
      priceTolerance: Double = 1e-10,
      rowTolerancePct: Double = 0.1
  ): ValidationResult = {
    import org.apache.spark.sql.types.NumericType
    val vals =
      if (valueCols.nonEmpty) valueCols
      else {
        val rightCols = right.schema.map(f => f.name).toSet
        left.schema.collect {
          case f if f.name != keyCol && rightCols.contains(f.name) &&
            f.dataType.isInstanceOf[NumericType] => f.name
        }
      }
    val l = left.select(col(keyCol).as("__k"),
      struct(vals.map(c => col(c).cast("double").as(c)): _*).as("__l"))
    val r = right.select(col(keyCol).as("__k"),
      struct(vals.map(c => col(c).cast("double").as(c)): _*).as("__r"))
    // persist the narrow projections: the pre-join counts and the join
    // both consume them, so each store is scanned ONCE from source (the
    // unpersisted form scanned both stores twice — four full input scans
    // on what the scaladoc pitches at 100 TB)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val lp = l.persist(lvl)
    val rp = r.persist(lvl)
    // true per-side row counts BEFORE the join: duplicate join keys fan the
    // full-outer join out (every joined count becomes pair-based and two
    // identical stores could read as mismatched), so validation requires
    // unique keys — detected below by comparing these against the joined
    // frame's distinct key counts, and reported as an explicit error.
    val trueL = lp.count()
    val trueR = rp.count()
    val joined = lp.join(rp, Seq("__k"), "full_outer")
      .persist(lvl)
    try {
      val inL = col("__l").isNotNull
      val inR = col("__r").isNotNull
      def mismatch(c: String) = {
        val lc = col(s"__l.$c")
        val rc = col(s"__r.$c")
        // equality goes through <=> first: both-null, both-NaN (Spark
        // treats NaN = NaN as true), and exactly-equal pairs never
        // mismatch. Without it, abs(NaN - NaN) > tol reads TRUE under
        // Spark's NaN-is-largest ordering, so identical stores carrying
        // the same NaN rows FAILED validation (numpy's abs(nan-nan) > tol
        // is False — the reference validator passes those).
        // INTENTIONAL DIVERGENCE for MIXED pairs (NaN vs a number, or NULL
        // vs a number): the reference's numpy comparison would silently
        // PASS them too (abs(nan - x) > tol is False for any x); here they
        // COUNT as mismatches. One side losing a value while the other
        // holds a number is exactly the disagreement a cross-store
        // validator exists to surface — matching the reference byte-for-
        // byte would hide it. Only the both-NaN case restores parity.
        inL && inR && !(lc <=> rc) &&
          (lc.isNull || rc.isNull || isnan(lc) || isnan(rc) ||
            abs(lc - rc) > priceTolerance)
      }
      // coalesce: sum over an empty join (both stores empty) is NULL, and
      // the verdict must read 0 rows, not NPE
      def cnt(cond: org.apache.spark.sql.Column) =
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
      val aggCols = Seq(
        cnt(inL && inR).as("matched"),
        cnt(inL && !inR).as("only_l"),
        cnt(!inL && inR).as("only_r"),
        coalesce(countDistinct(when(inL, col("__k"))), lit(0L)).as("l_keys"),
        coalesce(countDistinct(when(inR, col("__k"))), lit(0L)).as("r_keys"),
        // countDistinct ignores NULL, so null-keyed rows must be counted
        // separately: without this, N null-keyed rows read as "N duplicate
        // keys" (l_keys < trueL) — a misdiagnosis. Null keys also never
        // equi-join, so they are reported as their own error below.
        cnt(inL && col("__k").isNull).as("l_nulls"),
        cnt(inR && col("__k").isNull).as("r_nulls"),
        min(when(inL, col("__k"))).cast("string").as("l_min"),
        max(when(inL, col("__k"))).cast("string").as("l_max"),
        min(when(inR, col("__k"))).cast("string").as("r_min"),
        max(when(inR, col("__k"))).cast("string").as("r_max")) ++
        vals.map(c => cnt(mismatch(c)).as(s"mm_$c"))
      val row = joined.agg(aggCols.head, aggCols.tail: _*).head()
      def lng(n: String) = row.getLong(row.fieldIndex(n))
      def str(n: String) =
        Option(row.get(row.fieldIndex(n))).map(_.toString)
      val colReports = vals.map { c =>
        val mm = lng(s"mm_$c")
        val samples =
          if (mm == 0) Nil
          else joined.filter(mismatch(c))
            // order by the ORIGINAL key (string-cast ordering would sort
            // numeric/timestamp keys lexicographically — '10' < '2'), cast
            // for display only at collect time
            .select(col("__k"), col(s"__l.$c"), col(s"__r.$c"))
            .orderBy(col("__k"))
            .limit(5)
            .collect()
            .map { r0 =>
              // a NULL-vs-value disagreement is a legitimate sampled
              // mismatch: read both sides null-safely
              def d(i: Int): Option[Double] =
                if (r0.isNullAt(i)) None else Some(r0.getDouble(i))
              (String.valueOf(r0.get(0)), d(1), d(2))
            }
            .toSeq
        ColumnReport(c, mm, samples)
      }
      val lRows = trueL; val rRows = trueR
      val errors = scala.collection.mutable.ArrayBuffer.empty[String]
      if (lng("l_nulls") > 0)
        errors += s"left store has ${lng("l_nulls")} NULL $keyCol keys — " +
          "null-keyed rows cannot be matched across stores"
      if (lng("r_nulls") > 0)
        errors += s"right store has ${lng("r_nulls")} NULL $keyCol keys — " +
          "null-keyed rows cannot be matched across stores"
      // duplicate check nets out the null-keyed rows counted above
      if (lng("l_keys") + lng("l_nulls") < trueL)
        errors += s"left store has ${trueL - lng("l_keys") - lng("l_nulls")} duplicate " +
          s"$keyCol keys — per-key comparison is ambiguous"
      if (lng("r_keys") + lng("r_nulls") < trueR)
        errors += s"right store has ${trueR - lng("r_keys") - lng("r_nulls")} duplicate " +
          s"$keyCol keys — per-key comparison is ambiguous"
      if (lRows == 0) errors += "no data in left store"
      if (rRows == 0) errors += "no data in right store"
      if (lRows > 0 && rRows > 0) {
        val diffPct =
          math.abs(lRows - rRows).toDouble / math.max(lRows, rRows) * 100.0
        if (diffPct > rowTolerancePct)
          errors += f"row count difference ($diffPct%.2f%%) exceeds " +
            f"tolerance ($rowTolerancePct%.1f%%)"
        colReports.filter(_.mismatches > 0).foreach(c =>
          errors += s"${c.mismatches} ${c.column} mismatches")
        if (str("l_min") != str("r_min"))
          errors += s"min $keyCol mismatch: left=${str("l_min").orNull} " +
            s"right=${str("r_min").orNull}"
        if (str("l_max") != str("r_max"))
          errors += s"max $keyCol mismatch: left=${str("l_max").orNull} " +
            s"right=${str("r_max").orNull}"
      }
      ValidationResult(lRows, rRows, lng("matched"), lng("only_l"),
        lng("only_r"), str("l_min"), str("l_max"), str("r_min"), str("r_max"),
        colReports, errors.toSeq)
    } finally {
      joined.unpersist(blocking = false)
      lp.unpersist(blocking = false)
      rp.unpersist(blocking = false)
    }
  }

  /** CLI: `graft.Validate <leftParquet> <rightParquet> [keyCol] [valueCols
    * comma-separated]` — prints the match report, exits nonzero on FAIL.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Validate <left.parquet> <right.parquet> [keyCol] [cols]")
    val keyCol = if (args.length >= 3) args(2) else "ts"
    val vals =
      if (args.length >= 4) args(3).split(",").toSeq.filter(_.nonEmpty)
      else Nil
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = compareStores(
      spark.read.parquet(args(0)), spark.read.parquet(args(1)), keyCol, vals)
    println(res.report)
    spark.stop()
    if (!res.passed) sys.exit(1)
  }
}
