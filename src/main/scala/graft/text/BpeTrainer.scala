package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
  * merge-rule table from the corpus's own word-frequency statistics — the
  * step a training-data pipeline runs before token counting, not just the
  * application of a fixed vocabulary (the q_bpe_tokens query covers that).
  *
  * Semantics (the classic word-level variant, pinned so a SQL engine
  * reproduces it bit-for-bit):
  *   - the unit of training is the DISTINCT word with its corpus frequency
  *     (standard BPE trains on the word-freq table, not the token stream);
  *   - each word starts as its character sequence; each round counts ALL
  *     adjacent symbol pairs (overlapping, frequency-weighted), picks the
  *     most frequent pair with ties broken lexicographically on (left,
  *     right), and merges it in every word by a single LEFT-TO-RIGHT pass
  *     in which a merged symbol cannot immediately merge again
  *     ("aaaa" + (a,a) → "aa","aa" — the standard greedy pass).
  *
  * The merge pass is an `aggregate` fold with a (acc, skip) struct
  * accumulator over symbol positions — exact, order-pinned, and mirrored
  * in DuckDB as a per-word recursive-CTE walk (NOT list_reduce, whose
  * struct accumulators cross-contaminate rows in DuckDB 1.0 — the same
  * workaround as the fixed-point log).
  *
  * Scale shape — HYBRID. The corpus-sized work is exactly one job: the
  * initial distinct-word frequency count. After that aggregation the
  * word-freq table is typically tiny relative to the corpus (natural-
  * language vocabulary grows ~ Heaps' law, not linearly), so when it fits
  * under `localWordLimit` the merge loop runs DRIVER-LOCAL over the
  * collected table with bit-identical semantics (same overlapping
  * frequency-weighted pair counts, same (cnt desc, pair asc-by-UTF-8)
  * tie-break, same greedy pass) — a realistic 30k-merge vocabulary is a
  * tight in-memory loop instead of 30k Spark jobs. Above the limit the
  * distributed loop still applies: pair counting partially aggregates
  * map-side, each round is one top-1 collect plus a narrow map, and the
  * word table is re-persisted per round with the parent unpersisted so
  * plan depth and block usage stay constant.
  *
  * @return (merge_rank, left_sym, right_sym, pair_count) — `numMerges`
  *         rows (fewer if the vocabulary exhausts), rank 1 first.
  */
object BpeTrainer {

  private def sq(s: String): String = s.replace("'", "''")

  /** One left-to-right merge pass of pair (a, b) over the `syms` column. */
  private def mergeExpr(a: String, b: String): String =
    s"""IF(size(syms) < 2, syms,
        aggregate(
          sequence(1, size(syms)),
          named_struct('acc', CAST(array() AS ARRAY<STRING>), 'skip', false),
          (st, i) -> IF(st.skip,
            named_struct('acc', st.acc, 'skip', false),
            IF(i < size(syms) AND syms[i-1] = '${sq(a)}' AND syms[i] = '${sq(b)}',
              named_struct('acc', array_append(st.acc, '${sq(a)}${sq(b)}'), 'skip', true),
              named_struct('acc', array_append(st.acc, syms[i-1]), 'skip', false))),
          st -> st.acc))"""

  /** UTF-8 byte-order string comparison — the collation Spark's orderBy
    * uses on StringType (UTF8String binary compare), so the local loop's
    * tie-break is bit-identical to the distributed one beyond ASCII too.
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** The greedy left-to-right merge pass, local twin of [[mergeExpr]]. */
  private def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-local merge loop over the collected word-freq table — same
    * semantics as the distributed rounds, O(numMerges × Σ|word|) with no
    * job launches.
    */
  private def localMergeLoop(
      words0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var ws = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to numMerges if merges.size == r - 1) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))
        merges += ((r, a, b, cnt))
        ws = ws.map { case (syms, f) =>
          (if (syms.length < 2) syms else mergePass(syms, a, b), f)
        }
      }
    }
    merges.toSeq
  }

  private val utf8Ordering: Ordering[String] =
    (x: String, y: String) => if (utf8Lt(x, y)) -1 else if (utf8Lt(y, x)) 1 else 0

  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int = 8,
      localWordLimit: Long = 2000000L
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr("regexp_extract_all(w, '(?s).', 0)"))
      .persist(lvl)
    val nWords = words.count()
    // the fast-path gate is BYTE-aware, not just row-aware: 2M rows of
    // long words would be gigabytes on the driver, so the collect also
    // requires the total character volume to stay driver-sized
    // sum() over zero rows is NULL — an empty corpus must return an empty
    // merge table, not NPE inside getLong
    val totalChars =
      if (nWords == 0L) 0L
      else if (nWords <= localWordLimit) {
        val r = words.agg(sum(length(col("w")))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      } else Long.MaxValue
    if (nWords <= localWordLimit && totalChars <= 64000000L) {
      // hybrid fast path: the post-aggregation vocabulary fits — run the
      // merge loop in memory (identical semantics, zero jobs per round)
      val collected = words.select(col("syms"), col("freq")).collect()
        .map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
      words.unpersist(blocking = false)
      return localMergeLoop(collected, numMerges)
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
        .select(col("merge_rank").cast("int"), col("left_sym"),
          col("right_sym"), col("pair_count"))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> named_struct('a', syms[i-1], 'b', syms[i]))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.nonEmpty && merges.size < numMerges) {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, cnt))
        val next = words
          .withColumn("syms", expr(mergeExpr(a, b)))
          .persist(lvl)
        next.count() // materialize before dropping the parent's blocks
        words.unpersist(blocking = false)
        words = next
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .select(col("merge_rank").cast("int"), col("left_sym"),
        col("right_sym"), col("pair_count"))
  }
}
