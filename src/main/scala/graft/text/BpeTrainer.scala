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
  * Scale shape: pair counting partially aggregates map-side over the
  * (distinct-word, freq) table — corpus size only enters through the ONE
  * initial word count; each round is one tiny top-1 collect (the k-row
  * driver pin of the kmeans/centroid pattern) plus a narrow map. Rounds =
  * `numMerges` by construction, not data-dependent. The word table is
  * re-persisted per round and the previous round unpersisted, so plan
  * depth and block usage stay constant.
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

  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int = 8
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr("regexp_extract_all(w, '(?s).', 0)"))
      .persist(lvl)
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
