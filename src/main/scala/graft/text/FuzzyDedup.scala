package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy duplicate detection: LSH blocking
  * ([[MinHash.candidatePairs]]) followed by exact Levenshtein
  * verification with a RELATIVE threshold — the blocking→verification
  * shape of classic record linkage, with the verifier swapped from
  * Jaccard (token-set view, [[MinHash.nearDupPairs]]) to edit distance
  * (character-sequence view, catches reorder-free small edits that
  * shingle sets over-penalize and vice versa).
  *
  * Scale: the quadratic risk lives entirely in blocking, which LSH bounds
  * to colliding-bucket pairs; Levenshtein (O(|a|·|b|) per pair) runs on
  * candidates only. Spark's `levenshtein` is codegen'd; for corpora with
  * a known absolute edit cap prefer the thresholded 3-arg form
  * (`levenshtein(a, b, cap)`, banded O(|a|·cap)) — not used here because
  * the threshold is relative and the compared column must match the
  * oracle's plain-distance semantics.
  *
  * All compared columns are integers (distance, and the relative
  * distance as `dist·1e6 div maxlen` — floor division, exact BIGINT), so
  * the DuckDB oracle reproduces them bit-for-bit.
  */
object FuzzyDedup {

  /** @param maxRelE6 keep pairs with dist·1e6 div max(len) ≤ this
    *                 (e.g. 200000 = edits ≤ 20% of the longer string)
    * @return (id_a, id_b, dist, rel_e6), id_a < id_b
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 8,
      maxRelE6: Long = 200000L
  ): DataFrame = {
    val cand = MinHash.candidatePairs(docs, idCol, textCol, shingleN, k, bands)
    val txt = docs.select(col(idCol), col(textCol))
    cand
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("dist"),
        greatest(length(col("__ta")), length(col("__tb"))).cast("long").as("__ml"))
      .withColumn("rel_e6",
        when(col("__ml") === 0L, lit(0L))
          .otherwise(expr("dist * 1000000L div __ml")))
      .filter(col("rel_e6") <= maxRelE6)
      .select("id_a", "id_b", "dist", "rel_e6")
  }
}
