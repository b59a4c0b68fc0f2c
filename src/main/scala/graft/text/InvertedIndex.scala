package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted index (term → postings) and conjunctive keyword search — the
  * retrieval primitive behind corpus inspection tooling ("show me every
  * document containing all of these terms") and the exact-match
  * complement to the BM25 ranker in [[CorpusOps]].
  *
  * Build: one explode + groupBy(term, doc) aggregation — a single
  * shuffle, partially aggregated map-side; the index partitions by term
  * hash, so lookups touch only the queried terms' partitions (at rest,
  * write it term-bucketed for that pruning). Search: filter the postings
  * to the query terms (a handful of term keys — predicate-pushdown
  * friendly), then one groupBy(doc) requiring every term present.
  * Nothing driver-side; conjunctions of any arity are one aggregation.
  */
object InvertedIndex {

  /** Postings with term frequencies: (term, doc, tf). Tokenization is the
    * corpus-standard lowercase-whitespace split (mirrors the DuckDB
    * oracles' `regexp_split_to_array(trim(lower(text)), '\s+')`).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc")
      .agg(count(lit(1)).as("tf"))

  /** Documents containing ALL query terms, scored by total tf.
    *
    * @return (doc, score) — score = Σ tf over the query terms, an exact
    *         BIGINT
    */
  def searchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val uniq = terms.distinct
    postings
      .filter(col("term").isin(uniq: _*))
      .groupBy("doc")
      .agg(count(lit(1)).as("__nt"), sum(col("tf")).as("score"))
      .filter(col("__nt") === uniq.size)
      .select("doc", "score")
  }
}
