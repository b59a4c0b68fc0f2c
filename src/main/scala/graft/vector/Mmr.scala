package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity-aware selection step retrieval pipelines run after ANN:
  * greedily pick the candidate maximizing
  * `λ·rel(q, d) − (1−λ)·max_{s∈S} sim(d, s)`, so near-duplicate hits
  * don't crowd the result list (for training-data curation: diverse
  * exemplar selection from a retrieved pool).
  *
  * Arithmetic is EXACT integers end-to-end: vectors are symmetric-int8
  * coded (the [[VectorFunctions.annInt8Rerank]] construction) and every
  * compared quantity is `amax_e6(x) · amax_e6(y) · Σ(cx·cy)` — one
  * consistent scale for both relevance and pairwise similarity, so the
  * greedy argmax (ties → min id) is bit-reproducible and the DuckDB
  * oracle replays the whole selection. λ is in tenths (λ=7 ⇒ 0.7);
  * scores are `λt·rel − (10−λt)·maxSim`. Overflow bound:
  * `10 · dim·127² · amax_e6² < 2^62` holds for any |x| ≤ ~23 at dim 64
  * (unit-normalized embeddings sit at amax ≤ 1 ⇒ amax_e6 ≤ 1e6).
  *
  * Scale shape: shortlisting is the distributed int8 scan (corpus
  * streams, queries broadcast, per-query top-`shortlist` window);
  * the greedy loop — inherently sequential, k·shortlist pair scores —
  * runs driver-side on the COLLECTED shortlist (bounded:
  * |queries|·shortlist rows of dim codes; the same API-edge pin as the
  * IVF centroid collect). The corpus is never touched after the scan.
  */
object Mmr {

  /** @param lambdaTenths λ·10 ∈ [0, 10]
    * @return (query_id, sel_rank 1..k, neighbor_id, score) in selection
    *         order per query
    */
  def rerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 25,
      lambdaTenths: Int = 7
  ): DataFrame = {
    require(k >= 1 && shortlist >= k, "need shortlist >= k >= 1")
    require(lambdaTenths >= 0 && lambdaTenths <= 10, "lambdaTenths in [0,10]")
    val spark = corpus.sparkSession
    def coded(df: DataFrame, idAs: String, p: String) = df
      .select(col(idCol).as(idAs), col(vecCol).as(s"__${p}v"))
      .withColumn(s"__${p}amax",
        greatest(array_max(col(s"__${p}v")).cast("double"),
          -array_min(col(s"__${p}v")).cast("double"), lit(1e-12)))
      .withColumn(s"__${p}c", expr(
        s"transform(__${p}v, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / __${p}amax + 0.5) AS BIGINT))"))
      .withColumn(s"__${p}e6",
        greatest(floor(col(s"__${p}amax") * lit(1e6)).cast("long"), lit(1L)))
    val c = coded(corpus, "neighbor_id", "c")
    val q = coded(queries, "query_id", "q")
    val ws = Window.partitionBy("query_id")
      .orderBy(col("rel_key").desc, col("neighbor_id"))
    val short = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rel_key", col("__ce6") * col("__qe6") *
        graft.functions.exprs.dotProductLong(col("__qc"), col("__cc")))
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("rel_key"),
        col("__cc").as("codes"), col("__ce6").as("amax_e6"))
    // bounded collect: |queries| · shortlist rows (the greedy argmax is
    // sequential by definition; distributing k tiny jobs would cost k
    // barriers to scan ≤ shortlist rows each)
    val cands = short.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toArray, r.getLong(4)))
      .groupBy(_._1)

    val sel = cands.toSeq.flatMap { case (qid, arr) =>
      def simKey(a: (Long, Long, Long, Array[Long], Long),
          b: (Long, Long, Long, Array[Long], Long)): Long = {
        var s = 0L; var i = 0
        val ca = a._4; val cb = b._4
        while (i < ca.length) { s += ca(i) * cb(i); i += 1 }
        a._5 * b._5 * s
      }
      var selected = Vector.empty[(Long, Long, Long, Array[Long], Long)]
      var rows = Vector.empty[Row]
      var remaining = arr.sortBy(x => (x._2)).toVector
      var rank = 1
      while (rank <= k && remaining.nonEmpty) {
        val scored = remaining.map { cand =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(s => simKey(cand, s)).max
          (lambdaTenths * cand._3 - (10L - lambdaTenths) * ms, cand)
        }
        val (bestScore, best) = scored.minBy { case (sc, cd) => (-sc, cd._2) }
        selected :+= best
        remaining = remaining.filterNot(_._2 == best._2)
        rows :+= Row(qid, rank, best._2, bestScore)
        rank += 1
      }
      rows
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("sel_rank", IntegerType),
      StructField("neighbor_id", LongType), StructField("score", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(sel.toSeq, 1), schema)
  }
}
