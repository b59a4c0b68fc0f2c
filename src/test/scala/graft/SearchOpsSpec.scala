package graft

import org.apache.spark.sql.functions._

import graft.text.{FuzzyDedup, InvertedIndex}
import graft.vector.Mmr

/** Round-6 search/diversity operators: inverted-index conjunctive search,
  * edit-distance fuzzy dedup, MMR re-ranking.
  */
class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- InvertedIndex ------------------------------------------------------

  private lazy val docs = Seq(
    (1L, "spark window merge spark"),
    (2L, "spark window"),
    (3L, "merge window spark  extra   spaces"),
    (4L, "unrelated words only")
  ).toDF("doc_id", "text")

  test("conjunctive search requires ALL terms and scores by summed tf") {
    val p = InvertedIndex.postings(docs, "doc_id", "text")
    val got = InvertedIndex.searchAll(p, Seq("spark", "window", "merge"))
      .orderBy("doc").as[(Long, Long)].collect().toSeq
    // doc 1: spark·2 + window + merge = 4; doc 3: 3; doc 2 lacks merge
    assert(got == Seq((1L, 4L), (3L, 3L)))
  }

  test("postings tokenize on whitespace runs and drop empties") {
    val p = InvertedIndex.postings(docs, "doc_id", "text")
    val terms = p.filter(col("doc") === 3L).select("term")
      .as[String].collect().toSet
    assert(terms == Set("merge", "window", "spark", "extra", "spaces"))
    assert(InvertedIndex.searchAll(p, Seq("spark", "spark")).count() == 3,
      "duplicate query terms must not double-count the conjunction arity")
  }

  // ---- FuzzyDedup ---------------------------------------------------------

  test("edit-distance pairs keep near-identical docs and drop distant ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val d = Seq(
      (1L, base), (2L, base + " tail"), // tiny relative edit
      (3L, "completely different content about other things entirely " * 3)
    ).toDF("doc_id", "text")
    val got = FuzzyDedup.editDistancePairs(d, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    val (_, _, dist, rel) = got.head
    assert(dist == 5L, s"levenshtein to ' tail' suffix should be 5, got $dist")
    assert(rel == dist * 1000000L / (base.length + 5), s"rel_e6 $rel")
  }

  // ---- Mmr ----------------------------------------------------------------

  // query q at e1; candidates 1 and 2 are exact duplicates of q (max
  // relevance AND max mutual similarity), 3 is a less relevant diagonal
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)), // query
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f)), // dup of 1
    (3L, Array(0.6f, 0.0f, 0.8f))
  ).toDF("vec_id", "embedding")

  test("pure-relevance λ=10 ranks by relevance; λ=4 diversifies") {
    val q = vecs.filter(col("vec_id") === 0L)
    val pure = Mmr.rerank(vecs, q, "vec_id", "embedding",
      k = 3, shortlist = 3, lambdaTenths = 10)
      .orderBy("sel_rank").as[(Long, Int, Long, Long)].collect().toSeq
    assert(pure.map(_._3) == Seq(1L, 2L, 3L), s"pure relevance order: $pure")
    val div = Mmr.rerank(vecs, q, "vec_id", "embedding",
      k = 3, shortlist = 3, lambdaTenths = 4)
      .orderBy("sel_rank").as[(Long, Int, Long, Long)].collect().toSeq
    // after picking 1, its duplicate 2 is penalized below the diagonal 3:
    // score(2) = 4·rel − 6·sim(2,1) = −2·selfsim < score(3) = −2·sim(3,1)
    assert(div.map(_._3) == Seq(1L, 3L, 2L), s"diversified order: $div")
  }

  test("mmr emits k rows per query in selection order with monotone ranks") {
    val q = vecs.filter(col("vec_id") < 2L)
    val got = Mmr.rerank(vecs, q, "vec_id", "embedding",
      k = 2, shortlist = 3, lambdaTenths = 7)
      .orderBy("query_id", "sel_rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) ==
      Seq((0L, 1), (0L, 2), (1L, 1), (1L, 2)))
    assert(got.forall(t => t._3 != t._1), "self must be excluded")
  }
}
