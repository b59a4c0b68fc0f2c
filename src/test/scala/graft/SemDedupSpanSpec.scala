package graft

import org.apache.spark.sql.functions._

import graft.text.CorpusOps
import graft.vector.VectorFunctions

/** Semantics pins for the two round-9 dedup additions: duplicate-span
  * removal (Lee et al. 2022 ExactSubstr rewrite) and SemDeDup (Abbas et
  * al. 2023 cluster-scoped semantic dedup).
  */
class SemDedupSpanSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], w: Int) =
    CorpusOps.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("span removal: first occurrence wins, later occurrence is cut") {
    val quote = "alpha beta gamma delta epsilon"
    val out = spans(Seq(
      (1L, s"$quote tail one"),
      (2L, s"lead two $quote")), w = 5)
    out(1L) match { case (n, rem, txt) =>
      assert(n === 7 && rem === 0 && txt === s"$quote tail one")
    }
    out(2L) match { case (n, rem, txt) =>
      assert(n === 7 && rem === 5 && txt === "lead two")
    }
  }

  test("span removal: overlapping duplicated windows merge (union, not sum)") {
    // 7 shared tokens → three overlapping 5-token windows; removal must be
    // the 7-position union, not 15
    val run = "a b c d e f g"
    val out = spans(Seq(
      (1L, s"$run x y"),
      (2L, s"p q $run")), w = 5)
    assert(out(2L)._2 === 7)
    assert(out(2L)._3 === "p q")
  }

  test("span removal: docs shorter than the window pass through whole") {
    val out = spans(Seq(
      (1L, "tiny doc"),
      (2L, "tiny doc")), w = 5)
    assert(out(1L) === ((2L, 0L, "tiny doc")))
    assert(out(2L) === ((2L, 0L, "tiny doc")))
  }

  test("span removal: within-doc repetition cuts the second occurrence") {
    val q = "one two three four five"
    val out = spans(Seq((1L, s"$q mid $q")), w = 5)
    assert(out(1L)._1 === 11 && out(1L)._2 === 5)
    assert(out(1L)._3 === s"$q mid")
  }

  test("span removal: a pure duplicate doc is cut to the empty string") {
    val q = "u v w x y z"
    val out = spans(Seq((1L, q), (2L, q)), w = 5)
    assert(out(1L) === ((6L, 0L, q)))
    assert(out(2L)._2 === 6 && out(2L)._3 === "")
  }

  private val semCorpus = Seq(
    // an exact-duplicate trio near e1 (same cell by construction, sim 1.0)
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    // a near-dup pair along e2
    (10L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (11L, Array(0.0f, 0.98f, 0.2f, 0.0f)),
    // singletons spread across other axes
    (20L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (21L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
    (22L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")

  test("semDedup: one survivor per group, min-centroid-sim keep rule, cell-local groups") {
    val out = VectorFunctions
      .semDedup(semCorpus, "vec_id", "embedding", k = 4, trainIters = 2, tau = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    val byGroup = out.groupBy(_._4)
    // exact duplicates 1,2,3 share a group; near-dups 10,11 share a group
    assert(out.filter(t => Set(1L, 2L, 3L).contains(t._1)).map(_._4).distinct.length === 1)
    assert(out.filter(t => Set(10L, 11L).contains(t._1)).map(_._4).distinct.length === 1)
    byGroup.foreach { case (_, members) =>
      // exactly one kept per group, and it is the argmin (simc, id)
      assert(members.count(_._5) === 1)
      val expected = members.minBy(t => (t._3, t._1))
      assert(members.find(_._5).get._1 === expected._1)
      // every group lives inside one cell
      assert(members.map(_._2).distinct.length === 1)
    }
    // singletons keep themselves
    Seq(20L, 21L).foreach { id =>
      val t = out.find(_._1 === id).get
      assert(t._4 === id && t._5)
    }
  }

  test("semDedup: deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) = VectorFunctions
      .semDedup(df, "vec_id", "embedding", k = 4, trainIters = 2, tau = 0.9)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(run(semCorpus) === run(semCorpus.repartition(7)))
  }

  // an all-identical corpus: k-means collapses every vector into one cell,
  // the adversarial shape where the within-cell pair join is n² unguarded
  private def collapsedCorpus(n: Int) =
    (1 to n).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")

  test("semDedup hot-cell guard: collapsed cell is hash-split, pair work bounded") {
    val n = 60
    val out = VectorFunctions
      .semDedup(collapsedCorpus(n), "vec_id", "embedding",
        k = 2, trainIters = 1, tau = 0.9, maxCellSize = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(out.length === n) // every vector still classified
    val groups = out.groupBy(_._2)
    // the guard split the hot cell: no group (= sub-cell pair block) may
    // span the whole corpus, and each group still keeps exactly one rep
    assert(groups.size > 1)
    assert(groups.values.map(_.size).max < n)
    assert(groups.values.map(_.size).sum === n)
    groups.values.foreach(ms => assert(ms.count(_._3) === 1))
    // sub-cell sizes are ceil-capped: ceil(60/10)=6 sub-cells, so the
    // largest pair block is far under the unguarded 60²
    assert(groups.size >= 4)
  }

  test("semDedup hot-cell guard: inert below the cap (bit-identical output)") {
    def run(cap: Int) = VectorFunctions
      .semDedup(semCorpus, "vec_id", "embedding",
        k = 4, trainIters = 2, tau = 0.9, maxCellSize = cap)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(run(50000) === run(Int.MaxValue))
  }

  test("semDedup hot-cell guard: deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) = VectorFunctions
      .semDedup(df, "vec_id", "embedding",
        k = 2, trainIters = 1, tau = 0.9, maxCellSize = 10)
      .orderBy("id").collect().map(_.toString).toSeq
    val c = collapsedCorpus(60)
    assert(run(c) === run(c.repartition(11)))
  }
}
