package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("a uniform cycle is a fixpoint: every rank stays exactly 1e6") {
    val n = 20
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong, 1L))
      .toDF("src", "dst", "w")
    val ranks = PageRank.weightedRanksE6(edges, iters = 7)
    assert(ranks.filter(col("rank_e6") =!= 1000000L).count() === 0)
  }

  test("an authority hub outranks its satellites; dangling leaves get base inflow only") {
    // star: 10 satellites all point at node 100; 100 points nowhere
    val edges = (1L to 10L).map(i => (i, 100L, 1L)).toDF("src", "dst", "w")
    val ranks = PageRank.weightedRanksE6(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // satellites have no in-edges: rank = base = 150000 from iteration 1 on
    (1L to 10L).foreach(i => assert(ranks(i) === 150000L))
    // hub absorbs 10 × (850000·150000 div 1e6) after convergence of sources
    assert(ranks(100L) === 150000L + 10L * (850000L * 150000L / 1000000L))
  }

  test("edge weights steer rank proportionally and results are partitioning-invariant") {
    // two authorities, one receiving 3× the weight of the other
    val edges = Seq((1L, 10L, 3L), (1L, 11L, 1L), (2L, 10L, 3L), (2L, 11L, 1L))
      .toDF("src", "dst", "w")
    val r1 = PageRank.weightedRanksE6(edges, iters = 4)
    val heavy = r1.filter(col("node") === 10L).select("rank_e6").as[Long].head()
    val light = r1.filter(col("node") === 11L).select("rank_e6").as[Long].head()
    assert(heavy > light)
    val r2 = PageRank.weightedRanksE6(edges.repartition(7), iters = 4)
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty)
  }
}
