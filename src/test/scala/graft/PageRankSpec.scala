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

  test("the distributed loop is bit-identical to the local fast path") {
    // maxLocalEdges = 0 forces the distributed iteration loop (the path
    // large graphs take) on the same graph the default runs locally —
    // a non-trivial topology: weighted cycle + chords + a dangling sink
    val edges = ((0L until 12L).map(i => (i, (i + 1) % 12L, 1L + i % 3)) ++
      Seq((0L, 6L, 5L), (3L, 9L, 2L), (7L, 100L, 1L)))
      .toDF("src", "dst", "w")
    val local = PageRank.weightedRanksE6(edges, iters = 6)
    val dist = PageRank.weightedRanksE6(edges, iters = 6, maxLocalEdges = 0L)
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty)
  }

  test("java-equality-unsafe key types fall through to the distributed loop") {
    // BinaryType keys: Array[Byte] compares by reference under Java
    // equals — the local HashMap path would miss/NPE; the gate must send
    // the graph down the distributed loop, which handles them via Spark
    // join/groupBy equality. 2-cycle of binary nodes: uniform fixpoint.
    val a = Array[Byte](1); val b = Array[Byte](2)
    val edges = Seq((a, b, 1L), (b, a, 1L)).toDF("src", "dst", "w")
    val ranks = PageRank.weightedRanksE6(edges, iters = 3)
    assert(ranks.count() === 2)
    assert(ranks.filter(col("rank_e6") =!= 1000000L).count() === 0)
  }
}
