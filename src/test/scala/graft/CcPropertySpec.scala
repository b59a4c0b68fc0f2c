package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

/** Randomized connected-components check against an INDEPENDENT
  * driver-side union-find. Both fixpoints (min-label propagation and
  * star contraction) back every dedup-grouping operator in the engine;
  * NearDupGroupsSpec pins them to each other on random graphs, but a
  * convergence bug shared by both (e.g. an early-exit that strands a
  * bridge merge) would pass that. This spec re-derives the contract from
  * scratch: docs sharing any bucket are one component, the component's
  * label is its minimum doc id, docs with no edges are absent.
  *
  * Generator favors pathological topologies: a tiny bucket space (0..11)
  * over up to 26 docs, so multi-way bucket collisions, chains, and
  * bridge merges occur in nearly every sample.
  */
class CcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val edgeGen = for {
    id <- Gen.choose(0L, 25L)
    bucket <- Gen.choose(0L, 11L)
  } yield (id, bucket)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  /** Union-find with path compression; label = min id per component. */
  private def bruteForce(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // bucket nodes live in a disjoint id space so they can't collide
    // with doc ids inside the union-find
    edges.foreach { case (id, bucket) => union(id, (1L << 41) + bucket) }
    val ids = edges.map(_._1).distinct
    val minPer = ids.groupBy(find).map { case (root, ms) => root -> ms.min }
    ids.map(id => id -> minPer(find(id))).toMap
  }

  test("both fixpoints match a union-find oracle on random bipartite graphs") {
    check(Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      val expected = bruteForce(edges)

      val df = edges.toDF("id", "bucket")
      val (prop, _) = graft.operators.ConnectedComponents
        .labelPropagateWithRounds(df, "id", Seq("bucket"), maxIters = 40)
      val viaProp = prop.as[(Long, Long)].collect().toMap

      // star contraction runs on a single homogeneous id space: shift
      // buckets out of the doc-id range, then keep doc rows only
      val starEdges = edges.map { case (id, b) => (id, (1L << 40) + b) }
        .toDF("a", "b")
      val (star, _) = graft.operators.ConnectedComponents
        .starContractWithRounds(starEdges, "a", "b")
      val viaStar = star.filter(col("id") < (1L << 40))
        .as[(Long, Long)].collect().toMap

      val p = viaProp == expected
      val s = viaStar == expected
      if (!(p && s))
        println(s"MISMATCH prop=$p star=$s edges=$edges expected=$expected " +
          s"viaProp=$viaProp viaStar=$viaStar")
      p && s
    })
  }
}
