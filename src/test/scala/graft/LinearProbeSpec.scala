package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearProbe

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = ((1 to 60).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon tok$i", true)) ++
    (61 to 120).map(i =>
      (i.toLong, s"zeta eta theta iota kappa tok$i", false)))
    .toDF("id", "text", "label")

  test("the probe separates two disjoint vocabularies after 3 iterations") {
    val scores = LinearProbe.trainScores(corpus, "id", "text", "label",
      m = 32, iters = 3, lrDen = 2000L)
    val agg = scores.groupBy("y_e6").agg(avg(col("score_e6")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agg(1000000L) > agg(0L),
      s"positive mean ${agg(1000000L)} should exceed negative ${agg(0L)}")
    // and more than trivially: positives should score above the midpoint
    // between class means for most docs (linear separability here)
    val mid = (agg(1000000L) + agg(0L)) / 2
    val misranked = scores.filter(
      (col("y_e6") === 1000000L && col("score_e6") < mid) ||
      (col("y_e6") === 0L && col("score_e6") > mid)).count()
    assert(misranked.toDouble / 120 < 0.1, s"$misranked/120 misranked")
  }

  test("training is bit-deterministic under repartitioning") {
    val a = LinearProbe.trainScores(corpus, "id", "text", "label",
      m = 32, iters = 2, lrDen = 2000L)
    val b = LinearProbe.trainScores(corpus.repartition(11), "id", "text",
      "label", m = 32, iters = 2, lrDen = 2000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
