package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, s"lang${i % 7}")).toDF("id", "lang")

  test("hash sample is partition-layout invariant and refinable") {
    val a = Sampling.hashSample(docs, "id", 1, 10).select("id").as[Long].collect().sorted
    val b = Sampling.hashSample(docs.repartition(13), "id", 1, 10)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b), "sample depends on partitioning")
    // doubling the denominator with the same numerator refines the sample
    val fine = Sampling.hashSample(docs, "id", 1, 20).select("id").as[Long].collect().toSet
    assert(fine.subsetOf(a.toSet), "1/20 sample is not a subset of 1/10")
    // rate lands near the nominal fraction
    assert(math.abs(a.length / 2000.0 - 0.1) < 0.03, s"rate ${a.length / 2000.0}")
  }

  test("splitLabel partitions every row into exactly one split near nominal rates") {
    val counts = docs.withColumn("s", Sampling.splitLabel(col("id")))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05, counts.toString)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.04, counts.toString)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.04, counts.toString)
  }

  test("mixtureSample keeps per-stratum rates, is refinable per stratum, drops unknown strata at default 0") {
    val src = (0L until 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val rates = Map("s0" -> 1000, "s1" -> 300)
    val kept = Sampling.mixtureSample(src, "id", "src", rates)
      .as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("s0") == 1000, s"s0 at rate 1000pm must keep all: $bySrc")
    assert(math.abs(bySrc("s1") / 1000.0 - 0.3) < 0.05, bySrc.toString)
    assert(!bySrc.contains("s2"), "default 0 must drop unlisted strata")
    // raising one stratum's rate only ADDS rows for that stratum
    val more = Sampling.mixtureSample(src, "id", "src", rates + ("s1" -> 600))
      .as[(Long, String)].collect().toSet
    assert(kept.toSet.subsetOf(more))
  }

  test("epochShuffleKey: permutation is total, deterministic, and epoch-dependent") {
    val e3a = docs.select(col("id"),
      Sampling.epochShuffleKey(col("id"), 3).as("k"))
      .orderBy("k", "id").as[(Long, Long)].collect()
    val e3b = docs.repartition(17).select(col("id"),
      Sampling.epochShuffleKey(col("id"), 3).as("k"))
      .orderBy("k", "id").as[(Long, Long)].collect()
    assert(e3a.sameElements(e3b), "epoch order depends on layout")
    assert(e3a.map(_._1).toSet.size == 2000, "not a permutation")
    val e4 = docs.select(col("id"),
      Sampling.epochShuffleKey(col("id"), 4).as("k"))
      .orderBy("k", "id").as[(Long, Long)].collect()
    assert(!e3a.map(_._1).sameElements(e4.map(_._1)), "epochs must differ")
  }

  test("stratifiedEqualize cuts every stratum to the smallest stratum size") {
    // skewed strata: lang0 has 1200 rows, lang1 500, lang2 300
    val skewed = ((0 until 1200).map(i => (i.toLong, "l0")) ++
      (1200 until 1700).map(i => (i.toLong, "l1")) ++
      (1700 until 2000).map(i => (i.toLong, "l2"))).toDF("id", "lang")
    val eq = Sampling.stratifiedEqualize(skewed, "lang", "id")
    val sizes = eq.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet == Set(300L), sizes.toString)
  }
}
