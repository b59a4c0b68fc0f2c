package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Property checks for the deterministic CMS / HLL sketches and the
  * DSIR / weighted-sampling selection operators — the guarantees a user
  * relies on beyond the hash oracles (which pin exact values at one
  * dataset): CMS never underestimates and merges additively, HLL merges
  * by register max and lands near the true cardinality, selection ops are
  * deterministic and monotone.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def tokenStream = {
    // zipf-ish synthetic stream: token t_k appears ~N/k times
    val rows = (1 to 200).flatMap(k => Seq.fill(2000 / k)(s"tok_$k"))
    rows.toDF("token")
  }

  test("CMS never underestimates, and is exact when w has no collisions") {
    val toks = tokenStream
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    // tight sketch: collisions certain (200 tokens, 64 buckets)
    val tight = Sketches.cmsSketch(toks, "token", d = 3, w = 64)
    val estT = Sketches.cmsEstimate(tight, exact, "token", d = 3, w = 64)
      .join(exact.withColumnRenamed("token", "item"), "item")
    assert(estT.filter(col("est") < col("cnt")).count() === 0)
    // roomy sketch: 200 fingerprints into 3×65536 cells — if any row of
    // the sketch happens to collide, min over rows repairs it
    val roomy = Sketches.cmsSketch(toks, "token", d = 3, w = 65536)
    val estR = Sketches.cmsEstimate(roomy, exact, "token", d = 3, w = 65536)
      .join(exact.withColumnRenamed("token", "item"), "item")
    assert(estR.filter(col("est") =!= col("cnt")).count() === 0)
  }

  test("CMS sketches of corpus shards merge by cell-count sum") {
    val toks = tokenStream.withColumn("shard", pmod(length(col("token")), lit(2)))
    val whole = Sketches.cmsSketch(toks, "token", d = 3, w = 64)
    val merged = Sketches
      .cmsSketch(toks.filter(col("shard") === 0), "token", d = 3, w = 64)
      .unionByName(
        Sketches.cmsSketch(toks.filter(col("shard") === 1), "token", d = 3, w = 64))
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("HLL raw estimate lands near the true cardinality (m=256)") {
    val items = spark.range(20000).select(concat(lit("id_"), col("id")).as("x"))
    val est = Sketches
      .hllEstimate(Sketches.hllRegisters(items, "x", m = 256), m = 256)
      .select("hll_est").as[Double].head()
    // expected rel. std. error 1.04/sqrt(256) ≈ 6.5%; 3σ bound
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"est=$est")
  }

  test("HLL registers merge by max; duplicates never move a register") {
    val a = spark.range(0, 5000).select(concat(lit("k"), col("id")).as("x"))
    val b = spark.range(3000, 9000).select(concat(lit("k"), col("id")).as("x"))
    val whole = Sketches.hllRegisters(a.unionByName(b), "x", m = 64)
    val merged = Sketches.hllRegisters(a, "x", m = 64)
      .unionByName(Sketches.hllRegisters(b, "x", m = 64))
      .groupBy("bucket").agg(max(col("reg")).as("reg"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    // the a∪b stream contains every row of a twice for ids 3000-4999's
    // shared range — feeding duplicates changes nothing
    val dup = Sketches.hllRegisters(a.unionByName(a).unionByName(b), "x", m = 64)
    assert(whole.exceptAll(dup).isEmpty && dup.exceptAll(whole).isEmpty)
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    // two disjoint vocabularies; target = "wiki" rows
    val docs = ((1 to 40).map(i => (i.toLong, s"alpha beta gamma delta tok$i", true)) ++
      (41 to 80).map(i => (i.toLong, s"zeta eta theta iota tok$i", false)))
      .toDF("id", "text", "is_target")
    val w = graft.text.CorpusOps
      .dsirLogWeights(docs, "id", "text", "is_target", m = 1024)
    val avg = w.join(docs.select("id", "is_target"), "id")
      .groupBy("is_target").agg(org.apache.spark.sql.functions.avg("w_e6").as("mw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"target mean ${avg(true)} should exceed raw-only mean ${avg(false)}")
  }

  test("weightedSample: zero weight never kept, cap weight always kept, deterministic") {
    val df = spark.range(2000).select(col("id"),
      (col("id") % 3 * 50).as("w")) // weights 0, 50, 100
    val kept = graft.operators.Sampling.weightedSample(df, "id", "w", cap = 100L)
    assert(kept.filter(col("w") === 0).count() === 0)
    val full = df.withColumn("w", lit(100L))
    assert(graft.operators.Sampling.weightedSample(full, "id", "w", cap = 100L)
      .count() === 2000)
    val again = graft.operators.Sampling.weightedSample(df, "id", "w", cap = 100L)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    // monotone in weight: the kept set at w is a subset of kept at 2w
    val boosted = graft.operators.Sampling
      .weightedSample(df.withColumn("w", col("w") * 2), "id", "w", cap = 100L)
    assert(kept.select("id").exceptAll(boosted.select("id")).isEmpty)
  }
}
