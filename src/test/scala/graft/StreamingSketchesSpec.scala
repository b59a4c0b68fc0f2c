package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.StreamingSketches

class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("streamed CMS accumulates across micro-batches and matches the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cms_stream").toString
    val mem = MemoryStream[String]
    val q = mem.toDF.toDF("token").writeStream
      .foreachBatch(StreamingSketches.cmsUpdateBatch(dir, "token", d = 3, w = 1024))
      .start()
    try {
      mem.addData(Seq.fill(5)("alpha") ++ Seq.fill(2)("beta"): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(4)("alpha") ++ Seq.fill(7)("gamma"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val cand = Seq("alpha", "beta", "gamma").toDF("token")
    val est = StreamingSketches
      .readCmsEstimate(spark, dir, cand, "token", d = 3, w = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w=1024 over 3 fingerprints: no collisions → estimates exact, and
    // crucially alpha's count spans BOTH batches
    assert(est === Map("alpha" -> 9L, "beta" -> 2L, "gamma" -> 7L))
    // stored sketch equals the one-shot batch sketch over the union
    val whole = Sketches.cmsSketch(
      (Seq.fill(9)("alpha") ++ Seq.fill(2)("beta") ++ Seq.fill(7)("gamma"))
        .toDF("token"), "token", d = 3, w = 1024)
    val streamed = spark.read.parquet(
      s"$dir/v=${graft.streaming.StreamingDedup.latestVersion(spark, dir).get}")
    assert(whole.exceptAll(streamed).isEmpty && streamed.exceptAll(whole).isEmpty)
  }

  test("streamed HLL registers equal the batch registers over the union; versions compact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("hll_stream").toString
    val mem = MemoryStream[String]
    val q = mem.toDF.toDF("x").writeStream
      .foreachBatch(StreamingSketches.hllUpdateBatch(dir, "x", m = 64,
        keepVersions = Some(2)))
      .start()
    try {
      (0 until 5).foreach { b =>
        mem.addData((b * 1000 until b * 1000 + 500).map(i => s"item_$i"): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val whole = Sketches.hllRegisters(
      (0 until 5).flatMap(b => (b * 1000 until b * 1000 + 500))
        .map(i => s"item_$i").toDF("x"), "x", m = 64)
    val streamed = spark.read.parquet(
      s"$dir/v=${graft.streaming.StreamingDedup.latestVersion(spark, dir).get}")
    assert(whole.exceptAll(streamed).isEmpty && streamed.exceptAll(whole).isEmpty)
    // estimate over 2500 distinct within HLL's m=64 error envelope (~13% σ)
    val est = StreamingSketches.readHllEstimate(spark, dir, m = 64)
      .select("hll_est").as[Double].head()
    assert(math.abs(est - 2500.0) / 2500.0 < 0.4, s"est=$est")
    // keepVersions=2 pruned old versions: at most 2 complete + in-flight
    val kept = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName)
    assert(kept.length <= 3, kept.mkString(","))
  }

  test("batch replay after its version committed does not double-count (crash-window idempotence)") {
    // foreachBatch is at-least-once: in the crash window where v=batchId
    // committed but the streaming checkpoint did not, the batch re-runs
    // with its own output already on disk. Pre-fix the updater read the
    // ABSOLUTE latest version — folding the batch in twice and
    // overwriting the directory it was lazily reading. The strict-below
    // read must make the replay byte-identical instead.
    val dir = Files.createTempDirectory("cms_replay").toString
    val update = StreamingSketches.cmsUpdateBatch(dir, "token", d = 3, w = 1024)
    update(Seq.fill(5)("alpha").toDF("token"), 0L)
    update((Seq.fill(4)("alpha") ++ Seq.fill(7)("beta")).toDF("token"), 1L)
    def est() = StreamingSketches
      .readCmsEstimate(spark, dir, Seq("alpha", "beta").toDF("token"), "token", 3, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est() === Map("alpha" -> 9L, "beta" -> 7L))
    update((Seq.fill(4)("alpha") ++ Seq.fill(7)("beta")).toDF("token"), 1L) // replay batch 1
    assert(est() === Map("alpha" -> 9L, "beta" -> 7L)) // NOT 13/14
  }
}
