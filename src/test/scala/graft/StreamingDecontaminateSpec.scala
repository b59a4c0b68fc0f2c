package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDecontaminate
import graft.text.MinHash

class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed decontamination equals one-shot batch decontaminate over the union") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "an unrelated benchmark prompt about thermodynamics and entropy laws"))
      .toDF("doc_id", "text")
    val prep = StreamingDecontaminate.prepare(benchmark, "doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("decontam").toString

    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "a clean document about cooking pasta with garlic and fresh olive oil"))
    val batch2 = Seq(
      (3L, "an unrelated benchmark prompt about thermodynamics and entropy laws indeed"),
      (4L, "spark structured streaming maintains operator state across micro batches"))

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingDecontaminate.sink(prep, "doc_id", "text", out, threshold = 0.5))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("decontam_ck").toString)
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    // contaminated: 1 (near-dup of bench 100), 3 (near-dup of bench 101)
    assert(streamed === Set(2L, 4L))
    // and the streamed result matches the batch operator over the union
    val oneShot = MinHash.decontaminate(
        (batch1 ++ batch2).toDF("doc_id", "text"), benchmark,
        "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === oneShot)
    prep.unpersist()
  }

  test("replayed batch overwrites its own partition (idempotent output)") {
    val benchmark = Seq((100L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val prep = StreamingDecontaminate.prepare(benchmark, "doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("decontam2").toString
    val sink = StreamingDecontaminate.sink(prep, "doc_id", "text", out, threshold = 0.5)
    val batch = Seq((5L, "totally clean text with many distinct words here")).toDF("doc_id", "text")
    // per-trigger cache hygiene: every batch's pinned frames (shingles +
    // hit-id checkpoint) must be released when the sink returns, or a
    // long-running stream accumulates dead blocks trigger by trigger
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    sink(batch, 0L)
    sink(batch, 0L) // replay of the same batch id
    assert(spark.read.parquet(out).count() === 1)
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(cachedBefore),
      "sink must not leak cached RDDs across triggers")
    prep.unpersist()
  }
}
