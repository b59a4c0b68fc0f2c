package graft

import org.apache.spark.sql.functions._

import graft.storage.{Manifest, PrunedScan, RangeWriter}

/** Pins for [[Stage]] — the bench/verify fixture staging (r17 verdict
  * item 3): build-once reuse, crash recovery, and (the regression that
  * nearly shipped) a builder that reads back what it wrote must see its
  * own files — a dot-prefixed build dir is invisible to Spark's listing
  * even as the read root, so Manifest.write inside it ships an EMPTY
  * sidecar and pruning silently degrades to full scans.
  */
class StageSpec extends SparkSpec {

  private def fixture(name: String): (String, java.util.concurrent.atomic.AtomicInteger) = {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val src = java.nio.file.Files.createTempDirectory("graft_stage_src").toString
    def build(t: String): Unit = {
      builds.incrementAndGet()
      val df = spark.range(1000).select(
        col("id").as("k"), (col("id") * 3).as("v"))
      RangeWriter.writeSorted(df, t, Seq("k"), numFiles = 8)
      Manifest.write(spark, t, "k")
    }
    val d1 = Stage.staged(name, src)(build)
    val d2 = Stage.staged(name, src)(build)
    assert(d1 === d2)
    (d1, builds)
  }

  test("staged fixtures build once, and the built manifest actually prunes") {
    val (dir, builds) = fixture("spec-prune")
    assert(builds.get() === 1, "second staged() call must reuse, not rebuild")
    val total = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(total === 8)
    val pruned = PrunedScan.readRange(spark, dir, "k", 100L, 200L)
    assert(pruned.count() === 101)
    // THE pin: the sidecar written inside the build dir must describe the
    // staged files (non-empty, fresh), so the zone map plans a strict
    // subset — an invisible build dir would fall back to all 8 files
    assert(pruned.inputFiles.length < total,
      s"staged manifest did not prune: ${pruned.inputFiles.length} of $total files planned")
    Stage.cleanup()
  }

  test("a crashed partial build (no marker) is rebuilt from scratch") {
    val src = java.nio.file.Files.createTempDirectory("graft_stage_src2").toString
    var first = true
    def build(t: String): Unit = {
      if (first) { first = false; sys.error("simulated crash mid-build") }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(t, "data.txt"), "done")
    }
    intercept[RuntimeException](Stage.staged("spec-crash", src)(build))
    val dir = Stage.staged("spec-crash", src)(build)
    assert(new java.io.File(dir, "_STAGED").isFile)
    assert(new java.io.File(dir, "data.txt").isFile)
    Stage.cleanup()
  }
}
