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

  test("the stage root is per-process, and cleanup sweeps only DEAD siblings") {
    // r18 review: a machine-shared root let one JVM's end-of-run sweep
    // delete fixtures a concurrent JVM was mid-scan over. Per-process
    // roots have no cross-JVM interactions; crash-stranded roots of dead
    // processes are swept by the next cleanup.
    val pid = java.lang.ProcessHandle.current.pid
    val (dir, _) = fixture("spec-pid")
    assert(dir.contains(s"graft-stage-$pid"),
      s"staged dir $dir must live under this process's own root")
    val tmpBase = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    // a stranded root of a provably-dead pid (beyond pid_max) is swept...
    val dead = new java.io.File(tmpBase, "graft-stage-999999999")
    dead.mkdirs()
    java.nio.file.Files.writeString(
      dead.toPath.resolve("leftover.txt"), "stranded")
    // ...while a LIVE sibling survives (pid 1 = init, alive on any Linux;
    // skip the assertion in the unlikely case the handle isn't visible)
    val live = new java.io.File(tmpBase, "graft-stage-1")
    val oneAlive = java.lang.ProcessHandle.of(1L)
      .map[Boolean](_.isAlive).orElse(false)
    if (oneAlive) live.mkdirs()
    Stage.cleanup()
    assert(!dead.exists(), "dead-pid stage root must be swept")
    assert(!new java.io.File(dir).exists(), "own root must be swept")
    if (oneAlive) {
      assert(live.exists(), "a live sibling's stage root must survive")
      live.delete()
    }
  }

  test("stageFixtures narrowed to a selection stages only what it needs") {
    // r18 review: a single-query profiling run must not pay five fixture
    // builds for a query that touches none of them
    val pid = java.lang.ProcessHandle.current.pid
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-stage-$pid")
    Stage.cleanup()
    SparkEntry.stageFixtures(spark, "/root/testdata/sf0.001",
      forQueries = Some(Set("q1_pricing", "q_ohlc_1m")))
    val staged = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    assert(staged.isEmpty,
      s"no selected query uses a staged fixture, yet built: ${staged.mkString(", ")}")
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
