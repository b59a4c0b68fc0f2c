package graft

import java.io.File

/** Build-once staging for query fixtures that are derived WAREHOUSE
  * LAYOUTS (a ticks warehouse written through the ingest path, a
  * z-ordered export): the timed query body must measure the pruned SCAN,
  * not the fixture write (r17 verdict item 3 — the old form rebuilt the
  * fixture inside the timed body into a fresh never-deleted temp dir on
  * every call, so the recorded walls were write-dominated and a scan
  * regression could hide under write noise).
  *
  * Fixtures are keyed on (name, source dir) under ONE fixed root, so
  * repeated runs reuse instead of strand: build into a hidden `.build`
  * sibling first, atomically rename into place, then drop a `_STAGED`
  * marker — a crashed/partial build is never mistaken for a finished one
  * (the ScaleProbe skip-if-exists lesson: key the guard on a marker the
  * build writes LAST, not on the directory existing). [[Bench]] and
  * [[Verify]] sweep the root when they finish, so a full pass leaves no
  * stranded /tmp dirs.
  */
object Stage {

  private val root = new File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-stage")

  private def keyDir(name: String, srcDir: String): File = {
    // deterministic per source dir (sf0.001 and sf0.01 fixtures coexist);
    // String.hashCode is spec-fixed across JVMs
    val h = Integer.toHexString(srcDir.hashCode)
    new File(root, s"$name-$h")
  }

  /** Returns the staged fixture directory for (name, srcDir), building it
    * with `build` on first use. `build` receives the path to write into;
    * the path only becomes visible under the final name once the build
    * completed.
    */
  def staged(name: String, srcDir: String)(build: String => Unit): String = {
    val target = keyDir(name, srcDir)
    val marker = new File(target, "_STAGED")
    if (marker.isFile) return target.getAbsolutePath
    // stale partial state (crashed run): rebuild from scratch
    if (target.exists()) deleteRecursively(target)
    // NOT dot-prefixed: Spark's file listing ignores dot-paths even when
    // one is the READ ROOT, so a builder that reads back what it wrote
    // (Manifest.write) would see zero files inside a hidden dir and ship
    // an empty sidecar — pruning then silently degrades to full scans.
    // Nothing lists the stage root as a table, so visibility is moot;
    // the `_STAGED` marker, not the name, is the done signal. Unique per
    // process+call: two JVMs staging the same fixture concurrently (a
    // driver Verify beside a local test run) must never build into one
    // shared tmp dir — the rename race below picks a winner instead.
    val tmp = new File(root,
      s"${target.getName}.build-${java.lang.ProcessHandle.current.pid}-${System.nanoTime()}")
    if (tmp.exists()) deleteRecursively(tmp)
    tmp.mkdirs()
    build(tmp.getAbsolutePath)
    if (!tmp.renameTo(target)) {
      // lost a cross-process race: the winner's marker decides (it lands
      // a moment after the winner's rename — wait it out briefly)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!marker.isFile && System.nanoTime() < deadline) Thread.sleep(100)
      if (!marker.isFile)
        sys.error(s"could not move staged fixture into place: $target")
      deleteRecursively(tmp)
      return target.getAbsolutePath
    }
    if (!marker.createNewFile() && !marker.isFile)
      sys.error(s"could not write stage marker: $marker")
    target.getAbsolutePath
  }

  /** A fresh scratch dir under the stage root, for queries whose WRITE is
    * the thing being measured (format round-trips) — not memoized, but
    * swept with everything else by [[cleanup]] instead of stranding a new
    * /tmp dir per call.
    */
  def scratch(name: String): String = {
    root.mkdirs()
    // not dot-prefixed (same Spark dot-path-root caveat as in staged)
    java.nio.file.Files
      .createTempDirectory(root.toPath, s"$name-scratch-")
      .toString
  }

  /** Remove every staged fixture (the end-of-run sweep). */
  def cleanup(): Unit = if (root.exists()) deleteRecursively(root)

  private def deleteRecursively(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
  }
}
