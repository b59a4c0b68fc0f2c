package graft.storage

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet table directories.
  *
  * Streaming sinks, incremental month-partition updates, and per-executor
  * writers all accrete files far below the ~128 MB scan-split sweet spot;
  * at 100 TB the resulting listing+open overhead dominates scan time and
  * the NameNode/object-store metadata load grows unbounded. Compaction
  * rewrites a directory into ceil(bytes / target) files.
  *
  * The rewrite uses `repartition(n)` (round-robin, even output sizes) —
  * or `repartitionByRange(n, keys)` when sort keys are given, preserving
  * the range-clustered layout [[RangeWriter]] produces so row-group
  * min/max pruning keeps working after compaction.
  *
  * Safety: writes to a sibling temp dir first, then atomically swaps via
  * rename — a crash mid-compact leaves the original directory intact.
  */
object Compactor {

  /** @return number of output files written */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortKeys: Seq[String] = Nil
  ): Int = {
    val d = new File(dir)
    require(d.isDirectory, s"$dir is not a directory")
    val bytes = d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val out =
      if (sortKeys.nonEmpty)
        df.repartitionByRange(n, sortKeys.map(col): _*)
          .sortWithinPartitions(sortKeys.map(col): _*)
      else df.repartition(n)
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    out.write.mode("overwrite").parquet(tmp)
    val bak = dir.stripSuffix("/") + ".compact-old"
    val bakF = new File(bak)
    if (bakF.exists()) { def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(bakF) }
    if (!d.renameTo(bakF)) sys.error(s"could not move $dir aside")
    if (!new File(tmp).renameTo(d)) {
      bakF.renameTo(d) // roll back
      sys.error(s"could not move compacted dir into place")
    }
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    rm(bakF)
    n
  }
}
