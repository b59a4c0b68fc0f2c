package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable per-group bloom sketch over a column's `xxhash64` values,
  * for the manifest sidecar's point-lookup file index
  * ([[graft.storage.Manifest.build]] `bloomCols`): one bloom per data
  * file rides the SAME single stats scan as the min/max zone maps, so a
  * point predicate (`col = v`, `col IN (…)`) can prune FILES driver-side
  * on layouts where ranges prove nothing — the canonical case is a
  * hash-clustered (bucketed) table, where every file spans nearly the
  * full value range but each value lives in exactly one file.
  *
  * Built on Spark's own mergeable `util.sketch.BloomFilter` (the
  * `DataFrame.stat.bloomFilter` sketch) wrapped in a typed [[Aggregator]]
  * so it can ride an untyped `groupBy(input_file_name())` via
  * [[org.apache.spark.sql.functions.udaf]]. Elements are the column's
  * `xxhash64` hashes (not raw values), so one Long-typed aggregator
  * serves every column type and the query side only needs to reproduce
  * Spark's hash for a literal ([[graft.storage.PrunedScan.sparkHash64]]).
  * NULLs are skipped: an equality can never match NULL, so a bloom
  * without them prunes all-NULL files for free.
  */
object BloomSketch {

  /** Aggregator: input = pre-hashed element (nullable), buffer = the
    * mergeable sketch, output = base64 of the serialized sketch (JSON
    * sidecar friendly). All buffers are created with identical
    * (expectedItems, fpp), so `mergeInPlace` never sees an incompatible
    * pair. A file with MORE distinct values than `expectedItems`
    * saturates toward all-positive — pruning degrades to reading the
    * file, never to losing it.
    */
  final class Agg(expectedItems: Long, fpp: Double)
      extends Aggregator[java.lang.Long, BloomFilter, String] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    override def reduce(b: BloomFilter, a: java.lang.Long): BloomFilter = {
      if (a != null) b.putLong(a.longValue())
      b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    override def finish(r: BloomFilter): String = {
      val bos = new java.io.ByteArrayOutputStream()
      r.writeTo(bos)
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Base64 bloom of `xxhash64(c)` over the group's non-NULL values. */
  def agg(c: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new Agg(expectedItems, fpp), Encoders.LONG)(xxhash64(c))

  /** Decode a sketch serialized by [[Agg.finish]]. */
  def decode(base64: String): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(base64)))
}
