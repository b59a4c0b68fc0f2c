package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over the driver-provided Parquet dirs (TESTDATA.md) and any
  * engine-managed warehouse dir.
  *
  * Mirrors the role of the reference's schema bootstrap
  * (`clickhouse_manager.py:110-143`): a single place that knows where tables
  * live and with which normalized schema. Here that's schema-on-read Parquet
  * plus one normalization: nanosecond Parquet timestamps (which Spark's
  * µs-precision TimestampType cannot read natively) are read as raw longs via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncated to µs — the same
  * truncation DuckDB applies in `CAST(ts_ns AS TIMESTAMP)`, so oracle
  * comparisons line up exactly.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to a µs TimestampType (UTC session TZ).
    * The raw file stores TIMESTAMP(NANOS) which Spark rejects; we read it as
    * long and truncate ns → µs (floor division; all values are post-epoch).
    *
    * Optional bounds are applied in the raw ns-long domain BEFORE the
    * conversion: a predicate on the converted column cannot push through
    * the (monotone) conversion expression, but the equivalent ns bound on
    * the stored column reaches the Parquet scan (PushedFilters + row-group
    * stats pruning) — the same manual monotone-predicate injection the
    * yyyymm partition columns get (SURVEY.md §4 row 1).
    */
  def events(
      spark: SparkSession,
      dir: String,
      start: Option[String] = None,
      end: Option[String] = None
  ): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var raw = table(spark, dir, "events")
    // parse as UTC (matching the session TZ), not the JVM default zone
    def ns(s: String): Long = {
      val inst = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000000L + inst.getNano
    }
    start.foreach(s => raw = raw.filter(col("ts") >= ns(s)))
    end.foreach(e => raw = raw.filter(col("ts") < ns(e) + 1000)) // inclusive at µs
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
