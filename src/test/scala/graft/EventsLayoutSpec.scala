package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The r7 incident class, pinned as an invariance: the SAME logical events
  * land in all three physical `ts` layouts the driver has generated
  * (ns-BIGINT, TIMESTAMP_NTZ µs, instant-adjusted TIMESTAMP µs), and
  * `Tables.events` must read them to IDENTICAL rows — same values, same
  * µs TimestampType schema — with and without range bounds.
  */
class EventsLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def writeLayouts(): (String, String, String) = {
    // 500 logical events: 2024-03-01T00:00:00Z + i * 97s + i µs (odd
    // sub-second µs exercise the truncation-free µs paths; the ns layout
    // carries extra sub-µs ns that floor away)
    val base = spark.range(500).select(
      col("id").as("event_id"),
      (lit(1709251200000000L) + col("id") * 97000000L + col("id")).as("us"),
      (col("id") % 9).as("user_id"),
      when(col("id") % 2 === 0, "purchase").otherwise("click").as("event_type"),
      (col("id") * 0.25).as("value"),
      lit("{}").as("props"))

    val nsDir = java.nio.file.Files.createTempDirectory("ev_ns").toString
    base.withColumn("ts", col("us") * 1000 + 999) // sub-µs ns that must floor away
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nsDir/events.parquet")

    val ntzDir = java.nio.file.Files.createTempDirectory("ev_ntz").toString
    base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    val usDir = java.nio.file.Files.createTempDirectory("ev_us").toString
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try base.withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")
    finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    (nsDir, ntzDir, usDir)
  }

  test("all three physical ts layouts read to identical rows (the r7 failure class)") {
    val (nsDir, ntzDir, usDir) = writeLayouts()
    def rows(dir: String) = {
      val df = graft.catalog.Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"$dir: ${df.schema("ts")}")
      df.orderBy("event_id").collect().map(_.toSeq).toSeq
    }
    val (a, b, c) = (rows(nsDir), rows(ntzDir), rows(usDir))
    assert(a.size == 500)
    assert(a == b, "ns-long layout diverges from NTZ-us layout")
    assert(b == c, "NTZ-us layout diverges from instant-us layout")
  }

  test("range bounds select the same slice in every layout") {
    val (nsDir, ntzDir, usDir) = writeLayouts()
    val start = Some("2024-03-01 03:00:00")
    val end = Some("2024-03-01 08:30:00")
    def slice(dir: String) = graft.catalog.Tables
      .events(spark, dir, start, end)
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val (a, b, c) = (slice(nsDir), slice(ntzDir), slice(usDir))
    assert(a.nonEmpty && a.size < 500, s"bounds not selective: ${a.size}")
    assert(a == b && b == c)
    // and the slice equals a post-hoc filter over the unbounded read
    val post = graft.catalog.Tables.events(spark, ntzDir)
      .filter(col("ts") >= lit(start.get).cast("timestamp") &&
        col("ts") <= lit(end.get).cast("timestamp"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a == post)
  }

  test("ns-long bounds honor trunc-toward-zero on pre-epoch raws") {
    // raw ns in [-999, -1] truncate (toward zero) to µs 0 = 1970-01-01
    // 00:00:00.000000 exactly — a start bound of that instant must KEEP
    // them (the plain raw >= 0 form dropped them), and an end bound one µs
    // earlier must EXCLUDE them
    val dir = java.nio.file.Files.createTempDirectory("ev_preepoch").toString
    spark.range(4).select(
      col("id").as("event_id"),
      // raws: -1500 (µs -1), -500 (µs 0), 0 (µs 0), 1500 (µs 1)
      (col("id") * 1000L - 1500L).as("ts"),
      lit(0L).as("user_id"), lit("click").as("event_type"),
      lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def ids(start: Option[String], end: Option[String]) =
      graft.catalog.Tables.events(spark, dir, start, end)
        .select("event_id").orderBy("event_id")
        .collect().map(_.getLong(0)).toSeq
    assert(ids(Some("1970-01-01 00:00:00"), None) === Seq(1L, 2L, 3L))
    assert(ids(None, Some("1969-12-31 23:59:59.999999")) === Seq(0L))
    // converted values agree with the bounds story
    val all = graft.catalog.Tables.events(spark, dir)
      .select("event_id", "ts").orderBy("event_id")
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(all(1L) === 0L && all(2L) === 0L) // both land on the epoch µs
  }
}
