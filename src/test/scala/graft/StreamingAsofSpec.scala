package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.streaming.StreamingGate

class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  /** Batch twin in the gate's (k, t, ord, v, rt, rv, rord) shape. */
  private def batchAsof(left: DataFrame, right: DataFrame): Array[String] =
    AsofJoin.leftAsof(left, right, on = Seq("k"),
        leftTime = "t", rightTime = "t",
        rightPayload = Seq("v", "ord"), suffix = "_r")
      .select(col("k"), col("t"), col("ord"), col("v"),
        col("t_r").as("rt"), col("v_r").as("rv"), col("ord_r").as("rord"))
      .orderBy("k", "t", "ord")
      .collect().map(_.toString)

  /** Gate output with the single-payload arrays unpacked back to scalars,
    * matching the batch twin's shape. */
  private def streamAsofDf(left: DataFrame, right: DataFrame): DataFrame =
    StreamingGate.asofAvailableNow(spark, left, right)
      .select(col("k"), col("t"), col("ord"), element_at(col("v"), 1).as("v"),
        col("rt"), element_at(col("rv"), 1).as("rv"), col("rord"))

  private def streamAsof(left: DataFrame, right: DataFrame): Array[String] =
    streamAsofDf(left, right).collect().map(_.toString)

  test("streaming as-of equals the batch operator on real event data") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    def side(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("value").as("v"), col("event_id").as("ord"))
    val left = side("purchase")
    val right = side("click")
    val b = batchAsof(left, right)
    val s = streamAsof(left, right)
    assert(b.length == left.count() && s.length == b.length,
      s"row counts: batch ${b.length}, stream ${s.length}")
    assert(s.sameElements(b))
  }

  test("left rows before any right are NULL-filled; inclusive tR == tL; max-payload tie") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    val left = df(Seq(
      (7L, "2024-01-10 09:00:00", 1.0, 1L),   // before every right → NULLs
      (7L, "2024-01-10 10:00:00", 2.0, 2L),   // tL == tR of two rights (tie)
      (7L, "2024-01-10 11:00:00", 3.0, 3L),   // after both
      (9L, "2024-01-10 10:30:00", 4.0, 4L)))  // other key: only its own rights
    val right = df(Seq(
      (7L, "2024-01-10 10:00:00", 10.0, 11L), // equal-time pair: max (v, ord)
      (7L, "2024-01-10 10:00:00", 20.0, 12L), //   → this one must win
      (9L, "2024-01-10 10:15:00", 30.0, 13L)))
    val b = batchAsof(left, right)
    val s = streamAsof(left, right)
    assert(s.sameElements(b))
    // spot-pin the semantics themselves, not just twin agreement
    val byOrd = streamAsofDf(left, right)
      .collect().map(r => r.getLong(2) -> r).toMap
    assert(byOrd(1L).isNullAt(4) && byOrd(1L).isNullAt(5) && byOrd(1L).isNullAt(6))
    assert(byOrd(2L).getDouble(5) == 20.0 && byOrd(2L).getLong(6) == 12L)
    assert(byOrd(3L).getDouble(5) == 20.0)
    assert(byOrd(4L).getDouble(5) == 30.0 && byOrd(4L).getLong(6) == 13L)
  }

  test("streaming medallion chain reproduces the 27-column enriched bars exactly") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    def ticks(tpe: String) = e.filter(col("event_type") === tpe)
      .select(
        when(col("user_id") % 2 === 0, "EURUSD").otherwise("GBPUSD").as("instrument"),
        col("ts").as("timestamp"),
        (floor(col("value") * 64) / 64).as("bid"),
        (floor(col("value") * 64) / 64 + lit(0.25) * (lit(1) + col("event_id") % 3)).as("ask"))
    val raw = ticks("purchase")
    val std = ticks("click")
    val batch = graft.ohlc.OhlcGenerator.generate(raw, std)
      .orderBy("instrument", "timestamp").collect().map(_.toString)
    val stream = StreamingGate
      .ohlcEnrichedAvailableNow(spark, raw, std, Seq("EURUSD", "GBPUSD"))
      .collect().map(_.toString)
    assert(stream.length == batch.length,
      s"bar counts: batch ${batch.length}, stream ${stream.length}")
    assert(stream.sameElements(batch))
  }

  test("concurrent gates serialize the shuffle-partition override and restore it exactly") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def side(n: Long) = spark.range(n).selectExpr("id % 7 AS k",
      "timestamp_seconds(1704067200 + id * 60) AS t",
      "CAST(id AS DOUBLE) AS v", "id AS ord")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two gates racing on the shared session: without the gate lock their
    // read-set/restore could interleave and leave the session at 8
    val fs = (1 to 2).map { _ =>
      Future(StreamingGate.asofAvailableNow(spark, side(200), side(200)).count())
    }
    val counts = Await.result(Future.sequence(fs), 10.minutes)
    assert(counts === Seq(200L, 200L))
    assert(spark.conf.get(key) === prev,
      s"shuffle partitions not restored after concurrent gates: ${spark.conf.get(key)}")
  }

  test("an instrument missing from the code map fails loudly instead of dropping its bars") {
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    def ticks(tpe: String) = e.filter(col("event_type") === tpe)
      .select(
        when(col("user_id") % 2 === 0, "EURUSD").otherwise("GBPUSD").as("instrument"),
        col("ts").as("timestamp"),
        col("value").as("bid"), (col("value") + 0.1).as("ask"))
    // GBPUSD rows are present but unmapped: the batch twin would emit its
    // bars, so the gate must refuse rather than silently filter them out.
    // The refusal is LAZY (r17): it fires from the encode expression when
    // the first unmapped row is processed — a task failure naming the
    // instrument — instead of an up-front distinct().collect() pre-scan
    // of both full inputs (which a production unbounded stream can't pay)
    val ex = intercept[Exception] {
      StreamingGate.ohlcEnrichedAvailableNow(
        spark, ticks("purchase"), ticks("click"), Seq("EURUSD"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("GBPUSD")),
      s"failure must name the unmapped instrument: ${messages(ex).mkString(" | ")}")
  }

  test("arrival order independence: random file splits, out-of-order batches") {
    // rows land in micro-batches in RANDOM order (each file is a batch,
    // maxFilesPerTrigger=1); with a watermark delay covering the full
    // disorder nothing is late, so any arrival schedule must produce the
    // batch answer. Exercises multi-batch buffering, cross-batch carry,
    // and compaction under schedules the happy-path tests never hit.
    val rnd = new scala.util.Random(42)
    val e = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") % 7 === 0) // small but multi-key slice
    def side(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("value").as("v"), col("event_id").as("ord"))
    val left = side("purchase")
    val right = side("click")
    val expected = batchAsof(left, right)

    // replicate the gate inline, but with the union split into 4 shuffled
    // files and a span-wide watermark so disorder is never "late"
    import graft.streaming.StreamingAsof
    val root = java.nio.file.Files.createTempDirectory("asof_prop").toString
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    def tag(df: DataFrame, s: Int) = df.select(col("k").cast("long"),
      col("t").cast("timestamp"), lit(s).as("side"),
      array(col("v").cast("double")).as("v"), col("ord").cast("long"))
    val union = tag(left, 1).unionByName(tag(right, 0))
      .withColumn("__shard", (rand(7) * 4).cast("int"))
    (0 until 4).foreach { i =>
      union.filter(col("__shard") === i).drop("__shard")
        .coalesce(1).write.mode("append").parquet(in)
    }
    val files = new java.io.File(in).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    rnd.shuffle(files.toSeq).zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(System.currentTimeMillis() - 600000L + i * 60000L) }
    val maxTs = union.agg(max("t")).head().getTimestamp(0)
    val minTs = union.agg(min("t")).head().getTimestamp(0)
    val spanMin = (maxTs.getTime - minTs.getTime) / 60000L + 10L
    // flush sentinel: one far-future right on the reserved key space
    spark.range(1).select(lit(Long.MinValue).as("k"),
        lit(new java.sql.Timestamp(maxTs.getTime + 2 * spanMin * 60000L)).as("t"),
        lit(0).as("side"), array(lit(0.0)).as("v"), lit(0L).as("ord"))
      .coalesce(1).write.mode("append").parquet(in)
    new java.io.File(in).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .filterNot(f => files.exists(_.getName == f.getName))
      .foreach(_.setLastModified(System.currentTimeMillis()))

    import spark.implicits._
    val stream = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .withWatermark("t", s"$spanMin minutes")
      .as[StreamingAsof.In]
    val q = StreamingAsof.leftAsofStream(stream).toDF().writeStream
      .outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out).filter(col("k") =!= Long.MinValue)
      .select(col("k"), col("t"), col("ord"), element_at(col("v"), 1).as("v"),
        col("rt"), element_at(col("rv"), 1).as("rv"), col("rord"))
      .orderBy("k", "t", "ord").collect().map(_.toString)
    assert(got.length == expected.length,
      s"rows: stream ${got.length}, batch ${expected.length}")
    assert(got.sameElements(expected))
  }

  test("degenerate inputs: empty left, right-only, and NULL key/time rows match batch semantics") {
    def df(rows: Seq[(java.lang.Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    val someRight = df(Seq((1L: java.lang.Long, "2024-03-01 10:00:00", 5.0, 9L)))
    val empty = df(Nil)

    // empty left, non-empty right: zero output rows, no crash
    assert(StreamingGate.asofAvailableNow(spark, empty, someRight).count() == 0)
    // both sides empty: zero rows, schema intact
    val both = StreamingGate.asofAvailableNow(spark, empty, empty)
    assert(both.count() == 0 && both.columns.sameElements(
      Array("k", "t", "ord", "v", "rt", "rv", "rord")))
    // empty raw side through the full chain: empty 27-column frame
    val emptyTicks = empty.select(lit("EURUSD").as("instrument"),
      col("t").as("timestamp"), col("v").as("bid"), col("v").as("ask"))
    val chain = StreamingGate.ohlcEnrichedAvailableNow(
      spark, emptyTicks, emptyTicks, Seq("EURUSD"))
    assert(chain.count() == 0 && chain.columns.length == 27)

    // NULL key / NULL time lefts: NULL-filled like the batch twin, not a
    // crash at the primitive-key encoder; NULL-time rights dropped
    val left = df(Seq(
      (null, "2024-03-01 10:30:00", 1.0, 1L),                 // NULL key
      (1L: java.lang.Long, null, 2.0, 2L),                    // NULL time
      (1L: java.lang.Long, "2024-03-01 10:30:00", 3.0, 3L)))  // real match
    val right = someRight.unionByName(
      df(Seq((1L: java.lang.Long, null, 7.0, 8L))))           // NULL-time right
    val got = streamAsofDf(left, right).collect()
      .map(r => r.getLong(2) -> r).toMap
    assert(got.size == 3)
    assert(got(1L).isNullAt(4) && got(1L).isNullAt(6), "NULL key → NULL fill")
    assert(got(2L).isNullAt(4) && got(2L).isNullAt(6), "NULL time → NULL fill")
    assert(got(3L).getLong(6) == 9L, "real row matches the real right only")
    val b = batchAsof(left, right)
    assert(streamAsof(left, right).sameElements(b), "twin agreement incl. NULLs")
  }

  test("state compacts to ONE carry right per key once lefts flush (bounded state)") {
    import graft.streaming.StreamingAsof
    // 200 keys × (20 lefts + 20 rights) over an hour: once the sentinels
    // flush every left, surviving state must be the rights-only carry —
    // one row per key in the state store, INDEPENDENT of input volume
    // (8000 input rows → ≤ 201 state rows). This is the claim that makes
    // the operator a keyed-aggregate-class citizen at 100 TB.
    val n = 200
    val src = spark.range(n * 40).selectExpr(
      s"id % $n as k",
      s"timestamp_micros(1704067200000000 + (id div $n) * 90000000) as t",
      s"cast(if(id % 2 = 0, 1, 0) as int) as side",
      "array(cast(id as double)) as v",
      "id as ord")
    val root = java.nio.file.Files.createTempDirectory("asof_state").toString
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    val maxTs = src.agg(max("t")).head().getTimestamp(0)
    def sentinel(plusMin: Int) = spark.range(1).select(
      lit(Long.MinValue).as("k"),
      lit(new java.sql.Timestamp(maxTs.getTime + plusMin * 60000L)).as("t"),
      lit(0).as("side"), array(lit(0.0)).as("v"), lit(0L).as("ord"))
    val t0 = System.currentTimeMillis() - 600000L
    Seq(src, sentinel(10), sentinel(20)).zipWithIndex.foreach { case (d, i) =>
      d.coalesce(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          f.lastModified() > t0 + i * 60000L)
        .foreach(_.setLastModified(t0 + i * 60000L))
    }
    import spark.implicits._
    val stream = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .withWatermark("t", "2 minutes")
      .as[StreamingAsof.In]
    val q = StreamingAsof.leftAsofStream(stream).toDF().writeStream
      .outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.read.parquet(out).filter(col("k") =!= Long.MinValue).count()
    assert(emitted == n * 20, s"every left must flush: $emitted of ${n * 20}")
    val finalState = q.recentProgress
      .filter(_.stateOperators.nonEmpty).last.stateOperators.head.numRowsTotal
    assert(finalState <= n + 1,
      s"state must compact to ≤ ${n + 1} carry rows, found $finalState")
  }

  test("late-row contract: pending lefts merge late rights; emitted rows are immutable") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    import graft.streaming.StreamingAsof
    def run(batches: Seq[DataFrame]): Array[org.apache.spark.sql.Row] = {
      val root = java.nio.file.Files.createTempDirectory("asof_late").toString
      val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
      val t0 = System.currentTimeMillis() - 600000L
      batches.zipWithIndex.foreach { case (d, i) =>
        d.coalesce(1).write.mode("append").parquet(in)
        new java.io.File(in).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
            f.lastModified() > t0 + i * 60000L)
          .foreach(_.setLastModified(t0 + i * 60000L))
      }
      import spark.implicits._
      val stream = spark.readStream.schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .withWatermark("t", "2 minutes")
        .as[StreamingAsof.In]
      val q = StreamingAsof.leftAsofStream(stream).toDF().writeStream
        .outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).filter(col("k") =!= Long.MinValue).collect()
    }
    def tag(df0: DataFrame, s: Int) = df0.select(col("k").cast("long"),
      col("t").cast("timestamp"), lit(s).as("side"),
      array(col("v").cast("double")).as("v"), col("ord").cast("long"))
    def sentinel(hhmm: String) =
      tag(df(Seq((Long.MinValue, s"2024-03-01 $hhmm:00", 0.0, 0L))), 0)

    // (a) a right BELOW the watermark arrives while its left is still
    // PENDING: flatMapGroupsWithState admits late rows (no engine
    // pre-filter — this pin documents that Spark behavior) and the merge
    // matches it — better than dropping.
    val gotA = run(Seq(
      tag(df(Seq((1L, "2024-03-01 10:00:00", 1.0, 1L))), 1), // left, wm→09:58
      tag(df(Seq((1L, "2024-03-01 09:00:00", 5.0, 5L))), 0), // late right, left pending
      sentinel("18:00"), sentinel("19:00")))
    assert(gotA.length == 1)
    assert(gotA.head.getAs[Long]("rord") == 5L,
      "a late right must still match a PENDING left")

    // (b) the left was already FINALIZED (NULL-filled) when the late right
    // arrives: the emitted row is immutable — no retraction, no duplicate.
    val gotB = run(Seq(
      tag(df(Seq((1L, "2024-03-01 10:00:00", 1.0, 1L))), 1)
        .unionByName(tag(df(Seq((1L, "2024-03-01 12:00:00", 9.0, 9L))), 0)),
      sentinel("18:00"), // wm→11:58 during this batch: left emits NULL-filled
      tag(df(Seq((1L, "2024-03-01 09:00:00", 5.0, 5L))), 0), // too late: left emitted
      sentinel("19:00")))
    assert(gotB.length == 1, s"no duplicate emission: ${gotB.length} rows")
    assert(gotB.head.isNullAt(gotB.head.fieldIndex("rt")),
      "the already-emitted row must stay NULL-filled (append: no retraction)")
  }

  test("rightTtlMs evicts idle carries; a post-eviction left NULL-fills (documented contract)") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    import graft.streaming.StreamingAsof
    def run(ttl: Option[Long]): Array[org.apache.spark.sql.Row] = {
      val root = java.nio.file.Files.createTempDirectory("asof_ttl").toString
      val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
      def tag(df0: DataFrame, s: Int) = df0.select(col("k").cast("long"),
        col("t").cast("timestamp"), lit(s).as("side"),
        array(col("v").cast("double")).as("v"), col("ord").cast("long"))
      def sentinel(hhmm: String) =
        tag(df(Seq((Long.MinValue, s"2024-03-01 $hhmm:00", 0.0, 0L))), 0)
      val batches = Seq(
        tag(df(Seq((1L, "2024-03-01 10:00:00", 5.0, 5L))), 0), // carry for k1
        tag(df(Seq((2L, "2024-03-01 12:00:00", 0.0, 6L))), 0), // churn: wm -> 11:58
        tag(df(Seq((2L, "2024-03-01 12:10:00", 0.0, 7L))), 0), // k1 TTL timeout fires here
        tag(df(Seq((1L, "2024-03-01 12:20:00", 1.0, 1L))), 1), // left AFTER eviction
        sentinel("18:00"), sentinel("19:00"))
      val t0 = System.currentTimeMillis() - 600000L
      batches.zipWithIndex.foreach { case (d, i) =>
        d.coalesce(1).write.mode("append").parquet(in)
        new java.io.File(in).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
            f.lastModified() > t0 + i * 60000L)
          .foreach(_.setLastModified(t0 + i * 60000L))
      }
      import spark.implicits._
      val stream = spark.readStream.schema(spark.read.parquet(in).schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .withWatermark("t", "2 minutes")
        .as[StreamingAsof.In]
      val q = StreamingAsof.leftAsofStream(stream, ttl).toDF().writeStream
        .outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).filter(col("k") === 1L).collect()
    }
    // TTL 30 min: the 10:00 carry is > 30 min behind the watermark when
    // the churn batches advance it, so the eviction timeout fires before
    // the 12:20 left arrives — that left NULL-fills, per the contract
    val evicted = run(Some(30L * 60000L))
    assert(evicted.length == 1)
    assert(evicted.head.isNullAt(evicted.head.fieldIndex("rt")),
      "a left arriving after its key's TTL eviction must NULL-fill")
    // no TTL: the carry survives the quiet spell and the same left matches
    val kept = run(None)
    assert(kept.length == 1)
    assert(kept.head.getAs[Long]("rord") == 5L,
      "without a TTL the carry must survive indefinitely")
  }

  test("lefts inside the trailing watermark window still flush (sentinel path)") {
    def df(rows: Seq[(Long, String, Double, Long)]) =
      rows.toDF("k", "ts", "v", "ord")
        .select(col("k"), col("ts").cast("timestamp").as("t"), col("v"), col("ord"))
    // every left within 2 minutes of the stream max: nothing would emit
    // without the sentinel-driven timeout flush
    val left = df(Seq(
      (1L, "2024-03-01 12:00:00", 1.0, 1L),
      (1L, "2024-03-01 12:00:30", 2.0, 2L),
      (1L, "2024-03-01 12:01:00", 3.0, 3L)))
    val right = df(Seq((1L, "2024-03-01 12:00:10", 5.0, 9L)))
    val s = streamAsof(left, right)
    assert(s.length == 3)
    assert(s.sameElements(batchAsof(left, right)))
  }
}
