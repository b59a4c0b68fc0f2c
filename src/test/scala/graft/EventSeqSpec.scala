package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventSeq

class EventSeqSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- anchoredFunnel -----------------------------------------------------

  private lazy val funnelLog = Seq(
    // user 1 completes v → c → p within window
    (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
    (1L, 2L, ts("2024-01-01 01:00:00"), "click"),
    (1L, 3L, ts("2024-01-01 02:00:00"), "purchase"),
    // user 2: click BEFORE first view doesn't count; no click after
    (2L, 4L, ts("2024-01-01 00:00:00"), "click"),
    (2L, 5L, ts("2024-01-01 01:00:00"), "view"),
    (2L, 6L, ts("2024-01-01 02:00:00"), "purchase"),
    // user 3: chain complete but purchase falls outside the window
    (3L, 7L, ts("2024-01-01 00:00:00"), "view"),
    (3L, 8L, ts("2024-01-01 01:00:00"), "click"),
    (3L, 9L, ts("2024-01-03 00:00:00"), "purchase"),
    // user 4: never enters the funnel
    (4L, 10L, ts("2024-01-01 00:00:00"), "purchase")
  ).toDF("user_id", "event_id", "ts", "event_type")

  test("anchored funnel: ordering and window constraints gate each level") {
    val got = EventSeq.anchoredFunnel(funnelLog, "user_id", "ts",
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"), windowSec = 86400L)
      .orderBy("uid").select("uid", "level")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 3), (2L, 1), (3L, 2)))
  }

  test("anchored funnel anchors at the EARLIEST step-1 event") {
    // second view at 02:00 would make the click reachable, but the anchor
    // is the first view and the window closed 1h after it
    val l = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 02:00:00"), "view"),
      (1L, 3L, ts("2024-01-01 02:30:00"), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventSeq.anchoredFunnel(l, "user_id", "ts",
      Seq(col("event_type") === "view", col("event_type") === "click"),
      windowSec = 3600L)
      .select("uid", "level").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1)))
  }

  // ---- cohortRetention ----------------------------------------------------

  test("cohort retention counts distinct actives per (cohort, offset)") {
    val l = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), // user 1: cohort 0, active weeks 0,1,2
      (2L, 0L), (2L, 2L), // user 2: cohort 0, active weeks 0,2
      (3L, 1L), (3L, 1L), (3L, 2L) // user 3: cohort 1 (dup week collapses)
    ).map { case (u, w) => (u, ts("2024-01-01 00:00:00").toInstant
      .plusSeconds(w * 604800L).toString.replace("T", " ").replace("Z", ""))
    }.toDF("user_id", "tss")
      .select(col("user_id"), col("tss").cast("timestamp").as("ts"))
    val got = EventSeq.cohortRetention(l, "user_id", "ts",
      c => floor(floor(c.cast("double")) / lit(604800.0)).cast("long"))
      .orderBy("cohort", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val byCohort = got.groupBy(_._1)
    assert(byCohort(got.head._1).map(t => (t._2, t._3)) ==
      Seq((0L, 2L), (1L, 1L), (2L, 2L)))
    assert(byCohort(got.last._1).map(t => (t._2, t._3)) ==
      Seq((0L, 1L), (1L, 1L)))
  }

  // ---- sequenceMatch ------------------------------------------------------

  test("sequence match builds deterministic symbol strings and matches patterns") {
    val l = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 01:00:00"), "error"),
      (1L, 3L, ts("2024-01-01 02:00:00"), "purchase"),
      (2L, 4L, ts("2024-01-01 00:00:00"), "purchase"),
      (2L, 5L, ts("2024-01-01 01:00:00"), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventSeq.sequenceMatch(l, "user_id", "ts", "event_id",
      substring(col("event_type"), 1, 1), "v.*p")
      .orderBy("uid").as[(Long, String, Boolean)].collect().toSeq
    assert(got == Seq((1L, "vep", true), (2L, "pv", false)))
  }

  test("sequence match orders same-timestamp events by the tiebreak") {
    val t0 = ts("2024-01-01 00:00:00")
    val l = Seq((1L, 2L, t0, "b"), (1L, 1L, t0, "a"), (1L, 3L, t0, "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventSeq.sequenceMatch(l, "user_id", "ts", "event_id",
      col("event_type"), "abc").as[(Long, String, Boolean)].collect().toSeq
    assert(got == Seq((1L, "abc", true)))
  }
}
