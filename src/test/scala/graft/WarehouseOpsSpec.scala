package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConstraintAudit, Scd, SnapshotDiff, Triangles}

/** Round-6 warehouse/graph operators: SCD2 build + CDC merge, snapshot
  * diff, triangle counting, constraint audit.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Scd.scd2FromChangeLog ---------------------------------------------

  private lazy val log = Seq(
    // key 1: A A B A — the repeated A collapses, the return to A reopens
    (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"), (1L, 3L, 30L, "B"),
    (1L, 4L, 40L, "A"),
    // key 2: single row stays current
    (2L, 5L, 15L, "Z")
  ).toDF("k", "seq", "ts", "attr")

  test("scd2 collapses no-op changes and builds half-open intervals") {
    val got = Scd.scd2FromChangeLog(log, Seq("k"), "ts", Seq("seq"), Seq("attr"))
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "Z", 15L, None, true)))
  }

  test("scd2 treats NULL attr transitions null-safely") {
    val l = Seq((1L, 1L, 10L, Some("A")), (1L, 2L, 20L, None),
      (1L, 3L, 30L, None), (1L, 4L, 40L, Some("A")))
      .toDF("k", "seq", "ts", "attr")
    val got = Scd.scd2FromChangeLog(l, Seq("k"), "ts", Seq("seq"), Seq("attr"))
      .orderBy("valid_from").select("attr", "valid_from")
      .as[(Option[String], Long)].collect().toSeq
    // NULL run collapses; NULL→A reopens
    assert(got == Seq((Some("A"), 10L), (None, 20L), (Some("A"), 40L)))
  }

  // ---- Scd.applyChanges ---------------------------------------------------

  test("cdc merge: latest change wins, deletes remove, untouched pass through") {
    val current = Seq((1L, "old", 1.0), (2L, "keep", 2.0), (3L, "gone", 3.0))
      .toDF("k", "state", "v")
    val changes = Seq(
      (1L, 10L, 1L, "U", "mid", 1.5), (1L, 20L, 2L, "U", "new", 1.9),
      (3L, 10L, 3L, "D", "x", 0.0), // delete key 3
      (4L, 10L, 4L, "U", "ins", 4.0) // insert unseen key
    ).toDF("k", "ts", "seq", "op", "state", "v")
    val got = Scd.applyChanges(current, changes, Seq("k"), "ts", Seq("seq"),
      "op", Seq("state", "v")).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "new", 1.9), (2L, "keep", 2.0), (4L, "ins", 4.0)))
  }

  test("cdc merge: delete-then-upsert within one batch resolves by latest") {
    val current = Seq((1L, "old")).toDF("k", "state")
    val changes = Seq((1L, 10L, 1L, "D", "x"), (1L, 20L, 2L, "U", "back"))
      .toDF("k", "ts", "seq", "op", "state")
    val got = Scd.applyChanges(current, changes, Seq("k"), "ts", Seq("seq"),
      "op", Seq("state")).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "back")))
  }

  test("cdc merge rejects unknown ops") {
    val current = Seq((1L, "old")).toDF("k", "state")
    val changes = Seq((1L, 10L, 1L, "UPSERT", "x")).toDF("k", "ts", "seq", "op", "state")
    val ex = intercept[Exception] {
      Scd.applyChanges(current, changes, Seq("k"), "ts", Seq("seq"),
        "op", Seq("state")).collect()
    }
    assert(ex.getMessage.contains("op must be 'U' or 'D'") ||
      Option(ex.getCause).exists(_.getMessage.contains("op must be 'U' or 'D'")))
  }

  // ---- SnapshotDiff -------------------------------------------------------

  test("snapshot diff classifies added/removed/changed with null-safe column lists") {
    val before = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, Some("c"), 3.0), (4L, None: Option[String], 4.0)).toDF("k", "s", "v")
    val after = Seq((2L, Some("b"), 2.0), (3L, Some("C"), 3.5),
      (4L, Some("now"), 4.0), (5L, Some("e"), 5.0)).toDF("k", "s", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k"), Seq("s", "v"))
      .orderBy("k").as[(Long, String, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, "removed", None),
      (3L, "changed", Some("s,v")),
      (4L, "changed", Some("s")), // NULL → value registers as change
      (5L, "added", None)))
    // key 2 (unchanged) is absent
  }

  // ---- Triangles ----------------------------------------------------------

  test("triangles: K4 gives 3 per node; chain gives none; duplicate edges collapse") {
    // K4 + a pendant chain 4-5-6 + duplicated/reversed edge noise
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 1L), (1L, 2L), // duplicates/reversals of 1-2
      (4L, 5L), (5L, 6L), (3L, 4L)
    ).toDF("a", "b")
    val got = Triangles.perNodeCounts(edges, "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // K4 has C(4,3)=4 triangles, each node in 3 of them; chain nodes absent
    assert(got == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("triangles: hub star has none; closing one spoke pair makes one") {
    val star = (1L to 10L).map(i => (0L, i)).toDF("a", "b")
    assert(Triangles.perNodeCounts(star, "a", "b").count() == 0)
    val closed = star.union(Seq((3L, 7L)).toDF("a", "b"))
    val got = Triangles.perNodeCounts(closed, "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (3L, 1L), (7L, 1L)))
  }

  // ---- ConstraintAudit ----------------------------------------------------

  test("constraint audit counts violations per constraint in one result") {
    val df = Seq(
      (Some(1L), 5.0, 10L), (Some(2L), -1.0, 10L), (None, 3.0, 20L),
      (Some(1L), 200.0, 99L) // duplicate key 1; 99 not in parent
    ).toDF("k", "x", "fk")
    val parent = Seq(10L, 20L).toDF("p")
    val got = ConstraintAudit.audit(df, Seq(
      ConstraintAudit.NotNull("k_not_null", "k"),
      ConstraintAudit.InRange("x_0_100", "x", 0, 100),
      ConstraintAudit.Check("x_not_negative", col("x") >= 0),
      ConstraintAudit.Unique("k_unique", Seq("k")),
      ConstraintAudit.ForeignKey("fk_in_parent", "fk", parent, "p")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("k_not_null", 1L), ("x_0_100", 2L), ("x_not_negative", 1L),
      ("k_unique", 1L), ("fk_in_parent", 1L)))
  }

  test("constraint audit on an empty frame reports zero violations") {
    val empty = Seq.empty[(Option[Long], Double)].toDF("k", "x")
    val got = ConstraintAudit.audit(empty, Seq(
      ConstraintAudit.NotNull("k_not_null", "k"),
      ConstraintAudit.Unique("k_unique", Seq("k"))))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("k_not_null", 0L), ("k_unique", 0L)))
  }
}
