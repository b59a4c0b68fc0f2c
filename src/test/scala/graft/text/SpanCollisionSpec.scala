package graft.text

import org.apache.spark.sql.functions._

/** Collision-guard pin for [[CorpusOps.removeDupSpans]] (advisor r9,
  * medium; made EXACT r11): the op REWRITES text, so a window-identity
  * hash collision between two DIFFERENT windows must never cut a
  * non-duplicate span. Since r11 the cut path compares the literal
  * window text of every removal candidate against the canonical
  * occurrence's text — the hash only proposes — so a collision survives
  * with probability 1, matching the exactness of the reference
  * technique's suffix-array matches (Lee et al. 2022). A real 59-bit
  * collision cannot be constructed in a test, so the guard is exercised
  * through the injectable-identity-hash impl with a deliberately weak
  * hash (string length) that collides for free.
  */
class SpanCollisionSpec extends graft.SparkSpec {
  import spark.implicits._

  private val weakHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    g => length(g).cast("long")

  private def run(docs: Seq[(Long, String)], w: Int) =
    CorpusOps.removeDupSpansImpl(docs.toDF("doc_id", "text"), "doc_id", "text", w, weakHash)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("identity-hash collision between different windows does NOT cut text") {
    // both windows are 8 chars -> the weak length hash collides, but the
    // texts differ: the exact text compare on the cut path must veto the
    // removal (text-verified survival, not a second-hash coin flip)
    val out = run(Seq((1L, "aa bb cc"), (2L, "dd ee ff")), w = 3)
    assert(out(1L) === ((3L, 0L, "aa bb cc")))
    assert(out(2L) === ((3L, 0L, "dd ee ff")))
  }

  test("colliding windows differing ONLY in token order survive") {
    // same length, same token multiset — any order-insensitive check
    // would wrongly cut; the literal string compare keeps both
    val out = run(Seq((1L, "aa bb cc"), (2L, "cc bb aa")), w = 3)
    assert(out(1L) === ((3L, 0L, "aa bb cc")))
    assert(out(2L) === ((3L, 0L, "cc bb aa")))
  }

  test("true duplicates sharing the colliding hash are still removed") {
    // doc 3 is a genuine copy of doc 1's window: same weak hash AND same
    // window text -> removed; doc 2 collides by length only -> kept
    val out = run(Seq(
      (1L, "aa bb cc"), (2L, "dd ee ff"), (3L, "aa bb cc")), w = 3)
    assert(out(1L) === ((3L, 0L, "aa bb cc")))
    assert(out(2L) === ((3L, 0L, "dd ee ff")))
    assert(out(3L) === ((3L, 3L, "")))
  }

  test("production hash path is unchanged by the guard on a dup corpus") {
    val q = "one two three four five"
    val out = CorpusOps.removeDupSpans(
      Seq((1L, s"$q tail"), (2L, s"lead $q")).toDF("doc_id", "text"),
      "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 0L && out(2L) === 5L)
  }
}
