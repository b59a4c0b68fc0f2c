package graft

import graft.text.MinHash

class NearDupGroupsSpec extends SparkSpec {
  import spark.implicits._

  // family vocabularies are DISJOINT (tokens carry the seed), so distinct
  // families share zero shingles and can only fuse via hash collisions
  private def doc(seed: Int, extra: String = ""): String =
    (0 until 60).map(i => s"t${seed}_$i").mkString(" ") + extra

  test("near-identical families collapse to their minimum id; unrelated docs stay singleton") {
    // family A: ids 1..4 share a base doc with tiny suffix edits;
    // family B: ids 10..11; unrelated: 20, 21
    val docs = Seq(
      (1L, doc(1)), (2L, doc(1, " x")), (3L, doc(1, " y")), (4L, doc(1, " z")),
      (10L, doc(99)), (11L, doc(99, " q")),
      (20L, doc(7777)), (21L, doc(31337))
    ).toDF("doc_id", "text")
    val groups = MinHash.nearDupGroups(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L && groups(4L) == 1L)
    assert(groups(10L) == 10L && groups(11L) == 10L)
    assert(groups(20L) == 20L && groups(21L) == 21L)
  }

  test("groups agree with the transitive closure of nearDupPairs on the same corpus") {
    val docs = (0 until 40).map { i =>
      val fam = i / 4 // 10 families of 4 near-dups
      (i.toLong, doc(fam * 1000 + 1, s" v$i"))
    }.toDF("doc_id", "text")
    val groups = MinHash.nearDupGroups(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // every family of four shares its minimum id as rep
    (0 until 40).foreach { i =>
      assert(groups(i.toLong) == (i / 4 * 4).toLong, s"doc $i -> ${groups(i.toLong)}")
    }
  }
}
