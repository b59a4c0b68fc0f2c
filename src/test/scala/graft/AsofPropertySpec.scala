package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.AsofJoin

/** Randomized as-of semantics check against an INDEPENDENT in-memory
  * brute force. The existing AsofJoinSpec equivalence tests pin the three
  * physical forms to each other; a semantic bug shared by all three (the
  * window rewrite is the reference the other two were built against) would
  * pass them. This spec re-derives the contract from scratch per left row:
  * among right rows of the same key with time <= left time, the winner is
  * the maximum by (time, payload) — the inclusive `>=` plus deterministic
  * max-struct tie-break documented on [[AsofJoin.leftAsof]] — and NULL
  * right times never match.
  *
  * Generator deliberately uses a 3-key space, a 0..40 s time grid, and a
  * 1..9 payload range so equal-timestamp ties (both within and across
  * sides), keys missing from one side, and duplicate payload collisions
  * all occur in nearly every sample.
  */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
  private def ts(sec: Int) = new Timestamp(base + sec * 1000L)

  private val rowGen = for {
    k <- Gen.oneOf("A", "B", "C")
    sec <- Gen.choose(0, 40)
    v <- Gen.choose(1, 9)
  } yield (k, sec, v)

  private val inputGen = for {
    l <- Gen.nonEmptyListOf(rowGen)
    r <- Gen.listOf(rowGen)
    // NULL-time right rows: must never match anything in any form
    nulls <- Gen.listOf(Gen.zip(Gen.oneOf("A", "B", "C"), Gen.choose(1, 9)))
  } yield (l, r, nulls)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("all three physical forms match a brute-force as-of oracle on random inputs") {
    check(Prop.forAll(inputGen) { case (lRows, rRows, nullRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, sec, _), i) => (k, ts(sec), i.toLong) }
        .toDF("k", "t", "id")
      val right = (
        rRows.map { case (k, sec, v) => (k, ts(sec), v.toDouble) } ++
          nullRows.map { case (k, v) => (k, null.asInstanceOf[Timestamp], v.toDouble) }
      ).toDF("k", "t", "v")

      // independent reference: per left row, max-(time, payload) among
      // same-key right rows at-or-before it; NULL times excluded
      val expected: Map[Long, Option[(Long, Double)]] =
        lRows.zipWithIndex.map { case ((k, sec, _), i) =>
          val cands = rRows.collect {
            case (rk, rsec, rv) if rk == k && rsec <= sec =>
              (ts(rsec).getTime, rv.toDouble)
          }
          i.toLong -> (if (cands.isEmpty) None else Some(cands.max))
        }.toMap

      def run(form: String): Map[Long, Option[(Long, Double)]] = {
        val out = form match {
          case "window" =>
            AsofJoin.leftAsof(left, right, Seq("k"), "t", "t", Seq("v"), "_r")
          case "native" =>
            AsofJoin.leftAsofNative(left, right, Seq("k"), "t", "t", Seq("v"), "_r")
          case "bucketed" =>
            AsofJoin.leftAsofBucketed(left, right, Seq("k"), "t", "t", Seq("v"),
              "_r", bucketSeconds = 10L)
        }
        out.select("id", "t_r", "v_r").collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None
                           else Some((r.getTimestamp(1).getTime, r.getDouble(2))))
        }.toMap
      }

      val w = run("window") == expected
      val n = run("native") == expected
      val b = run("bucketed") == expected
      if (!(w && n && b))
        println(s"MISMATCH window=$w native=$n bucketed=$b left=$lRows right=$rRows nulls=$nullRows")
      w && n && b
    })
  }
}
