package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Property coverage for the composed-builtins as-of join: on ANY
  * (left, right) table pair — duplicate timestamps, equal-ts ties on
  * both sides, empty sides, keys present on only one side — all four
  * (direction × tolerance) configurations must equal the obvious
  * sequential per-row scan: backward = the max-(rts, payload) right row
  * with rts ≤ lts, forward = the min-rts (max payload at that ts) right
  * row with rts ≥ lts, tolerance nulls a match whose matched-ts gap
  * exceeds it. This pins exactly the semantics the window encoding
  * (union → key window → carried last non-null right struct) claims,
  * including the inclusive-at-equal-ts and deterministic-tiebreak
  * contracts the q54/qam/qan oracles rely on.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val tablesGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(0, 30)
      nr <- Gen.choose(0, 30)
      lk <- Gen.listOfN(nl, Gen.choose(0L, 4L))
      lt <- Gen.listOfN(nl, Gen.choose(0L, 50L))
      rk <- Gen.listOfN(nr, Gen.choose(0L, 4L))
      rt <- Gen.listOfN(nr, Gen.choose(0L, 50L))
      rv <- Gen.listOfN(nr, Gen.choose(0L, 100L))
    } yield (
      lk.zip(lt).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      rk.zip(rt).zip(rv).map { case ((k, t), v) => (k, t, v) })

  /** Sequential reference: the matched right (rts, v) for one left row. */
  private def expectedMatch(right: List[(Long, Long, Long)], k: Long, lts: Long,
      direction: String, tol: Option[Long]): Option[Long] = {
    val cands = right.filter(_._1 == k)
    val hit = direction match {
      case "backward" =>
        val elig = cands.filter(_._2 <= lts)
        if (elig.isEmpty) None else Some(elig.maxBy(r => (r._2, r._3)))
      case "forward" =>
        val elig = cands.filter(_._2 >= lts)
        if (elig.isEmpty) None
        else {
          val ts = elig.map(_._2).min
          Some(elig.filter(_._2 == ts).maxBy(_._3))
        }
    }
    hit.filter { r =>
      tol.forall(t => math.abs(r._2 - lts) <= t)
    }.map(_._3)
  }

  test("all four direction/tolerance configs equal the sequential scan") {
    import spark.implicits._
    val prop = Prop.forAll(tablesGen) { case (left, right) =>
      val l = left.toDF("k", "lts", "lid")
      val r = right.toDF("k", "rts", "v")
      Seq(("backward", None), ("forward", None),
        ("backward", Some(7L)), ("forward", Some(7L))).forall { case (dir, tol) =>
        val got = AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", Seq("v"),
            direction = dir, toleranceMs = tol)
          .collect()
          .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
            if (row.isNullAt(3)) None else Some(row.getLong(3))))
          .sortBy(t => (t._1, t._2, t._3))
        val want = left
          .map { case (k, lts, lid) =>
            (k, lts, lid, expectedMatch(right, k, lts, dir, tol)) }
          .sortBy(t => (t._1, t._2, t._3))
        got.toSeq == want
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
