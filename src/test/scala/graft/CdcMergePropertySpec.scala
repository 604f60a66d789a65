package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcMerge

/** Property coverage for the latest-wins CDC resolution: for EVERY
  * changelog — any key/version/op mix, including version gaps,
  * re-inserts after deletes, and single-version keys — the distributed
  * max_by aggregation must equal the obvious sequential fold
  * (sort by version, take the last, drop if it is a delete).
  */
class CdcMergePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  // rows: (doc_id in a small keyspace so keys collide, distinct
  // versions per key assigned after generation, op weighted toward U)
  private val logGen: Gen[List[(Long, String, Long, String)]] = for {
    n <- Gen.choose(0, 60)
    keys <- Gen.listOfN(n, Gen.choose(0L, 9L))
    ops <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D")))
    verBase <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield {
    // make (key, version) unique — ties are undefined input for a CDC
    // log (a real log's versions are monotone per key)
    keys.zip(ops).zip(verBase).zipWithIndex.map {
      case (((k, op), v), i) => (k, s"t$i", v * 100 + i, op)
    }
  }

  test("latestWins equals the sequential per-key fold on random changelogs") {
    import spark.implicits._
    check(Prop.forAll(logGen) { log =>
      val expected = log.groupBy(_._1).flatMap { case (k, rows) =>
        val last = rows.maxBy(_._3)
        if (last._4 == "D") None else Some(k -> last._2)
      }
      val got =
        if (log.isEmpty) Map.empty[Long, String]
        else CdcMerge.latestWins(
          log.toDF("doc_id", "text", "version", "op"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == expected
    })
  }
}
