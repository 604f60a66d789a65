package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** HyperLogLog invariants beyond the gate corpus: register max-merge IS
  * the union sketch (mergeability), and the estimate lands inside the
  * published error envelope on a known cardinality.
  */
class HllSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def tokFrame(source: String, lo: Long, hi: Long) =
    s.range(lo, hi).select(lit(source).as("source"),
      concat(lit("tok"), $"id").as("token"))

  test("max-merged per-part registers equal the union corpus registers") {
    // three parts with overlapping token ranges
    val a = tokFrame("a", 0, 4000)
    val b = tokFrame("b", 3000, 7000)
    val c = tokFrame("c", 6500, 9000)
    val parts = TextQueries.hllDenseRegisters(s, a.union(b).union(c))
    val merged = parts.groupBy($"bucket").agg(max($"m").as("m"))
      .select(lit("u").as("source"), $"bucket", $"m")
    val direct = TextQueries.hllDenseRegisters(
      s, a.union(b).union(c).withColumn("source", lit("u")))
    val m1 = merged.orderBy($"bucket").collect().map(r => (r.getLong(1), r.getInt(2)))
    val m2 = direct.orderBy($"bucket").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(m1.sameElements(m2))
  }

  test("estimate within the 3-sigma envelope for a known cardinality") {
    // sigma = 1.04/sqrt(256) = 6.5% -> 3 sigma = 19.5%
    for (n <- Seq(1000L, 10000L, 50000L)) {
      val est = TextQueries.hllEstimate(
        TextQueries.hllDenseRegisters(s, tokFrame("x", 0, n)))
        .collect()(0).getDouble(1)
      assert(math.abs(est - n) / n < 0.195, s"n=$n est=$est")
    }
  }

  test("small-range correction: near-empty sketch estimates exactly") {
    // 3 distinct tokens: linear counting regime, error well under 1
    val est = TextQueries.hllEstimate(
      TextQueries.hllDenseRegisters(s, tokFrame("x", 0, 3)))
      .collect()(0).getDouble(1)
    assert(math.abs(est - 3.0) < 0.1, s"est=$est")
  }
}
