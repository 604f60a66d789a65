package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted aggregation/join must equal the unsalted results exactly. */
class SkewSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def skewed = {
    import spark.implicits._
    // 90% of rows share one hot key
    (0 until 2000).map(i => (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "HOT", i * 1.5))
      .toDF("id", "key", "v")
  }

  test("saltedAgg equals plain groupBy aggregation") {
    import spark.implicits._
    val salted = Skew.saltedAgg(skewed, "key", "id", salts = 8)(
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      merge = Seq(sum($"s").as("total"), sum($"c").cast("long").as("n")))
    val plain = skewed.groupBy($"key")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
    val j = salted.alias("a").join(plain.alias("b"), "key")
      .filter(abs(col("a.total") - col("b.total")) > 1e-9 || col("a.n") =!= col("b.n"))
    assert(plain.count() == salted.count())
    assert(j.count() == 0)
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = Seq(("HOT", "hot-dim"), ("k0", "dim-0"), ("k3", "dim-3")).toDF("key", "label")
    val salted = Skew.saltedJoin(skewed, dim, "key", "id", salts = 4)
      .select("id", "key", "label")
    val plain = skewed.join(dim, "key").select("id", "key", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("CDC latest-wins stays correct on a hot key with deep version history") {
    import spark.implicits._
    // one key carrying 50k versions (the takedown-then-restore churn
    // case) + cold keys; max_by partial aggregation must resolve the
    // hot key without a window and land on the true max version
    val hot = (0 until 50000).map(v =>
      (1L, s"v$v", v.toLong, if (v == 49998) "D" else "U"))
    val cold = (2 until 100).map(k => (k.toLong, s"cold$k", 0L, "U"))
    val log = (hot ++ cold).toDF("doc_id", "text", "version", "op")
    val merged = graft.operators.CdcMerge.latestWins(log)
    val rows = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // hot key's final version (49999, op U) survives the mid-history D
    assert(rows(1L) == "v49999")
    assert(merged.count() == 99) // 1 hot + 98 cold
  }
}
