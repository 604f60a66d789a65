package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalIndex

/** Distributed contiguous rank: ids must equal the global 0-based rank
  * by the key — contiguous, complete, deterministic — across partition
  * counts, including degenerate ones.
  */
class GlobalIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("ids are the exact global rank, payload rides along") {
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b"), (50L, "e"), (40L, "d"))
      .toDF("k", "v").repartition(3)
    val got = GlobalIndex.rankIds(df, "k", "idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq((10L, "a", 0L), (20L, "b", 1L),
      (30L, "c", 2L), (40L, "d", 3L), (50L, "e", 4L)))
  }

  test("contiguous and complete at scale across partition counts") {
    val df = spark.range(0, 10000).select(($"id" * 7919 % 10007).as("k"))
    for (p <- Seq(1, 7, 64)) {
      val ids = GlobalIndex.rankIds(df, "k", "idx", numPartitions = p)
        .select($"idx").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until 10000L))
    }
  }

  test("rank pairs with the key exactly (not just the id set)") {
    val df = spark.range(0, 1000).select(($"id" * 31 % 1009).as("k"))
    val got = GlobalIndex.rankIds(df, "k", "idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.collect().map(_.getLong(0)).sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got == want)
  }

  test("empty frame yields empty result with the id column") {
    val out = GlobalIndex.rankIds(
      spark.range(0, 0).select($"id".as("k")), "k", "idx")
    assert(out.columns.toSeq == Seq("k", "idx") && out.count() == 0)
  }
}
