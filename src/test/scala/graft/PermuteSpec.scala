package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Permute

/** The Feistel PRP's contract: a seeded BIJECTION of [0, n) for every n,
  * so splits/epoch-shards computed from it are exact by construction.
  */
class PermuteSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(r.passed, r.status.toString)
  }

  test("bijection on [0, n) for boundary and random domains") {
    // powers of 4 (walk-free), one past (max walk pressure), tiny domains
    for (n <- Seq(1L, 2L, 3L, 4L, 5L, 16L, 17L, 63L, 64L, 65L, 100L, 1000L); seed <- Seq(0, 7, 23)) {
      val img = (0L until n).map(Permute.permuteJvm(_, n, seed))
      assert(img.toSet == (0L until n).toSet, s"not a bijection for n=$n seed=$seed")
    }
  }

  test("bijection property on arbitrary (n, seed)") {
    val gen = for {
      n <- Gen.choose(1L, 2048L)
      seed <- Gen.choose(0, 1 << 20)
    } yield (n, seed)
    check(Prop.forAll(gen) { case (n, seed) =>
      val img = (0L until n).map(Permute.permuteJvm(_, n, seed))
      img.toSet == (0L until n).toSet
    })
  }

  test("deterministic across calls, different across seeds") {
    val n = 512L
    val a = (0L until n).map(Permute.permuteJvm(_, n, 1))
    val b = (0L until n).map(Permute.permuteJvm(_, n, 1))
    val c = (0L until n).map(Permute.permuteJvm(_, n, 2))
    assert(a == b)
    assert(a != c)
    // and it actually permutes (not identity) on a non-trivial domain
    assert(a != (0L until n))
  }

  test("exact split counts at integer boundaries") {
    for (n <- Seq(10L, 499L, 500L, 501L, 5000L)) {
      val t1 = n * 8 / 10; val t2 = n * 9 / 10
      val ps = (0L until n).map(Permute.permuteJvm(_, n, 7))
      assert(ps.count(_ < t1) == t1)
      assert(ps.count(p => p >= t1 && p < t2) == t2 - t1)
      assert(ps.count(_ >= t2) == n - t2)
    }
  }

  test("epoch worker stripes are balanced to ±1 and partition the corpus") {
    val n = 500L; val w = 8
    for (epoch <- 1 to 3) {
      val byWorker = (0L until n)
        .map(i => Permute.permuteJvm(i, n, 23 + epoch) * w / n)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(byWorker.keySet == (0L until w).toSet)
      assert(byWorker.values.sum == n)
      assert(byWorker.values.max - byWorker.values.min <= 1)
    }
  }

  test("udf form matches the jvm kernel through a DataFrame") {
    val s = SparkTestSession.get
    import s.implicits._
    val n = 300L
    val got = s.range(n).toDF("i")
      .withColumn("p", Permute.permuteUdf(9)($"i", org.apache.spark.sql.functions.lit(n)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until n).foreach(i => assert(got(i) == Permute.permuteJvm(i, n, 9)))
  }

  test("halfBits covers the domain minimally and evenly") {
    assert(Permute.halfBits(1) == 1)
    assert(Permute.halfBits(4) == 1)
    assert(Permute.halfBits(5) == 2)   // needs 3 bits -> padded to 4
    assert(Permute.halfBits(16) == 2)
    assert(Permute.halfBits(17) == 3)  // needs 5 bits -> padded to 6
    for (n <- Seq(2L, 100L, 4096L, 1000000L)) {
      val k = Permute.halfBits(n)
      assert((1L << (2 * k)) >= n)
      assert(k == 1 || (1L << (2 * (k - 1))) < n)
    }
  }
}
