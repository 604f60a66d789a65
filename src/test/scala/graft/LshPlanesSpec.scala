package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FastText, PortableHash, SimilarityFunctions}

/** Scale-adaptive LSH plane count: the formula itself (integer
  * bit-length, clamped) and the property it exists for — expected
  * bucket size stays near the target as the corpus grows, so
  * within-bucket pair work does not go quadratic when n scales 100×.
  */
class LshPlanesSpec extends AnyFunSuite {

  test("adaptivePlanes follows ceil(log2(n/target)) with clamps") {
    import SimilarityFunctions.adaptivePlanes
    assert(adaptivePlanes(1) == 4)            // lo clamp
    assert(adaptivePlanes(64) == 4)           // m = 1 → 0 → lo clamp
    assert(adaptivePlanes(500) == 4)          // m = 8 → 3 bits → lo clamp
    assert(adaptivePlanes(2000) == 5)         // m = 32 → 5 bits
    assert(adaptivePlanes(4096) == 6)         // m = 64 → 6 bits
    assert(adaptivePlanes(1L << 20) == 14)    // m = 16384 → 14 bits
    // monotone non-decreasing in n
    val vals = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(adaptivePlanes(_))
    assert(vals == vals.sorted)
  }

  test("default ceiling is the Long representation bound, un-clamped at planetary n") {
    import SimilarityFunctions.{adaptivePlanes, MaxPlanes}
    // the old scale-killer: a hi=16 default stopped growing at ~4.2M
    // vectors. The default now only binds at the 62-bit bucket-id bound.
    assert(adaptivePlanes(1000000000L) == 24)         // 1e9 vectors: un-clamped
    assert(adaptivePlanes(1L << 40) == 34)            // ~1.1e12: un-clamped
    // even the largest representable corpus doesn't reach the ceiling:
    // m = ceil(2^63/64) ≈ 2^57 → 57 planes < MaxPlanes
    assert(adaptivePlanes(Long.MaxValue) == 57)
    assert(MaxPlanes == 62)
    // the documented guarantee: expected bucket size n/2^p ≤ targetBucket
    // whenever the ceiling is not binding
    for (n <- Seq(100L, 4096L, 1000000L, 1000000000L, 1L << 40)) {
      val p = adaptivePlanes(n)
      assert(n.toDouble / (1L << p) <= 64.0,
        s"n=$n p=$p expected bucket ${n.toDouble / (1L << p)}")
    }
    // a deliberately smaller hi still clamps (the knob works both ways)
    assert(adaptivePlanes(1000000000L, hi = 16) == 16)
  }

  /** Deterministic pseudo-random unit-ish vector for bucket statistics. */
  private def vec(id: Int, dim: Int): Seq[Float] =
    (0 until dim).map(i =>
      (PortableHash.detHashJvm(s"v:$id:$i") / 2147483648.0 - 1.0).toFloat)

  test("bucket-size bounds hold at two corpus sizes") {
    val dim = 16
    for (n <- Seq(512, 4096)) {
      val p = SimilarityFunctions.adaptivePlanes(n)
      val planes = SimilarityFunctions.hyperplanes(p, dim)
      val buckets = (0 until n).map(i => FastText.lshBucketJvm(vec(i, dim), planes))
      val byBucket = buckets.groupBy(identity).map(_._2.size)
      val expected = n.toDouble / (1 << p)
      // every sign pattern is populated, and no bucket is more than 4×
      // the expected size — the guarantee that pair mining stays O(n)
      assert(byBucket.size == (1 << p), s"n=$n: want ${1 << p} buckets, got ${byBucket.size}")
      assert(byBucket.max <= 4 * expected, s"n=$n: max bucket ${byBucket.max} vs expected $expected")
    }
  }
}
