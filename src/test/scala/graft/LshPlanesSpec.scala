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
    assert(adaptivePlanes(1L << 40) == 16)    // hi clamp
    // monotone non-decreasing in n
    val vals = Seq(1L, 100L, 1000L, 10000L, 100000L, 1000000L)
      .map(adaptivePlanes(_))
    assert(vals == vals.sorted)
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
