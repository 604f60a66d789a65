package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Pins the magic-mask Morton ladder to a naive bit-by-bit reference,
  * and the curve's locality property the layout relies on.
  */
class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.get
  import spark.implicits._

  private def naiveZ(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zOrder2 equals the bit-by-bit reference on a value sweep") {
    val xs = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 65535L, 65536L + 7L, 123456789L)
    val pairs = for (x <- xs; y <- xs) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(ZOrder.zOrder2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    val want = pairs.map { case (x, y) => naiveZ(x & 0xFFFFL, y & 0xFFFFL) }
    assert(got == want)
    // and the SQL-surface JVM twin is bit-identical
    assert(pairs.map { case (x, y) => ZOrder.zOrder2Jvm(x, y) } == want)
  }

  private def naiveZK(xs: Seq[Long], bits: Int): Long = {
    val k = xs.size
    (for (d <- 0 until k; i <- 0 until bits)
      yield ((xs(d) >> i) & 1L) << (i * k + d)).foldLeft(0L)(_ | _)
  }

  test("zOrderK matches the bit-by-bit reference for k in 2..4 (JVM, Column)") {
    val vals = Seq(0L, 1L, 7L, 255L, 4095L, 32767L, 65535L)
    for (k <- 2 to 4) {
      val bits = ZOrder.bitsFor(k)
      assert(bits == (if (k == 4) 15 else 16))
      val tuples = (0 until 60).map(i =>
        Seq.tabulate(k)(d => vals((i * (d + 3) + d) % vals.size) & ((1L << bits) - 1)))
      val want = tuples.map(naiveZK(_, bits))
      assert(tuples.map(ZOrder.zOrderKJvm) == want, s"k=$k JVM twin")
      // codes stay non-negative (signed-long range ordering holds)
      assert(want.forall(_ >= 0L))
      val cols = (0 until k).map(d => col(s"d$d"))
      val df = tuples.map {
        case Seq(a, b) => (a, b, 0L, 0L)
        case Seq(a, b, c) => (a, b, c, 0L)
        case Seq(a, b, c, e) => (a, b, c, e)
      }.toDF("d0", "d1", "d2", "d3")
      val got = df.select(ZOrder.zOrderK(cols.take(k)).as("z"))
        .as[Long].collect().toSeq
      assert(got == want, s"k=$k Column form")
    }
    // k=2 is bit-identical to the ladder the 2-dim layouts always used
    assert(ZOrder.zOrderKJvm(Seq(12345L, 54321L)) ==
      ZOrder.zOrder2Jvm(12345L, 54321L))
  }

  test("aligned cubes map to one contiguous z-range for k=3") {
    val m = 2
    val (x0, y0, z0) = (8L, 16L, 4L) // multiples of 2^m
    val zs = for {
      x <- x0 until (x0 + (1L << m))
      y <- y0 until (y0 + (1L << m))
      z <- z0 until (z0 + (1L << m))
    } yield ZOrder.zOrderKJvm(Seq(x, y, z))
    assert(zs.max - zs.min + 1 == (1L << (3 * m)), "cube z-range not contiguous")
    assert(zs.toSet.size == (1 << (3 * m)))
  }

  test("z-value range of an aligned box is contiguous (the skipping property)") {
    // an axis-aligned power-of-two cell [x0, x0+2^k) × [y0, y0+2^k)
    // maps to ONE contiguous z-range — this is exactly why row groups
    // sorted by z carry tight min/max stats for box predicates
    val k = 3
    val (x0, y0) = (40L, 16L) // both multiples of 2^k
    val zs = for {
      x <- x0 until (x0 + (1L << k))
      y <- y0 until (y0 + (1L << k))
    } yield naiveZ(x, y)
    assert(zs.max - zs.min + 1 == (1L << (2 * k)), "cell z-range not contiguous")
    assert(zs.toSet.size == (1 << (2 * k)).toInt)
  }
}
