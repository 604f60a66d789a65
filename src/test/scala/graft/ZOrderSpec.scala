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
