package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertCurve

/** The two properties the layout relies on: the index is a bijection
  * over the grid (no cell lost, none doubled), and the curve is
  * CONTINUOUS — consecutive indexes are grid-adjacent cells. The
  * second is exactly what Z-order lacks (quadrant jumps) and why
  * Hilbert runs cover tighter rectangles.
  */
class HilbertCurveSpec extends AnyFunSuite {

  test("xy2d is a bijection on the order-5 grid and d2xy inverts it") {
    val order = 5
    val n = 1 << order
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertCurve.xy2d(order, x, y)
    assert(ds.toSet.size == n * n)
    assert(ds.min == 0L && ds.max == n.toLong * n - 1)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertCurve.xy2d(order, x, y)
      assert(HilbertCurve.d2xy(order, d) == (x.toLong, y.toLong))
    }
  }

  test("consecutive indexes are adjacent cells (curve continuity)") {
    val order = 6
    val n = 1L << order
    var prev = HilbertCurve.d2xy(order, 0)
    (1L until n * n).foreach { d =>
      val cur = HilbertCurve.d2xy(order, d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"jump at d=$d: $prev -> $cur")
      prev = cur
    }
  }

  test("masking matches ZOrder's 16-bit quantization convention") {
    assert(HilbertCurve.xy2d(16, 65536L + 3, 7) ==
      HilbertCurve.xy2d(16, 3, 7))
  }
}
