package graft.functions

/** Hilbert curve index for 2-D clustering layouts — the
  * better-locality alternative to [[ZOrder]]: the Hilbert curve is
  * continuous (every consecutive pair of indexes is an adjacent cell,
  * HilbertCurveSpec pins it), so sorted runs cover tighter rectangles
  * than the Z curve's quadrant jumps, which tightens row-group min/max
  * stats and improves single-dimension pruning. The cost is a heavier
  * key: quadrant rotations don't reduce to mask-shift arithmetic, so
  * the kernel is a JVM function (used via UDF at RE-LAYOUT time only —
  * a write-side job where the per-row cost is dwarfed by the range
  * exchange; scans never evaluate it, they only benefit from the
  * layout). `LayoutScaleSmoke` measures both curves side by side.
  *
  * Algorithm: the standard d2xy/xy2d quadrant-rotation formulation
  * (Hilbert 1891; iterative form as in Warren, Hacker's Delight §16 /
  * the Wikipedia "Hilbert curve" pseudocode).
  */
object HilbertCurve {

  /** Map (x, y), each masked to `order` low bits, to the Hilbert curve
    * index in [0, 4^order).
    */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    require(order >= 1 && order <= 31, s"order out of range: $order")
    val mask = (1L << order) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation lines up
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[xy2d]] (spec uses it to prove bijectivity and
    * step-adjacency).
    */
  def d2xy(order: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
