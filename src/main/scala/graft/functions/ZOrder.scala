package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding for multi-dimensional data-skipping
  * layouts.
  *
  * A table range-partitioned and sorted by ONE column clusters its
  * parquet row-group min/max stats in that column only — a predicate on
  * a second column scans everything. Interleaving the bits of two
  * quantized dimensions into one z-value and laying the table out by
  * that z-value makes row groups cover small axis-aligned rectangles of
  * the (x, y) space, so min/max pruning works for predicates on EITHER
  * column (or a box on both). This is the clustering layout engines
  * like Delta/Iceberg call Z-ORDER; here it is nothing but columns —
  * `zOrder2` builds the curve key with codegen'd bitwise arithmetic,
  * and the layout is `repartitionByRange(n, z).sortWithinPartitions(z)`
  * + a plain parquet write. 100 TB judgment: the z-value is computed
  * scan-side (no shuffle beyond the one range exchange every re-layout
  * pays), and the payoff is at read time, where a 2-D box prunes to
  * O(perimeter) row groups instead of O(table).
  *
  * Quantization is the fixed-width kind every Morton code uses: the low
  * 16 bits of each dimension (`dim & 0xFFFF`). Callers with wider
  * domains pre-scale into 16-bit bucket indexes.
  *
  * Reference behavior: the reference keeps corpora as directory-of-tars
  * with no multi-dim clustering (custom_datapipes.py shard listings);
  * this is a capability the Spark-side engine adds for warehouse-style
  * range queries over event/lineage tables.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i —
    * the classic magic-mask doubling ladder, all codegen'd builtins.
    */
  def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code interleaving the low 16 bits of `x` (even bit
    * positions) and `y` (odd bit positions).
    */
  def zOrder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** JVM twin of [[zOrder2]] for the SQL surface (`graft_zorder2`);
    * bit-identical to the Column form (ZOrderSpec).
    */
  def zOrder2Jvm(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var m = v & 0xFFFFL
      m = (m | (m << 8)) & 0x00FF00FFL
      m = (m | (m << 4)) & 0x0F0F0F0FL
      m = (m | (m << 2)) & 0x33333333L
      (m | (m << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Lane width for a k-way interleave: 16 bits per dimension while the
    * code fits a non-negative long (k ≤ 3), ⌊63/k⌋ after — k=4 gets
    * 15-bit lanes (60-bit codes). 63, not 64: the top bit stays clear
    * so codes order correctly as SIGNED longs, which is what
    * `repartitionByRange` sorts by.
    */
  def bitsFor(k: Int): Int = math.min(16, 63 / k)

  /** k-way Morton interleave: bit i of dimension d lands at position
    * `i * k + d`, each dimension masked to [[bitsFor]](k) bits. For
    * k = 2 this is bit-identical to [[zOrder2]] (pinned by ZOrderSpec)
    * and delegates to the cheaper magic-mask ladder; higher k builds
    * the code from shift/mask/or builtins — still whole-stage codegen,
    * `bitsFor(k) * k` constant-folded terms, no UDF boundary.
    */
  def zOrderK(dims: Seq[Column]): Column = {
    val k = dims.size
    require(k >= 2, s"zOrderK interleaves at least 2 dimensions, got $k")
    if (k == 2) zOrder2(dims(0), dims(1))
    else {
      val bits = bitsFor(k)
      val terms = for {
        (c, d) <- dims.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(c.bitwiseAND(lit(1L << i)), i * (k - 1) + d)
      terms.reduce(_ bitwiseOR _)
    }
  }

  /** JVM twin of [[zOrderK]] (driver-side stats scaling, specs). */
  def zOrderKJvm(xs: Seq[Long]): Long = {
    val k = xs.size
    if (k == 2) zOrder2Jvm(xs(0), xs(1))
    else {
      val bits = bitsFor(k)
      var z = 0L
      var d = 0
      while (d < k) {
        var i = 0
        while (i < bits) {
          z |= ((xs(d) >> i) & 1L) << (i * k + d)
          i += 1
        }
        d += 1
      }
      z
    }
  }
}
