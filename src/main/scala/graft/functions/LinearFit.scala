package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed least-squares fitting by EXACT normal equations — the
  * "distill the expensive signal into a cheap linear model" op a
  * curation pipeline runs to replace a costly scorer with a
  * shippable one (the fastText-filter training shape, linearized).
  *
  * Why this shape at 100 TB: for a handful of features the whole fit is
  * ONE map-side-combinable aggregation producing the moment matrix
  * XᵀX and XᵀY (a dozen scalars), then an O(d³) driver solve — no
  * gradient iterations, no per-pass corpus reads, no nondeterministic
  * float reduction order. Inputs are integers (counts and micro-unit
  * scores), so the moments are EXACT integer sums and the entire fit is
  * bit-reproducible — and replayable by an external SQL engine with
  * 128-bit arithmetic, which is how the gate oracle checks it. At
  * higher dims or row counts you'd center/scale features and accept
  * float moments; the contract here is exactness at the dims that
  * matter for signal distillation (a few engineered features).
  */
object LinearFit {

  /** y ≈ w0 + w1·x1 + w2·x2, solved by Cramer's rule on the exact
    * 3×3 moment matrix. All three input columns must be integral
    * (LongType after cast); sums must fit a Long (the caller owns the
    * scale argument — see the gate's bound note). Determinants use
    * BigInt: they overflow Long by design. Returns the coefficients
    * ROUNDED to 6 decimals (`Portable.pround`'s quantization), which is
    * what downstream scoring should ship — and what makes the fit
    * replay-stable across engines.
    */
  final case class Fit3(w0: Double, w1: Double, w2: Double, n: Long)

  def fit3(df: DataFrame, x1: Column, x2: Column, y: Column): Fit3 = {
    val r = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"), sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      .head
    val Seq(n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (0 until 9).map(i => BigInt(r.getLong(i)))
    def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
        f: BigInt, g: BigInt, h: BigInt, i: BigInt): BigInt =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    require(det != 0, "degenerate moment matrix: features are collinear")
    val d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    def w(di: BigInt): Double =
      math.floor(di.toDouble / det.toDouble * 1e6 + 0.5) / 1e6
    Fit3(w(d0), w(d1), w(d2), r.getLong(0))
  }
}
