package graft.functions

/** MinHash-LSH banding parameter selection — the S-curve optimizer that
  * turns a target Jaccard threshold plus a signature budget into the
  * (bands, rowsPerBand) pair the banded queries consume
  * (`DedupFunctions.lshBandBuckets`). Public construction (MMDS ch. 3;
  * the datasketch library ships the same optimizer): a pair with
  * similarity s becomes a candidate with probability
  * `1 - (1 - s^r)^b`, so the false-positive mass is the area under that
  * curve left of the threshold and the false-negative mass is the area
  * above it to the right; enumerate every (b, r) with b*r <= numPerm
  * and keep the weighted minimum.
  *
  * At 100 TB this is the knob that matters: r too small floods the
  * bucket join with low-similarity candidates (the verify stage becomes
  * the job), r too large drops true pairs that no band catches. The
  * gate queries pin their banding constants for oracle determinism
  * (DedupQueries.Bands/RowsPerBand); LshTuningSpec asserts those
  * constants are what this optimizer returns for the gate's own
  * threshold and budget, so the fixed numbers stay justified rather
  * than folklore.
  */
object LshTuning {

  /** Chosen banding plus its predicted error masses. */
  final case class Params(bands: Int, rowsPerBand: Int,
      falsePositiveArea: Double, falseNegativeArea: Double) {
    /** The similarity where candidate probability crosses 1/2 —
      * the usual "effective threshold" reading of a banding choice.
      */
    def approxThreshold: Double =
      math.pow(1.0 - math.pow(0.5, 1.0 / bands), 1.0 / rowsPerBand)
  }

  /** P(some band collides) for a pair with Jaccard similarity `s`. */
  def candidateProbability(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Midpoint-rule integral of `f` over [a, b] (the curve is smooth and
    * bounded in [0, 1]; 1024 panels give ~1e-7 accuracy, far below the
    * spread between adjacent (b, r) choices).
    */
  private def integrate(f: Double => Double, a: Double, b: Double): Double = {
    val n = 1024
    val h = (b - a) / n
    var acc = 0.0
    var i = 0
    while (i < n) { acc += f(a + (i + 0.5) * h); i += 1 }
    acc * h
  }

  /** Enumerate every banding that fits the signature budget and return
    * the one minimizing `fpWeight * FP-area + fnWeight * FN-area`
    * around `threshold`. Ties break toward fewer bands (cheaper
    * explode). `numPerm` is the MinHash signature length; bandings
    * that use fewer than all permutations are considered too, exactly
    * like datasketch's integer-division sweep.
    */
  def optimalParams(threshold: Double, numPerm: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): Params = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")
    require(fpWeight >= 0 && fnWeight >= 0 && fpWeight + fnWeight > 0,
      s"weights must be non-negative and not both zero")
    var best: Params = null
    var bestErr = Double.MaxValue
    var b = 1
    while (b <= numPerm) {
      var r = 1
      while (r * b <= numPerm) {
        val fp = integrate(candidateProbability(_, b, r), 0.0, threshold)
        val fn = integrate(s => 1.0 - candidateProbability(s, b, r),
          threshold, 1.0)
        val err = fpWeight * fp + fnWeight * fn
        if (err < bestErr - 1e-12) {
          bestErr = err
          best = Params(b, r, fp, fn)
        }
        r += 1
      }
      b += 1
    }
    best
  }
}
