package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LshTuning
import graft.queries.DedupQueries

/** The S-curve optimizer: hand-computed small cases, weight-direction
  * properties, and — the load-bearing one — that the gate queries'
  * fixed banding constants are exactly what the optimizer returns for
  * the gate's own threshold and budget.
  */
class LshTuningSpec extends AnyFunSuite {

  test("candidate probability is an S-curve: 0 at 0, 1 at 1, monotone") {
    for (b <- Seq(1, 4, 16); r <- Seq(1, 2, 8)) {
      assert(LshTuning.candidateProbability(0.0, b, r) == 0.0)
      assert(math.abs(LshTuning.candidateProbability(1.0, b, r) - 1.0) < 1e-12)
      val probs = (0 to 20).map(i => LshTuning.candidateProbability(i / 20.0, b, r))
      assert(probs.zip(probs.tail).forall { case (a, c) => c >= a - 1e-12 })
    }
  }

  test("hand-computed 2-permutation cases") {
    // t=0.9: fp(1,2)=∫s²=0.243, fn=0.1-(1-0.729)/3≈0.0097 beats (2,1)
    // and (1,1); t=0.1 is the mirror image.
    val high = LshTuning.optimalParams(0.9, 2)
    assert((high.bands, high.rowsPerBand) == (1, 2))
    assert(math.abs(high.falsePositiveArea - 0.243) < 1e-3)
    assert(math.abs(high.falseNegativeArea - 0.009667) < 1e-3)
    val low = LshTuning.optimalParams(0.1, 2)
    assert((low.bands, low.rowsPerBand) == (2, 1))
  }

  test("the gate's fixed banding is the optimizer's answer") {
    val p = LshTuning.optimalParams(DedupQueries.MinJaccard, DedupQueries.MinhashK)
    assert((p.bands, p.rowsPerBand) ==
      (DedupQueries.Bands, DedupQueries.RowsPerBand))
  }

  test("weights steer the tradeoff: all-recall maxes bands, all-precision maxes rows") {
    val recall = LshTuning.optimalParams(0.5, 16, fpWeight = 0.0, fnWeight = 1.0)
    assert(recall.bands == 16 && recall.rowsPerBand == 1)
    val precision = LshTuning.optimalParams(0.5, 16, fpWeight = 1.0, fnWeight = 0.0)
    assert(precision.rowsPerBand == 16 && precision.bands == 1)
  }

  test("bigger signature budget never hurts") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val small = LshTuning.optimalParams(t, 8)
      val big = LshTuning.optimalParams(t, 128)
      def err(p: LshTuning.Params) =
        0.5 * p.falsePositiveArea + 0.5 * p.falseNegativeArea
      assert(err(big) <= err(small) + 1e-12)
    }
  }

  test("128-permutation choices match an independent replica of the integral") {
    // Verified against a separate Python implementation of the same
    // S-curve areas (4096-panel midpoint rule).
    val p5 = LshTuning.optimalParams(0.5, 128)
    assert((p5.bands, p5.rowsPerBand) == (25, 5))
    val p8 = LshTuning.optimalParams(0.8, 128)
    assert((p8.bands, p8.rowsPerBand) == (9, 13))
    assert(math.abs(p5.falsePositiveArea - 0.053722) < 1e-4)
    assert(math.abs(p5.falseNegativeArea - 0.033753) < 1e-4)
    // the effective threshold of the chosen banding sits near the target
    assert(math.abs(p5.approxThreshold - 0.5) < 0.15)
    assert(math.abs(p8.approxThreshold - 0.8) < 0.15)
  }
}
