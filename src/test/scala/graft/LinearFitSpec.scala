package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LinearFit

/** Exact normal-equations fit: recovers a perfectly linear relation
  * exactly, matches a hand-solved overdetermined system, and refuses
  * collinear features loudly.
  */
class LinearFitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("perfect linear data is recovered exactly (integer w, zero residual)") {
    // y = 7 + 3*x1 - 2*x2 over a non-degenerate grid
    val df = (for (a <- 1L to 6L; b <- 1L to 5L)
      yield (a, a * b, 7L + 3 * a - 2 * a * b)).toDF("x1", "x2", "y")
    val fit = LinearFit.fit3(df, $"x1", $"x2", $"y")
    assert(fit.w0 == 7.0 && fit.w1 == 3.0 && fit.w2 == -2.0 && fit.n == 30)
  }

  test("overdetermined system matches the hand-solved least squares") {
    // four points, one feature pair duplicated with different y: the
    // normal equations give the classic averaged solution
    val df = Seq((1L, 1L, 10L), (2L, 1L, 12L), (1L, 2L, 9L), (2L, 1L, 14L))
      .toDF("x1", "x2", "y")
    val fit = LinearFit.fit3(df, $"x1", $"x2", $"y")
    // moments by hand: A = [[4,6,5],[6,10,7],[5,7,7]], b = [45,71,54];
    // Cramer gives det=2, (d0,d1,d2)=(16,6,-2) -> w=(8,3,-1), which
    // indeed averages the duplicated (2,1) pair: 8+6-1 = 13 = (12+14)/2
    assert(fit.w0 == 8.0 && fit.w1 == 3.0 && fit.w2 == -1.0)
  }

  test("collinear features are refused loudly") {
    val df = spark.range(1, 20)
      .select($"id".as("x1"), ($"id" * 2).as("x2"), ($"id" * 5).as("y"))
    val e = intercept[IllegalArgumentException] {
      LinearFit.fit3(df, $"x1", $"x2", $"y")
    }
    assert(e.getMessage.contains("collinear"))
  }
}
