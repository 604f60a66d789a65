package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.plans.{PqEncode, PqNearestSub}

/** Property-based coverage for the round-6 sketch/quantization kernels:
  * invariants that must hold for EVERY input, not just the gate corpus.
  */
class SketchPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(r.passed, r.status.toString)
  }

  private val floatGen = Gen.chooseNum(-4.0f, 4.0f)
  private def vecGen(dim: Int) = Gen.listOfN(dim, floatGen).map(_.toArray)

  test("PqNearestSub: code is the brute-force rounded-L2 argmin with first-wins ties") {
    val Dim = 16; val Sub = 4; val K = 5
    val gen = for {
      v <- vecGen(Dim)
      books <- Gen.listOfN(K, vecGen(Dim))
      s <- Gen.choose(0, Dim / Sub - 1)
    } yield (v, books, s)
    check(Prop.forAll(gen) { case (v, books, s) =>
      val expr = PqNearestSub(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        s * Sub, Sub, books.map(_.slice(s * Sub, s * Sub + Sub).toSeq))
      def d2(c: Array[Float]): Double = {
        var d = 0.0
        for (i <- 0 until Sub) {
          val x = v(s * Sub + i).toDouble - c(s * Sub + i).toDouble; d += x * x
        }
        math.floor(d * 1e6 + 0.5) / 1e6
      }
      val brute = books.indices.minBy(j => (d2(books(j)), j)).toLong
      expr.eval(null) == brute
    })
  }

  test("PqEncode.tableEntry equals the expression's distance for the coded entry") {
    val Dim = 16; val Sub = 4
    val gen = for {
      p <- vecGen(Dim); c <- vecGen(Dim); s <- Gen.choose(0, Dim / Sub - 1)
    } yield (p, c, s)
    check(Prop.forAll(gen) { case (p, c, s) =>
      val t = PqEncode.tableEntry(p, c, s * Sub, Sub)
      // single-rounding contract: micro-unit rendering is integral
      val um = t * 1e6
      t >= 0.0 && math.abs(um - um.round) < 1e-6
    })
  }

  test("CMS bucket is always within the grid for any token and row") {
    val gen = for {
      t <- Gen.asciiPrintableStr.suchThat(_.nonEmpty)
      r <- Gen.choose(0, 3)
    } yield (t, r)
    check(Prop.forAll(gen) { case (t, r) =>
      val b = PortableHash.detHashJvm(s"$t:cms:$r") % graft.queries.TextQueries.CmsW
      b >= 0 && b < graft.queries.TextQueries.CmsW
    })
  }

  test("Bloom probe has zero false negatives for any eval/train shingle sets") {
    lazy val spark = SparkTestSession.get
    import spark.implicits._
    val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val setGen = Gen.listOfN(30, word).map(_.distinct)
    // each sample runs two tiny Spark jobs — keep the sample count low
    val few = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15)
    val prop = Prop.forAll(Gen.zip(setGen, setGen)) { case (eval, train) =>
      val bits = graft.queries.TrainPrepQueries.bloomBitmap(
        eval.toDF("shingle"))
      val hits = graft.queries.TrainPrepQueries.bloomHitsUdf(bits)
      val n = Seq(train).toDF("sh").select(hits($"sh")).collect().head.getLong(0)
      // every true overlap must be counted (plus possible FPs)
      n >= train.toSet.intersect(eval.toSet).size
    }
    val r = org.scalacheck.Test.check(few, prop)
    assert(r.passed, r.status.toString)
  }
}
