package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: int8 scalar-quantized ANN (q4b), bigram-LM
  * quality scoring (q9h), and mixture upsampling (q9i). The oracle gate
  * hash-checks values; these specs pin the semantic invariants the hash
  * alone wouldn't explain — quantization must approximate the exact
  * ranking, LM scores must be valid scaled probabilities, and the
  * stochastic-rounding copy counts must bracket their epoch weights.
  */
class QuantizedLmSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("q4b: quantized rerank recovers the exact brute-force top-5") {
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, dir)
      .collect().take(5).map(_.getAs[Long]("vec_id")).toSet
    val quant = SparkEntry.queries("q4b_quantized_rerank")(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // int8 with a 20-candidate pool loses at most a boundary straggler
    assert((exact & quant).size >= 4,
      s"quantized recall collapsed: exact=$exact quant=$quant")
  }

  test("q4b: quantized and exact scores agree to int8 resolution") {
    SparkEntry.queries("q4b_quantized_rerank")(spark, dir).collect().foreach { r =>
      val q = r.getAs[Double]("qscore")
      val s = r.getAs[Double]("score")
      assert(math.abs(q - s) < 0.02, s"quantization error too large: q=$q exact=$s")
    }
  }

  test("q9h: LM scores are valid scaled probabilities and every doc scores") {
    val rows = SparkEntry.queries("q9h_lm_bigram_score")(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs, s"${rows.length} scored of $nDocs docs")
    rows.foreach { r =>
      val ppm = r.getAs[Long]("avg_ppm")
      assert(ppm >= 0 && ppm <= 1000000, s"avg_ppm out of [0, 1e6]: $r")
      assert(r.getAs[Long]("n_bigrams") > 0, s"empty bigram frame: $r")
    }
  }

  test("q9i: copy counts bracket the epoch weight and mean converges to it") {
    SparkEntry.queries("q9i_mixture_upsample")(spark, dir).collect().foreach { r =>
      val srcNum = r.getAs[String]("source").drop(3).toInt
      val w = 1.0 + (srcNum % 4) * 0.75
      val n = r.getAs[Long]("n_docs").toDouble
      val copies = r.getAs[Long]("n_copies_out").toDouble
      assert(copies >= math.floor(w) * n && copies <= math.ceil(w) * n,
        s"copies outside [floor(w)n, ceil(w)n]: $r (w=$w)")
      // stochastic rounding is unbiased: the achieved epoch factor sits
      // near w (loose band — sf0.001 sources hold only a few docs)
      assert(math.abs(copies / n - w) <= 0.5, s"epoch factor far from w=$w: $r")
    }
  }
}
