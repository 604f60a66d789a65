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

  test("q4c: an independent JVM encode+ADC reproduces the engine's exact top-5") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val all = e.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    // same seeded codebook pick as ivfCentroids(k=16, seed=21)
    val books = all
      .sortBy { case (id, _) =>
        (graft.functions.PortableHash.detHashJvm(s"$id:21"), id) }
      .take(16).map(_._2)
    val probe = all.find(_._1 == 0L).get._2
    def d2(v: Array[Float], c: Array[Float], off: Int): Double = {
      var d = 0.0
      for (i <- 0 until 8) {
        val x = v(off + i).toDouble - c(off + i).toDouble; d += x * x
      }
      math.floor(d * 1e6 + 0.5) / 1e6
    }
    val expected = all.filter(_._1 != 0L).map { case (id, v) =>
      val adc = (0 until 8).map { s =>
        val code = books.indices.minBy(j => (d2(v, books(j), s * 8), j))
        (d2(probe, books(code), s * 8) * 1e6).round
      }.sum
      (id, adc)
    }.sortBy { case (id, adc) => (adc, id) }.take(5).toSeq
    val engine = SparkEntry.queries("q4c_pq_adc")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("adc_um"))).toSeq
    assert(engine == expected, s"engine=$engine expected=$expected")
  }

  test("q9j: CMS estimates are one-sided (est >= truth) and within the 2N/w bound") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q9j_cms_heavy_hitters")(spark, dir).collect()
    assert(rows.length == 20)
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).count()
    rows.foreach { r =>
      val t = r.getAs[Long]("true_n"); val est = r.getAs[Long]("cms_est")
      assert(est >= t, s"CMS under-counted (impossible): $r")
      assert(est - t <= 2 * n / 1024, s"error above the 2N/w bound: $r (N=$n)")
    }
  }

  test("q9k: bloom pre-filter never drops a doc the exact decontamination flags") {
    val exact = SparkEntry.queries("q93_decontaminate")(spark, dir)
      .collect().map(_.getAs[Long]("train_id")).toSet
    val bloom = SparkEntry.queries("q9k_bloom_decontaminate")(spark, dir)
      .collect().map(_.getAs[Long]("train_id")).toSet
    // q93 requires >=3 shingles shared with ONE eval doc; bloom counts
    // hits against the union bitmap — a strict superset, zero false
    // negatives (the property that makes it a safe pre-filter)
    assert(exact.subsetOf(bloom), s"bloom missed ${exact -- bloom}")
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
