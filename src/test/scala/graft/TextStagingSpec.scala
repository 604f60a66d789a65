package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextStaging

/** The staging-medium contract (TextStaging scaladoc): the parquet
  * medium is the 100 TB form of the once-per-corpus shingle staging —
  * consumers must read a plain parquet scan of the staged table and
  * produce hashes identical to the cache medium. Media are selected by
  * `spark.graft.staging.medium`; results are a pure function of the
  * corpus, so the medium can never change them.
  */
class TextStagingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] =
    SparkEntry.queries(q)(spark, sf).collect()
      .map(_.toString).sorted.toSeq

  private def withMedium[A](m: String)(body: => A): A = {
    spark.conf.set("spark.graft.staging.medium", m)
    try body finally spark.conf.unset("spark.graft.staging.medium")
  }

  test("parquet staging medium: consumer results identical to cache medium") {
    // q33 (Jaccard join) and q93 (decontamination) both consume
    // TextStaging.shingle4 — the two gate queries most sensitive to the
    // staged frame's content
    val cacheQ33 = rows("q33_ngram_jaccard")
    val cacheQ93 = rows("q93_decontaminate")
    val (pqQ33, pqQ93) = withMedium("parquet") {
      (rows("q33_ngram_jaccard"), rows("q93_decontaminate"))
    }
    assert(pqQ33 == cacheQ33, "q33 differs between staging media")
    assert(pqQ93 == cacheQ93, "q93 differs between staging media")
  }

  test("parquet staging medium: consumer plan reads a parquet FileScan, not a cache") {
    val plan = withMedium("parquet") {
      SparkEntry.queries("q33_ngram_jaccard")(spark, sf)
        .queryExecution.executedPlan.toString
    }
    assert(plan.contains("parquet") &&
      plan.contains("graft-staging"),
      s"q33 under the parquet medium does not scan the staging table:\n${plan.take(1200)}")
  }

  test("unknown staging medium fails loudly at first use") {
    val err = intercept[IllegalArgumentException] {
      withMedium("tachyon") { rows("q33_ngram_jaccard") }
    }
    assert(err.getMessage.contains("spark.graft.staging.medium"))
  }
}
