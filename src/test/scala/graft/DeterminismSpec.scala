package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replayability under different physical execution: the same query on
  * the same data must produce byte-identical rows regardless of the
  * shuffle partition count (the engine-wide rule SURVEY §7.4 — every
  * "random" decision is a pure function of (row key, seed), so task
  * retries, speculative execution, and cluster-size changes can never
  * shift a result). Exercised on the seeded/sampling queries where an
  * RNG-based implementation would break first.
  */
class DeterminismSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def runWith(partitions: Int, q: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- Seq("q67_det_shuffle", "q69_hash_sample", "q90_split_train_val_test",
      "q94_weighted_reservoir", "q95_mixture_quota", "q28_quantile_sketch",
      "q4b_quantized_rerank", "q9h_lm_bigram_score", "q9i_mixture_upsample",
      "q4c_pq_adc", "q9j_cms_heavy_hitters", "q9k_bloom_decontaminate",
      "q4d_ivfpq_search", "q9l_bucketed_dedup_layout",
      "q9m_quality_percentile", "q9n_mixture_compile",
      "q56_interval_pairs", "q9o_source_lang_pivot", "q38_pair_pagerank",
      "q72_aspect_buckets", "q9p_oov_rate", "q57_drift_monitor",
      "q9q_stratified_split", "q39_dup_leakage_matrix", "q9r_token_spectrum",
      "q3a_contrastive_pairs",
      // rank-assignment ops: global ids must not shift with the range
      // partitioner's sampled boundaries
      "qbl_contiguous_index", "qau_exact_split",
      // per-row scrubs: trivially partition-free, pinned anyway
      "qbv_pii_redact", "qbx_dedup_lines")) {
    test(s"$q is identical at 5 and 32 shuffle partitions") {
      assert(runWith(5, q) == runWith(32, q))
    }
  }
}
