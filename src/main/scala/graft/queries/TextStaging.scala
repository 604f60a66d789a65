package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Tables

/** Once-per-(session, corpus) staging of the EXPENSIVE text derivations
  * shared across the text family — the same write-once staging-table
  * discipline as DedupQueries.verifiedPairs, applied to the shingle
  * kernels (md5 per shingle per row):
  *
  *  - [[shingle4]]: the 4-gram shingle-set frame q33 (n-gram Jaccard),
  *    q93 (decontamination) and q9k (Bloom pre-filter) each derived
  *    independently — three gate queries, one kernel pass;
  *  - [[spanStats8]]: the 8-token duplicated-span statistics q97 (span
  *    report) and q9c (composed curation gate) each mined with their own
  *    posting explode + df aggregation — two consumers, one posting
  *    shuffle.
  *
  * Deliberately NOT staged: plain `tokens(lower(text))` frames (q23,
  * q9j, q9r, …). The tokenizer is a cheap codegen split; caching a
  * corpus-sized token frame costs more than re-deriving it in the scan
  * (the q9j scaladoc records this judgment). Staging pays where the
  * kernel is expensive (md5 shingling) or the derivation shuffles
  * (span df) — the same rule a production pipeline uses to decide what
  * becomes a staging table.
  *
  * Scale note: at gate scale the default staging medium is the
  * block-manager cache (MEMORY_AND_DISK). At 100 TB, [[spanStats8]]
  * stays cache-shaped (3 longs per doc), but [[shingle4]] is
  * corpus-sized × shingle expansion — there the same once-per-corpus
  * discipline materializes to a staging PARQUET table instead (the q9l
  * bucketed layout / q4a persisted-index pattern: write once keyed by
  * corpus version, consumers scan it), trading block-manager memory for
  * a columnar scan. Both media are implemented:
  * `spark.graft.staging.medium = cache | parquet` selects per session
  * (parquet writes once under `spark.graft.staging.dir`, default a
  * per-application tmp root, then consumers get a plain parquet scan —
  * column-prunable, relation-cached by Spark, no executor memory
  * pinned). TextStagingSpec pins hash-identical consumer results and
  * the FileScan-parquet leaf under the parquet medium.
  */
object TextStaging {

  /** Staging media accepted by `spark.graft.staging.medium`. */
  private val Media = Set("cache", "parquet")

  /** Span width for duplicated-passage mining (q97/q9c — Lee et al.'s
    * substring-dedup granularity: 8 tokens ≈ a boilerplate sentence).
    */
  val SpanN = 8

  private val cache =
    new ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  private def medium(s: SparkSession): String = {
    val m = s.conf.get("spark.graft.staging.medium", "cache")
    require(Media.contains(m),
      s"spark.graft.staging.medium must be one of ${Media.mkString("/")}, got '$m'")
    m
  }

  /** Root for parquet-medium staging tables. Per-application by default
    * so concurrent runs never share a path; a production deployment sets
    * `spark.graft.staging.dir` to a durable corpus-versioned location
    * and gets cross-job reuse for free (the write is keyed by corpus
    * dir, so a re-run against the same corpus re-reads, not re-derives).
    */
  private def stagingRoot(s: SparkSession): String =
    s.conf.get("spark.graft.staging.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-staging-${s.sparkContext.applicationId}")

  private def staged(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame = {
    val m = medium(s)
    cache.computeIfAbsent((s, dir, key, m), { _ =>
      if (m == "parquet") {
        // Write-once per (session, corpus, key): the memoizing map is the
        // once-guard within a session; across sessions the path itself is
        // the guard when staging.dir is durable (overwrite is idempotent —
        // the frame is a pure function of the corpus).
        val path = s"${stagingRoot(s)}/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}/$key"
        build.write.mode("overwrite").parquet(path)
        s.read.parquet(path)
      } else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize now: consumers read cached rows, provably
        df
      }
    })
  }

  /** `(doc_id, sh array<string>)` — each document's distinct 4-gram
    * shingle set (the md5-per-shingle kernel runs once per row at
    * materialization).
    */
  def shingle4(s: SparkSession, dir: String): DataFrame =
    staged(s, dir, "shingle4") {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.FastText.shingleAnalyze(4)(col("text")).getField("sh").as("sh"))
    }

  /** `(doc_id, n_spans, n_dup)` — per-document distinct [[SpanN]]-token
    * span count and how many of those spans occur in ≥2 documents
    * corpus-wide. Span document frequencies are an AGGREGATION joined
    * back, not a count window: a window partitioned by the span pins
    * every occurrence of a hot boilerplate span on one reducer
    * (unbounded Zipf skew at 100 TB), while the aggregate map-side
    * combines hot spans per task and the join-back is AQE
    * skew-splittable. The transient posting frame unpersists once the
    * (doc-sized) stats are materialized.
    */
  def spanStats8(s: SparkSession, dir: String): DataFrame =
    // Always cache-medium: 3 longs per doc is block-manager-shaped at
    // any corpus size (the parquet medium targets shingle expansion).
    cache.computeIfAbsent((s, dir, "spanStats8", "cache"), { _ =>
      val analyze = graft.functions.FastText.shingleAnalyze(SpanN)
      val p = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(analyze(col("text")).getField("sh")).as("g"))
        .persist()
      val dfG = p.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val stats = p.join(dfG, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          count(when(col("df") >= 2, lit(1))).as("n_dup"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stats.count() // materialize the (doc-sized) stats, then free the
      p.unpersist() // corpus-sized posting cache — verifiedPairs's shape
      stats
    })
}
