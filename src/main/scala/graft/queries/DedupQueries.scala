package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{DedupFunctions, TextFunctions}
import graft.functions.DedupFunctions._

/** Deduplication over the `documents` table: exact content-hash dedup,
  * MinHash+LSH candidate pairs with Jaccard verification, SimHash, and
  * blocked n-gram Jaccard near-dup mining.
  *
  * Scale notes: exact dedup shuffles 16-byte digests only; MinHash-LSH
  * is explode(bands) → hash-shuffle on bucket → within-bucket self-join,
  * the standard sub-quadratic fuzzy-dedup topology; the n-gram variant
  * demonstrates *blocked* pairing (block by language) — its cost is
  * sum(block²), controlled by the blocking key, never global n².
  */
object DedupQueries extends QueryPack {

  private val MinhashK = 8      // signature length
  private val ShingleN = 3      // tokens per shingle
  private val Bands = 4         // LSH bands (rows-per-band = 2)
  private val RowsPerBand = MinhashK / Bands

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: minimal-id survivor per content digest.
    "q30_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      exactDedup(docs(s, dir), "text", "doc_id")
        .select($"doc_id", contentHash($"text").as("content_hash"))
        .orderBy($"doc_id")
    }),

    // MinHash signatures + LSH banding → candidate pairs → exact
    // shingle-Jaccard verification.
    "q31_minhash_pairs" -> ((s, dir) => {
      import s.implicits._
      // shingle sets + signatures + band buckets computed once per doc,
      // BEFORE the pair join (linear work); the join only moves ids,
      // buckets and precomputed shingle arrays.
      val sig = docs(s, dir).select(
        $"doc_id",
        distinctShingles($"text", ShingleN).as("sh"),
        DedupFunctions.lshBandBuckets(
          minhashSignature($"text", MinhashK, ShingleN), Bands, RowsPerBand).as("buckets"))
      val exploded = sig.select($"doc_id", $"sh", explode($"buckets").as("bucket"))
      val a = exploded.select($"doc_id".as("a_id"), $"sh".as("a_sh"), $"bucket")
      val b = exploded.select($"doc_id".as("b_id"), $"sh".as("b_sh"), $"bucket")
      a.join(b, Seq("bucket"))
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id", jaccardOnSets($"a_sh", $"b_sh").as("jaccard"))
        .distinct()
        .filter($"jaccard" >= 0.4)
        .orderBy($"a_id", $"b_id")
    }),

    // SimHash (16-bit) per document — equal hashes ⇒ near-dup cluster.
    "q32_simhash" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", simhash($"text", 16).as("sh"))
        .orderBy($"doc_id")
    }),

    // Blocked n-gram Jaccard: all pairs within a language block with
    // bigram-set Jaccard above threshold.
    "q33_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select($"doc_id", $"lang",
        distinctShingles($"text", 2).as("sh"))
      val a = d.select($"lang", $"doc_id".as("a_id"), $"sh".as("a_sh"))
      val b = d.select($"lang", $"doc_id".as("b_id"), $"sh".as("b_sh"))
      a.join(b, Seq("lang"))
        .filter($"a_id" < $"b_id")
        .select($"lang", $"a_id", $"b_id", jaccardOnSets($"a_sh", $"b_sh").as("jaccard"))
        .filter($"jaccard" >= 0.35)
        .orderBy($"lang", $"a_id", $"b_id")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash FROM (
        | SELECT doc_id, text, row_number() OVER (
        |  PARTITION BY md5(text) ORDER BY doc_id) AS rk FROM documents)
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "q31_minhash_pairs" -> {
      val buckets = DedupFunctions.lshBandBucketsSql(
        DedupFunctions.minhashSignatureSql("text", MinhashK, ShingleN), Bands, RowsPerBand)
      s"""WITH sig AS (
         | SELECT doc_id, ${distinctShinglesSql("text", ShingleN)} AS sh,
         |  unnest($buckets) AS bucket FROM documents),
         |pairs AS (
         | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         |  ${jaccardOnSetsSql("a.sh", "b.sh")} AS jaccard
         | FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, jaccard FROM pairs WHERE jaccard >= 0.4
         |ORDER BY a_id, b_id""".stripMargin
    },
    "q32_simhash" ->
      s"""SELECT doc_id, ${simhashSql("text", 16)} AS sh
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, lang, ${distinctShinglesSql("text", 2)} AS sh
         |           FROM documents)
         |SELECT lang, a_id, b_id, jaccard FROM (
         | SELECT a.lang AS lang, a.doc_id AS a_id, b.doc_id AS b_id,
         |  ${jaccardOnSetsSql("a.sh", "b.sh")} AS jaccard
         | FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.35
         |ORDER BY lang, a_id, b_id""".stripMargin
  )
}
