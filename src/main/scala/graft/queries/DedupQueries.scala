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
  * uses a rare-shingle inverted index (prefix-filter family) — its cost
  * is Σ df² over rare shingles, controlled by the df cutoff, never n².
  */
object DedupQueries extends QueryPack {

  private val MinhashK = 8      // signature length
  private val ShingleN = 3      // tokens per shingle
  private val Bands = 4         // LSH bands (rows-per-band = 2)
  private val RowsPerBand = MinhashK / Bands
  private val MaxBucket = 50    // hot-bucket guard: skip degenerate bands
  private val MaxDf = 10        // rare-shingle cutoff for the q33 inverted index
  private val MinShared = 3     // q33 count filter: pairs must share >= 3 rare shingles
  private val JaccN = 4         // q33 shingle width: 4-grams are rare enough
                                // in this corpus to keep postings selective

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
      // Shingle sets + signatures + band buckets are computed once per
      // doc (linear). The candidate join moves ONLY (id, bucket) pairs;
      // shingle arrays are re-attached once per unique candidate pair.
      // Hot buckets (> MaxBucket members) are skipped — the standard
      // LSH-dedup guard that bounds per-bucket work at B²/2 and kills
      // the quadratic blowup a skewed band would otherwise cause.
      val analyze = graft.functions.FastText.minhashAnalyze(
        MinhashK, ShingleN, Bands, RowsPerBand)
      // The signature frame feeds three plan branches (bucket counts +
      // both pair-join sides); persist it so the UDF runs once per doc —
      // the local-mode analogue of materializing the signature table,
      // which is how a 100 TB dedup run stages this anyway.
      val d = docs(s, dir)
        .select($"doc_id", analyze($"text").as("a"))
        .select($"doc_id", $"a.sh".as("sh"), $"a.buckets".as("buckets"))
        .persist()
      val exploded = d.select($"doc_id", explode($"buckets").as("bucket"))
      val okBuckets = exploded.groupBy($"bucket").agg(count(lit(1)).as("n"))
        .filter($"n" >= 2 && $"n" <= MaxBucket)
        .select($"bucket")
      // The eligible-bucket list and candidate-pair set are
      // data-dependent (a near-dup-heavy corpus can make either large),
      // so no forced broadcast hints: AQE broadcasts them at runtime
      // when they come out small and shuffle-joins when they don't.
      val elig = exploded.join(okBuckets, Seq("bucket"))
      val cand = elig.select($"bucket", $"doc_id".as("a_id"))
        .join(elig.select($"bucket", $"doc_id".as("b_id")), Seq("bucket"))
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id")
        .distinct()
      cand
        .join(d.select($"doc_id".as("a_id"), $"sh".as("a_sh")), Seq("a_id"))
        .join(d.select($"doc_id".as("b_id"), $"sh".as("b_sh")), Seq("b_id"))
        .select($"a_id", $"b_id",
          graft.functions.FastText.jaccardUdf($"a_sh", $"b_sh").as("jaccard"))
        .filter($"jaccard" >= 0.4)
        .orderBy($"a_id", $"b_id")
    }),

    // Canonical-fingerprint dedup: documents sharing the sorted distinct
    // lowercase token set collapse to the minimal doc_id (catches
    // reorder/repetition edits that exact hashing misses).
    "q34_fingerprint_dedup" -> ((s, dir) => {
      import s.implicits._
      val fp = docs(s, dir)
        .select($"doc_id",
          graft.functions.FastText.textStatsUdf($"text").getField("fp").as("fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"fp").orderBy($"doc_id")
      fp.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"doc_id", $"fp")
        .orderBy($"doc_id")
    }),

    // SimHash (16-bit) per document — equal hashes ⇒ near-dup cluster.
    "q32_simhash" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", graft.functions.FastText.simhashUdf(16)($"text").as("sh"))
        .orderBy($"doc_id")
    }),

    // N-gram Jaccard similarity join via a rare-shingle inverted index
    // (prefix-filter family, à la PPJoin): candidates must share at
    // least one *rare* trigram (document frequency ≤ MaxDf). The
    // inverted index is a word-count-shaped explode + groupBy; pair
    // formation only touches rare postings lists, so work is bounded by
    // Σ df² over rare shingles — never n². Arrays never enter the pair
    // join: ids pair first, shingle sets re-attach per candidate.
    "q33_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .select($"doc_id",
          graft.functions.FastText.shingleAnalyze(JaccN)($"text").as("a"))
        .select($"doc_id", $"a.sh".as("sh"))
        .persist()
      val postings = d.select($"doc_id", explode($"sh").as("shingle"))
      val rare = postings.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2 && $"df" <= MaxDf)
        .select($"shingle")
      // rare-shingle list and candidate set are data-dependent sizes —
      // leave the join strategy to AQE (see q31 note).
      val elig = postings.join(rare, Seq("shingle"))
      // Count filter (PPJoin family): a pair must share >= MinShared
      // rare shingles to reach exact verification. On a low-entropy
      // corpus single-shingle collisions explode (~436k pairs for ~25
      // survivors at sf0.1); the count cut keeps the verify join
      // proportional to genuinely-similar pairs. The aggregation costs
      // the same shuffle the distinct() needed anyway.
      val cand = elig.select($"shingle", $"doc_id".as("a_id"))
        .join(elig.select($"shingle", $"doc_id".as("b_id")), Seq("shingle"))
        .filter($"a_id" < $"b_id")
        .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("shared"))
        .filter($"shared" >= MinShared)
        .select($"a_id", $"b_id")
      cand
        .join(d.select($"doc_id".as("a_id"), $"sh".as("a_sh")), Seq("a_id"))
        .join(d.select($"doc_id".as("b_id"), $"sh".as("b_sh")), Seq("b_id"))
        .select($"a_id", $"b_id",
          graft.functions.FastText.jaccardUdf($"a_sh", $"b_sh").as("jaccard"))
        .filter($"jaccard" >= 0.35)
        .orderBy($"a_id", $"b_id")
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
      s"""WITH d AS (
         | SELECT doc_id, ${distinctShinglesSql("text", ShingleN)} AS sh,
         |  $buckets AS buckets FROM documents),
         |exploded AS (SELECT doc_id, unnest(buckets) AS bucket FROM d),
         |ok AS (SELECT bucket FROM exploded GROUP BY bucket
         |       HAVING count(*) >= 2 AND count(*) <= $MaxBucket),
         |elig AS (SELECT e.doc_id, e.bucket FROM exploded e JOIN ok USING (bucket)),
         |cand AS (
         | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         | FROM elig a JOIN elig b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id, jaccard FROM (
         | SELECT a_id, b_id, ${jaccardOnSetsSql("da.sh", "db.sh")} AS jaccard
         | FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
         |WHERE jaccard >= 0.4
         |ORDER BY a_id, b_id""".stripMargin
    },
    "q34_fingerprint_dedup" ->
      s"""SELECT doc_id, fp FROM (
         | SELECT doc_id, ${TextFunctions.fingerprintSql("text")} AS fp,
         |  row_number() OVER (PARTITION BY ${TextFunctions.fingerprintSql("text")}
         |   ORDER BY doc_id) AS rk
         | FROM documents)
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "q32_simhash" ->
      s"""SELECT doc_id, ${simhashSql("text", 16)} AS sh
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, ${distinctShinglesSql("text", JaccN)} AS sh
         |           FROM documents),
         |postings AS (SELECT doc_id, unnest(sh) AS shingle FROM d),
         |rare AS (SELECT shingle FROM postings GROUP BY shingle
         |         HAVING count(*) >= 2 AND count(*) <= $MaxDf),
         |elig AS (SELECT p.doc_id, p.shingle FROM postings p JOIN rare USING (shingle)),
         |cand AS (
         | SELECT a_id, b_id FROM (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
         |  FROM elig a JOIN elig b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         | WHERE shared >= $MinShared)
         |SELECT a_id, b_id, jaccard FROM (
         | SELECT a_id, b_id, ${jaccardOnSetsSql("da.sh", "db.sh")} AS jaccard
         | FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
         |WHERE jaccard >= 0.35
         |ORDER BY a_id, b_id""".stripMargin
  )
}
