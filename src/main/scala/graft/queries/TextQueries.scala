package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.functions.Portable.pround

/** Text-analysis operators over the `documents` table: token stats,
  * language ID, quality scoring, fingerprinting, vocabulary extraction.
  * All pure codegen'd expressions — a single WholeStageCodegen pass over
  * the scan, embarrassingly parallel at any scale.
  */
object TextQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Count-min sketch geometry — shared by the batch gate (q9j) and the
    * streaming twin ([[graft.streaming.StreamOps.streamingCms]]) so both
    * build the SAME sketch cell-for-cell.
    */
  val CmsW = 1024
  val CmsD = 4

  /** HyperLogLog geometry (qaw): m=256 registers over the 32-bit portable
    * hash — 8 bucket bits, 24 suffix bits. The estimator numerator
    * α·m²·2²⁵ is precomputed to ONE double literal so both engines parse
    * the identical value (the harmonic sum stays exact BIGINT).
    */
  val HllM = 256
  val HllW = 24
  val HllNumer: Double =
    0.7213 / (1 + 1.079 / HllM) * HllM.toDouble * HllM.toDouble * (1L << (HllW + 1)).toDouble

  /** CMS cell column for one (token, row) pair. */
  def cmsBucket(token: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.detHash(
      concat(token, lit(":cms:"), r.cast("string"))) % CmsW

  /** The d×w counter grid over a `token`-column frame: every cell an
    * independent SUM, so the aggregation is map-side combined and the
    * exchange carries ≤ d·w rows per task at any corpus size — and the
    * same plan is an incremental streaming aggregation for free.
    */
  def cmsCells(tok: DataFrame): DataFrame =
    tok.select(col("token"), explode(typedLit((0 until CmsD).toList)).as("r"))
      .withColumn("bucket", cmsBucket(col("token"), col("r")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HTML → text extraction (the trafilatura/boilerpipe stage every
    // web-crawl corpus runs first): each document is wrapped in a
    // formulaic page — mixed-case STYLE/NAV, a script whose body
    // contains a stray '<', entity-bearing prose, and footer/aside
    // boilerplate — then [[TextFunctions.htmlExtract]] recovers the
    // text. Both engines build the SAME page and run the SAME regex
    // algebra, so the md5 of the extraction is the gate: a surviving
    // nav link, an undecoded entity, a double-decoded &amp;lt;, or the
    // script's stray '<' breaking tag-strip all change it. Pure
    // codegen'd per-row chain — no UDF, no shuffle.
    "qbi_html_extract" -> ((s, dir) => {
      import s.implicits._
      val html = concat(
        lit("<html><head><title>Doc "), $"doc_id".cast("string"),
        lit("</title><STYLE>body{color:#333}</STYLE>" +
          "<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script>" +
          "</head><body><NAV><a href=\"/\">Home</a> | <a href=\"/about\">About</a></NAV>" +
          "<h1>Doc "), $"doc_id".cast("string"),
        lit("</h1><p>Tom &amp; Jerry &lt;3&nbsp;&quot;quoted&#39;s&quot; "), $"text",
        lit("</p><footer>&copy; 2024 Example &amp; Co.</footer>" +
          "<aside>ad ad ad</aside></body></html>"))
      docs(s, dir)
        .withColumn("clean", graft.functions.TextFunctions.htmlExtract(html))
        .select($"doc_id", length($"clean").cast("long").as("n_chars_clean"),
          md5($"clean").as("clean_md5"))
        .orderBy($"doc_id")
    }),

    // PII redaction (the pre-release scrub every published corpus runs):
    // two thirds of the documents get formulaic PII appended — an email,
    // an IPv4, and a dashed phone, all derived from doc_id — then
    // [[TextFunctions.redactPii]] scrubs the augmented text. Both
    // engines build the SAME augmentation and run the SAME RE2-subset
    // patterns in the SAME order, so the md5 of the redacted text plus
    // the per-family match counts are the gate: a pattern that
    // under-matches, over-matches, or fires out of order changes them.
    // Pure codegen'd per-row regexp chain — no UDF, no shuffle.
    "qbv_pii_redact" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.{redactPii, piiCount}
      val aug = concat($"text",
        when($"doc_id" % 3 =!= 0, concat(
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com from 10."), ($"doc_id" % 256).cast("string"),
          lit("."), ($"doc_id" % 97).cast("string"), lit(".7 or call 555-"),
          lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"), lit(" now")))
          .otherwise(lit("")))
      docs(s, dir)
        .withColumn("aug", aug)
        .select($"doc_id",
          piiCount($"aug", "email").as("n_email"),
          piiCount($"aug", "ip").as("n_ip"),
          piiCount($"aug", "phone").as("n_phone"),
          md5(redactPii($"aug")).as("red_md5"))
        .orderBy($"doc_id")
    }),

    // Within-document repeated-line removal (CCNet's page scrub, the
    // within-page complement of qbh's cross-corpus excision): each
    // document becomes a formulaic multi-line page — its 8-token block
    // lines, a copy of its first two lines, and a doubled footer — and
    // [[TextFunctions.dedupLines]] keeps each distinct line's first
    // occurrence in order. Both engines build the same page; DuckDB's
    // unordered list_distinct forces the oracle to spell first-
    // occurrence survival as an indexed prefix filter, so the md5 pins
    // the ORDER as well as the survivor set. Pure per-row projection.
    "qbx_dedup_lines" -> ((s, dir) => {
      import s.implicits._
      val blocks = graft.functions.DedupFunctions.blockArray($"text", 8)
      val page = array_join(concat(blocks, slice(blocks, 1, 2),
        array(lit("(c) footer 2024"), lit("(c) footer 2024"))), "\n")
      docs(s, dir).withColumn("page", page)
        .withColumn("clean", graft.functions.TextFunctions.dedupLines($"page"))
        .select($"doc_id",
          size(filter(split($"page", "\n"), l => length(trim(l)) > lit(0)))
            .cast("long").as("n_lines"),
          size(filter(split($"clean", "\n"), l => length(trim(l)) > lit(0)))
            .cast("long").as("n_kept"),
          md5($"clean").as("clean_md5"))
        .orderBy($"doc_id")
    }),

    // N-gram repetition score — the standard "repeated template text"
    // curation signal (fraction of trigram positions occupied by a
    // repeat): 1 - distinct_trigrams / total_trigrams. Reuses the
    // shingle kernel already proven bit-identical to the oracle; pure
    // per-row work, embarrassingly parallel.
    "q25_repetition" -> ((s, dir) => {
      import s.implicits._
      val analyze = graft.functions.FastText.shingleAnalyze(3)
      docs(s, dir)
        .select($"doc_id", analyze($"text").as("a"))
        .select($"doc_id", size($"a.sh").as("distinct_tri"),
          greatest($"a.ntok" - 2, lit(1)).as("total_tri"))
        .withColumn("rep_ratio",
          pround(lit(1.0) - $"distinct_tri".cast("double") / $"total_tri", 6))
        .orderBy($"doc_id")
    }),

    // Token counting + punctuation density + canonical fingerprint.
    "q20_text_stats" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", length($"text").as("n_chars_txt"),
          graft.functions.FastText.textStatsUdf($"text").as("st"))
        .select($"doc_id", $"st.n_tokens".as("n_tokens"), $"n_chars_txt",
          $"st.n_punct".as("n_punct"), $"st.fp".as("fp"))
        .orderBy($"doc_id")
    }),

    // Heuristic language ID (stopword argmax) per document.
    "q21_lang_id" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select($"doc_id", $"lang", graft.functions.FastText.langIdUdf($"text").as("lang_pred"))
        .orderBy($"doc_id")
    }),

    // Composite quality score + keep-filter at 0.5.
    "q22_quality_score" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select($"doc_id", graft.functions.FastText.qualityScoreUdf($"text").as("quality"))
        .filter($"quality" >= 0.5)
        .orderBy($"doc_id")
    }),

    // Token counting two ways: whitespace tokens and a BPE-ish regex
    // segmentation (letter runs | digits | single punctuation) — the
    // cheap token-budget estimator for LLM corpora.
    "q24_token_budget" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(
        $"doc_id",
        tokenCount($"text").as("ws_tokens"),
        regexp_count(lower($"text"), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).as("bpeish_tokens"))
        .orderBy($"doc_id")
    }),

    // The flagship curation composition — what a training-data pipeline
    // actually runs: exact-dedup survivors → language ID → quality gate
    // → token budget, in one declarative plan. Dedup shuffles digests,
    // the scoring kernels fuse into the same scan pass; Catalyst pushes
    // the whole thing into two stages at any scale.
    "q36_curation_pipeline" -> ((s, dir) => {
      import s.implicits._
      graft.functions.DedupFunctions.exactDedup(docs(s, dir), "text", "doc_id")
        .select($"doc_id",
          graft.functions.FastText.langIdUdf($"text").as("lang_pred"),
          graft.functions.FastText.qualityScoreUdf($"text").as("quality"),
          tokenCount($"text").as("n_tokens"))
        .filter($"lang_pred" === "en" && $"quality" >= 0.5)
        .orderBy($"doc_id")
    }),

    // KMV (k-minimum-values) distinct-count sketch over the token
    // vocabulary — the deterministic, oracle-checkable cousin of
    // HLL/approx_count_distinct for 100 TB cardinality estimation: keep
    // the k smallest deterministic hashes of the distinct values;
    // estimate = (k-1) · 2^32 / kth_min. The k-smallest set is a
    // mergeable sketch (union = k smallest of the union), and the plan
    // is distinct-hash aggregate → TakeOrdered(k) — no full sort, no
    // single-reducer pass. Falls back to the exact count when fewer
    // than k distinct values exist.
    "q26_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val K = 16
      val kmin = docs(s, dir)
        .select(explode(tokens(lower($"text"))).as("token"))
        .select(graft.functions.PortableHash.detHash($"token").as("h"))
        .distinct()
        .orderBy($"h")
        .limit(K)
      kmin.agg(max($"h").as("kth"), count(lit(1)).as("k"))
        .select(
          when($"k" < K, $"k".cast("double"))
            .otherwise(pround(lit((K - 1) * 4294967296.0) / $"kth", 4))
            .as("est_distinct"),
          $"k")
    }),

    // Grouped KMV sketches: per-language distinct-token estimates. The
    // k-smallest pick per group is a rank window over the DISTINCT
    // (group, hash) frame — already collapsed to vocabulary size, not
    // corpus size; if per-group vocabularies themselves outgrow a
    // reducer, pre-filter with a coarse hash bound before ranking.
    "q27_kmv_grouped" -> ((s, dir) => {
      import s.implicits._
      val K = 16
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"h")
      docs(s, dir)
        .select($"lang", explode(tokens(lower($"text"))).as("token"))
        .select($"lang", graft.functions.PortableHash.detHash($"token").as("h"))
        .distinct()
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= K)
        .groupBy($"lang")
        .agg(max($"h").as("kth"), count(lit(1)).as("k"))
        .select($"lang",
          when($"k" < K, $"k".cast("double"))
            .otherwise(pround(lit((K - 1) * 4294967296.0) / $"kth", 4))
            .as("est_distinct"),
          $"k")
        .orderBy($"lang")
    }),

    // Count-min sketch heavy-hitter estimation: a d×w counter grid
    // (d=4 rows, w=1024 buckets) whose cell (r, h_r(token) % w) sums
    // occurrences; a token's estimate is the MIN over its d cells —
    // one-sided error (est ≥ true), bounded by 2N/w with prob 1−2⁻ᵈ.
    // The sketch is 4096 counters REGARDLESS of corpus size, and every
    // cell is an independent SUM — partial aggregation collapses each
    // task's contribution to ≤4096 rows before the exchange, so the
    // shuffle moves sketch-sized state while the exact word-count
    // shuffle (q23) moves vocabulary-sized state. Gate output compares
    // the estimate against truth for the exact top-20 tokens, putting
    // the one-sided-error contract itself on the hash path.
    "q9j_cms_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      // two aggregations over the token stream (sketch build + exact
      // top-20): both reduce a cheap re-scanned map stage; persisting
      // the exploded token frame would cache corpus-sized state for a
      // scan that costs less than the cache write at scale
      def tok = docs(s, dir).select(explode(tokens(lower($"text"))).as("token"))
      val cms = TextQueries.cmsCells(tok)
      val top = tok.groupBy($"token").agg(count(lit(1)).as("true_n"))
        .orderBy($"true_n".desc, $"token").limit(20)
      top
        .select($"token", $"true_n", explode(typedLit((0 until CmsD).toList)).as("r"))
        .withColumn("bucket", TextQueries.cmsBucket($"token", $"r"))
        .join(cms, Seq("r", "bucket"))
        .groupBy($"token")
        .agg(max($"true_n").as("true_n"), min($"cnt").as("cms_est"))
        .orderBy($"true_n".desc, $"token")
    }),

    // Bigram language-model scoring — the perplexity-proxy quality
    // signal: train bigram/prefix counts on the corpus itself, score
    // every document by its mean bigram probability. All arithmetic is
    // INTEGER (probabilities scaled to parts-per-million with floor
    // division) so the score is exact and summation-order-independent —
    // no cross-engine libm/float-accumulation hazard. Plan shape: the
    // "model" is two AGGREGATIONS of the exploded bigram frame (bigram
    // counts, then prefix counts reduced from them — vocabulary-sized,
    // never corpus-sized) joined back to the frame. Deliberately NOT
    // the count-window form (NOTES_r6's one-exchange trick): a window
    // partitioned by w1 puts every bigram starting with a stop-word on
    // ONE reducer — unbounded skew on Zipf text at 100 TB — while
    // aggregations map-side combine hot keys per task and the
    // join-back is AQE skew-splittable. The persist keeps the exploded
    // frame from being derived twice (model build + scoring pass).
    "q9h_lm_bigram_score" -> ((s, dir) => {
      import s.implicits._
      val Scale = 1000000L
      val b = docs(s, dir)
        .select($"doc_id", tokens(lower($"text")).as("t"))
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(zip_with(
          slice($"t", lit(1), size($"t") - 1),
          slice($"t", lit(2), size($"t") - 1),
          (a, bb) => struct(a.as("w1"), bb.as("w2")))).as("bg"))
        .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
        .persist()
      val c2 = b.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
      b.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .withColumn("term", expr(s"($Scale * c2) DIV c1"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"term").as("score_sum"))
        .select($"doc_id", $"n_bigrams",
          expr("score_sum DIV n_bigrams").as("avg_ppm"))
        .orderBy($"doc_id")
    }),

    // Token frequency SPECTRUM (frequency-of-frequencies): how many
    // vocabulary types occur with counts in each power-of-two band
    // (bucket = bit length of the count — ⌊log2 c⌋+1, integer-exact via
    // the binary string rendering both engines share) — the Zipf/Heaps
    // corpus-health diagnostic (a fat low band = noisy long tail; mass
    // pushed high = template text) and the input to Good-Turing
    // smoothing. Two hash aggregations over integer counts,
    // vocabulary-sized then spectrum-sized — nothing floats.
    "q9r_token_spectrum" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select(explode(tokens(lower($"text"))).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("c"))
        .withColumn("freq_bucket", length(bin($"c")).cast("long"))
        .groupBy($"freq_bucket")
        .agg(count(lit(1)).as("n_types"), sum($"c").as("n_occurrences"))
        .orderBy($"freq_bucket")
    }),

    // Tokenizer-coverage / OOV analysis: train a top-K vocabulary on
    // the corpus, then score every document's out-of-vocabulary rate —
    // the number that says whether a tokenizer's vocab budget fits the
    // data. The vocab is a top-K aggregate (small by construction, K
    // rows — broadcast side), the scoring join is corpus-tokens ×
    // broadcast — no shuffle of the token stream beyond its per-doc
    // rollup. Boundary ties rank (count DESC, token) so the vocab set
    // is total and replayable.
    "q9p_oov_rate" -> ((s, dir) => {
      import s.implicits._
      val VocabK = 1000
      def tok = docs(s, dir)
        .select($"doc_id", explode(tokens(lower($"text"))).as("token"))
      val vocab = tok.groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token").limit(VocabK)
        .select($"token", lit(1).as("inv"))
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when($"inv".isNull, lit(1))).as("n_oov"))
        .withColumn("oov_rate",
          pround($"n_oov".cast("double") / $"n_tokens".cast("double"), 6))
        .orderBy($"doc_id")
    }),

    // Vocabulary: explode tokens, top-20 by frequency (generator + agg
    // + top-k — the classic word-count shuffle).
    "q23_vocab_top" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select(explode(tokens(lower($"text"))).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token")
        .limit(20)
    }),

    // HyperLogLog distinct-token estimates per source + merged union row
    // (Flajolet et al. 2007) — the industry-standard mergeable
    // cardinality sketch beside KMV (q26/q27): m=256 registers, register
    // j = max over bucket-j hashes of (leading-zero position of the
    // 24-bit hash suffix). Everything is built-in aggregation: registers
    // are a groupBy max (map-side combined, ≤ m rows per group at ANY
    // corpus size) and the union registers are max-merged from the
    // per-source ones — the mergeability IS the query. The harmonic
    // denominator Σ2^-Mj is carried as the exact integer Σ2^(25-Mj), so
    // the only float math is the final estimator division (portable
    // literal numerator, q1g discipline); exact ndv runs beside it to
    // show the ~6.5% (1.04/√m) envelope.
    "qaw_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val tok = d.select($"source", explode(tokens(lower($"text"))).as("token"))
      // dense registers feed both the per-source rows and the union merge
      val dense = hllDenseRegisters(s, tok).persist()
      val union = dense.groupBy($"bucket")
        .agg(max($"m").as("m")).withColumn("source", lit("__union__"))
      val exact = tok
        .groupBy($"source").agg(countDistinct($"token").as("n_exact"))
      val exactUnion = tok
        .agg(countDistinct($"token").as("n_exact"))
        .withColumn("source", lit("__union__"))
      hllEstimate(dense.select($"source", $"bucket", $"m")
          .union(union.select($"source", $"bucket", $"m")))
        .join(exact.union(exactUnion.select($"source", $"n_exact")), Seq("source"))
        .select($"source", $"n_exact", $"hll_est", $"zero_regs")
        .orderBy($"source")
    }),

    // BPE merge-rule training (Sennrich et al. 2016) — the tokenizer-
    // construction step of an LLM data pipeline, distributed: the
    // corpus collapses to a word-frequency table in ONE shuffle, then
    // every merge iteration is a vocab-sized aggregation whose argmax
    // (count desc, pair asc — fully deterministic) is the only row the
    // driver sees. The oracle replays all 8 iterations as unrolled
    // MATERIALIZED CTEs sharing the engine's exact double-space
    // `replace` merge semantics, so rule choice, tie-breaks, and pair
    // counts all hash-match. See [[graft.operators.Bpe]].
    "qbb_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val (merges, _) = bpeState(s, dir)
      merges.map(m => (m.rank, m.lhs, m.rhs, m.count))
        .toDF("rank", "lhs", "rhs", "n").orderBy($"rank")
    }),

    // BPE apply — the production tokenize path: the 8 learned rules
    // fold into ONE codegen `replace` chain (no join, no UDF, map-only
    // at corpus scale), here run over the vocabulary and weighted by
    // word counts to the corpus token spectrum. Exercises applyMerges,
    // NOT the trainer's internal state — their equality is the point
    // (also pinned per-word in BpeSpec).
    "qbc_bpe_apply" -> ((s, dir) => {
      import s.implicits._
      val (merges, fin) = bpeState(s, dir)
      fin.select(explode(graft.operators.Bpe.applyMerges($"word", merges))
          .as("tok"), $"cnt")
        .groupBy($"tok").agg(sum($"cnt").as("freq"))
        .orderBy($"freq".desc, $"tok".asc).limit(20)
    })
  )

  /** BPE training configuration shared by qbb/qbc and their oracles:
    * top-2000 lowercase-alpha words, 8 merges. Trained once per
    * (session, corpus) — the state is the merge list plus the final
    * vocab-sized representations frame.
    */
  private val BpeVocab = 2000
  private val BpeNumMerges = 8

  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Seq[graft.operators.Bpe.Merge], DataFrame)]

  private def bpeState(s: SparkSession, dir: String) =
    bpeCache.computeIfAbsent((s, dir), { _ =>
      graft.operators.Bpe.train(
        graft.operators.Bpe.wordCounts(docs(s, dir), "text", BpeVocab),
        BpeNumMerges)
    })

  /** The unrolled-iteration oracle prefix for the BPE gates: w0/r0 the
    * word table and char representations, then per rank i the pair
    * counts (p_i), the argmax rule (b_i), and the merged
    * representations (r_i). MATERIALIZED is load-bearing: each CTE is
    * referenced twice, and DuckDB's default inlining makes the chain
    * exponential without it.
    */
  private def bpeOracleWith: String = {
    val steps = (1 to BpeNumMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         | SELECT li || '  ' || ri AS pair, sum(cnt) AS n FROM (
         |  SELECT cnt, a[i] AS li, a[i+1] AS ri
         |  FROM (SELECT cnt, string_split(repr, '  ') AS a FROM r${i - 1}),
         |       LATERAL unnest(range(1, len(a))) AS t(i)) GROUP BY 1),
         |b$i AS MATERIALIZED (
         | SELECT pair, replace(pair, '  ', '') AS merged, n
         | FROM p$i ORDER BY n DESC, pair LIMIT 1),
         |r$i AS MATERIALIZED (
         | SELECT word, cnt,
         |  trim(replace(' ' || repr || ' ',
         |       ' ' || (SELECT pair FROM b$i) || ' ',
         |       ' ' || (SELECT merged FROM b$i) || ' ')) AS repr
         | FROM r${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       | SELECT unnest(${tokensSql("lower(text)")}) AS w FROM documents),
       |w0 AS MATERIALIZED (
       | SELECT w AS word, count(*) AS cnt FROM toks
       | WHERE regexp_matches(w, '^[a-z]+$$')
       | GROUP BY w ORDER BY cnt DESC, w LIMIT $BpeVocab),
       |r0 AS MATERIALIZED (
       | SELECT word, cnt,
       |  concat(array_to_string(string_split(word, ''), '  '), '  </w>') AS repr
       | FROM w0),
       |$steps""".stripMargin
  }

  /** Dense m-register HLL frame (source, bucket, m) from a (source, token)
    * frame — a groupBy max plus a dim-sized grid left-join for the empty
    * registers; map-side combined, ≤ [[HllM]] rows per group at any scale.
    */
  def hllDenseRegisters(s: SparkSession, tok: DataFrame): DataFrame = {
    import s.implicits._
    val perSrc = tok
      .select($"source", graft.functions.PortableHash.detHash($"token").as("h"))
      .select($"source", expr(s"h % $HllM").as("bucket"),
        when(expr(s"h DIV $HllM") === 0, lit(HllW + 1))
          .otherwise(lit(HllW + 1) - length(bin(expr(s"h DIV $HllM"))))
          .as("rho"))
      .groupBy($"source", $"bucket").agg(max($"rho").as("m"))
    tok.select($"source").distinct()
      .crossJoin(s.range(HllM).toDF("bucket"))
      .join(perSrc, Seq("source", "bucket"), "left")
      .select($"source", $"bucket", coalesce($"m", lit(0)).as("m"))
  }

  /** (source, hll_est, zero_regs) from dense registers: exact-BIGINT
    * harmonic sum, float only in the final estimator (+ the standard
    * small-range linear-counting correction).
    */
  def hllEstimate(regs: DataFrame): DataFrame = {
    import regs.sparkSession.implicits._
    regs.groupBy($"source")
      .agg(sum(expr(s"shiftleft(1L, ${HllW + 1} - cast(m as int))")).as("ss"),
        sum(when($"m" === 0, 1L).otherwise(0L)).as("v"))
      .select($"source",
        pround(
          when((lit(HllNumer) / $"ss" <= lit(2.5 * HllM)) && ($"v" > 0),
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / $"v"))
            .otherwise(lit(HllNumer) / $"ss"), 4).as("hll_est"),
        $"v".as("zero_regs"))
  }

  override def oracles: Map[String, String] = Map(
    // identical page construction (|| concat) and the same regex
    // algebra via htmlExtractSql — RE2-subset patterns, DuckDB's 'g'
    // option standing in for Spark's always-global replace
    "qbi_html_extract" -> {
      val page = "'<html><head><title>Doc ' || doc_id || " +
        "'</title><STYLE>body{color:#333}</STYLE>" +
        "<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script>" +
        "</head><body><NAV><a href=\"/\">Home</a> | <a href=\"/about\">About</a></NAV>" +
        "<h1>Doc ' || doc_id || " +
        "'</h1><p>Tom &amp; Jerry &lt;3&nbsp;&quot;quoted&#39;s&quot; ' || text || " +
        "'</p><footer>&copy; 2024 Example &amp; Co.</footer>" +
        "<aside>ad ad ad</aside></body></html>'"
      s"""SELECT doc_id, CAST(length(clean) AS BIGINT) AS n_chars_clean,
         |  md5(clean) AS clean_md5
         |FROM (SELECT doc_id, ${graft.functions.TextFunctions.htmlExtractSql("h")} AS clean
         |      FROM (SELECT doc_id, $page AS h FROM documents))
         |ORDER BY doc_id""".stripMargin
    },
    // identical augmentation (|| concat of the same doc_id arithmetic)
    // and the same pattern chain via redactPiiSql / piiCountSql
    "qbv_pii_redact" -> {
      import graft.functions.TextFunctions.{redactPiiSql, piiCountSql}
      val aug = "text || (CASE WHEN doc_id % 3 <> 0 THEN " +
        "' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@mail.example.com from 10.' || CAST(doc_id % 256 AS VARCHAR) || " +
        "'.' || CAST(doc_id % 97 AS VARCHAR) || '.7 or call 555-' || " +
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || " +
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' " +
        "ELSE '' END)"
      s"""SELECT doc_id,
         |  ${piiCountSql("aug", "email")} AS n_email,
         |  ${piiCountSql("aug", "ip")} AS n_ip,
         |  ${piiCountSql("aug", "phone")} AS n_phone,
         |  md5(${redactPiiSql("aug")}) AS red_md5
         |FROM (SELECT doc_id, $aug AS aug FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    // identical page construction (per-doc block list || first-two ||
    // doubled footer) and the prefix-filter dedup via dedupLinesSql
    "qbx_dedup_lines" -> {
      val toks = graft.functions.TextFunctions.tokensSql("text")
      val clean = graft.functions.TextFunctions.dedupLinesSql("page")
      val nLines = "length(list_filter(string_split(page, chr(10)), " +
        "l -> length(trim(l)) > 0))"
      val nKept = "length(list_filter(string_split(clean, chr(10)), " +
        "l -> length(trim(l)) > 0))"
      s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
         |l AS (SELECT doc_id,
         |  list_transform(generate_series(0, (length(t) + 7) // 8 - 1),
         |    i -> array_to_string(t[(i*8+1):(i*8+8)], ' ')) AS blocks
         |  FROM t),
         |p AS (SELECT doc_id, array_to_string(
         |  blocks || blocks[1:2] || ['(c) footer 2024', '(c) footer 2024'],
         |  chr(10)) AS page FROM l),
         |c AS (SELECT doc_id, page, $clean AS clean FROM p)
         |SELECT doc_id,
         |  CAST($nLines AS BIGINT) AS n_lines,
         |  CAST($nKept AS BIGINT) AS n_kept,
         |  md5(clean) AS clean_md5
         |FROM c
         |ORDER BY doc_id""".stripMargin
    },

    "qaw_hll_distinct" -> {
      val h = graft.functions.PortableHash.duckHashSql("token")
      s"""WITH toks AS (
         | SELECT source, unnest(${tokensSql("lower(text)")}) AS token FROM documents),
         |rho AS (
         | SELECT source, h % $HllM AS bucket,
         |  CASE WHEN h // $HllM = 0 THEN ${HllW + 1}
         |       ELSE ${HllW + 1} - length(printf('%b', h // $HllM)) END AS rho
         | FROM (SELECT source, $h AS h FROM toks)),
         |regs AS (SELECT source, bucket, max(rho) AS m FROM rho GROUP BY 1, 2),
         |grid AS (SELECT source, b AS bucket
         |         FROM (SELECT DISTINCT source FROM documents),
         |              (SELECT unnest(generate_series(0, ${HllM - 1})) AS b)),
         |dense AS (SELECT g.source, g.bucket, coalesce(m, 0) AS m
         |          FROM grid g LEFT JOIN regs USING (source, bucket)),
         |allregs AS (
         | SELECT source, m FROM dense
         | UNION ALL
         | SELECT '__union__' AS source, max(m) AS m FROM dense GROUP BY bucket),
         |agg AS (
         | SELECT source,
         |  CAST(sum(1::BIGINT << (${HllW + 1} - m)) AS BIGINT) AS ss,
         |  CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
         | FROM allregs GROUP BY source),
         |exact AS (
         | SELECT source, count(DISTINCT token) AS n_exact FROM toks GROUP BY source
         | UNION ALL
         | SELECT '__union__', count(DISTINCT token) FROM toks)
         |SELECT agg.source, n_exact,
         | ${graft.functions.Portable.proundSql(
        s"CASE WHEN $HllNumer / ss <= ${2.5 * HllM} AND v > 0 " +
          s"THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v) " +
          s"ELSE $HllNumer / ss END", 4)} AS hll_est,
         | v AS zero_regs
         |FROM agg JOIN exact ON agg.source = exact.source
         |ORDER BY agg.source""".stripMargin
    },
    "q25_repetition" -> {
      val distinctTri = s"length(${graft.functions.DedupFunctions.distinctShinglesSql("text", 3)})"
      val totalTri = s"greatest(${tokenCountSql("text")} - 2, 1)"
      s"""SELECT doc_id, $distinctTri AS distinct_tri, $totalTri AS total_tri,
         | ${graft.functions.Portable.proundSql(
        s"1.0 - ($distinctTri)::DOUBLE / ($totalTri)", 6)} AS rep_ratio
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q36_curation_pipeline" ->
      s"""WITH surv AS (
         | SELECT doc_id, text FROM (
         |  SELECT doc_id, text,
         |   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
         |  FROM documents) WHERE rk = 1)
         |SELECT doc_id, lang_pred, quality, n_tokens FROM (
         | SELECT doc_id, ${langIdSql("text")} AS lang_pred,
         |  ${qualityScoreSql("text")} AS quality,
         |  ${tokenCountSql("text")} AS n_tokens
         | FROM surv)
         |WHERE lang_pred = 'en' AND quality >= 0.5
         |ORDER BY doc_id""".stripMargin,
    "q27_kmv_grouped" -> {
      val K = 16
      s"""WITH h AS (
         | SELECT DISTINCT lang, ${graft.functions.PortableHash.duckHashSql("token")} AS h
         | FROM (SELECT lang, unnest(${tokensSql("lower(text)")}) AS token FROM documents)),
         |km AS (SELECT lang, h,
         |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rk FROM h)
         |SELECT lang,
         | CASE WHEN count(*) < $K THEN count(*)::DOUBLE
         | ELSE ${graft.functions.Portable.proundSql(
        s"${(K - 1) * 4294967296.0} / max(h)", 4)} END AS est_distinct,
         | count(*) AS k
         |FROM km WHERE rk <= $K GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q26_kmv_distinct" -> {
      val K = 16
      s"""WITH h AS (
         | SELECT DISTINCT ${graft.functions.PortableHash.duckHashSql("token")} AS h
         | FROM (SELECT unnest(${tokensSql("lower(text)")}) AS token FROM documents)),
         |kmin AS (SELECT h FROM h ORDER BY h LIMIT $K)
         |SELECT CASE WHEN count(*) < $K THEN count(*)::DOUBLE
         |       ELSE ${graft.functions.Portable.proundSql(
        s"${(K - 1) * 4294967296.0} / max(h)", 4)} END AS est_distinct,
         | count(*) AS k
         |FROM kmin""".stripMargin
    },
    "q20_text_stats" ->
      s"""SELECT doc_id, ${tokenCountSql("text")} AS n_tokens,
         | length(text) AS n_chars_txt,
         | ${punctCountSql("text")} AS n_punct,
         | ${fingerprintSql("text")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_lang_id" ->
      s"""SELECT doc_id, lang, ${langIdSql("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_quality_score" ->
      s"""SELECT doc_id, quality FROM (
         | SELECT doc_id, ${qualityScoreSql("text")} AS quality FROM documents)
         |WHERE quality >= 0.5 ORDER BY doc_id""".stripMargin,
    "q24_token_budget" ->
      s"""SELECT doc_id, ${tokenCountSql("text")} AS ws_tokens,
         | length(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q23_vocab_top" ->
      s"""SELECT token, count(*) AS n FROM (
         | SELECT unnest(${tokensSql("lower(text)")}) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q9r_token_spectrum" ->
      s"""SELECT length(format('{:b}', c))::BIGINT AS freq_bucket, count(*) AS n_types,
         | CAST(sum(c) AS BIGINT) AS n_occurrences
         |FROM (SELECT token, count(*) AS c FROM (
         |  SELECT unnest(${tokensSql("lower(text)")}) AS token FROM documents)
         | GROUP BY token)
         |GROUP BY 1 ORDER BY freq_bucket""".stripMargin,
    "q9p_oov_rate" ->
      s"""WITH tok AS (
         | SELECT doc_id, unnest(${tokensSql("lower(text)")}) AS token
         | FROM documents),
         |v AS (SELECT token FROM (
         |  SELECT token, count(*) AS n FROM tok GROUP BY token
         |  ORDER BY n DESC, token LIMIT 1000))
         |SELECT doc_id, count(*) AS n_tokens,
         | count(*) FILTER (WHERE v.token IS NULL) AS n_oov,
         | ${graft.functions.Portable.proundSql(
           "count(*) FILTER (WHERE v.token IS NULL)::DOUBLE / count(*)::DOUBLE", 6)}
         |  AS oov_rate
         |FROM tok LEFT JOIN v ON tok.token = v.token
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q9j_cms_heavy_hitters" -> {
      val bucket = graft.functions.PortableHash.duckHashSql(
        "(token || ':cms:' || CAST(r AS VARCHAR))")
      s"""WITH tok AS (
         | SELECT unnest(${tokensSql("lower(text)")}) AS token FROM documents),
         |seeds AS (SELECT unnest(generate_series(0, 3)) AS r),
         |cms AS (
         | SELECT r, $bucket % 1024 AS bucket, count(*) AS cnt
         | FROM tok, seeds GROUP BY 1, 2),
         |top AS (
         | SELECT token, count(*) AS true_n FROM tok GROUP BY token
         | ORDER BY true_n DESC, token LIMIT 20)
         |SELECT token, max(true_n) AS true_n, min(cnt) AS cms_est
         |FROM (SELECT t.token, t.true_n, s.r,
         |        ${graft.functions.PortableHash.duckHashSql(
                   "(t.token || ':cms:' || CAST(s.r AS VARCHAR))")} % 1024 AS bucket
         |      FROM top t, seeds s) q
         |JOIN cms ON cms.r = q.r AND cms.bucket = q.bucket
         |GROUP BY token ORDER BY true_n DESC, token""".stripMargin
    },
    // same integer-scaled floor-division arithmetic: bigram frame via
    // generate_series indexing, counts as windows, `//` ≡ Spark DIV
    "q9h_lm_bigram_score" ->
      s"""WITH t AS (
         | SELECT doc_id, ${tokensSql("lower(text)")} AS t FROM documents),
         |b AS (
         | SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         | FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS i
         |       FROM t WHERE length(t) >= 2)),
         |c AS (
         | SELECT doc_id,
         |  count(*) OVER (PARTITION BY w1, w2) AS c2,
         |  count(*) OVER (PARTITION BY w1) AS c1
         | FROM b)
         |SELECT doc_id, count(*) AS n_bigrams,
         | CAST(sum((1000000 * c2) // c1) // count(*) AS BIGINT) AS avg_ppm
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // each b_i row is one learned rule; the UNION ALL stack reads them
    // in rank order with the pair split back into its two symbols
    "qbb_bpe_train" ->
      s"""$bpeOracleWith
         |SELECT * FROM (
         | ${(1 to BpeNumMerges).map(i =>
              s"SELECT $i AS rank, split_part(pair, '  ', 1) AS lhs, " +
                s"split_part(pair, '  ', 2) AS rhs, n::BIGINT AS n FROM b$i")
              .mkString(" UNION ALL ")}
         |) ORDER BY rank""".stripMargin,

    // final representations r_K exploded to tokens, weighted by word
    // frequency — the corpus token spectrum under the learned rules
    "qbc_bpe_apply" ->
      s"""$bpeOracleWith
         |SELECT tok, sum(cnt)::BIGINT AS freq FROM (
         | SELECT cnt, unnest(string_split(repr, '  ')) AS tok
         | FROM r$BpeNumMerges)
         |GROUP BY tok ORDER BY freq DESC, tok LIMIT 20""".stripMargin
  )
}
