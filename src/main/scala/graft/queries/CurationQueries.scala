package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{PortableHash, TextFunctions}
import graft.functions.TextFunctions.{tokenCount, tokenCountSql, tokens, tokensSql, stopwordCount, stopwordCountSql, qualityScoreSql}
import graft.functions.Portable.{pround, proundSql}

/** Corpus-curation operators over the `documents` table — the rule-based
  * quality/dedup layer every LLM training-data pipeline runs between raw
  * ingest and tokenization (the reference stops at per-sample mappers;
  * these are the corpus-level extensions, same north star as
  * [[TextQueries]]/[[DedupQueries]]).
  *
  * Scale design (100 TB):
  *  - q96 (Gopher-style rules) is pure per-row arithmetic — one
  *    WholeStageCodegen pass over the scan, embarrassingly parallel;
  *  - q97 (duplicated-span mining à la "Deduplicating Training Data
  *    Makes Language Models Better") is a posting-list explode + ONE
  *    shuffle on the n-gram, with the document-frequency computed as a
  *    count window over that same exchange — never a self-join, never
  *    quadratic;
  *  - q98 (BM25) keeps only query-term postings (the array is filtered
  *    BEFORE explode, so non-matching tokens never leave the scan
  *    stage), and joins them against two broadcast-sized frames: the
  *    per-term document frequencies (≤ |query| rows) and the 1-row
  *    corpus stats frame;
  *  - q99 (per-source report card) is a single hash aggregation keyed by
  *    the low-cardinality source column.
  */
object CurationQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // Gopher-family rule thresholds (tuned to split this corpus
  // non-trivially; the operators are threshold-agnostic).
  private[graft] val MinWords = 25
  private[graft] val MaxWords = 90
  private[graft] val MinMeanWl = 3.0
  private[graft] val MaxMeanWl = 10.0
  private[graft] val MinStopHits = 2

  // q97: span width for duplicated-passage mining. 8 tokens ≈ the
  // "memorization-length" granularity the substring-dedup literature
  // uses; documents shorter than the width degrade to one whole-text
  // shingle (same convention as the MinHash kernels).
  // span width lives with the shared staging table; oracles must render
  // the same constant the Spark side mines with
  private val SpanN = TextStaging.SpanN

  // q98: BM25 constants (standard Robertson defaults) + probe terms.
  private val K1 = 1.2
  private val B = 0.75
  private val QueryTerms = Seq("spark", "join", "stream")

  // q9c: composed-gate thresholds on top of the Gopher rules.
  private[graft] val MinQuality = 0.5
  private[graft] val MaxDupFrac = 0.5

  // qar: per-domain document cap (the C4/Gopher "no domain dominates"
  // guard) and its selection seed.
  private val DomainCap = 12
  private val DomainCapSeed = 29

  /** Formulaic crawl-URL fixture shared by qaq/qar: four messy variants
    * per (host, path) class — uppercase scheme/host + default port +
    * trailing slash, utm-only query, fragment, mixed utm/non-utm query.
    */
  private def messyUrl: Column = {
    val h = (col("doc_id") % 7).cast("string")
    val p = (col("doc_id") % 5).cast("string")
    when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://WWW.Site"), h, lit(".COM:443/p/"), p, lit("/")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://www.site"), h, lit(".com/p/"), p,
          lit("?utm_source=x&utm_campaign=y")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://www.site"), h, lit(".com/p/"), p, lit("#sec"), p))
      .otherwise(
        concat(lit("https://www.site"), h, lit(".com:443/p/"), p,
          lit("?id="), h, lit("&utm_medium=z")))
  }

  /** DuckDB rendering of [[messyUrl]] — rendered as ONE line so the
    * consumer oracles' `.stripMargin` can't eat the leading `|` of a
    * wrapped `||` concat operator.
    */
  private def messyUrlSql: String = {
    val h = "CAST(doc_id % 7 AS VARCHAR)"
    val p = "CAST(doc_id % 5 AS VARCHAR)"
    s"CASE CAST(doc_id % 4 AS INT) " +
      s"WHEN 0 THEN 'HTTPS://WWW.Site' || $h || '.COM:443/p/' || $p || '/' " +
      s"WHEN 1 THEN 'https://www.site' || $h || '.com/p/' || $p || '?utm_source=x&utm_campaign=y' " +
      s"WHEN 2 THEN 'https://www.site' || $h || '.com/p/' || $p || '#sec' || $p " +
      s"ELSE 'https://www.site' || $h || '.com:443/p/' || $p || '?id=' || $h || '&utm_medium=z' " +
      "END"
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style document quality rules: word-count bounds, mean word
    // length bounds, minimum stopword evidence — emitted as per-rule
    // columns plus the composite keep flag, the shape a curation run
    // audits before dropping anything. keep is derived from the emitted
    // (rounded) columns so engine and oracle gate on identical values.
    "q96_gopher_rules" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id",
          tokenCount($"text").as("n_words"),
          pround((length($"text").cast("double") - tokenCount($"text").cast("double") + lit(1.0)) /
            greatest(tokenCount($"text").cast("double"), lit(1.0)), 6).as("mean_word_len"),
          stopwordCount($"text", TextFunctions.stopwords.head._2).as("stop_hits"))
        .withColumn("keep",
          $"n_words" >= MinWords && $"n_words" <= MaxWords &&
            $"mean_word_len" >= MinMeanWl && $"mean_word_len" <= MaxMeanWl &&
            $"stop_hits" >= MinStopHits)
        .orderBy($"doc_id")
    }),

    // Duplicated-span mining: for each document, the fraction of its
    // distinct 8-token spans that also occur in ≥2 documents corpus-wide
    // — the per-doc "how much of me is boilerplate" signal used to rank
    // docs for substring-level dedup. One explode + one shuffle; the
    // document frequency rides a count window over the same exchange.
    "q97_dup_spans" -> ((s, dir) => {
      import s.implicits._
      // per-doc span statistics from the SHARED staging table
      // (TextStaging.spanStats8): q97 and q9c consume the same posting
      // explode + df aggregation, so it is mined once per (session,
      // corpus) — the verifiedPairs discipline applied to the span
      // kernel. Skew reasoning (aggregation + join-back, not a count
      // window) lives with the staging builder.
      TextStaging.spanStats8(s, dir)
        .withColumn("dup_frac",
          pround($"n_dup".cast("double") / $"n_spans".cast("double"), 6))
        .orderBy($"doc_id")
    }),

    // BM25 top-20 retrieval for a fixed term query: classic inverted-
    // index scoring. Term postings are filtered inside the token array
    // (before explode), df and corpus stats are broadcast-sized, scores
    // aggregate per doc. ln/idf arithmetic ordered identically to the
    // oracle; the score is rounded to 4 decimals before the top-k sort
    // so tie-breaking (by doc_id) is deterministic in both engines.
    "q98_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val toks = docs(s, dir)
        .select($"doc_id", tokens(lower($"text")).as("toks"))
      val tf = toks
        .select($"doc_id", size($"toks").cast("double").as("dl"),
          explode(filter($"toks", t => t.isin(QueryTerms: _*))).as("token"))
        .groupBy($"doc_id", $"token", $"dl")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(size($"toks")).as("avgdl"))
      tf.join(broadcast(df), Seq("token"))
        .crossJoin(broadcast(stats))
        .withColumn("s",
          log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
            ($"tf" * lit(K1 + 1.0)) /
            ($"tf" + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / $"avgdl")))
        .groupBy($"doc_id")
        .agg(pround(sum($"s"), 4).as("bm25"))
        .orderBy($"bm25".desc, $"doc_id")
        .limit(20)
    }),

    // The composed curation gate — what a production corpus run executes
    // end-to-end: Gopher rules AND quality threshold AND duplicated-span
    // ceiling, in one declarative plan. The rule/quality columns fuse
    // into the scan pass; the span stage adds its one posting shuffle;
    // a single doc_id join stitches them. Survivors only.
    "q9c_curation_v2" -> ((s, dir) => {
      import s.implicits._
      // duplicated-span ceiling from the shared staging table (see q97)
      val spanStats = TextStaging.spanStats8(s, dir)
        .select($"doc_id",
          pround($"n_dup".cast("double") / $"n_spans".cast("double"), 6)
            .as("dup_frac"))
      val rules = docs(s, dir)
        .select($"doc_id",
          tokenCount($"text").as("n_words"),
          pround((length($"text").cast("double") - tokenCount($"text").cast("double") + lit(1.0)) /
            greatest(tokenCount($"text").cast("double"), lit(1.0)), 6).as("mean_word_len"),
          stopwordCount($"text", TextFunctions.stopwords.head._2).as("stop_hits"),
          graft.functions.FastText.qualityScoreUdf($"text").as("quality"))
      rules.join(spanStats, Seq("doc_id"))
        .filter($"n_words" >= MinWords && $"n_words" <= MaxWords &&
          $"mean_word_len" >= MinMeanWl && $"mean_word_len" <= MaxMeanWl &&
          $"stop_hits" >= MinStopHits &&
          $"quality" >= MinQuality && $"dup_frac" <= MaxDupFrac)
        .select($"doc_id", $"n_words", $"quality", $"dup_frac")
        .orderBy($"doc_id")
    }),

    // Per-source corpus report card: volume, exact-dup rate, mean
    // quality, token budget — the dataset-mixture dashboard a training
    // run reads before setting sampling weights. One aggregation keyed
    // by the (low-cardinality) source column.
    "q99_source_report" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"source", $"doc_id", $"text",
          md5($"text".cast("binary")).as("h"),
          graft.functions.FastText.qualityScoreUdf($"text").as("q"),
          tokenCount($"text").cast("long").as("ntok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"h").as("n_unique"),
          pround(lit(1.0) - countDistinct($"h").cast("double") / count(lit(1)).cast("double"), 6)
            .as("dup_rate"),
          pround(avg($"q"), 5).as("mean_quality"),
          sum($"ntok").as("n_tokens"))
        .orderBy($"source")
    }),

    // Per-source quality-percentile normalization: raw quality scores
    // aren't comparable across sources (a boilerplate-heavy source sits
    // lower everywhere), so the keep-threshold is applied to each doc's
    // PERCENT RANK within its source — "best half of every source", the
    // per-domain adaptive cut a global threshold can't express. One
    // rank window per source; ordering is (quality, doc_id) so ranks
    // are total and replayable at any partition count.
    "q9m_quality_percentile" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"quality", $"doc_id")
      docs(s, dir)
        .select($"doc_id", $"source",
          graft.functions.FastText.qualityScoreUdf($"text").as("quality"))
        .withColumn("pr", pround(percent_rank().over(w), 6))
        .filter($"pr" >= 0.5)
        .orderBy($"source", $"doc_id")
    }),

    // The mixture COMPILER: q99's report + a target share per source →
    // the concrete resampling decision (downsample rate or upsample
    // epochs) each source needs to hit the target. Uniform target here
    // (1/n_sources of the corpus token budget); the arithmetic is one
    // 20-row agg + window — the driver-free form of "read the report,
    // set the weights" that q95 (quota) and q9i (epochs) then execute.
    "q9n_mixture_compile" -> ((s, dir) => {
      import s.implicits._
      val wAll = Window.partitionBy()
      docs(s, dir)
        .select($"source", tokenCount($"text").cast("long").as("tok"))
        .groupBy($"source")
        .agg(sum($"tok").as("n_tokens"))
        .withColumn("target_tokens",
          pround(sum($"n_tokens").over(wAll).cast("double") /
            count(lit(1)).over(wAll).cast("double"), 6))
        .withColumn("rate",
          pround(least(lit(1.0), $"target_tokens" / $"n_tokens".cast("double")), 6))
        .withColumn("epochs",
          pround(greatest(lit(1.0), $"target_tokens" / $"n_tokens".cast("double")), 6))
        .withColumn("mode",
          when($"n_tokens".cast("double") > $"target_tokens", "down").otherwise("up"))
        .select($"source", $"n_tokens", $"target_tokens", $"rate", $"epochs", $"mode")
        .orderBy($"source")
    }),

    // Source × language contingency matrix via PIVOT — the corpus-
    // composition dashboard in wide form. The pivot vocabulary is
    // declared (not discovered) so the plan is one hash aggregation
    // with conditional counts — no second collect-distinct pass over
    // the corpus, stable output schema at any scale.
    "q9o_source_lang_pivot" -> ((s, dir) => {
      import s.implicits._
      val langs = Seq("de", "en", "es", "fr", "zh")
      docs(s, dir)
        .groupBy($"source").pivot("lang", langs).agg(count(lit(1)))
        .select($"source" +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy($"source")
    }),

    // PII redaction: the scrub pass every training corpus runs before
    // release. The word-salad corpus carries no PII, so the fixture
    // INJECTS it formulaically (email on %3 ids, phone on %5 ids —
    // ids overlapping both get both), then the scrubber strips it
    // back out; the aggregate pins found-counts by type, residual
    // length, and that redacted text carries zero leftover matches.
    // Patterns stay in the RE2 ∩ java.util.regex common subset
    // (explicit classes, no backrefs) so both engines match
    // identically; per-row regex work is a scan kernel — no shuffle
    // beyond the final 1-row aggregate.
    "q9s_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val emailRe = "[a-z0-9._]+@[a-z0-9]+\\.[a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      val withPii = docs(s, dir).withColumn("t",
        concat($"text",
          when($"doc_id" % 3 === 0,
            concat(lit(" contact u"), $"doc_id", lit("@mail.com"))).otherwise(lit("")),
          when($"doc_id" % 5 === 0,
            concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      withPii
        .select(
          size(regexp_extract_all($"t", lit(emailRe), lit(0))).as("n_email"),
          size(regexp_extract_all($"t", lit(phoneRe), lit(0))).as("n_phone"),
          length(regexp_replace(regexp_replace($"t", emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("red_len"),
          size(regexp_extract_all(
            regexp_replace(regexp_replace($"t", emailRe, "<EMAIL>"), phoneRe, "<PHONE>"),
            lit(emailRe), lit(0))).as("leftover"))
        .agg(
          sum($"n_email").as("n_emails"),
          sum($"n_phone").as("n_phones"),
          sum($"red_len").as("redacted_bytes"),
          sum($"leftover").as("n_leftover"))
    }),

    // URL canonicalization dedup: crawl URLs are injected formulaically
    // in four messy variants per (host, path) class — uppercase
    // scheme/host + default port + trailing slash, utm-only query,
    // fragment, mixed utm/non-utm query — then canonicalized by
    // [[graft.functions.UrlFunctions.canonicalizeUrl]] and grouped.
    // Variants 0/1/2 MUST collapse to one canonical form and variant 3
    // must keep its non-utm parameter: the gate hashes (canonical,
    // n_docs, raw_forms), so both the merges and the non-merges are
    // pinned. Pure per-row regex chain (one codegen pass) + one
    // low-cardinality agg — the canonical key is then what a URL-keyed
    // dedup/domain-quota pass shuffles on, 16-byte-digest-sized rows at
    // 100 TB.
    "qaq_url_canonical" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", messyUrl.as("url"))
        .select($"url",
          graft.functions.UrlFunctions.canonicalizeUrl($"url").as("canon"))
        .groupBy($"canon")
        .agg(count(lit(1)).as("n_docs"), countDistinct($"url").as("raw_forms"))
        .orderBy($"canon")
    }),

    // Per-domain document cap — the "no domain dominates the corpus"
    // guard (C4 and Gopher both cap per-site contributions): canonical
    // host extracted from the canonicalized URL, then each host keeps
    // its DomainCap hash-first docs — the kept set is the K smallest
    // (detHash(doc_id), doc_id) keys per host, a deterministic uniform
    // draw that is replayable under retry and oracle-checkable. Emits
    // the kept rows (host, rk, doc_id) so the gate pins EXACTLY which
    // docs survive, not just the counts. The rank window partitions by
    // host; at crawl scale a mega-host partition is the known window
    // hazard, so the production form pre-prunes with an approximate
    // per-host hash threshold (keep hash < K/n̂·2³² from a sketch of
    // host counts) before the exact rank — same output, bounded
    // partition; documented here, exact form mined at gate scale.
    "qar_domain_cap" -> ((s, dir) => {
      import s.implicits._
      val canon = graft.functions.UrlFunctions.canonicalizeUrl(messyUrl)
      val hosts = docs(s, dir)
        .select($"doc_id",
          regexp_extract(canon, "^[a-z]+://([^/:?#]+)", 1).as("host"))
      val w = Window.partitionBy($"host")
        .orderBy(PortableHash.detHash($"doc_id", DomainCapSeed), $"doc_id")
      hosts.withColumn("rk", row_number().over(w))
        .filter($"rk" <= DomainCap)
        .select($"host", $"rk", $"doc_id")
        .orderBy($"host", $"rk")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q96_gopher_rules" -> {
      val nTok = tokenCountSql("text")
      val meanWl = proundSql(
        s"(length(text)::DOUBLE - ($nTok)::DOUBLE + 1.0) / greatest(($nTok)::DOUBLE, 1.0)", 6)
      val stopHits = stopwordCountSql("text", TextFunctions.stopwords.head._2)
      s"""SELECT doc_id, n_words, mean_word_len, stop_hits,
         | (n_words >= $MinWords AND n_words <= $MaxWords
         |  AND mean_word_len >= $MinMeanWl AND mean_word_len <= $MaxMeanWl
         |  AND stop_hits >= $MinStopHits) AS keep
         |FROM (SELECT doc_id, $nTok AS n_words, $meanWl AS mean_word_len,
         |       $stopHits AS stop_hits FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    "q97_dup_spans" -> {
      val sh = graft.functions.DedupFunctions.distinctShinglesSql("text", SpanN)
      s"""WITH p AS (
         | SELECT doc_id, unnest(sh) AS g FROM
         |  (SELECT doc_id, $sh AS sh FROM documents)),
         |c AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM p)
         |SELECT doc_id, n_spans, n_dup,
         | ${proundSql("n_dup::DOUBLE / n_spans::DOUBLE", 6)} AS dup_frac
         |FROM (SELECT doc_id, count(*) AS n_spans,
         |       count(*) FILTER (WHERE df >= 2) AS n_dup
         |      FROM c GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "q98_bm25_topk" -> {
      val terms = QueryTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH toks AS (
         | SELECT doc_id, ${tokensSql("lower(text)")} AS toks FROM documents),
         |postings AS (
         | SELECT doc_id, length(toks)::DOUBLE AS dl,
         |  unnest(list_filter(toks, t -> list_contains($terms, t))) AS token
         | FROM toks),
         |tf AS (SELECT doc_id, token, dl, count(*) AS tf
         |       FROM postings GROUP BY doc_id, token, dl),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(length(toks)) AS avgdl
         |          FROM toks)
         |SELECT doc_id,
         | ${proundSql(
        s"sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
          s"(tf * ${K1 + 1.0}) / (tf + $K1 * (${1.0 - B} + $B * dl / avgdl)))", 4)} AS bm25
         |FROM tf JOIN df USING (token) CROSS JOIN stats
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    },
    "q9c_curation_v2" -> {
      val nTok = tokenCountSql("text")
      val meanWl = proundSql(
        s"(length(text)::DOUBLE - ($nTok)::DOUBLE + 1.0) / greatest(($nTok)::DOUBLE, 1.0)", 6)
      val stopHits = stopwordCountSql("text", TextFunctions.stopwords.head._2)
      val sh = graft.functions.DedupFunctions.distinctShinglesSql("text", SpanN)
      s"""WITH p AS (
         | SELECT doc_id, unnest(sh) AS g FROM
         |  (SELECT doc_id, $sh AS sh FROM documents)),
         |c AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM p),
         |spans AS (
         | SELECT doc_id, ${proundSql(
        "(count(*) FILTER (WHERE df >= 2))::DOUBLE / count(*)::DOUBLE", 6)} AS dup_frac
         | FROM c GROUP BY doc_id),
         |rules AS (
         | SELECT doc_id, $nTok AS n_words, $meanWl AS mean_word_len,
         |  $stopHits AS stop_hits, ${qualityScoreSql("text")} AS quality
         | FROM documents)
         |SELECT doc_id, n_words, quality, dup_frac
         |FROM rules JOIN spans USING (doc_id)
         |WHERE n_words >= $MinWords AND n_words <= $MaxWords
         | AND mean_word_len >= $MinMeanWl AND mean_word_len <= $MaxMeanWl
         | AND stop_hits >= $MinStopHits
         | AND quality >= $MinQuality AND dup_frac <= $MaxDupFrac
         |ORDER BY doc_id""".stripMargin
    },
    "q99_source_report" ->
      s"""SELECT source, count(*) AS n_docs,
         | count(DISTINCT md5(text)) AS n_unique,
         | ${proundSql("1.0 - count(DISTINCT md5(text))::DOUBLE / count(*)::DOUBLE", 6)} AS dup_rate,
         | ${proundSql(s"avg(${qualityScoreSql("text")})", 5)} AS mean_quality,
         | sum(${tokenCountSql("text")})::BIGINT AS n_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q9m_quality_percentile" ->
      s"""SELECT doc_id, source, quality, pr FROM (
         | SELECT doc_id, source, quality,
         |  ${proundSql("percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)", 6)} AS pr
         | FROM (SELECT doc_id, source, ${qualityScoreSql("text")} AS quality
         |       FROM documents))
         |WHERE pr >= 0.5 ORDER BY source, doc_id""".stripMargin,
    "q9n_mixture_compile" ->
      s"""WITH s AS (
         | SELECT source, CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS n_tokens
         | FROM documents GROUP BY source),
         |t AS (
         | SELECT source, n_tokens,
         |  ${proundSql("(sum(n_tokens) OVER ())::DOUBLE / (count(*) OVER ())::DOUBLE", 6)}
         |   AS target_tokens
         | FROM s)
         |SELECT source, n_tokens, target_tokens,
         | ${proundSql("least(1.0, target_tokens / n_tokens::DOUBLE)", 6)} AS rate,
         | ${proundSql("greatest(1.0, target_tokens / n_tokens::DOUBLE)", 6)} AS epochs,
         | CASE WHEN n_tokens::DOUBLE > target_tokens THEN 'down' ELSE 'up' END AS mode
         |FROM t ORDER BY source""".stripMargin,
    "q9o_source_lang_pivot" -> {
      val cells = Seq("de", "en", "es", "fr", "zh")
        .map(l => s"count(*) FILTER (WHERE lang = '$l') AS $l")
        .mkString(",\n         | ")
      s"""SELECT source,
         | $cells
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },
    // DuckDB regexp_replace needs the 'g' flag (Spark's replaces all
    // by default); patterns are in the RE2 ∩ java.util.regex subset
    "q9s_pii_redact" ->
      """WITH p AS (
        |  SELECT text ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         ELSE '' END AS t
        |  FROM documents
        |), r AS (
        |  SELECT len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9]+\.[a-z]{2,}')) AS n_email,
        |         len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS n_phone,
        |         regexp_replace(
        |           regexp_replace(t, '[a-z0-9._]+@[a-z0-9]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |           '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
        |  FROM p
        |)
        |SELECT CAST(sum(n_email) AS BIGINT) AS n_emails,
        |       CAST(sum(n_phone) AS BIGINT) AS n_phones,
        |       CAST(sum(length(red)) AS BIGINT) AS redacted_bytes,
        |       CAST(sum(len(regexp_extract_all(red, '[a-z0-9._]+@[a-z0-9]+\.[a-z]{2,}'))) AS BIGINT)
        |         AS n_leftover
        |FROM r""".stripMargin,

    "qaq_url_canonical" ->
      s"""WITH u AS (SELECT doc_id, $messyUrlSql AS url FROM documents)
         |SELECT canon, count(*) AS n_docs, count(DISTINCT url) AS raw_forms
         |FROM (SELECT url, ${graft.functions.UrlFunctions.canonicalizeUrlSql("url")} AS canon
         |      FROM u)
         |GROUP BY canon ORDER BY canon""".stripMargin,

    "qar_domain_cap" -> {
      val h = PortableHash.duckHashSql("CAST(doc_id AS VARCHAR)", DomainCapSeed)
      val canon = graft.functions.UrlFunctions.canonicalizeUrlSql("url")
      s"""WITH u AS (SELECT doc_id, $messyUrlSql AS url FROM documents),
         |hosts AS (SELECT doc_id,
         |  regexp_extract($canon, '^[a-z]+://([^/:?#]+)', 1) AS host FROM u),
         |ranked AS (SELECT host, doc_id, row_number() OVER (
         |  PARTITION BY host ORDER BY $h, doc_id) AS rk FROM hosts)
         |SELECT host, rk, doc_id FROM ranked
         |WHERE rk <= $DomainCap ORDER BY host, rk""".stripMargin
    }
  )
}
