package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization
  * stats, language ID, quality scoring, fingerprinting.
  *
  * These extend the reference's per-sample mapper/filter surface (its
  * text handling stops at utf-8 decode — reference
  * sdata/datapipeline.py:185-189) with the operations a 100 TB text
  * corpus actually needs. Everything is built from codegen'd built-ins
  * (split/filter/transform/aggregate) — no UDFs — so the whole stage
  * fuses into one WholeStageCodegen pass over the scan.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** HTML → main text extraction — the first stage of every web-crawl
    * corpus (the trafilatura/boilerpipe role, reduced to a deterministic
    * regex algebra): (1) drop non-content ELEMENTS whole (script/style —
    * their character data is code, not text — and nav/header/footer/
    * aside — link-farm boilerplate that poisons n-gram stats); (2) strip
    * remaining tags to spaces; (3) decode the common entities (`&amp;`
    * LAST, so `&amp;lt;` comes out as the literal `&lt;` and never
    * double-decodes); (4) collapse whitespace. Order matters and is part
    * of the contract: a stray `<` inside script text would break a
    * naive tag-strip, which is why element removal runs first.
    *
    * Pure codegen'd regexp_replace/replace chain — no UDF, fuses into
    * the scan's WholeStageCodegen. Patterns stay inside the RE2 subset
    * (inline (?is) flags, lazy quantifiers, no backreferences) so
    * [[htmlExtractSql]] is the same algebra verbatim.
    */
  /** Elements whose entire content is dropped (not just the tags). */
  private val DroppedElements =
    Seq("script", "style", "nav", "header", "footer", "aside")

  /** Entity decode table, `&amp;` deliberately last. */
  private val HtmlEntities = Seq("&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** JVM twin of [[htmlExtract]] (the SQL-surface `graft_html_extract`):
    * Spark's regexp_replace IS Java-regex replaceAll, so running the
    * identical pattern chain here is bit-identical by construction.
    */
  def htmlExtractJvm(s: String): String = {
    if (s == null) return null
    val noElems = DroppedElements.foldLeft(s)((x, el) =>
      x.replaceAll(s"(?is)<$el\\b[^>]*>.*?</$el\\s*>", " "))
    val noTags = noElems.replaceAll("(?s)<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (x, (ent, ch)) =>
      x.replaceAll(ent, java.util.regex.Matcher.quoteReplacement(ch)) }
    decoded.replaceAll("\\s+", " ").trim
  }

  def htmlExtract(c: Column): Column = {
    // one pattern per element (RE2 has no backreferences): lazy body
    // match, (?is) for case-insensitive tags and dot-matches-newline
    val noElems = DroppedElements.foldLeft(c)((e, el) =>
      regexp_replace(e, s"(?is)<$el\\b[^>]*>.*?</$el\\s*>", " "))
    val noTags = regexp_replace(noElems, "(?s)<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (e, (ent, ch)) =>
      regexp_replace(e, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Count of non-alphanumeric, non-space chars. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))

  /** Word-shingles of `n` consecutive tokens from a *materialized* token
    * array column; degenerates to one shingle (the whole text) when the
    * document is shorter than `n` tokens.
    *
    * IMPORTANT perf contract: pass a bound token-array column (stage
    * `tokens(text)` through a projection first), never an inline
    * `tokens(text)` expression — Spark does not hoist loop-invariant
    * subexpressions out of higher-order-function lambdas, so an inline
    * split would re-tokenize the text once per array element (O(n²) per
    * row; observed 400+s at sf0.1 before staging).
    */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Convenience one-shot form (tokenizes inline — fine for single use,
    * see the perf contract on [[wordShinglesFromTokens]]).
    */
  def wordShingles(c: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(c), n)

  /** Language-scoring stopword lists (tiny n-gram-free heuristic). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une", "du", "est", "dans", "pour", "que"))

  /** Number of tokens of `c` found in `words` (not deduplicated). */
  def stopwordCount(c: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(c), t => array_contains(arr, lower(t))))
  }

  /** Heuristic language ID: the first language (in [[stopwords]] order)
    * achieving the maximal stopword count; "und" when no stopword hits.
    */
  def langId(c: Column): Column = {
    val best = stopwords.foldLeft((lit("und"), lit(0L))) {
      case ((bestLang, bestScore), (lang, words)) =>
        val s = stopwordCount(c, words).cast("long")
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }
    best._1
  }

  /** Composite quality score in [0,1]: length saturation, low punctuation
    * density, stopword presence, sane mean word length. Pure arithmetic —
    * portable and deterministic.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punctCount(c).cast("double") / greatest(length(c).cast("double"), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio * lit(5.0), lit(0.0))
    val stopRatio = stopwordCount(c, stopwords.head._2).cast("double") / greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * lit(4.0), lit(1.0))
    val meanWordLen = (length(c).cast("double") - nTok + lit(1.0)) / greatest(nTok, lit(1.0))
    val wordLenScore = when(meanWordLen >= 3 && meanWordLen <= 10, lit(1.0)).otherwise(lit(0.5))
    Portable.pround(
      lenScore * lit(0.3) + punctScore * lit(0.2) + stopScore * lit(0.3) + wordLenScore * lit(0.2),
      6)
  }

  /** Canonical fingerprint: md5 of the sorted distinct lowercase token
    * set — robust to token order and repetition (the "collection
    * fingerprint" used for near-canonical dedup).
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(transform(tokens(c), t => lower(t))))).cast("binary"))

  /** Unicode NFC normalization — the canonicalization pass that must
    * precede any content-hash dedup on real web text: the same visible
    * string arrives both precomposed (U+00E9) and decomposed
    * (e + U+0301) and raw-byte hashing under-merges. Spark has no
    * normalization built-in, so this is a JVM kernel over
    * `java.text.Normalizer` (ICU-conformant NFC, identical output to
    * DuckDB's utf8proc `nfc_normalize` — qap proves the parity under the
    * md5 hash). Per-row scalar work; the UDF boundary costs one codegen
    * break, acceptable because normalization is a one-time ingest pass,
    * not a hot analytical kernel. Null-safe (null → null, the binary
    * decode convention).
    */
  def nfcJvm(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def nfcNormalize(c: Column): Column = {
    val f = udf((s: String) => nfcJvm(s))
    f(c)
  }

  // ---- DuckDB-dialect renderings (oracle side) -------------------------

  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, '\\s+'), t -> length(t) > 0)"

  def tokenCountSql(e: String): String = s"length(${tokensSql(e)})"

  /** [[htmlExtract]]'s exact algebra in the DuckDB dialect — same
    * pattern strings (RE2-subset), same order, DuckDB needing only the
    * explicit 'g' option (its regexp_replace is first-match by default
    * where Spark's is global).
    */
  def htmlExtractSql(e: String): String = {
    val noElems = DroppedElements.foldLeft(e)((x, el) =>
      s"regexp_replace($x, '(?is)<$el\\b[^>]*>.*?</$el\\s*>', ' ', 'g')")
    val noTags = s"regexp_replace($noElems, '(?s)<[^>]*>', ' ', 'g')"
    val decoded = HtmlEntities.foldLeft(noTags) { case (x, (ent, ch)) =>
      val rep = if (ch == "'") "''" else ch
      s"regexp_replace($x, '$ent', '$rep', 'g')" }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  def punctCountSql(e: String): String =
    s"(length($e) - length(regexp_replace($e, '[^a-zA-Z0-9\\s]', '', 'g')))"

  def wordShinglesSql(e: String, n: Int): String = {
    val toks = tokensSql(e)
    s"list_transform(generate_series(1, greatest(length($toks) - ${n - 1}, 1)), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' '))"
  }

  def stopwordCountSql(e: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"length(list_filter(${tokensSql(e)}, t -> list_contains($arr, lower(t))))"
  }

  def langIdSql(e: String): String = {
    // same fold as langId: first language in order with strictly greater
    // score than all previous wins; CASE chain renders the same argmax.
    val scores = stopwords.map { case (l, ws) => l -> stopwordCountSql(e, ws) }
    val conds = scores.zipWithIndex.map { case ((lang, s), i) =>
      val laterGe = scores.drop(i + 1).map { case (_, s2) => s"$s >= $s2" }
      val cond = (Seq(s"$s > 0") ++ laterGe).mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"(CASE ${conds.mkString(" ")} ELSE 'und' END)"
  }

  def qualityScoreSql(e: String): String = {
    val nTok = s"(${tokenCountSql(e)})::DOUBLE"
    val lenScore = s"least($nTok / 50.0, 1.0)"
    val punctRatio = s"(${punctCountSql(e)})::DOUBLE / greatest(length($e)::DOUBLE, 1.0)"
    val punctScore = s"greatest(1.0 - ($punctRatio) * 5.0, 0.0)"
    val stopRatio = s"(${stopwordCountSql(e, stopwords.head._2)})::DOUBLE / greatest($nTok, 1.0)"
    val stopScore = s"least(($stopRatio) * 4.0, 1.0)"
    val meanWordLen = s"((length($e)::DOUBLE - $nTok + 1.0) / greatest($nTok, 1.0))"
    val wordLenScore = s"(CASE WHEN $meanWordLen >= 3 AND $meanWordLen <= 10 THEN 1.0 ELSE 0.5 END)"
    Portable.proundSql(
      s"($lenScore) * 0.3 + ($punctScore) * 0.2 + ($stopScore) * 0.3 + ($wordLenScore) * 0.2",
      6)
  }

  def fingerprintSql(e: String): String =
    s"md5(array_to_string(list_sort(list_distinct(list_transform(${tokensSql(e)}, t -> lower(t)))), ' '))"

  /** PII redaction — the scrub pass every published training corpus runs
    * before release (the Dolma/BigScience shape: regex families, typed
    * placeholders). Three families in fixed order — email, then IPv4,
    * then dashed/dotted phone — each an RE2-subset pattern (no
    * backreferences, no lookaround) evaluated identically by Spark's
    * java.util.regex and DuckDB's RE2, so the oracle replays the scrub
    * verbatim. Order matters and is part of the contract: an email's
    * numeric domain can no longer fake an IP once `<EMAIL>` replaced it.
    *
    * Scale: a per-row regexp_replace chain — pure codegen projection,
    * no shuffle, fuses into the scan at any corpus size.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** The text with every PII family replaced by its placeholder. */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (e, (_, pat, rep)) =>
      regexp_replace(e, pat, rep) }

  /** JVM twin of [[redactPii]] (the `graft_pii_redact` SQL function) —
    * same java.util.regex engine Spark's regexp_replace runs on, same
    * patterns, same order: bit-identical by construction.
    */
  def redactPiiJvm(s: String): String =
    if (s == null) null
    else PiiPatterns.foldLeft(s) { case (x, (_, pat, rep)) =>
      x.replaceAll(pat, java.util.regex.Matcher.quoteReplacement(rep)) }

  /** Match count for one family over the ORIGINAL text (counts are
    * computed before any replacement, so families never see each
    * other's placeholders).
    */
  def piiCount(c: Column, family: String): Column = {
    val pat = PiiPatterns.collectFirst { case (f, p, _) if f == family => p }
      .getOrElse(throw new IllegalArgumentException(s"no PII family $family"))
    regexp_count(c, lit(pat)).cast("long")
  }

  /** Within-document repeated-line removal (the CCNet-style page scrub:
    * navigation and boilerplate lines repeat INSIDE a page long before
    * they repeat across pages): split on newline, drop blank lines,
    * keep each distinct line's FIRST occurrence in document order,
    * rejoin. Pure per-row array work — `array_distinct` preserves
    * first-occurrence order — so the scrub is a codegen projection
    * with no shuffle, batch or stream.
    */
  def dedupLines(c: Column): Column =
    array_join(array_distinct(
      filter(split(c, "\n"), l => length(trim(l)) > lit(0))), "\n")

  /** JVM twin of [[dedupLines]] (the `graft_dedup_lines` SQL function):
    * split on the same regex, the insertion-ordered set IS
    * first-occurrence survival. Spark `trim` strips spaces only, so
    * the blank test matches `length(trim(l)) > 0` exactly.
    */
  def dedupLinesJvm(s: String): String =
    if (s == null) null
    else {
      val seen = new java.util.LinkedHashSet[String]()
      s.split("\n", -1).foreach { l =>
        if (!l.replace(" ", "").isEmpty) seen.add(l)
      }
      String.join("\n", seen)
    }

  /** [[dedupLines]] in the DuckDB dialect. DuckDB's `list_distinct`
    * does NOT preserve order, so first-occurrence survival is spelled
    * as an indexed prefix filter (keep l[i] iff absent from l[1:i-1]).
    */
  def dedupLinesSql(e: String): String = {
    val lines = s"list_filter(string_split($e, chr(10)), l -> length(trim(l)) > 0)"
    s"array_to_string(list_filter($lines, " +
      s"(x, i) -> coalesce(list_position(($lines)[1:i-1], x), 0) = 0), chr(10))"
  }

  /** [[redactPii]] in the DuckDB dialect — same patterns, same order. */
  def redactPiiSql(e: String): String =
    PiiPatterns.foldLeft(e) { case (x, (_, pat, rep)) =>
      s"regexp_replace($x, '$pat', '$rep', 'g')" }

  def piiCountSql(e: String, family: String): String = {
    val pat = PiiPatterns.collectFirst { case (f, p, _) if f == family => p }
      .getOrElse(throw new IllegalArgumentException(s"no PII family $family"))
    s"CAST(length(regexp_extract_all($e, '$pat')) AS BIGINT)"
  }
}
