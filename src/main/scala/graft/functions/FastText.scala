package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** JVM fast path for the hash-heavy text/similarity kernels.
  *
  * The Column versions in [[TextFunctions]]/[[DedupFunctions]] are pure
  * built-ins, but Spark evaluates higher-order-function lambdas
  * interpreted (no codegen) and — worse — re-inlines staged
  * subexpressions into Generate/Join nodes, re-running tokenization per
  * array element (observed: 130s for a 5000-doc explode that should take
  * ~1s). For kernels that do thousands of md5s per row, a plain Scala
  * UDF is 50-100× faster than the interpreted expression tree.
  *
  * EVERY function here is an exact twin of the portable SQL the oracle
  * runs — same tokenization, same md5-prefix hash ([[PortableHash
  * .detHashJvm]]), same float→double cast points, same sequential
  * summation order, same floor-based rounding — verified bit-for-bit by
  * FastTextSpec against the Column versions and by the driver's DuckDB
  * gate. Trade-off documented: a UDF is opaque to Catalyst (no pushdown
  * through it), so these are used for *computed* columns only, never
  * for predicates Catalyst could otherwise push to the scan.
  */
object FastText extends Serializable {

  // ---- scalar kernels (exact twins of the SQL forms) -------------------

  def tokensJvm(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  def shinglesJvm(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toArray

  def proundJvm(x: Double, d: Int): Double = {
    val p = math.pow(10.0, d.toDouble)
    math.floor(x * p + 0.5) / p
  }

  def md5Hex(s: String): String = PortableHash.md5HexJvm(s)

  /** MinHash signature: sig(j) = min over shingles of detHash(s + ":mh" + j). */
  def minhashJvm(shingles: Array[String], k: Int): Array[Long] =
    Array.tabulate(k) { j =>
      var min = Long.MaxValue
      shingles.foreach { s =>
        val h = PortableHash.detHashJvm(s + ":mh" + j)
        if (h < min) min = h
      }
      min
    }

  /** LSH band buckets: md5 of "b:" ++ "_" ++ sig-slice joined by ",". */
  def bandBucketsJvm(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[String] =
    Array.tabulate(bands) { b =>
      val slice = sig.slice(b * rowsPerBand, b * rowsPerBand + rowsPerBand)
      md5Hex(s"$b:_" + slice.mkString(","))
    }

  /** Jaccard of two string sets, pround(6). */
  def jaccardJvm(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    proundJvm(sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble, 6)
  }

  /** SimHash over token detHashes. */
  def simhashJvm(text: String, bits: Int): Long = {
    val hs = tokensJvm(text).map(t => PortableHash.detHashJvm(t))
    var out = 0L
    var j = 0
    while (j < bits) {
      var bal = 0L
      hs.foreach(h => bal += ((h >> j) & 1L) * 2L - 1L)
      if (bal > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Cosine with double-precision sequential summation — the same op
    * order as [[SimilarityFunctions.cosine]] and the oracle SQL.
    *
    * Malformed inputs have DEFINED results, aligned bit-for-bit with
    * [[graft.plans.CosineSim]] (CosineSimSpec enforces it): mismatched
    * lengths and zero-norm vectors return null — not an exception, not
    * NaN — so the two kernels cannot diverge exactly where inputs go
    * wrong.
    */
  def cosineJvm(a: Seq[Float], b: Seq[Float]): java.lang.Double = {
    if (a == null || b == null || a.length != b.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else proundJvm(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
  }

  /** Sign-pattern LSH bucket against deterministic hyperplanes. */
  def lshBucketJvm(v: Seq[Float], planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var proj = 0.0
      var i = 0
      while (i < p.length) { proj += v(i).toDouble * p(i); i += 1 }
      if (proj > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Punctuation count — twin of `regexp_replace(c, "[^a-zA-Z0-9\\s]", "")`
    * length difference (ASCII classes, as in both SQL dialects).
    */
  def punctCountJvm(text: String): Int = {
    var n = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (!alnum && !ws) n += 1
      i += 1
    }
    n
  }

  /** Canonical fingerprint — twin of
    * md5(sorted distinct lowercase tokens joined by " ").
    */
  def fingerprintJvm(text: String): String =
    md5Hex(tokensJvm(text).map(_.toLowerCase).distinct.sorted.mkString(" "))

  /** Stopword hit count (not deduplicated), lowercased-token membership. */
  def stopwordCountJvm(toks: Array[String], words: Set[String]): Int =
    toks.count(t => words.contains(t.toLowerCase))

  private val stopwordSets: Seq[(String, Set[String])] =
    TextFunctions.stopwords.map { case (l, ws) => l -> ws.toSet }

  /** Language ID — twin of [[TextFunctions.langId]]'s fold: first
    * language (in list order) with a strictly greater score than every
    * earlier one wins; "und" on zero hits.
    */
  def langIdJvm(text: String): String = {
    val toks = tokensJvm(text)
    var bestLang = "und"
    var bestScore = 0L
    stopwordSets.foreach { case (lang, ws) =>
      val s = stopwordCountJvm(toks, ws).toLong
      if (s > bestScore) { bestLang = lang; bestScore = s }
    }
    bestLang
  }

  /** Quality score — twin of [[TextFunctions.qualityScore]] with the
    * identical double-operation order.
    */
  def qualityScoreJvm(text: String): Double = {
    val toks = tokensJvm(text)
    val nTok = toks.length.toDouble
    val len = text.length.toDouble
    val lenScore = math.min(nTok / 50.0, 1.0)
    val punctRatio = punctCountJvm(text).toDouble / math.max(len, 1.0)
    val punctScore = math.max(1.0 - punctRatio * 5.0, 0.0)
    val stopRatio = stopwordCountJvm(toks, stopwordSets.head._2).toDouble / math.max(nTok, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val meanWordLen = (len - nTok + 1.0) / math.max(nTok, 1.0)
    val wordLenScore = if (meanWordLen >= 3 && meanWordLen <= 10) 1.0 else 0.5
    proundJvm(lenScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordLenScore * 0.2, 6)
  }

  // ---- udfs ------------------------------------------------------------

  /** (token count, punct count, fingerprint) in one pass. */
  case class TextStats(n_tokens: Int, n_punct: Int, fp: String)

  val textStatsUdf: Column => Column = {
    val f = udf { (text: String) =>
      TextStats(tokensJvm(text).length, punctCountJvm(text), fingerprintJvm(text))
    }
    c => f(c)
  }

  val langIdUdf: Column => Column = {
    val f = udf((text: String) => langIdJvm(text))
    c => f(c)
  }

  val qualityScoreUdf: Column => Column = {
    val f = udf((text: String) => qualityScoreJvm(text))
    c => f(c)
  }

  /** (shingle set, band buckets) in one pass over the text. */
  case class MinhashAnalysis(sh: Array[String], buckets: Array[String], ntok: Int)

  def minhashAnalyze(k: Int, n: Int, bands: Int, rowsPerBand: Int): Column => Column = {
    val f = udf { (text: String) =>
      val toks = tokensJvm(text)
      val shAll = shinglesJvm(toks, n)
      MinhashAnalysis(
        shAll.distinct,
        bandBucketsJvm(minhashJvm(shAll, k), bands, rowsPerBand),
        toks.length)
    }
    c => f(c)
  }

  /** Distinct shingles + token count (for blocked jaccard mining). */
  case class ShingleAnalysis(sh: Array[String], ntok: Int)

  def shingleAnalyze(n: Int): Column => Column = {
    val f = udf { (text: String) =>
      val toks = tokensJvm(text)
      ShingleAnalysis(shinglesJvm(toks, n).distinct, toks.length)
    }
    c => f(c)
  }

  val jaccardUdf: (Column, Column) => Column = {
    val f = udf((a: Seq[String], b: Seq[String]) => jaccardJvm(a, b))
    (a, b) => f(a, b)
  }

  def simhashUdf(bits: Int): Column => Column = {
    val f = udf((text: String) => simhashJvm(text, bits))
    c => f(c)
  }

  val cosineUdf: (Column, Column) => Column = {
    val f = udf((a: Seq[Float], b: Seq[Float]) => cosineJvm(a, b))
    (a, b) => f(a, b)
  }

  def lshBucketUdf(nPlanes: Int, dim: Int): Column => Column = {
    val planes = SimilarityFunctions.hyperplanes(nPlanes, dim)
    val f = udf((v: Seq[Float]) => lshBucketJvm(v, planes))
    c => f(c)
  }
}
