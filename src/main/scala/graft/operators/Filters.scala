package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-sample predicate framework.
  *
  * Semantics derive from the reference's filter layer
  * (reference sdata/filters/base.py:9-64, sdata/filters/metadata_filters.py:9-104):
  * a filter is a boolean verdict per sample; samples whose `__url__`
  * contains any excluded substring bypass the filter (verdict true).
  *
  * Spark-first design: a filter contributes a `Column` predicate, so the
  * whole chain stays one `Filter` node that Catalyst can reorder, merge,
  * and push into the parquet/tar scan — never a row-at-a-time callback.
  */
trait SampleFilter extends Serializable {

  /** `__url__` substrings exempting a sample (reference filters/base.py:18-28). */
  def excludeKeys: Seq[String] = Nil

  /** The keep-predicate over the frame's columns. */
  def predicate(df: DataFrame): Column

  /** Skip ⇒ keep: url-excluded samples pass unfiltered. */
  final def guarded(df: DataFrame): Column = {
    val p = predicate(df)
    if (excludeKeys.isEmpty || !df.columns.contains("__url__")) p
    else excludeKeys.map(k => col("__url__").contains(k)).reduce(_ || _) || p
  }

  final def apply(df: DataFrame): DataFrame = df.filter(guarded(df))
}

/** AND-conjunction of one configured predicate over N columns
  * (reference sdata/filters/base.py:34-64).
  */
case class LambdaFilter(keys: Seq[String], fn: Column => Column,
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {
  require(keys.nonEmpty, "LambdaFilter needs at least one key")
  override def predicate(df: DataFrame): Column =
    keys.map(k => fn(col(k))).reduce(_ && _)
}

/** Keep a sample iff every listed key is present (non-null); a key absent
  * from the schema entirely drops everything, mirroring the reference's
  * exception-to-False behavior (reference sdata/filters/metadata_filters.py:9-28).
  */
case class SimpleKeyFilter(keys: Seq[String],
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {
  override def predicate(df: DataFrame): Column =
    keys.map { k =>
      if (df.columns.contains(k)) col(k).isNotNull else lit(false)
    }.reduce(_ && _)
}

object SizeFilterMode extends Enumeration { val Min, Max = Value }

/** Keep iff height/width are within bound (mode=Min: both >= size;
  * mode=Max: both <= size). Missing metadata resolves via the strict
  * policy: strict ⇒ drop, lenient ⇒ keep; a per-URL-substring policy map
  * overrides the default for matching urls
  * (reference sdata/filters/metadata_filters.py:31-104).
  */
case class SimpleSizeFilter(
    height: Long, width: Long,
    mode: SizeFilterMode.Value = SizeFilterMode.Min,
    strict: Boolean = true,
    strictPerUrl: Map[String, Boolean] = Map.empty,
    heightKey: String = "height", widthKey: String = "width",
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {

  override def predicate(df: DataFrame): Column = {
    val h = col(heightKey).cast("long")
    val w = col(widthKey).cast("long")
    val bound = mode match {
      case SizeFilterMode.Min => h >= height && w >= width
      case SizeFilterMode.Max => h <= height && w <= width
    }
    // On missing (null) metadata the verdict comes from the policy chain:
    // the first matching __url__ substring wins, else the default.
    val defaultOnMissing = lit(!strict)
    val onMissing =
      if (strictPerUrl.isEmpty || !df.columns.contains("__url__")) defaultOnMissing
      else strictPerUrl.foldRight(defaultOnMissing) { case ((sub, st), acc) =>
        when(col("__url__").contains(sub), lit(!st)).otherwise(acc)
      }
    coalesce(bound, onMissing)
  }
}

object SimpleSizeFilter {
  /** Square variant: one bound for both dimensions. */
  def square(size: Long, mode: SizeFilterMode.Value = SizeFilterMode.Min,
      strict: Boolean = true, heightKey: String = "height",
      widthKey: String = "width"): SimpleSizeFilter =
    SimpleSizeFilter(size, size, mode, strict,
      heightKey = heightKey, widthKey = widthKey)
}

/** Constant-true predicate (reference sdata/datapipeline.py:256-257). */
case object IdentityFilter extends SampleFilter {
  override def predicate(df: DataFrame): Column = lit(true)
}

/** Curation filters as pipeline stages: the SAME kernels and default
  * thresholds as the gate queries (q22 quality, q21 language ID, q96
  * Gopher rules) wrapped in the SampleFilter contract, so a
  * reference-shaped YAML/JSON config can run the curation pack inline
  * with its decode/transform chain — one rulebook across the gate
  * queries, the streaming `curationGate`, and the pipeline API.
  */
case class TextQualityFilter(key: String = "txt", minQuality: Double = 0.5,
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {
  override def predicate(df: DataFrame): Column =
    graft.functions.FastText.qualityScoreUdf(col(key)) >= minQuality
}

case class LangFilter(key: String = "txt", lang: String = "en",
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {
  override def predicate(df: DataFrame): Column =
    graft.functions.FastText.langIdUdf(col(key)) === lang
}

/** Gopher-style rule slice (word count, mean word length, stopword
  * hits) with q96's default thresholds.
  */
case class GopherRulesFilter(key: String = "txt",
    minWords: Long = 25, maxWords: Long = 90,
    minMeanWl: Double = 3.0, maxMeanWl: Double = 10.0,
    minStopHits: Long = 2,
    override val excludeKeys: Seq[String] = Nil) extends SampleFilter {
  override def predicate(df: DataFrame): Column = {
    val t = col(key)
    val nTok = graft.functions.TextFunctions.tokenCount(t).cast("long")
    val meanWl = (length(t).cast("double") - nTok.cast("double") + lit(1.0)) /
      greatest(nTok.cast("double"), lit(1.0))
    val stops = graft.functions.TextFunctions.stopwordCount(t,
      graft.functions.TextFunctions.stopwords.head._2)
    nTok >= minWords && nTok <= maxWords &&
      meanWl >= minMeanWl && meanWl <= maxMeanWl &&
      stops >= minStopHits
  }
}
