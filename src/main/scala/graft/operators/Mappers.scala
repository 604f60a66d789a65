package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Per-sample transform framework.
  *
  * Semantics derive from the reference's mapper layer
  * (reference sdata/mappers/base.py:10-67, sdata/mappers/sample_mappers.py):
  * a mapper rewrites some keys of a sample; samples whose `__url__`
  * contains an excluded substring pass through untouched.
  *
  * Spark-first design: a mapper is `DataFrame => DataFrame` built from
  * `withColumn` of pure `Column` expressions, so chains of mappers stay
  * inside whole-stage codegen; the url-exclusion guard becomes a
  * `when(excluded, old).otherwise(new)` per rewritten column rather than
  * a row-level branch.
  */
trait SampleMapper extends Serializable {

  /** `__url__` substrings exempting a sample (reference sdata/mappers/base.py:15-33). */
  def excludeKeys: Seq[String] = Nil

  def transform(df: DataFrame): DataFrame

  final def apply(df: DataFrame): DataFrame = transform(df)

  /** Rewrite `key` with `f(old)`, preserving the original value for
    * url-excluded samples.
    */
  protected final def rewrite(df: DataFrame, key: String)(f: Column => Column): DataFrame = {
    val out =
      if (excludeKeys.isEmpty || !df.columns.contains("__url__")) f(col(key))
      else {
        val excl = excludeKeys.map(k => col("__url__").contains(k)).reduce(_ || _)
        when(excl, col(key)).otherwise(f(col(key)))
      }
    df.withColumn(key, out)
  }
}

/** Applies one configured expression to each of N keys in place
  * (reference sdata/mappers/base.py:40-67).
  */
case class LambdaMapper(keys: Seq[String], fn: Column => Column,
    override val excludeKeys: Seq[String] = Nil) extends SampleMapper {
  require(keys.nonEmpty, "LambdaMapper needs at least one key")
  override def transform(df: DataFrame): DataFrame =
    keys.foldLeft(df)((d, k) => rewrite(d, k)(fn))
}

/** Value-range remap of a numeric-array (image) column: float mode
  * `x*2-1` (assumes [0,1] input), uint mode `x/127.5-1` (assumes [0,255])
  * (reference sdata/mappers/sample_mappers.py:14-85). `strict=false`
  * passes nulls through; `strict=true` keeps SQL null semantics (null in,
  * null out) — the engine-wide error policy decides what to do with them.
  */
case class Rescaler(key: String = "jpg", isFloat: Boolean = true,
    override val excludeKeys: Seq[String] = Nil) extends SampleMapper {
  override def transform(df: DataFrame): DataFrame =
    rewrite(df, key) { c =>
      val f: Column => Column =
        if (isFloat) v => v * lit(2.0) - lit(1.0)
        else v => v / lit(127.5) - lit(1.0)
      transform_(c, f)
    }
  private def transform_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)
}

/** Emits `original_size_as_tuple = [h, w]` from metadata columns and
  * crops the image to a square of side `min(h, w)` at a deterministic
  * pseudo-random offset, emitting `crop_coords_top_left = [top, left]`
  * (reference sdata/mappers/sample_mappers.py:127-177).
  *
  * The reference draws top/left from process-global numpy RNG
  * (sample_mappers.py:171-172); we derive them from
  * (key column, seed) via [[PortableHash]] so the op is replayable under
  * task retry and oracle-checkable (SURVEY.md §7.4).
  */
case class CropToSquare(heightKey: String = "height", widthKey: String = "width",
    idKey: String = "__key__", seed: Int = 42,
    override val excludeKeys: Seq[String] = Nil) extends SampleMapper {
  override def transform(df: DataFrame): DataFrame = {
    val h = col(heightKey).cast("long")
    val w = col(widthKey).cast("long")
    val size = least(h, w)
    val dH = h - size
    val dW = w - size
    val top = PortableHash.detHash(col(idKey), seed) % (dH + 1)
    val left = PortableHash.detHash(col(idKey), seed + 1) % (dW + 1)
    df.withColumn("original_size_as_tuple", array(h, w))
      .withColumn("crop_size", size)
      .withColumn("crop_coords_top_left", array(top, left))
  }
}

/** Einops-style `rearrange` on a flat numeric array column with known
  * dims: supports axis-permutation patterns like "h w c -> c h w"
  * (reference sdata/mappers/batched_mappers.py:9-34 delegates to einops).
  *
  * Implemented as a pure index-remap expression over the flattened
  * array — `transform(sequence(...), i -> data[remap(i)])` — which stays
  * codegen'd; no UDF, no shuffle, valid for any row count.
  */
case class EinopsRearrange(key: String, pattern: String, dims: Map[String, Int],
    override val excludeKeys: Seq[String] = Nil) extends SampleMapper {

  private val (inAxes, outAxes) = {
    val Array(lhs, rhs) = pattern.split("->").map(_.trim)
    (lhs.split("\\s+").toSeq, rhs.split("\\s+").toSeq)
  }
  require(inAxes.sorted == outAxes.sorted,
    s"rearrange only permutes axes: $pattern")
  require(inAxes.forall(dims.contains), s"missing dims for $pattern")

  override def transform(df: DataFrame): DataFrame = rewrite(df, key) { c =>
    val n = inAxes.map(dims).product
    // For output flat index i: decompose over outAxes dims, recompose
    // over inAxes order.
    val outDims = outAxes.map(dims)
    val inStrides = inAxes.reverse.scanLeft(1)((acc, a) => acc * dims(a)).reverse.tail
    val inStrideOf = inAxes.zip(inStrides).toMap
    org.apache.spark.sql.functions.transform(sequence(lit(0), lit(n - 1)), { i =>
      // decompose i into outAxes coordinates
      var rem: Column = i
      val coords = scala.collection.mutable.Map[String, Column]()
      outAxes.zipWithIndex.foreach { case (axis, k) =>
        val tail = outDims.drop(k + 1).product
        coords(axis) = (rem / lit(tail)).cast("int")
        rem = rem % lit(tail)
      }
      val src = inAxes.map(a => coords(a) * lit(inStrideOf(a)))
        .reduce(_ + _)
      element_at(c, src + lit(1))
    })
  }
}
