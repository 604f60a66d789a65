package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Chained image transforms over a payload+metadata media column — the
  * dual of the reference's torchvision transform chain
  * (reference sdata/mappers/sample_mappers.py:88-123
  * `TorchVisionImageTransforms`).
  *
  * Parity semantics kept exactly:
  *  - `strict = true`: a sample whose image key is missing (null) is
  *    DROPPED (the reference returns `None`, which the pipeline skips);
  *  - `strict = false`: missing key passes the sample through untouched.
  *
  * The transform vocabulary operates on the metadata struct (resize,
  * center-crop geometry) and the payload digest; actual pixel work is
  * the documented decode stub (graft.functions.Multimodal) — swap in a
  * codec-backed kernel via [[Multimodal.decodePartitioned]] without
  * changing this operator's shape.
  */
sealed trait ImageOp {
  def apply(media: Column): Column
}

/** Clamp the longer side to `maxSide`, preserving aspect (metadata). */
final case class ResizeOp(maxSide: Int) extends ImageOp {
  override def apply(media: Column): Column = Multimodal.resizeMeta(media, maxSide)
}

/** Center-crop geometry to a `size`×`size` square (metadata). */
final case class CenterCropOp(size: Int) extends ImageOp {
  override def apply(media: Column): Column = {
    val w = media.getField("width").cast("long")
    val h = media.getField("height").cast("long")
    struct(
      least(w, lit(size)).cast("int").as("width"),
      least(h, lit(size)).cast("int").as("height"),
      media.getField("channels").as("channels"),
      media.getField("n_frames").as("n_frames"))
  }
}

/** Pixel-level ops over an [[graft.functions.ImageCodec]] decoded
  * struct (width, height, channels, pixels) — the real torchvision
  * vocabulary (`Resize`, `CenterCrop`, sample_mappers.py:88-123),
  * operating on the pixels a D3 image decoder produced. `channelMajor`
  * names the pixel layout of the decode spec in use (torch* specs are
  * CHW, pil/rgb/l are HWC).
  */
final case class PixelResizeOp(size: Int, channelMajor: Boolean = false) extends ImageOp {
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float]) =>
    graft.functions.ImageCodec.resizeShorter(
      graft.functions.ImageCodec.DecodedImage(w, h, c, px), size, channelMajor))
  override def apply(media: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"))
}

final case class PixelCenterCropOp(size: Int, channelMajor: Boolean = false) extends ImageOp {
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float]) =>
    graft.functions.ImageCodec.centerCrop(
      graft.functions.ImageCodec.DecodedImage(w, h, c, px), size, channelMajor))
  override def apply(media: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"))
}

final case class ImageTransforms(ops: Seq[ImageOp], key: String = "media",
    strict: Boolean = true,
    override val excludeKeys: Seq[String] = Nil) extends SampleMapper {

  override def transform(df: DataFrame): DataFrame = {
    val base = if (strict) df.filter(col(key).isNotNull) else df
    rewrite(base, key) { c =>
      val out = ops.foldLeft(c)((acc, op) => op(acc))
      if (strict) out else when(c.isNull, c).otherwise(out)
    }
  }
}
