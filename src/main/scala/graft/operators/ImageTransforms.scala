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
  /** Ops with per-sample randomness (flip/crop draws) override this;
    * `id` is the sample key the deterministic draw hashes (SURVEY §7.4:
    * every "random" decision is a pure function of (row key, seed)).
    */
  def apply(media: Column, id: Column): Column = apply(media)
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
final case class PixelResizeOp(size: Int, channelMajor: Boolean = false,
    interp: graft.functions.ImageCodec.Interp =
      graft.functions.ImageCodec.Interp.Nearest,
    clampHi: Float = 255f) extends ImageOp {
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float]) =>
    graft.functions.ImageCodec.resizeShorter(
      graft.functions.ImageCodec.DecodedImage(w, h, c, px), size, channelMajor,
      interp, clampHi))
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

/** torchvision `Normalize(mean, std)`: per-channel (v − mean_c) / std_c
  * over the decoded pixels. A channel beyond the mean/std length reuses
  * the last entry (torchvision broadcasts a 1-element list the same way).
  */
final case class PixelNormalizeOp(mean: Seq[Double], std: Seq[Double],
    channelMajor: Boolean = false) extends ImageOp {
  require(mean.nonEmpty && std.nonEmpty, "Normalize needs mean and std")
  require(std.forall(_ != 0.0), "Normalize std must be non-zero")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float]) => {
    val out = new Array[Float](px.length)
    val plane = w * h
    var i = 0
    while (i < px.length) {
      val ch = if (channelMajor) i / plane else i % c
      val m = mean(math.min(ch, mean.length - 1))
      val s = std(math.min(ch, std.length - 1))
      out(i) = ((px(i) - m) / s).toFloat
      i += 1
    }
    graft.functions.ImageCodec.DecodedImage(w, h, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  })
  override def apply(media: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"))
}

/** torchvision `RandomHorizontalFlip(p)` with the engine's replayable
  * randomness: the flip draw is PortableHash(key, seed) — uniform in
  * [0,1), flips when < p — instead of the reference's process-global RNG
  * (stable under task retry, reproducible anywhere).
  */
final case class RandomHFlipOp(p: Double = 0.5, seed: Int = 42,
    channelMajor: Boolean = false) extends ImageOp {
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    val draw = graft.functions.PortableHash.detHashJvm(s"$id:$seed") / 4294967296.0
    if (draw >= p) graft.functions.ImageCodec.DecodedImage(w, h, c, px)
    else {
      val out = new Array[Float](px.length)
      var ch = 0
      while (ch < c) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = if (channelMajor) px(ch * h * w + y * w + x)
                    else px((y * w + x) * c + ch)
            val mx = w - 1 - x
            if (channelMajor) out(ch * h * w + y * w + mx) = v
            else out((y * w + mx) * c + ch) = v
            x += 1
          }
          y += 1
        }
        ch += 1
      }
      graft.functions.ImageCodec.DecodedImage(w, h, c,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
    }
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `RandomResizedCrop(size)` with replayable randomness:
  * the area fraction draws uniform from `scale`, the aspect ratio
  * log-uniform from `ratio`, and top/left uniform over the legal range —
  * all from PortableHash(key, seed). One draw with geometry clamped to
  * the image (torchvision rejection-samples up to 10× then falls back
  * to center-crop; a deterministic engine takes the single clamped draw
  * — documented divergence, same distribution family). The crop then
  * resizes to `size`×`size` with `interp`.
  */
final case class RandomResizedCropOp(size: Int,
    scale: (Double, Double) = (0.08, 1.0),
    ratio: (Double, Double) = (0.75, 4.0 / 3.0),
    seed: Int = 42,
    channelMajor: Boolean = false,
    interp: graft.functions.ImageCodec.Interp =
      graft.functions.ImageCodec.Interp.Bilinear,
    clampHi: Float = 255f) extends ImageOp {
  require(scale._1 > 0 && scale._1 <= scale._2 && scale._2 <= 1.0, "bad scale range")
  require(ratio._1 > 0 && ratio._1 <= ratio._2, "bad ratio range")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    import graft.functions.{ImageCodec, PortableHash}
    def u(tag: Int): Double =
      PortableHash.detHashJvm(s"$id:rrc$tag:$seed") / 4294967296.0
    val frac = scale._1 + u(0) * (scale._2 - scale._1)
    val logR = math.log(ratio._1) + u(1) * (math.log(ratio._2) - math.log(ratio._1))
    val r = math.exp(logR)
    val area = frac * w * h
    val cw = math.max(1, math.min(w, math.round(math.sqrt(area * r)).toInt))
    val chh = math.max(1, math.min(h, math.round(math.sqrt(area / r)).toInt))
    val left = (PortableHash.detHashJvm(s"$id:rrc2:$seed") % (w - cw + 1)).toInt
    val top = (PortableHash.detHashJvm(s"$id:rrc3:$seed") % (h - chh + 1)).toInt
    val cropped = ImageCodec.crop(
      ImageCodec.DecodedImage(w, h, c, px), left, top, cw, chh, channelMajor)
    ImageCodec.resample(cropped, size, size, channelMajor, interp, clampHi)
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `RandomCrop(size)` with replayable randomness: top/left
  * drawn from PortableHash(key, seed) over the legal offset range — the
  * same (key, seed) discipline CropToSquare uses
  * (reference sample_mappers.py:171-172 draws from global numpy RNG).
  * Crops clamp to the image (no padding of small images), matching
  * [[PixelCenterCropOp]].
  */
final case class RandomCropOp(size: Int, seed: Int = 42,
    channelMajor: Boolean = false) extends ImageOp {
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    val d = graft.functions.ImageCodec.DecodedImage(w, h, c, px)
    val nw = math.min(size, w); val nh = math.min(size, h)
    val top = (graft.functions.PortableHash.detHashJvm(s"$id:$seed") % (h - nh + 1)).toInt
    val left = (graft.functions.PortableHash.detHashJvm(s"$id:${seed + 1}") % (w - nw + 1)).toInt
    graft.functions.ImageCodec.crop(d, left, top, nw, nh, channelMajor)
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

final case class ImageTransforms(ops: Seq[ImageOp], key: String = "media",
    strict: Boolean = true,
    override val excludeKeys: Seq[String] = Nil,
    idKey: String = "__key__") extends SampleMapper {

  override def transform(df: DataFrame): DataFrame = {
    val base = if (strict) df.filter(col(key).isNotNull) else df
    // sample key for the seeded-randomness ops (flip/crop draws); a
    // frame without the key column gets a constant id — the draws stay
    // deterministic, just no longer per-sample.
    val idc = if (df.columns.contains(idKey)) col(idKey) else lit("")
    rewrite(base, key) { c =>
      val out = ops.foldLeft(c)((acc, op) => op(acc, idc))
      if (strict) out else when(c.isNull, c).otherwise(out)
    }
  }
}
