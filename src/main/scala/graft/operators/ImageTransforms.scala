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
/** Open for user extension: the YAML config vocabulary stays fail-fast
  * on unknown transform names, but a user op registered via
  * [[ImageTransforms.registerConfigOp]] becomes config-reachable without
  * an engine change — the Scala dual of the reference's open-world
  * `instantiate` (sample_mappers.py:104-108), minus arbitrary imports.
  */
trait ImageOp {
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
  // op-specific "hflip" tag: sibling ops drawing from the same (id, seed)
  // must not share a hash input, or their draws correlate perfectly
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    val draw = graft.functions.PortableHash.detHashJvm(s"$id:hflip:$seed") / 4294967296.0
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
    // rc0/rc1 tags keep these draws independent of sibling ops' draws
    // (the RandomResizedCropOp rrc0..rrc3 discipline)
    val top = (graft.functions.PortableHash.detHashJvm(s"$id:rc0:$seed") % (h - nh + 1)).toInt
    val left = (graft.functions.PortableHash.detHashJvm(s"$id:rc1:$seed") % (w - nw + 1)).toInt
    graft.functions.ImageCodec.crop(d, left, top, nw, nh, channelMajor)
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `Pad(padding, fill)` with constant fill: padding is
  * (left, top, right, bottom) — torchvision's single-int and 2-tuple
  * forms expand to it (reference reaches Pad via `instantiate`,
  * sample_mappers.py:104-108). Padding-mode variants other than
  * constant are rejected at config parse.
  */
final case class PixelPadOp(left: Int, top: Int, right: Int, bottom: Int,
    fill: Double = 0.0, channelMajor: Boolean = false) extends ImageOp {
  require(left >= 0 && top >= 0 && right >= 0 && bottom >= 0, "Pad needs non-negative padding")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float]) => {
    val nw = w + left + right
    val nh = h + top + bottom
    val out = Array.fill[Float](nw * nh * c)(fill.toFloat)
    var ch = 0
    while (ch < c) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = if (channelMajor) px(ch * h * w + y * w + x)
                  else px((y * w + x) * c + ch)
          val (ny, nx) = (y + top, x + left)
          if (channelMajor) out(ch * nh * nw + ny * nw + nx) = v
          else out((ny * nw + nx) * c + ch) = v
          x += 1
        }
        y += 1
      }
      ch += 1
    }
    graft.functions.ImageCodec.DecodedImage(nw, nh, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  })
  override def apply(media: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"))
}

/** torchvision `ColorJitter(brightness, contrast, saturation, hue)` with
  * replayable randomness: each factor draws from its range via
  * PortableHash(id, "cj<i>", seed). Ranges follow torchvision's
  * normalization (scalar b → [max(0, 1−b), 1+b]; scalar hue → [−hue,
  * hue]). torchvision additionally shuffles the application ORDER per
  * sample; the deterministic engine applies brightness → contrast →
  * saturation → hue fixed (documented divergence — same factor
  * distributions, fixed composition order). Jitter math mirrors
  * torchvision functional blends: brightness/saturation/contrast are
  * `f·img + (1−f)·other` against black / per-pixel luma / mean luma,
  * hue rotates the HSV hue channel. Saturation and hue are no-ops on
  * non-3-channel images.
  */
final case class ColorJitterOp(
    brightness: Option[(Double, Double)] = None,
    contrast: Option[(Double, Double)] = None,
    saturation: Option[(Double, Double)] = None,
    hue: Option[(Double, Double)] = None,
    seed: Int = 42,
    channelMajor: Boolean = false,
    clampHi: Float = 255f) extends ImageOp {
  Seq("brightness" -> brightness, "contrast" -> contrast, "saturation" -> saturation)
    .foreach { case (n, r) => r.foreach { case (lo, hi) =>
      require(lo >= 0 && lo <= hi, s"ColorJitter $n range must be 0 <= lo <= hi") } }
  hue.foreach { case (lo, hi) =>
    require(lo >= -0.5 && lo <= hi && hi <= 0.5, "ColorJitter hue range must be within [-0.5, 0.5]") }

  private val f = udf((w: Int, h: Int, c: Int, px0: Seq[Float], id: String) => {
    import graft.functions.PortableHash
    def draw(tag: Int, r: (Double, Double)): Double =
      r._1 + PortableHash.detHashJvm(s"$id:cj$tag:$seed") / 4294967296.0 * (r._2 - r._1)
    val scale = clampHi.toDouble // luma weights are scale-free; clamp isn't
    var px = px0.toArray
    val n = px.length
    def lumaAt(pix: Int): Double = {
      // pix is the pixel index; fetch r,g,b per layout
      val (r, g, b) =
        if (channelMajor) (px(pix), px(w * h + pix), px(2 * w * h + pix))
        else (px(pix * c), px(pix * c + 1), px(pix * c + 2))
      0.299 * r + 0.587 * g + 0.114 * b
    }
    def clamp(v: Double): Float =
      math.max(0.0, math.min(scale, v)).toFloat
    // brightness: blend toward black
    brightness.foreach { r =>
      val fac = draw(0, r)
      var i = 0
      while (i < n) { px(i) = clamp(px(i) * fac); i += 1 }
    }
    // contrast: blend toward the mean luma of the (current) image
    contrast.foreach { r =>
      val fac = draw(1, r)
      val mean =
        if (c >= 3) { var s = 0.0; var p = 0; while (p < w * h) { s += lumaAt(p); p += 1 }; s / (w * h) }
        else { var s = 0.0; var i = 0; while (i < n) { s += px(i); i += 1 }; s / n }
      var i = 0
      while (i < n) { px(i) = clamp(fac * px(i) + (1 - fac) * mean); i += 1 }
    }
    // saturation: blend toward the per-pixel luma (3-channel only)
    saturation.filter(_ => c == 3).foreach { r =>
      val fac = draw(2, r)
      val out = new Array[Float](n)
      var p = 0
      while (p < w * h) {
        val l = lumaAt(p)
        var ch = 0
        while (ch < 3) {
          val i = if (channelMajor) ch * w * h + p else p * c + ch
          out(i) = clamp(fac * px(i) + (1 - fac) * l)
          ch += 1
        }
        p += 1
      }
      px = out
    }
    // hue: rotate the HSV hue channel (3-channel only)
    hue.filter(_ => c == 3).foreach { r =>
      val shift = draw(3, r) // in turns of the hue circle
      var p = 0
      while (p < w * h) {
        val (ri, gi, bi) =
          if (channelMajor) (p, w * h + p, 2 * w * h + p)
          else (p * c, p * c + 1, p * c + 2)
        val (rv, gv, bv) = (px(ri) / scale, px(gi) / scale, px(bi) / scale)
        val mx = math.max(rv, math.max(gv, bv))
        val mn = math.min(rv, math.min(gv, bv))
        val d = mx - mn
        var hh =
          if (d == 0) 0.0
          else if (mx == rv) ((gv - bv) / d) % 6.0
          else if (mx == gv) (bv - rv) / d + 2.0
          else (rv - gv) / d + 4.0
        hh = (hh / 6.0 + shift) % 1.0
        if (hh < 0) hh += 1.0
        val s = if (mx == 0) 0.0 else d / mx
        // HSV -> RGB
        val i6 = (hh * 6.0).toInt % 6
        val fr = hh * 6.0 - math.floor(hh * 6.0)
        val (pv, qv, tv) = (mx * (1 - s), mx * (1 - fr * s), mx * (1 - (1 - fr) * s))
        val (nr, ng, nb) = i6 match {
          case 0 => (mx, tv, pv)
          case 1 => (qv, mx, pv)
          case 2 => (pv, mx, tv)
          case 3 => (pv, qv, mx)
          case 4 => (tv, pv, mx)
          case _ => (mx, pv, qv)
        }
        px(ri) = clamp(nr * scale); px(gi) = clamp(ng * scale); px(bi) = clamp(nb * scale)
        p += 1
      }
    }
    graft.functions.ImageCodec.DecodedImage(w, h, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(px))
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `RandomRotation(degrees, interpolation)` with replayable
  * randomness: the angle draws uniform from [lo, hi] via
  * PortableHash(id, "rot", seed). Inverse mapping about the image
  * center with nearest or bilinear sampling, constant fill outside
  * (torchvision's expand=False shape: output size == input size).
  */
final case class RandomRotationOp(degLo: Double, degHi: Double,
    seed: Int = 42, channelMajor: Boolean = false,
    bilinear: Boolean = false, fill: Double = 0.0) extends ImageOp {
  require(degLo <= degHi, "RandomRotation needs degLo <= degHi")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    val u = graft.functions.PortableHash.detHashJvm(s"$id:rot:$seed") / 4294967296.0
    val theta = math.toRadians(degLo + u * (degHi - degLo))
    val (cosT, sinT) = (math.cos(theta), math.sin(theta))
    val (cx, cy) = ((w - 1) / 2.0, (h - 1) / 2.0)
    val out = new Array[Float](px.length)
    def src(x: Int, y: Int): (Double, Double) = {
      // inverse rotation: output pixel pulls from R(-theta) about center
      val (dx, dy) = (x - cx, y - cy)
      (cx + dx * cosT + dy * sinT, cy - dx * sinT + dy * cosT)
    }
    def sample(sx: Double, sy: Double, ch: Int): Double = {
      def pix(xi: Int, yi: Int): Double =
        if (xi < 0 || xi >= w || yi < 0 || yi >= h) fill
        else if (channelMajor) px(ch * h * w + yi * w + xi)
        else px((yi * w + xi) * c + ch)
      if (!bilinear) {
        val (xi, yi) = (math.round(sx).toInt, math.round(sy).toInt)
        pix(xi, yi)
      } else {
        val (x0, y0) = (math.floor(sx).toInt, math.floor(sy).toInt)
        val (fx, fy) = (sx - x0, sy - y0)
        (pix(x0, y0) * (1 - fx) + pix(x0 + 1, y0) * fx) * (1 - fy) +
          (pix(x0, y0 + 1) * (1 - fx) + pix(x0 + 1, y0 + 1) * fx) * fy
      }
    }
    var ch = 0
    while (ch < c) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (sx, sy) = src(x, y)
          val v = sample(sx, sy, ch).toFloat
          if (channelMajor) out(ch * h * w + y * w + x) = v
          else out((y * w + x) * c + ch) = v
          x += 1
        }
        y += 1
      }
      ch += 1
    }
    graft.functions.ImageCodec.DecodedImage(w, h, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `RandomAffine(degrees, translate, scale, shear)` with
  * replayable randomness: each parameter draws from its configured
  * range via PortableHash(id, tag, seed) with a distinct tag per
  * parameter (draws must not correlate). The output-to-input mapping
  * uses torchvision's published inverse-affine-matrix formula
  * (rotation·scale·shear about the image center, integer-pixel
  * translation), sampled nearest or bilinear with constant fill —
  * pinning any range to a point (lo == hi) makes the op exact, which
  * is how the specs check it.
  */
final case class RandomAffineOp(
    degLo: Double, degHi: Double,
    translate: Option[(Double, Double)] = None,
    scaleRange: Option[(Double, Double)] = None,
    shear: (Double, Double, Double, Double) = (0, 0, 0, 0),
    seed: Int = 42, channelMajor: Boolean = false,
    bilinear: Boolean = false, fill: Double = 0.0) extends ImageOp {
  require(degLo <= degHi, "RandomAffine needs degrees lo <= hi")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    def u(tag: String): Double =
      graft.functions.PortableHash.detHashJvm(s"$id:$tag:$seed") / 4294967296.0
    val angle = math.toRadians(degLo + u("aff_rot") * (degHi - degLo))
    val (tx, ty) = translate match {
      case Some((fx, fy)) =>
        // torchvision draws integer pixel offsets in [-f*size, f*size]
        (math.round(-fx * w + u("aff_tx") * 2 * fx * w).toDouble,
          math.round(-fy * h + u("aff_ty") * 2 * fy * h).toDouble)
      case None => (0.0, 0.0)
    }
    val s = scaleRange match {
      case Some((lo, hi)) => lo + u("aff_sc") * (hi - lo)
      case None => 1.0
    }
    val shx = math.toRadians(shear._1 + u("aff_shx") * (shear._2 - shear._1))
    val shy = math.toRadians(shear._3 + u("aff_shy") * (shear._4 - shear._3))
    val (cx, cy) = ((w - 1) / 2.0, (h - 1) / 2.0)
    // torchvision _get_inverse_affine_matrix (output coord -> input)
    val a = math.cos(angle - shy) / math.cos(shy)
    val b = -math.cos(angle - shy) * math.tan(shx) / math.cos(shy) - math.sin(angle)
    val cc = math.sin(angle - shy) / math.cos(shy)
    val d = -math.sin(angle - shy) * math.tan(shx) / math.cos(shy) + math.cos(angle)
    val m0 = d / s; val m1 = -b / s
    val m3 = -cc / s; val m4 = a / s
    val m2 = m0 * (-cx - tx) + m1 * (-cy - ty) + cx
    val m5 = m3 * (-cx - tx) + m4 * (-cy - ty) + cy
    val out = new Array[Float](px.length)
    def sample(sx: Double, sy: Double, ch: Int): Double = {
      def pix(xi: Int, yi: Int): Double =
        if (xi < 0 || xi >= w || yi < 0 || yi >= h) fill
        else if (channelMajor) px(ch * h * w + yi * w + xi)
        else px((yi * w + xi) * c + ch)
      if (!bilinear) pix(math.round(sx).toInt, math.round(sy).toInt)
      else {
        val (x0, y0) = (math.floor(sx).toInt, math.floor(sy).toInt)
        val (fx, fy) = (sx - x0, sy - y0)
        (pix(x0, y0) * (1 - fx) + pix(x0 + 1, y0) * fx) * (1 - fy) +
          (pix(x0, y0 + 1) * (1 - fx) + pix(x0 + 1, y0 + 1) * fx) * fy
      }
    }
    var ch = 0
    while (ch < c) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val sx = m0 * x + m1 * y + m2
          val sy = m3 * x + m4 * y + m5
          val v = sample(sx, sy, ch).toFloat
          if (channelMajor) out(ch * h * w + y * w + x) = v
          else out((y * w + x) * c + ch) = v
          x += 1
        }
        y += 1
      }
      ch += 1
    }
    graft.functions.ImageCodec.DecodedImage(w, h, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** torchvision `GaussianBlur(kernel_size, sigma)` with replayable
  * randomness: sigma draws uniform from [lo, hi] via
  * PortableHash(id, "gb", seed) — a scalar config sigma pins lo == hi.
  * Separable 1-D gaussian convolution (horizontal then vertical), the
  * kernel sampled at integer offsets and normalized to sum 1, with
  * PyTorch "reflect" padding (border pixel not repeated), matching
  * torchvision's functional `gaussian_blur`.
  */
final case class GaussianBlurOp(kx: Int, ky: Int,
    sigmaLo: Double, sigmaHi: Double, seed: Int = 42,
    channelMajor: Boolean = false) extends ImageOp {
  require(kx > 0 && kx % 2 == 1 && ky > 0 && ky % 2 == 1,
    s"GaussianBlur kernel sizes must be positive odd, got ($kx, $ky)")
  require(sigmaLo > 0 && sigmaLo <= sigmaHi,
    s"GaussianBlur sigma needs 0 < lo <= hi, got ($sigmaLo, $sigmaHi)")
  private val f = udf((w: Int, h: Int, c: Int, px: Seq[Float], id: String) => {
    val u = graft.functions.PortableHash.detHashJvm(s"$id:gb:$seed") / 4294967296.0
    val sigma = sigmaLo + u * (sigmaHi - sigmaLo)
    def kernel1d(k: Int): Array[Double] = {
      val lim = (k - 1) / 2
      val arr = Array.tabulate(k) { i =>
        val x = (i - lim) / sigma
        math.exp(-0.5 * x * x)
      }
      val s = arr.sum
      arr.map(_ / s)
    }
    // PyTorch reflect padding: period 2(size−1), border pixel unrepeated
    def reflect(t: Int, size: Int): Int =
      if (size == 1) 0
      else {
        val period = 2 * (size - 1)
        val v = ((t % period) + period) % period
        if (v >= size) period - v else v
      }
    val in = px.toArray
    val tmp = new Array[Float](in.length)
    val out = new Array[Float](in.length)
    def idx(x: Int, y: Int, ch: Int): Int =
      if (channelMajor) ch * h * w + y * w + x else (y * w + x) * c + ch
    def pass(k: Array[Double], horizontal: Boolean,
        src: Array[Float], dst: Array[Float]): Unit = {
      val half = (k.length - 1) / 2
      var ch = 0
      while (ch < c) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var acc = 0.0
            var i = 0
            while (i < k.length) {
              val s =
                if (horizontal) src(idx(reflect(x + i - half, w), y, ch))
                else src(idx(x, reflect(y + i - half, h), ch))
              acc += k(i) * s
              i += 1
            }
            dst(idx(x, y, ch)) = acc.toFloat
            x += 1
          }
          y += 1
        }
        ch += 1
      }
    }
    pass(kernel1d(kx), horizontal = true, in, tmp)
    pass(kernel1d(ky), horizontal = false, tmp, out)
    graft.functions.ImageCodec.DecodedImage(w, h, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  })
  override def apply(media: Column): Column = apply(media, lit(""))
  override def apply(media: Column, id: Column): Column =
    f(media.getField("width"), media.getField("height"),
      media.getField("channels"), media.getField("pixels"), id.cast("string"))
}

/** Registry for config-reachable user image ops (the torchvision
  * escape hatch). A registration names the transform as a YAML
  * `target`'s last segment (e.g. "ElasticTransform"), pins WHERE in
  * the canonical chain it runs (`rank` — canonical ops sit at 0, 10,
  * …, 100, plus affine at 35; pick an unoccupied intermediate value),
  * and supplies the factory from the config's string params + the
  * chain context (layout, seed, clamp). Unknown names still fail
  * fast — the open world is exactly the set of explicit
  * registrations, not arbitrary class loading.
  */
object ImageTransforms {

  /** Chain-wide context handed to user-op factories: pixel layout
    * (CHW ⇔ torch* decode specs), the chain's seed for deterministic
    * draws, and the overshoot clamp ceiling of the pixel scale.
    */
  final case class UserOpContext(chw: Boolean, seed: Int, clampHi: Float)

  private val configOps =
    scala.collection.concurrent.TrieMap[String, (Int, (Map[String, String], UserOpContext) => ImageOp)]()

  def registerConfigOp(name: String, rank: Int)(
      mk: (Map[String, String], UserOpContext) => ImageOp): Unit = {
    require(rank >= 0 && rank % 10 != 0,
      s"user op rank must be positive and between canonical slots (not a multiple of 10): $rank")
    configOps.put(name, (rank, mk))
  }

  /** The chain rank of a registered user op, if any (ConfigYaml's
    * unknown-transform fallback).
    */
  def configOpRank(name: String): Option[Int] = configOps.get(name).map(_._1)

  def buildConfigOp(name: String, params: Map[String, String],
      ctx: UserOpContext): ImageOp =
    configOps.getOrElse(name,
      sys.error(s"unknown user image op: $name"))._2(params, ctx)
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
