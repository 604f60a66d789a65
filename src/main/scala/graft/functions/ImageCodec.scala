package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real in-JVM image decode for the multimodal path, built on
  * `javax.imageio` (ships with the JDK — PNG/JPEG/GIF/BMP). This is the
  * codec-backed implementation the [[Multimodal]] stub documents: same
  * partition-level shape (one reader per partition via mapPartitions),
  * so swapping stub→real changes no pipeline topology.
  *
  * Decoded representation matches the reference's CHW float convention
  * (reference sdata/mappers/sample_mappers.py:160-165 asserts
  * channels-first): `struct(width, height, channels, pixels)` with
  * pixels normalized to [0,1] in channel-major order. Resampling honors
  * the torchvision interpolation codes the reference's configs carry
  * (nearest / bilinear / bicubic, see [[ImageCodec.Interp]]); kernels
  * are dependency-free and deterministic (SURVEY §7.3 risk 6 —
  * cross-library interpolation parity is approximate by nature, so
  * correctness-critical paths keep bytes + dims).
  */
object ImageCodec {

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType), nullable = false)))

  /** Decoded image as a case class (encodes to [[decodedSchema]]).
    * Pixel layout and value scale depend on the decode spec (see
    * [[specs]]); the struct itself is layout-agnostic.
    */
  final case class DecodedImage(width: Int, height: Int, channels: Int,
      pixels: Seq[Float])

  /** The webdataset autodecode image-spec vocabulary the reference
    * accepts as decoder strings (reference sdata/dataset.py:204-232
    * validates against `wds.autodecode.imagespecs`):
    * spec -> (grayscale, scale to [0,1], channel-major/CHW layout).
    *
    *  - "pil"/"rgb8": HWC, 8-bit values 0..255
    *  - "rgb":        HWC, floats in [0,1]
    *  - "l8"/"l":     single channel, 0..255 / [0,1]
    *  - "torchrgb"/"torchl": CHW (the channels-first tensor convention
    *    the reference's Rescaler asserts, sample_mappers.py:160-165)
    */
  private val specs: Map[String, (Boolean, Boolean, Boolean)] = Map(
    "pil" -> ((false, false, false)),
    "rgb" -> ((false, true, false)),
    "rgb8" -> ((false, false, false)),
    "l" -> ((true, true, false)),
    "l8" -> ((true, false, false)),
    "torchrgb" -> ((false, true, true)),
    "torchl" -> ((true, true, true)))

  def isImageSpec(s: String): Boolean = specs.contains(s)
  def imageSpecs: Set[String] = specs.keySet

  /** Decode bytes per a wds image spec. Grayscale uses the ITU-R 601-2
    * integer luma PIL's convert("L") uses: (299r + 587g + 114b) / 1000.
    */
  def decodeAs(spec: String, bytes: Array[Byte]): Option[DecodedImage] = {
    val (gray, unit, chw) = specs.getOrElse(spec,
      throw new IllegalArgumentException(
        s"unknown image spec '$spec' (known: ${specs.keys.toSeq.sorted.mkString(", ")})"))
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val c = if (gray) 1 else 3
      val out = new Array[Float](c * h * w)
      val scale = if (unit) 255.0f else 1.0f
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          if (gray) {
            val lum = (299 * r + 587 * g + 114 * b) / 1000
            out(y * w + x) = lum / scale
          } else if (chw) {
            out(0 * h * w + y * w + x) = r / scale
            out(1 * h * w + y * w + x) = g / scale
            out(2 * h * w + y * w + x) = b / scale
          } else {
            val base = (y * w + x) * 3
            out(base) = r / scale
            out(base + 1) = g / scale
            out(base + 2) = b / scale
          }
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, c, scala.collection.immutable.ArraySeq.unsafeWrapArray(out)))
    }
  }

  /** Column-level decoder for one spec (used by the D3 decode registry):
    * binary -> decoded struct, null for undecodable payloads.
    */
  def decodeUdf(spec: String): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    require(isImageSpec(spec), s"unknown image spec '$spec'")
    // Try, not just the ImageIO null: a RECOGNIZED-but-corrupt payload
    // (valid PNG signature, truncated chunk) makes ImageIO.read THROW
    // rather than return null, and a corrupt member must not fail a
    // skip-policy pipeline.
    val f = org.apache.spark.sql.functions.udf(
      (bytes: Array[Byte]) =>
        if (bytes == null) None
        else scala.util.Try(decodeAs(spec, bytes)).toOption.flatten)
    c => f(c)
  }

  @inline private def pixelAt(px: Seq[Float], w: Int, h: Int, c: Int,
      chw: Boolean, ch: Int, y: Int, x: Int): Float =
    if (chw) px(ch * h * w + y * w + x) else px((y * w + x) * c + ch)

  /** Interpolation modes for pixel resampling, named by the
    * torchvision/PIL constants the reference's configs carry
    * (example.yaml:20 `interpolation: 3`; PIL: NEAREST=0, BILINEAR=2,
    * BICUBIC=3). Cross-library pixel parity is approximate by nature
    * (SURVEY §7.3 risk 6) — what we guarantee is that each mode is the
    * standard kernel (half-pixel centers; Keys cubic a=-0.5) evaluated
    * deterministically.
    */
  sealed trait Interp
  object Interp {
    case object Nearest extends Interp
    case object Bilinear extends Interp
    case object Bicubic extends Interp
    case object Lanczos extends Interp

    /** PIL integer code or name → mode; rejects the codes we don't
      * implement (4=box, 5=hamming) rather than silently substituting
      * a different kernel.
      */
    def parse(s: String): Interp = s.trim.toLowerCase match {
      case "0" | "nearest" => Nearest
      case "1" | "lanczos" => Lanczos
      case "2" | "bilinear" => Bilinear
      case "3" | "bicubic" => Bicubic
      case other => throw new IllegalArgumentException(
        s"unsupported interpolation '$other' " +
          "(supported: 0/nearest, 1/lanczos, 2/bilinear, 3/bicubic)")
    }
  }

  /** Keys cubic convolution kernel, a = -0.5 (the PIL/torchvision
    * bicubic kernel). Defined for |t| < 2; weights at the 4 taps around
    * a sample point always sum to 1.
    */
  @inline private def cubicW(t: Double): Double = {
    val a = -0.5
    val at = math.abs(t)
    if (at <= 1.0) ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    else if (at < 2.0) (((at - 5.0) * at + 8.0) * at - 4.0) * a
    else 0.0
  }

  @inline private def clampIdx(i: Int, n: Int): Int =
    if (i < 0) 0 else if (i >= n) n - 1 else i

  /** Lanczos-3 windowed sinc (the PIL LANCZOS kernel, a=3): 6 taps per
    * axis; tap weights are normalized to sum 1 (the kernel itself does
    * not), as PIL's resampler does.
    */
  @inline private def lanczosW(t: Double): Double = {
    val at = math.abs(t)
    if (at < 1e-12) 1.0
    else if (at >= 3.0) 0.0
    else {
      val pt = math.Pi * at
      3.0 * math.sin(pt) * math.sin(pt / 3.0) / (pt * pt)
    }
  }

  /** Resample to (nw, nh) with the given mode. Source coordinates use
    * half-pixel centers (sx = (x+0.5)·w/nw − 0.5) for the linear/cubic
    * kernels — the align_corners=False convention PIL and torchvision
    * share; nearest keeps the engine's historical floor(x·w/nw) mapping.
    * Bicubic and Lanczos can overshoot, so their output is clamped to
    * [0, clampHi].
    * `clampHi` is the pixel scale's ceiling — 255 for 8-bit specs
    * (pil/rgb8/l8), 1.0 for unit-scale specs (rgb/l/torch*): the
    * reference resizes BEFORE ToTensor on uint8 PIL data, so its
    * unit-scale output is the 255-clamped result divided by 255 —
    * clamping at 1.0 lands on the same values.
    */
  def resample(d: DecodedImage, nw: Int, nh: Int, chw: Boolean,
      mode: Interp, clampHi: Float = 255f): DecodedImage = {
    if (nw == d.width && nh == d.height) return d
    val (w, h, c) = (d.width, d.height, d.channels)
    val out = new Array[Float](c * nw * nh)
    @inline def put(ch: Int, y: Int, x: Int, v: Float): Unit =
      if (chw) out(ch * nh * nw + y * nw + x) = v
      else out((y * nw + x) * c + ch) = v
    @inline def src(ch: Int, y: Int, x: Int): Double =
      pixelAt(d.pixels, w, h, c, chw, ch, clampIdx(y, h), clampIdx(x, w)).toDouble
    val sxScale = w.toDouble / nw
    val syScale = h.toDouble / nh
    mode match {
      case Interp.Nearest =>
        var y = 0
        while (y < nh) {
          val sy = (y.toLong * h / nh).toInt
          var x = 0
          while (x < nw) {
            val sx = (x.toLong * w / nw).toInt
            var ch = 0
            while (ch < c) {
              put(ch, y, x, pixelAt(d.pixels, w, h, c, chw, ch, sy, sx))
              ch += 1
            }
            x += 1
          }
          y += 1
        }
      case Interp.Bilinear =>
        var y = 0
        while (y < nh) {
          val sy = (y + 0.5) * syScale - 0.5
          val y0 = math.floor(sy).toInt; val fy = sy - y0
          var x = 0
          while (x < nw) {
            val sx = (x + 0.5) * sxScale - 0.5
            val x0 = math.floor(sx).toInt; val fx = sx - x0
            var ch = 0
            while (ch < c) {
              val v =
                (1 - fy) * ((1 - fx) * src(ch, y0, x0) + fx * src(ch, y0, x0 + 1)) +
                  fy * ((1 - fx) * src(ch, y0 + 1, x0) + fx * src(ch, y0 + 1, x0 + 1))
              put(ch, y, x, v.toFloat)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
      case Interp.Lanczos =>
        val wx = new Array[Double](6); val wy = new Array[Double](6)
        var y = 0
        while (y < nh) {
          val sy = (y + 0.5) * syScale - 0.5
          val y0 = math.floor(sy).toInt; val fy = sy - y0
          var wySum = 0.0
          var j = 0
          while (j < 6) { wy(j) = lanczosW(fy - (j - 2)); wySum += wy(j); j += 1 }
          var x = 0
          while (x < nw) {
            val sx = (x + 0.5) * sxScale - 0.5
            val x0 = math.floor(sx).toInt; val fx = sx - x0
            var wxSum = 0.0
            var i = 0
            while (i < 6) { wx(i) = lanczosW(fx - (i - 2)); wxSum += wx(i); i += 1 }
            val norm = wySum * wxSum
            var ch = 0
            while (ch < c) {
              var acc = 0.0
              j = 0
              while (j < 6) {
                var rowAcc = 0.0
                i = 0
                while (i < 6) {
                  rowAcc += wx(i) * src(ch, y0 + j - 2, x0 + i - 2)
                  i += 1
                }
                acc += wy(j) * rowAcc
                j += 1
              }
              acc /= norm
              val clamped = if (acc < 0.0) 0.0 else if (acc > clampHi) clampHi.toDouble else acc
              put(ch, y, x, clamped.toFloat)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
      case Interp.Bicubic =>
        val wx = new Array[Double](4); val wy = new Array[Double](4)
        var y = 0
        while (y < nh) {
          val sy = (y + 0.5) * syScale - 0.5
          val y0 = math.floor(sy).toInt; val fy = sy - y0
          var j = 0
          while (j < 4) { wy(j) = cubicW(fy - (j - 1)); j += 1 }
          var x = 0
          while (x < nw) {
            val sx = (x + 0.5) * sxScale - 0.5
            val x0 = math.floor(sx).toInt; val fx = sx - x0
            var i = 0
            while (i < 4) { wx(i) = cubicW(fx - (i - 1)); i += 1 }
            var ch = 0
            while (ch < c) {
              var acc = 0.0
              j = 0
              while (j < 4) {
                var rowAcc = 0.0
                i = 0
                while (i < 4) {
                  rowAcc += wx(i) * src(ch, y0 + j - 1, x0 + i - 1)
                  i += 1
                }
                acc += wy(j) * rowAcc
                j += 1
              }
              val clamped = if (acc < 0.0) 0.0 else if (acc > clampHi) clampHi.toDouble else acc
              put(ch, y, x, clamped.toFloat)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
    }
    DecodedImage(nw, nh, c,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** torchvision `Resize(size, interpolation)` semantics: scale so the
    * SHORTER side equals `size`, preserving aspect; resampling kernel
    * per [[Interp]] (the reference's shipped example requests bicubic —
    * example.yaml:19-20).
    */
  def resizeShorter(d: DecodedImage, size: Int, chw: Boolean,
      mode: Interp = Interp.Nearest, clampHi: Float = 255f): DecodedImage = {
    val (w, h) = (d.width, d.height)
    if (math.min(w, h) == size) return d
    val scale = size.toDouble / math.min(w, h)
    val nw = math.max(1, math.round(w * scale).toInt)
    val nh = math.max(1, math.round(h * scale).toInt)
    resample(d, nw, nh, chw, mode, clampHi)
  }

  /** torchvision `CenterCrop(size)` semantics on the decoded pixels;
    * crops are clamped to the image (no padding of small images).
    */
  def centerCrop(d: DecodedImage, size: Int, chw: Boolean): DecodedImage = {
    val nw = math.min(size, d.width); val nh = math.min(size, d.height)
    crop(d, (d.width - nw) / 2, (d.height - nh) / 2, nw, nh, chw)
  }

  /** Rectangular crop at (x0, y0), size nw×nh (caller guarantees the
    * window lies inside the image). Shared by center and random crops.
    */
  def crop(d: DecodedImage, x0: Int, y0: Int, nw: Int, nh: Int,
      chw: Boolean): DecodedImage = {
    if (nw == d.width && nh == d.height) return d
    val out = new Array[Float](d.channels * nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        var ch = 0
        while (ch < d.channels) {
          val v = pixelAt(d.pixels, d.width, d.height, d.channels, chw, ch, y0 + y, x0 + x)
          if (chw) out(ch * nh * nw + y * nw + x) = v
          else out((y * nw + x) * d.channels + ch) = v
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    DecodedImage(nw, nh, d.channels,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  /** Decode bytes → (w, h, c, chw pixels in [0,1]); None on undecodable
    * payloads (feeds the engine error policy, not an exception).
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val c = 3
      val out = new Array[Float](c * h * w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(0 * h * w + y * w + x) = ((rgb >> 16) & 0xff) / 255.0f
          out(1 * h * w + y * w + x) = ((rgb >> 8) & 0xff) / 255.0f
          out(2 * h * w + y * w + x) = (rgb & 0xff) / 255.0f
          x += 1
        }
        y += 1
      }
      Some((w, h, c, out))
    }
  }

  /** Deterministic nearest-neighbor resize of a decoded image. */
  def resizeNearest(img: BufferedImage, newW: Int, newH: Int): BufferedImage = {
    val out = new BufferedImage(newW, newH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * img.getHeight / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * img.getWidth / newW).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-level decode stage: appends a `decoded` struct column
    * (null for undecodable payloads — route via ErrorPolicy). Optional
    * `maxSide` applies a nearest-neighbor downscale before pixel
    * extraction, bounding memory per row.
    */
  def decodeImages(df: DataFrame, payloadCol: String,
      maxSide: Option[Int] = None): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("decoded", decodedSchema, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // ImageIO scans for plugins lazily; touching it here = once per
      // partition, mirroring the one-codec-per-partition contract.
      javax.imageio.ImageIO.getUseCache
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val decoded: Row =
          if (payload == null) null
          else {
            val img0 = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
            if (img0 == null) null
            else {
              val img = maxSide match {
                case Some(m) if math.max(img0.getWidth, img0.getHeight) > m =>
                  val scale = m.toDouble / math.max(img0.getWidth, img0.getHeight)
                  resizeNearest(img0,
                    math.max(1, (img0.getWidth * scale).toInt),
                    math.max(1, (img0.getHeight * scale).toInt))
                case _ => img0
              }
              val w = img.getWidth; val h = img.getHeight
              val px = new Array[Float](3 * h * w)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  px(0 * h * w + y * w + x) = ((rgb >> 16) & 0xff) / 255.0f
                  px(1 * h * w + y * w + x) = ((rgb >> 8) & 0xff) / 255.0f
                  px(2 * h * w + y * w + x) = (rgb & 0xff) / 255.0f
                  x += 1
                }
                y += 1
              }
              Row(w, h, 3, px.toSeq)
            }
          }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }
}
