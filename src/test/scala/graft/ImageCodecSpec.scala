package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageCodec

/** Real PNG decode through the partition-level pipeline. */
class ImageCodecSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages extracts CHW [0,1] pixels; bad payloads → null") {
    import spark.implicits._
    val red = pngBytes(4, 2, 0xff0000)
    val blue = pngBytes(2, 2, 0x0000ff)
    val df = Seq(
      (1L, red), (2L, blue), (3L, "not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = ImageCodec.decodeImages(df, "payload")
    val rows = out.select($"id", $"decoded").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val redRow = rows(1L).get
    assert(redRow.getInt(0) == 4 && redRow.getInt(1) == 2 && redRow.getInt(2) == 3)
    val px = redRow.getSeq[Float](3)
    assert(px.length == 3 * 4 * 2)
    assert(px.take(8).forall(_ == 1.0f))        // R channel all 1
    assert(px.slice(8, 24).forall(_ == 0.0f))   // G,B channels all 0
    val blueRow = rows(2L).get
    assert(blueRow.getSeq[Float](3).takeRight(4).forall(_ == 1.0f)) // B channel
    assert(rows(3L).isEmpty && rows(4L).isEmpty)
  }

  test("maxSide bounds decoded dimensions deterministically") {
    import spark.implicits._
    val big = pngBytes(64, 32, 0x00ff00)
    val df = Seq((1L, big)).toDF("id", "payload")
    val out = ImageCodec.decodeImages(df, "payload", maxSide = Some(16))
      .select($"decoded.width", $"decoded.height").collect().head
    assert(out.getInt(0) == 16 && out.getInt(1) == 8)
    // deterministic: same result on re-run
    val out2 = ImageCodec.decodeImages(df, "payload", maxSide = Some(16))
      .select($"decoded.width", $"decoded.height").collect().head
    assert(out == out2)
  }

  test("decode kernel standalone") {
    val Some((w, h, c, px)) = ImageCodec.decode(pngBytes(3, 3, 0x808080))
    assert((w, h, c) == ((3, 3, 3)))
    assert(px.forall(v => math.abs(v - 128 / 255.0f) < 1e-6))
    assert(ImageCodec.decode("garbage".getBytes).isEmpty)
  }

  private def gray(w: Int, h: Int, vals: Seq[Float]) =
    ImageCodec.DecodedImage(w, h, 1, vals)

  test("bilinear golden vector: half-pixel centers with edge clamp") {
    // 2x1 row [0, 100] upscaled to 4: sx = (x+0.5)/2 - 0.5 →
    // [-0.25, 0.25, 0.75, 1.25] → [0 (clamped), 25, 75, 100 (clamped)]
    val out = ImageCodec.resample(gray(2, 1, Seq(0f, 100f)), 4, 1,
      chw = false, ImageCodec.Interp.Bilinear)
    assert(out.pixels == Seq(0f, 25f, 75f, 100f))
  }

  test("bicubic reproduces linear ramps exactly in the interior") {
    val ramp = gray(8, 1, (0 until 8).map(i => 100f * i))
    val out = ImageCodec.resample(ramp, 16, 1, chw = false, ImageCodec.Interp.Bicubic)
    // interior x=4 → sx = 1.75, all 4 taps interior → exactly 175
    assert(math.abs(out.pixels(4) - 175f) < 1e-3)
    assert(math.abs(out.pixels(5) - 225f) < 1e-3) // sx = 2.25
    // above the default 255 clamp, the unclamped kernel is still linear
    val unclamped = ImageCodec.resample(ramp, 16, 1, chw = false,
      ImageCodec.Interp.Bicubic, clampHi = Float.MaxValue)
    assert(math.abs(unclamped.pixels(8) - 375f) < 1e-3) // sx = 3.75
  }

  test("constant images are invariant under every interpolation mode") {
    val const = gray(5, 3, Seq.fill(15)(42f))
    for (m <- Seq(ImageCodec.Interp.Nearest, ImageCodec.Interp.Bilinear,
        ImageCodec.Interp.Bicubic, ImageCodec.Interp.Lanczos)) {
      val out = ImageCodec.resample(const, 7, 9, chw = false, m)
      assert(out.pixels.forall(v => math.abs(v - 42f) < 1e-4), s"mode $m")
    }
  }

  test("lanczos stays clamped and differs from bicubic on an edge") {
    val step = gray(12, 1, Seq.fill(6)(0f) ++ Seq.fill(6)(255f))
    val lz = ImageCodec.resample(step, 24, 1, chw = false, ImageCodec.Interp.Lanczos)
    val bc = ImageCodec.resample(step, 24, 1, chw = false, ImageCodec.Interp.Bicubic)
    assert(lz.pixels.forall(v => v >= 0f && v <= 255f))
    assert(lz.pixels != bc.pixels)
    // both kernels preserve the flat regions away from the edge
    assert(math.abs(lz.pixels(1)) < 1e-3 && math.abs(lz.pixels(22) - 255f) < 1e-3)
  }

  test("bicubic overshoot is clamped to the uint8 ceiling") {
    // a step edge overshoots under cubic; values must stay in [0, 255]
    val step = gray(8, 1, Seq(0f, 0f, 0f, 0f, 255f, 255f, 255f, 255f))
    val out = ImageCodec.resample(step, 32, 1, chw = false, ImageCodec.Interp.Bicubic)
    assert(out.pixels.forall(v => v >= 0f && v <= 255f))
  }

  test("interpolation modes differ on non-trivial content; CHW and HWC agree") {
    val img = ImageCodec.DecodedImage(4, 2, 3,
      (0 until 24).map(i => (i * 11 % 256).toFloat))
    val near = ImageCodec.resample(img, 8, 4, chw = false, ImageCodec.Interp.Nearest)
    val bil = ImageCodec.resample(img, 8, 4, chw = false, ImageCodec.Interp.Bilinear)
    val bic = ImageCodec.resample(img, 8, 4, chw = false, ImageCodec.Interp.Bicubic)
    assert(near.pixels != bil.pixels && bil.pixels != bic.pixels)
    // layout-independence: resampling CHW pixels = resampling HWC pixels
    def toChw(d: ImageCodec.DecodedImage): Seq[Float] =
      (0 until d.channels).flatMap(ch =>
        (0 until d.height).flatMap(y => (0 until d.width).map(x =>
          d.pixels((y * d.width + x) * d.channels + ch))))
    val chwImg = ImageCodec.DecodedImage(4, 2, 3, toChw(img))
    val bilChw = ImageCodec.resample(chwImg, 8, 4, chw = true, ImageCodec.Interp.Bilinear)
    assert(bilChw.pixels == toChw(bil))
  }

  test("Interp.parse accepts torchvision codes and rejects unknown kernels") {
    assert(ImageCodec.Interp.parse("3") == ImageCodec.Interp.Bicubic)
    assert(ImageCodec.Interp.parse("bilinear") == ImageCodec.Interp.Bilinear)
    assert(ImageCodec.Interp.parse("NEAREST") == ImageCodec.Interp.Nearest)
    assert(ImageCodec.Interp.parse("1") == ImageCodec.Interp.Lanczos)
    intercept[IllegalArgumentException](ImageCodec.Interp.parse("box"))
    intercept[IllegalArgumentException](ImageCodec.Interp.parse("4"))
  }
}
