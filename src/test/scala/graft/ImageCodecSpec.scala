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
}
