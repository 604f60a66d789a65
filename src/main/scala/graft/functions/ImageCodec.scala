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
  * pixels normalized to [0,1] in channel-major order. Nearest-neighbor
  * resize keeps the kernel dependency-free and deterministic; the
  * interpolation mode is a parameter slot exactly like the reference's
  * torchvision config (SURVEY §7.3 risk 6 — cross-library interpolation
  * parity is approximate by nature, so correctness-critical paths keep
  * bytes + dims).
  */
object ImageCodec {

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType), nullable = false)))

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
