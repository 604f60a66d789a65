package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VideoCodec

class VideoCodecSpec extends AnyFunSuite {

  private def load(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(s"/y4m/$name").toURI))

  test("C420 metadata: dimensions, fps, frame count by stream walk") {
    val m = VideoCodec.decodeMeta(load("c420_3f.y4m"))
    assert(m.width == 4 && m.height == 2)
    assert(m.fps_num == 30 && m.fps_den == 1)
    assert(m.n_frames == 3)
  }

  test("luma frame sampling skips chroma and honors step") {
    val all = VideoCodec.sampleLumaFrames(load("c420_3f.y4m"), step = 1)
    assert(all.map(_.frame_idx) == Seq(0, 1, 2))
    assert(all.head.pixels.toSeq == Seq(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f))
    assert(all(2).pixels.toSeq ==
      Seq(200f, 201f, 202f, 203f, 204f, 205f, 206f, 207f))
    val sampled = VideoCodec.sampleLumaFrames(load("c420_3f.y4m"), step = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2))
  }

  test("mono and C444 colorspaces size frames correctly") {
    val mono = VideoCodec.decodeMeta(load("mono_2f.y4m"))
    assert(mono.n_frames == 2 && mono.fps_num == 25)
    assert(VideoCodec.sampleLumaFrames(load("mono_2f.y4m"), 1)(1).pixels.toSeq ==
      Seq(250f, 251f, 252f, 253f))
    val c444 = VideoCodec.decodeMeta(load("c444_1f.y4m"))
    assert(c444.n_frames == 1 && c444.width == 2 && c444.height == 1)
    assert(VideoCodec.sampleLumaFrames(load("c444_1f.y4m"), 1).head.pixels.toSeq ==
      Seq(10f, 20f))
  }

  test("RGB frame sampling: BT.601 integer conversion, image-op-ready shape") {
    // neutral chroma (U=V=128) → gray: Y=200 → 214, Y=207 → 222
    // (values cross-checked against the published fixed-point formula)
    val frames = VideoCodec.sampleRgbFrames(load("c420_3f.y4m"), step = 2)
    assert(frames.map(_.frame_idx) == Seq(0, 2))
    val f2 = frames(1)
    assert(f2.width == 4 && f2.height == 2 && f2.pixels.length == 4 * 2 * 3)
    assert(f2.pixels.take(3).toSeq == Seq(214f, 214f, 214f)) // Y=200
    assert(f2.pixels.slice(21, 24).toSeq == Seq(222f, 222f, 222f)) // Y=207
    // mono replicates luma; Y=250 clips at 255
    val mono = VideoCodec.sampleRgbFrames(load("mono_2f.y4m"), step = 1)
    assert(mono(1).pixels.take(3).toSeq == Seq(255f, 255f, 255f))
    // a colored 420 frame: hand-built bytes, Y=128 U=200 V=60 everywhere
    val colored = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("YUV4MPEG2 W2 H2 F30:1 C420jpeg\n".getBytes("ASCII"))
      bos.write("FRAME\n".getBytes("ASCII"))
      (0 until 4).foreach(_ => bos.write(128)) // Y plane
      bos.write(200) // U (1x1 for 2x2 @ 420)
      bos.write(60)  // V
      bos.toByteArray
    }
    val cf = VideoCodec.sampleRgbFrames(colored, 1).head
    assert(cf.pixels.take(3).toSeq == Seq(22f, 158f, 255f))
    // the RGB frame drives the image op chain directly
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Tuple1(load("c420_3f.y4m"))).toDF("y4m")
      .withColumn("fr", VideoCodec.sampleRgbFramesUdf(2)(col("y4m")))
      .select(explode(col("fr")).as("f"))
      .select(struct(
        col("f.width").as("width"), col("f.height").as("height"),
        lit(3).as("channels"), col("f.pixels").as("pixels")).as("img"))
    val cropped = df.select(
      graft.operators.PixelCenterCropOp(2).apply(col("img")).as("img"))
      .select("img.width", "img.height").collect()
    assert(cropped.forall(r => r.getInt(0) == 2 && r.getInt(1) == 2))
  }

  test("strict API throws on malformed/truncated; UDF nulls them") {
    intercept[Exception](VideoCodec.decodeMeta(Array[Byte](1, 2, 3)))
    intercept[Exception](VideoCodec.decodeMeta(
      "YUV4MPEG2 W4 H2 F30:1 C420\nFRAME\nxx".getBytes("ASCII"))) // truncated
    intercept[Exception](VideoCodec.decodeMeta(
      "YUV4MPEG2 W4 H2 C999\n".getBytes("ASCII"))) // unknown colorspace
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(("good", load("mono_2f.y4m")), ("bad", Array[Byte](9)))
      .toDF("k", "raw")
      .withColumn("m", VideoCodec.decodeMetaUdf(col("raw")))
      .collect().map(r => r.getString(0) -> r.get(2)).toMap
    assert(rows("good") != null && rows("bad") == null)
  }

  test("registry decoder yields the metadata struct for .y4m members") {
    val dec = graft.pipeline.Decoders.defaults("y4m")
    val spark = SparkTestSession.get
    import spark.implicits._
    val r = Seq(Tuple1(load("c420_3f.y4m"))).toDF("y4m")
      .withColumn("m", dec.decode(org.apache.spark.sql.functions.col("y4m")))
      .select("m.width", "m.height", "m.n_frames")
      .collect().head
    assert(r.getInt(0) == 4 && r.getInt(1) == 2 && r.getInt(2) == 3)
  }
}
