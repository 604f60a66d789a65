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
