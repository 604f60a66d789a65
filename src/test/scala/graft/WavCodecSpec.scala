package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WavCodec

/** WAV decode against fixtures written by python's stdlib `wave`
  * module — the ground truth is an independent reference writer, as
  * with NpyCodecSpec's numpy fixtures.
  */
class WavCodecSpec extends AnyFunSuite {

  private def load(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(s"/wav/$name").toURI))

  test("pcm16 mono: raw values, rate, frame count") {
    val a = WavCodec.decodeWav(load("pcm16_mono.wav"))
    assert(a.sample_rate == 16000 && a.channels == 1 && a.n_frames == 6)
    assert(a.samples.toSeq == Seq(0f, 1000f, -1000f, 32767f, -32768f, 5f))
  }

  test("pcm16 stereo stays channel-interleaved") {
    val a = WavCodec.decodeWav(load("pcm16_stereo.wav"))
    assert(a.sample_rate == 8000 && a.channels == 2 && a.n_frames == 4)
    assert(a.samples.toSeq ==
      Seq(10f, -10f, 20f, -20f, 30f, -30f, 40f, -40f))
  }

  test("pcm8 is unsigned 0..255") {
    val a = WavCodec.decodeWav(load("pcm8_mono.wav"))
    assert(a.sample_rate == 44100 && a.channels == 1)
    assert(a.samples.toSeq == Seq(0f, 128f, 255f, 64f))
  }

  test("pcm24 sign-extends correctly at both extremes") {
    val a = WavCodec.decodeWav(load("pcm24_mono.wav"))
    assert(a.sample_rate == 48000 && a.n_frames == 5)
    assert(a.samples.toSeq ==
      Seq(0f, 100000f, -100000f, 8388607f, -8388608f))
  }

  test("strict API throws on malformed; UDF nulls them") {
    intercept[Exception](WavCodec.decodeWav(Array[Byte](1, 2, 3)))
    intercept[Exception](WavCodec.decodeWav(
      ("RIFFxxxxNOPE" + "x" * 40).getBytes("ASCII")))
    val spark = SparkTestSession.get
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("good", load("pcm16_mono.wav")),
      ("bad", Array[Byte](9, 9, 9)))
      .toDF("k", "raw")
      .withColumn("a", WavCodec.decodeWavUdf(col("raw")))
      .collect().map(r => r.getString(0) -> r.get(2)).toMap
    assert(rows("good") != null && rows("bad") == null)
  }

  test("decodes through the pipeline registry for .wav members") {
    val dec = graft.pipeline.Decoders.defaults("wav")
    val spark = SparkTestSession.get
    import spark.implicits._
    val row = Seq(Tuple1(load("pcm16_stereo.wav"))).toDF("wav")
      .withColumn("a", dec.decode(org.apache.spark.sql.functions.col("wav")))
      .select("a.sample_rate", "a.channels", "a.n_frames")
      .collect().head
    assert(row.getInt(0) == 8000 && row.getInt(1) == 2 && row.getInt(2) == 4)
  }
}
