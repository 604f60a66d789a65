package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WAV (RIFF/WAVE) audio decode — the audio half of the wds autodecode
  * extension vocabulary (reference sdata/dataset.py:204-232 hands audio
  * extensions to the webdataset handler chain). PCM WAV needs no codec
  * library: the container is a chunked RIFF header over raw samples,
  * parsed here with pure byte arithmetic (format spec: public
  * RIFF/WAVE documentation).
  *
  * Output: `struct(sample_rate int, channels int, n_frames int,
  * samples array<float>)` — samples stay channel-interleaved exactly as
  * stored, and integer PCM values are emitted RAW (not normalized):
  * 8-bit as 0..255, 16-bit as -32768..32767, so every supported width
  * up to 24-bit is exact in float32 and cross-engine hashable;
  * normalize with one multiply downstream when a model wants [-1, 1]
  * (32-bit PCM wider than float32's 24-bit mantissa rounds — use the
  * 16/24-bit layouts for exactness). Compressed codecs inside WAV
  * (mp3/adpcm) and non-WAV audio (flac/ogg) stay `BinaryType` unless a
  * user registers a decoder — same fallback as unknown image formats.
  *
  * Error convention matches [[ImageCodec.decodeUdf]]/[[NpyCodec]]: the
  * strict [[decodeWav]] throws, the Column UDF nulls malformed
  * payloads.
  */
object WavCodec {

  final case class Audio(sample_rate: Int, channels: Int, n_frames: Int,
      samples: Array[Float])

  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, s"wav too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "bad RIFF/WAVE magic")
    // walk chunks: fmt must precede data (spec-guaranteed); skip others
    var pos = 12
    var fmtCode = -1
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var audio: Audio = null
    while (audio == null && pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"wav chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          fmtCode = buf.getShort(pos + 8) & 0xffff
          channels = buf.getShort(pos + 10) & 0xffff
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xffff
          require(channels > 0 && sampleRate > 0, "bad fmt chunk")
        case "data" =>
          require(fmtCode >= 0, "wav data chunk before fmt")
          audio = readSamples(bytes, pos + 8, size, fmtCode, channels,
            sampleRate, bits)
        case _ => () // LIST/INFO/fact/bext… — metadata, skipped
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(audio != null, "wav has no data chunk")
    audio
  }

  private def tag(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, "ASCII")

  private def readSamples(bytes: Array[Byte], off: Int, size: Int,
      fmtCode: Int, channels: Int, sampleRate: Int, bits: Int): Audio = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out: Array[Float] = (fmtCode, bits) match {
      case (1, 8) =>
        Array.tabulate(size)(i => (bytes(off + i) & 0xff).toFloat)
      case (1, 16) =>
        Array.tabulate(size / 2)(i => buf.getShort(off + 2 * i).toFloat)
      case (1, 24) =>
        Array.tabulate(size / 3) { i =>
          val b0 = bytes(off + 3 * i) & 0xff
          val b1 = bytes(off + 3 * i + 1) & 0xff
          val b2 = bytes(off + 3 * i + 2).toInt // sign byte
          ((b2 << 16) | (b1 << 8) | b0).toFloat
        }
      case (1, 32) =>
        Array.tabulate(size / 4)(i => buf.getInt(off + 4 * i).toFloat)
      case (3, 32) => // IEEE float
        Array.tabulate(size / 4)(i => buf.getFloat(off + 4 * i))
      case other => throw new IllegalArgumentException(
        s"unsupported wav encoding (format, bits) = $other — PCM 8/16/24/32 and float32 only")
    }
    Audio(sampleRate, channels, out.length / channels, out)
  }

  /** `binary => struct(sample_rate, channels, n_frames, samples)`, null
    * for undecodable payloads.
    */
  val decodeWavUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeWav(bytes)).toOption
    }
    c => f(c)
  }
}
