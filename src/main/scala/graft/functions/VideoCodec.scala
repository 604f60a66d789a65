package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Y4M (YUV4MPEG2) video decode — the video leg of the multimodal
  * column family (reference treats video members as opaque bytes for
  * the wds handler chain; SURVEY brief: decode / frame-sample with the
  * Spark-side plumbing real). Y4M is the uncompressed interchange
  * container — a text header (`YUV4MPEG2 W<w> H<h> F<n>:<d> ...`) and
  * raw planar frames each prefixed by a `FRAME` line — so, like PCM
  * WAV, it parses with pure byte arithmetic and no codec library.
  * Compressed containers (mp4/webm/mkv) stay `BinaryType` unless a
  * user registers a decoder, the same fallback as images and audio.
  *
  * Two tiers, so metadata queries never touch pixel bytes:
  *  - [[decodeMeta]] → `struct(width, height, fps_num, fps_den,
  *    n_frames)` — walks frame headers only (the registry decoder);
  *  - [[sampleLumaFrames]] → every `step`-th frame's LUMA plane as
  *    `struct(frame_idx, width, height, pixels array<float>)` with raw
  *    0..255 values (exact in float32, cross-engine hashable); chroma
  *    is skipped on read. RGB conversion is a downstream op — luma is
  *    what frame-level dedup/quality kernels consume.
  *
  * Supported colorspaces: C420 (+jpeg/paldv/mpeg2 variants), C422,
  * C444, Cmono — anything else fails fast. Error convention matches
  * the other codecs: strict APIs throw, Column UDFs null malformed
  * payloads.
  */
object VideoCodec {

  final case class VideoMeta(width: Int, height: Int, fps_num: Int,
      fps_den: Int, n_frames: Int)
  final case class LumaFrame(frame_idx: Int, width: Int, height: Int,
      pixels: Array[Float])

  private final case class Header(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, frameBytes: Int, lumaBytes: Int, dataStart: Int)

  private def parseHeader(bytes: Array[Byte]): Header = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "y4m: no header line")
    val line = new String(bytes, 0, nl, "ASCII")
    require(line.startsWith("YUV4MPEG2"), s"y4m: bad magic: ${line.take(20)}")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420"
    line.split(' ').drop(1).foreach { tok =>
      if (tok.nonEmpty) tok.head match {
        case 'W' => w = tok.tail.toInt
        case 'H' => h = tok.tail.toInt
        case 'F' =>
          val Array(a, b) = tok.tail.split(':'); fn = a.toInt; fd = b.toInt
        case 'C' => cs = tok.tail
        case _ => () // I (interlace), A (aspect), X (extension) — ignored
      }
    }
    require(w > 0 && h > 0, s"y4m: missing W/H in header: $line")
    // Long arithmetic, then bound by the ACTUAL payload size: with Int
    // math a hostile W/H (e.g. 40000x40000 C420) overflows frameBytes
    // NEGATIVE, which (a) vacuously passes the per-frame overrun check
    // and lets the luma sampler attempt a multi-GB allocation (fatal
    // OOM, not catchable by the null-on-malformed UDFs), and (b) steps
    // the frame walk BACKWARDS, which can cycle forever in decodeMeta.
    // A frame can never be larger than the member that contains it.
    val luma = w.toLong * h
    val chroma: Long = cs match {
      case s if s.startsWith("420") => (w / 2).toLong * (h / 2) * 2
      case s if s.startsWith("422") => (w / 2).toLong * h * 2
      case s if s.startsWith("444") => luma * 2
      case "mono" => 0L
      case other => throw new IllegalArgumentException(
        s"y4m: unsupported colorspace C$other (420*/422/444/mono only)")
    }
    val frameBytes = luma + chroma
    require(frameBytes > 0 && frameBytes <= bytes.length,
      s"y4m: frame size $frameBytes exceeds payload ${bytes.length}")
    Header(w, h, fn, fd, frameBytes.toInt, luma.toInt, nl + 1)
  }

  /** Position of frame `k`'s luma plane, or -1 past the end; also used
    * to count frames. Each frame is `FRAME[params]\n` + planes.
    */
  private def framePayload(bytes: Array[Byte], hdr: Header, k: Int): Int = {
    var pos = hdr.dataStart
    var i = 0
    while (pos < bytes.length) {
      require(pos + 5 <= bytes.length &&
        new String(bytes, pos, 5, "ASCII") == "FRAME",
        s"y4m: bad FRAME marker at $pos")
      var nl = pos + 5
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      require(nl < bytes.length, "y4m: unterminated FRAME header")
      val payload = nl + 1
      require(payload.toLong + hdr.frameBytes <= bytes.length,
        s"y4m: truncated frame $i")
      if (i == k) return payload
      pos = payload + hdr.frameBytes
      i += 1
    }
    -1
  }

  def decodeMeta(bytes: Array[Byte]): VideoMeta = {
    val hdr = parseHeader(bytes)
    var n = 0
    while (framePayload(bytes, hdr, n) >= 0) n += 1
    VideoMeta(hdr.width, hdr.height, hdr.fpsNum, hdr.fpsDen, n)
  }

  /** Every `step`-th frame converted to RGB via the integer-exact
    * BT.601 full-range formula (C = Y−16, D = U−128, E = V−128;
    * R = clip((298·C + 409·E + 128) >> 8) etc. — the published
    * fixed-point form, so results are bit-identical on any platform).
    * Output is an HWC interleaved [[graft.functions.ImageCodec
    * .DecodedImage]]-shaped struct per frame, ready for the image op
    * chain (resize / crop / normalize / fingerprint). 420 chroma
    * upsamples by pixel doubling (nearest); mono replicates luma.
    */
  def sampleRgbFrames(bytes: Array[Byte], step: Int): Seq[RgbFrame] = {
    require(step >= 1, s"step must be >= 1, got $step")
    val hdr = parseHeader(bytes)
    val (w, h) = (hdr.width, hdr.height)
    val luma = hdr.lumaBytes
    // chroma geometry from the plane sizes the header implies
    val chromaPer = (hdr.frameBytes - luma) / 2
    val mode =
      if (chromaPer == 0) "mono"
      else if (chromaPer == (w / 2) * (h / 2)) "420"
      else if (chromaPer == (w / 2) * h) "422"
      else "444"
    def clip(v: Int): Float = math.max(0, math.min(255, v)).toFloat
    val out = scala.collection.mutable.ArrayBuffer.empty[RgbFrame]
    var k = 0
    var pos = framePayload(bytes, hdr, k)
    while (pos >= 0) {
      val px = new Array[Float](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = bytes(pos + y * w + x) & 0xff
          val (u, v) =
            if (mode == "mono") (128, 128)
            else {
              val (cw, cx, cy) = mode match {
                case "420" => (w / 2, x / 2, y / 2)
                case "422" => (w / 2, x / 2, y)
                case _ => (w, x, y)
              }
              (bytes(pos + luma + cy * cw + cx) & 0xff,
                bytes(pos + luma + chromaPer + cy * cw + cx) & 0xff)
          }
          val c = 298 * (yy - 16)
          val d = u - 128
          val e = v - 128
          val base = (y * w + x) * 3
          px(base) = clip((c + 409 * e + 128) >> 8)
          px(base + 1) = clip((c - 100 * d - 208 * e + 128) >> 8)
          px(base + 2) = clip((c + 516 * d + 128) >> 8)
          x += 1
        }
        y += 1
      }
      out += RgbFrame(k, w, h, px)
      k += step
      pos = framePayload(bytes, hdr, k)
    }
    out.toSeq
  }

  final case class RgbFrame(frame_idx: Int, width: Int, height: Int,
      pixels: Array[Float])

  /** Every `step`-th frame's luma plane (frame 0, step, 2·step, …). */
  def sampleLumaFrames(bytes: Array[Byte], step: Int): Seq[LumaFrame] = {
    require(step >= 1, s"step must be >= 1, got $step")
    val hdr = parseHeader(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[LumaFrame]
    var k = 0
    var pos = framePayload(bytes, hdr, k)
    while (pos >= 0) {
      val px = new Array[Float](hdr.lumaBytes)
      var i = 0
      while (i < hdr.lumaBytes) { px(i) = (bytes(pos + i) & 0xff).toFloat; i += 1 }
      out += LumaFrame(k, hdr.width, hdr.height, px)
      k += step
      pos = framePayload(bytes, hdr, k)
    }
    out.toSeq
  }

  /** `binary => struct(width, height, fps_num, fps_den, n_frames)`,
    * null for undecodable payloads.
    */
  val decodeMetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeMeta(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => array<struct(frame_idx, width, height, pixels)>` of
    * every `step`-th luma frame, null for undecodable payloads.
    */
  def sampleLumaFramesUdf(step: Int): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(sampleLumaFrames(bytes, step)).toOption
    }
    c => f(c)
  }

  /** RGB variant of the sampler — HWC interleaved, image-op-chain
    * ready; null for undecodable payloads.
    */
  def sampleRgbFramesUdf(step: Int): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(sampleRgbFrames(bytes, step)).toOption
    }
    c => f(c)
  }
}
