package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Compressed-audio METADATA decode — the metadata tier for formats a
  * JVM cannot (and a data pipeline need not) fully decode. The
  * reference's autodecode vocabulary accepts mp3/flac members
  * (reference sdata/dataset.py:204-232 via wds autodecode); this engine
  * decodes their FRAME HEADERS — duration, sample rate, channels,
  * sample counts — while the payload stays `BinaryType`, exactly the
  * split [[VideoCodec]] makes for video: curation queries (length
  * filters, rate histograms, duration-budget packing) never touch a
  * codec library, and a user who needs PCM registers their own decoder.
  *
  * Both parsers are pure byte arithmetic over published container
  * layouts:
  *  - MP3: optional ID3v2 tag skip (syncsafe length), then a walk of
  *    MPEG audio frame headers (version/layer/bitrate/samplerate
  *    tables, padded frame lengths) summing samples-per-frame; a
  *    trailing 128-byte ID3v1 `TAG` block is tolerated, anything else
  *    after the last frame is malformed.
  *  - FLAC: `fLaC` magic, metadata-block walk to STREAMINFO, whose
  *    packed bit layout carries sample rate (20 bits), channels (3),
  *    bits-per-sample (5), and total samples (36).
  *
  * Error convention matches the other codecs: strict APIs throw,
  * Column UDFs null malformed payloads.
  */
object AudioMetaCodec {

  final case class Mp3Meta(version: String, layer: Int, sample_rate: Int,
      channels: Int, n_frames: Int, n_samples: Long, duration_ms: Long,
      bitrate_kbps: Int)

  final case class FlacMeta(sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long)

  // bitrate tables (kbps), index 1..14; 0 = free (unsupported), 15 = bad
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  private def u(b: Byte): Int = b & 0xff

  /** Bytes to skip for an ID3v2 tag at `off`, or 0 when none. */
  private def id3v2Len(bytes: Array[Byte], off: Int): Int = {
    if (off + 10 > bytes.length || bytes(off) != 'I' || bytes(off + 1) != 'D' ||
      bytes(off + 2) != '3') return 0
    // syncsafe 28-bit size; bit 4 of the flags byte adds a 10-byte footer
    val size = (u(bytes(off + 6)) << 21) | (u(bytes(off + 7)) << 14) |
      (u(bytes(off + 8)) << 7) | u(bytes(off + 9))
    10 + size + (if ((u(bytes(off + 5)) & 0x10) != 0) 10 else 0)
  }

  /** Parse the 4-byte MPEG audio frame header at `off`; returns
    * (frameLen, samplesPerFrame, sampleRate, channels, bitrateKbps,
    * version, layer) or throws.
    */
  private def frameHeader(bytes: Array[Byte], off: Int) = {
    require(off + 4 <= bytes.length, s"mp3: truncated frame header at $off")
    val b1 = u(bytes(off)); val b2 = u(bytes(off + 1))
    val b3 = u(bytes(off + 2)); val b4 = u(bytes(off + 3))
    require(b1 == 0xff && (b2 & 0xe0) == 0xe0, f"mp3: lost sync at $off")
    val verBits = (b2 >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
    require(verBits != 1, "mp3: reserved MPEG version")
    val layerBits = (b2 >> 1) & 3 // 1=III, 2=II, 3=I
    require(layerBits != 0, "mp3: reserved layer")
    val layer = 4 - layerBits
    val brIdx = (b3 >> 4) & 15
    require(brIdx != 0 && brIdx != 15, s"mp3: unsupported bitrate index $brIdx")
    val srIdx = (b3 >> 2) & 3
    require(srIdx != 3, "mp3: bad sample-rate index")
    val padding = (b3 >> 1) & 1
    val channels = if (((b4 >> 6) & 3) == 3) 1 else 2
    val v1 = verBits == 3
    val sr = (verBits match {
      case 3 => SrV1
      case 2 => SrV2
      case _ => SrV25
    })(srIdx)
    val br = (if (v1) layer match {
      case 1 => BrV1L1
      case 2 => BrV1L2
      case _ => BrV1L3
    } else if (layer == 1) BrV2L1 else BrV2L23)(brIdx)
    val spf = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (v1) 1152 else 576
    }
    val frameLen =
      if (layer == 1) (12 * br * 1000 / sr + padding) * 4
      else spf / 8 * br * 1000 / sr + padding
    val version = verBits match {
      case 3 => "MPEG1"
      case 2 => "MPEG2"
      case _ => "MPEG2.5"
    }
    (frameLen, spf, sr, channels, br, version, layer)
  }

  /** Strict MP3 frame-header walk. Constant version/layer/samplerate
    * over the stream required (the stream-description fields are
    * per-track metadata); bitrate may vary (VBR) — the reported
    * `bitrate_kbps` is the frame average rounded down.
    */
  def decodeMp3Meta(bytes: Array[Byte]): Mp3Meta = {
    require(bytes != null && bytes.length >= 4, "mp3: empty payload")
    var off = id3v2Len(bytes, 0)
    var nFrames = 0
    var nSamples = 0L
    var brSum = 0L
    var meta: (String, Int, Int, Int) = null // version, layer, sr, channels
    var done = false
    while (!done) {
      if (off == bytes.length) done = true
      else if (bytes.length - off == 128 && bytes(off) == 'T' &&
        bytes(off + 1) == 'A' && bytes(off + 2) == 'G') done = true // ID3v1
      else {
        val (flen, spf, sr, ch, br, ver, layer) = frameHeader(bytes, off)
        require(off + flen <= bytes.length,
          s"mp3: frame at $off overruns payload (${off + flen} > ${bytes.length})")
        val m = (ver, layer, sr, ch)
        if (meta == null) meta = m
        else require(meta == m, s"mp3: stream description changed mid-file: $meta -> $m")
        nFrames += 1
        nSamples += spf
        brSum += br
        off += flen
      }
    }
    require(nFrames > 0, "mp3: no audio frames")
    Mp3Meta(meta._1, meta._2, meta._3, meta._4, nFrames, nSamples,
      nSamples * 1000L / meta._3, (brSum / nFrames).toInt)
  }

  /** Strict FLAC STREAMINFO parse (an ID3v2 tag before the `fLaC`
    * magic is tolerated, as ubiquitous taggers write one).
    */
  def decodeFlacMeta(bytes: Array[Byte]): FlacMeta = {
    require(bytes != null && bytes.length >= 4, "flac: empty payload")
    var off = id3v2Len(bytes, 0)
    require(off + 4 <= bytes.length && bytes(off) == 'f' &&
      bytes(off + 1) == 'L' && bytes(off + 2) == 'a' && bytes(off + 3) == 'C',
      "flac: bad magic")
    off += 4
    var last = false
    var found: FlacMeta = null
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated block header")
      val hdr = u(bytes(off))
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val blen = (u(bytes(off + 1)) << 16) | (u(bytes(off + 2)) << 8) | u(bytes(off + 3))
      off += 4
      require(off + blen <= bytes.length, s"flac: block overruns payload")
      if (btype == 0) {
        require(blen == 34, s"flac: STREAMINFO must be 34 bytes, got $blen")
        val b = bytes
        val sr = (u(b(off + 10)) << 12) | (u(b(off + 11)) << 4) | (u(b(off + 12)) >> 4)
        val ch = ((u(b(off + 12)) >> 1) & 7) + 1
        val bps = (((u(b(off + 12)) & 1) << 4) | (u(b(off + 13)) >> 4)) + 1
        val n = ((u(b(off + 13)) & 0x0f).toLong << 32) |
          (u(b(off + 14)).toLong << 24) | (u(b(off + 15)).toLong << 16) |
          (u(b(off + 16)).toLong << 8) | u(b(off + 17)).toLong
        require(sr > 0, "flac: zero sample rate")
        found = FlacMeta(sr, ch, bps, n, n * 1000L / sr)
      }
      off += blen
    }
    require(found != null, "flac: no STREAMINFO block")
    found
  }

  final case class OggMeta(codec: String, sample_rate: Int, channels: Int,
      n_samples: Long, duration_ms: Long)

  /** Strict OGG container parse (Vorbis and Opus): the page walk is
    * pure header arithmetic (capture pattern + segment-table lacing);
    * the codec id header rides the first (BOS) page, and the stream's
    * total length is the LAST page's granule position — PCM samples
    * for Vorbis, 48 kHz samples net of pre-skip for Opus. CRCs are not
    * verified (metadata tier, not an integrity checker).
    */
  def decodeOggMeta(bytes: Array[Byte]): OggMeta = {
    require(bytes != null && bytes.length >= 28, "ogg: empty payload")
    var off = 0
    var first = true
    var codec = ""
    var rate = -1
    var channels = -1
    var preskip = 0
    var lastGranule = -1L
    while (off < bytes.length) {
      require(off + 27 <= bytes.length, s"ogg: truncated page header at $off")
      require(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
        bytes(off + 2) == 'g' && bytes(off + 3) == 'S',
        s"ogg: lost page capture at $off")
      require(bytes(off + 4) == 0, "ogg: unsupported page version")
      var granule = 0L
      var i = 7
      while (i >= 0) { granule = (granule << 8) | u(bytes(off + 6 + i)); i -= 1 }
      val nsegs = u(bytes(off + 26))
      require(off + 27 + nsegs <= bytes.length, "ogg: truncated segment table")
      var payloadLen = 0
      (0 until nsegs).foreach(k => payloadLen += u(bytes(off + 27 + k)))
      val payloadStart = off + 27 + nsegs
      require(payloadStart + payloadLen <= bytes.length,
        s"ogg: page payload overruns member at $off")
      if (first) {
        if (payloadLen >= 30 && bytes(payloadStart) == 0x01 &&
          new String(bytes, payloadStart + 1, 6, "ISO-8859-1") == "vorbis") {
          codec = "vorbis"
          channels = u(bytes(payloadStart + 11)).toInt
          rate = (u(bytes(payloadStart + 12)) | (u(bytes(payloadStart + 13)) << 8) |
            (u(bytes(payloadStart + 14)) << 16) | (u(bytes(payloadStart + 15)) << 24)).toInt
        } else if (payloadLen >= 19 &&
          new String(bytes, payloadStart, 8, "ISO-8859-1") == "OpusHead") {
          codec = "opus"
          channels = u(bytes(payloadStart + 9)).toInt
          preskip = (u(bytes(payloadStart + 10)) | (u(bytes(payloadStart + 11)) << 8)).toInt
          rate = 48000 // opus granules are always 48 kHz
        } else throw new IllegalArgumentException(
          "ogg: first page carries neither a vorbis nor an opus id header")
        first = false
      }
      if (granule >= 0) lastGranule = granule
      off = payloadStart + payloadLen
    }
    require(lastGranule >= 0, "ogg: no page carries a granule position")
    require(rate > 0 && channels > 0, s"ogg: bad id header (rate $rate)")
    val n = if (codec == "opus") lastGranule - preskip else lastGranule
    require(n >= 0, "ogg: pre-skip exceeds stream length")
    OggMeta(codec, rate, channels, n, n * 1000L / rate)
  }

  /** `binary => struct(codec, sample_rate, channels, n_samples,
    * duration_ms)`, null for undecodable.
    */
  val decodeOggMetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeOggMeta(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => struct(version, layer, sample_rate, channels, n_frames,
    * n_samples, duration_ms, bitrate_kbps)`, null for undecodable.
    */
  val decodeMp3MetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeMp3Meta(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => struct(sample_rate, channels, bits_per_sample,
    * n_samples, duration_ms)`, null for undecodable.
    */
  val decodeFlacMetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeFlacMeta(bytes)).toOption
    }
    c => f(c)
  }
}
