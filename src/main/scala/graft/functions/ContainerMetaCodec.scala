package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Container METADATA decode for the remaining opaque member formats
  * the reference's autodecode vocabulary reaches (reference
  * sdata/dataset.py:204-232): ISO-BMFF video (`.mp4`/`.m4a`/`.mov`)
  * and torch checkpoint archives (`.pth`/`.pt`). Same contract as
  * [[AudioMetaCodec]] / [[VideoCodec]]: structure walks with pure byte
  * arithmetic, payload media stays `BinaryType`, strict APIs throw,
  * Column UDFs null malformed payloads.
  *
  *  - MP4: the ISO base-media box walk — `moov`/`mvhd` give timescale
  *    + presentation duration (v0 and v1 layouts), `trak`/`mdia`/`hdlr`
  *    give per-track handler fourccs (`vide`, `soun`, ...), so "how
  *    long, how many streams, is there audio" costs a header read.
  *  - PTH: a torch checkpoint is a ZIP archive (pickled metadata +
  *    raw tensor storages); the listing (entry names + uncompressed
  *    sizes) answers "which tensors, how many bytes" — the shard-
  *    budgeting question — without unpickling anything.
  *  - WEBM/MKV: the EBML element walk — Segment Info gives timestamp
  *    scale + duration, Tracks gives per-track types; clusters skip
  *    by size.
  */
object ContainerMetaCodec {

  final case class Mp4Meta(timescale: Int, duration_ms: Long,
      n_tracks: Int, handlers: Seq[String])

  final case class PthMeta(n_entries: Int, total_bytes: Long,
      names: Seq[String])

  private def u(b: Byte): Long = b & 0xffL

  private def be32(b: Array[Byte], off: Int): Long =
    (u(b(off)) << 24) | (u(b(off + 1)) << 16) | (u(b(off + 2)) << 8) | u(b(off + 3))

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** Walk the boxes in [start, end), invoking `f(type, payloadStart,
    * payloadEnd)` for each. Bounds-checked: a size that under-runs the
    * header or overruns the window throws (never loops or allocates).
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      require(off + 8 <= end, s"mp4: truncated box header at $off")
      val size0 = be32(b, off)
      val typ = fourcc(b, off + 4)
      val (size, hdr) =
        if (size0 == 1) {
          require(off + 16 <= end, "mp4: truncated largesize")
          (be64(b, off + 8), 16)
        } else if (size0 == 0) ((end - off).toLong, 8) // box extends to end
        else (size0, 8)
      require(size >= hdr && off + size <= end,
        s"mp4: box '$typ' size $size out of bounds at $off")
      f(typ, off + hdr, off + size.toInt)
      off += size.toInt
    }
  }

  /** Strict ISO-BMFF metadata parse: requires a `moov` with an `mvhd`. */
  def decodeMp4Meta(bytes: Array[Byte]): Mp4Meta = {
    require(bytes != null && bytes.length >= 8, "mp4: empty payload")
    var timescale = -1
    var durationUnits = -1L
    var handlers = List.empty[String]
    var nTracks = 0
    walkBoxes(bytes, 0, bytes.length) {
      case ("moov", ms, me) =>
        walkBoxes(bytes, ms, me) {
          case ("mvhd", ps, pe) =>
            val version = bytes(ps) & 0xff
            if (version == 1) {
              // v1 layout reads through ps+31 (8-byte duration at +24)
              require(pe - ps >= 32, "mp4: short mvhd v1")
              timescale = be32(bytes, ps + 20).toInt
              durationUnits = be64(bytes, ps + 24)
            } else {
              require(pe - ps >= 20, "mp4: short mvhd v0")
              timescale = be32(bytes, ps + 12).toInt
              durationUnits = be32(bytes, ps + 16)
            }
          case ("trak", ts, te) =>
            nTracks += 1
            walkBoxes(bytes, ts, te) {
              case ("mdia", ds, de) =>
                walkBoxes(bytes, ds, de) {
                  case ("hdlr", hs, he) =>
                    require(he - hs >= 12, "mp4: short hdlr")
                    handlers ::= fourcc(bytes, hs + 8)
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => () // ftyp, mdat, free, ...
    }
    require(timescale > 0 && durationUnits >= 0, "mp4: no mvhd in moov")
    Mp4Meta(timescale, durationUnits * 1000L / timescale, nTracks,
      handlers.reverse)
  }

  /** Strict torch-checkpoint (ZIP) listing: entry names + uncompressed
    * byte counts, measured by actually inflating each entry (sizes in
    * streaming zips ride the data descriptor AFTER the data, so the
    * header alone can't be trusted). Inflation WORK is capped at 64×
    * the archive's own size (+64 KB): checkpoint storages are mostly
    * incompressible tensor bytes (ratio ≈ 1) and pickled metadata
    * compresses a few-fold, so every honest archive decodes with huge
    * headroom, while a zero-stuffed decompression bomb (DEFLATE
    * expands up to ~1032×) throws instead of burning three orders of
    * magnitude more CPU than the member's size justifies inside a
    * per-row UDF.
    */
  def decodePthMeta(bytes: Array[Byte]): PthMeta = {
    require(bytes != null && bytes.length >= 4, "pth: empty payload")
    require(bytes(0) == 'P' && bytes(1) == 'K', "pth: not a zip archive")
    val inflateCap = 64L * bytes.length + 65536L
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          names += e.getName
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) {
            total += n
            require(total <= inflateCap,
              s"pth: inflated size exceeds $inflateCap bytes — refusing " +
                "a decompression bomb")
            n = zin.read(buf)
          }
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(names.nonEmpty, "pth: no entries")
    PthMeta(names.size, total, names.toSeq)
  }

  final case class WebmMeta(timescale_ns: Long, duration_ms: Long,
      n_tracks: Int, track_types: Seq[Int])

  // EBML element ids (stored with their length marker, as in the file)
  private val EbmlHeader = 0x1a45dfa3L
  private val Segment = 0x18538067L
  private val Info = 0x1549a966L
  private val TimestampScale = 0x2ad7b1L
  private val DurationId = 0x4489L
  private val Tracks = 0x1654ae6bL
  private val TrackEntry = 0xaeL
  private val TrackType = 0x83L

  /** (value, bytesRead) of the EBML varint at `off`; `keepMarker`
    * for element IDs (stored with the length marker), stripped for
    * sizes. All-ones ("unknown size") refuses — a metadata walk
    * cannot skip what has no length.
    */
  private def ebmlVint(b: Array[Byte], off: Int, end: Int,
      keepMarker: Boolean): (Long, Int) = {
    require(off < end, s"webm: truncated varint at $off")
    val first = u(b(off)).toInt
    require(first != 0, "webm: invalid varint lead byte 0x00")
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    require(len >= 1 && len <= 8 && off + len <= end,
      s"webm: varint of length $len overruns at $off")
    var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    (1 until len).foreach(k => v = (v << 8) | u(b(off + k)))
    if (!keepMarker) {
      val allOnes = (1L << (7 * len)) - 1
      require(v != allOnes, "webm: unknown-size element unsupported")
    }
    (v, len)
  }

  private def ebmlUint(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    (0 until len).foreach(k => v = (v << 8) | u(b(off + k)))
    v
  }

  /** Walk EBML child elements in [start, end), invoking `f(id,
    * payloadStart, payloadEnd)`.
    */
  private def walkEbml(b: Array[Byte], start: Int, end: Int)
      (f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      val (id, idLen) = ebmlVint(b, off, end, keepMarker = true)
      val (size, szLen) = ebmlVint(b, off + idLen, end, keepMarker = false)
      val ps = off + idLen + szLen
      require(size >= 0 && ps + size <= end,
        s"webm: element 0x${id.toHexString} size $size overruns at $off")
      f(id, ps, ps + size.toInt)
      off = ps + size.toInt
    }
  }

  /** Strict WebM/Matroska metadata parse: EBML header + Segment walk
    * to Info (timestamp scale in ns, duration in scale units — float32
    * or float64) and Tracks (type per TrackEntry: 1 video, 2 audio).
    * Clusters and everything else skip by size; media bytes are never
    * touched.
    */
  def decodeWebmMeta(bytes: Array[Byte]): WebmMeta = {
    require(bytes != null && bytes.length >= 8, "webm: empty payload")
    var sawHeader = false
    var scaleNs = 1000000L // Matroska default: 1 ms
    var durationUnits = -1.0
    var trackTypes = List.empty[Int]
    walkEbml(bytes, 0, bytes.length) {
      case (EbmlHeader, _, _) => sawHeader = true
      case (Segment, ss, se) =>
        walkEbml(bytes, ss, se) {
          case (Info, is, ie) =>
            walkEbml(bytes, is, ie) {
              case (TimestampScale, ps, pe) =>
                scaleNs = ebmlUint(bytes, ps, pe - ps)
              case (DurationId, ps, pe) =>
                durationUnits = (pe - ps) match {
                  case 4 => java.lang.Float.intBitsToFloat(
                    ebmlUint(bytes, ps, 4).toInt).toDouble
                  case 8 => java.lang.Double.longBitsToDouble(ebmlUint(bytes, ps, 8))
                  case n => throw new IllegalArgumentException(
                    s"webm: Duration must be a 4- or 8-byte float, got $n")
                }
              case _ => ()
            }
          case (Tracks, ts, te) =>
            walkEbml(bytes, ts, te) {
              case (TrackEntry, es, ee) =>
                walkEbml(bytes, es, ee) {
                  case (TrackType, ps, pe) =>
                    trackTypes ::= ebmlUint(bytes, ps, pe - ps).toInt
                  case _ => ()
                }
              case _ => ()
            }
          case _ => () // clusters, seek heads, cues — skipped by size
        }
      case _ => ()
    }
    require(sawHeader, "webm: no EBML header")
    require(durationUnits >= 0, "webm: no Duration in Segment Info")
    require(scaleNs > 0, "webm: zero timestamp scale")
    WebmMeta(scaleNs, (durationUnits * scaleNs / 1e6).toLong,
      trackTypes.size, trackTypes.reverse)
  }

  /** `binary => struct(timescale_ns, duration_ms, n_tracks,
    * track_types)`, null for undecodable payloads.
    */
  val decodeWebmMetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeWebmMeta(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => struct(timescale, duration_ms, n_tracks, handlers)`,
    * null for undecodable payloads.
    */
  val decodeMp4MetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeMp4Meta(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => struct(n_entries, total_bytes, names)`, null for
    * undecodable payloads.
    */
  val decodePthMetaUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodePthMeta(bytes)).toOption
    }
    c => f(c)
  }
}
