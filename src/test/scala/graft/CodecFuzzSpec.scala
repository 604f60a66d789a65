package graft

import java.io.ByteArrayOutputStream

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioMetaCodec, ContainerMetaCodec, ImageCodec, NpyCodec, VideoCodec, WavCodec}

/** Fuzz coverage for the binary decoders' malformed-payload contract:
  * strict APIs may only fail with a catchable Exception (never a fatal
  * Error or a hang), and the Column UDFs must render every such failure
  * as NULL — a corrupt tar member must not be able to fail, OOM, or
  * wedge a skip-policy pipeline. Random garbage plus mutants of valid
  * payloads (truncations, byte flips) drive the generic property;
  * targeted cases pin the two fatal classes fuzzing found: header-
  * declared sizes that overflow Int into multi-GB allocations, and a
  * negative y4m frame stride that cycled the frame walk forever.
  */
class CodecFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  // -- minimal valid payloads (seeds for the mutation generators) -------

  private def npyValid: Array[Byte] = {
    val header = "{'descr': '<f4', 'fortran_order': False, 'shape': (3,), }"
    val bos = new ByteArrayOutputStream()
    bos.write(0x93); bos.write("NUMPY".getBytes("ASCII"))
    bos.write(1); bos.write(0)
    bos.write(header.length & 0xff); bos.write(header.length >> 8)
    bos.write(header.getBytes("ISO-8859-1"))
    val fb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.putFloat(1f).putFloat(2f).putFloat(3f)
    bos.write(fb.array())
    bos.toByteArray
  }

  private def wavValid: Array[Byte] = {
    val n = 4 // frames, PCM16 mono
    val data = 2 * n
    val bb = java.nio.ByteBuffer.allocate(44 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + data)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("ASCII")).putInt(data)
    (1 to n).foreach(i => bb.putShort((i * 100).toShort))
    bb.array()
  }

  private def y4mValid: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 F25:1 Cmono\n".getBytes("ASCII"))
    (0 until 2).foreach { f =>
      bos.write("FRAME\n".getBytes("ASCII"))
      bos.write(Array.tabulate[Byte](4)(i => (f * 10 + i).toByte))
    }
    bos.toByteArray
  }

  private def mp3Valid: Array[Byte] = {
    // 2 MPEG1 Layer III 128 kbps 44.1 kHz mono frames, padding 0 then 1
    val bos = new ByteArrayOutputStream()
    (0 until 2).foreach { f =>
      val pad = f % 2
      bos.write(0xff); bos.write(0xfb)
      bos.write((9 << 4) | (pad << 1)); bos.write(0xc0)
      (4 until 144 * 128000 / 44100 + pad).foreach(k => bos.write(k % 256))
    }
    bos.toByteArray
  }

  private def flacValid: Array[Byte] = {
    val (sr, ch, bps, ns) = (16000, 2, 16, 48000L)
    val bos = new ByteArrayOutputStream()
    bos.write("fLaC".getBytes("ASCII"))
    bos.write(0x80); bos.write(0); bos.write(0); bos.write(34)
    bos.write(0x10); bos.write(0x00); bos.write(0x10); bos.write(0x00)
    (0 until 6).foreach(_ => bos.write(0))
    bos.write((sr >> 12) & 0xff); bos.write((sr >> 4) & 0xff)
    bos.write(((sr & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4))
    bos.write(((bps - 1) & 0xf) << 4 | ((ns >> 32) & 0xf).toInt)
    bos.write(((ns >> 24) & 0xff).toInt); bos.write(((ns >> 16) & 0xff).toInt)
    bos.write(((ns >> 8) & 0xff).toInt); bos.write((ns & 0xff).toInt)
    (0 until 16).foreach(_ => bos.write(0))
    bos.toByteArray
  }

  private def oggValid: Array[Byte] = {
    def page(headerType: Int, granule: Long, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(27 + 1 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("ASCII")).put(0.toByte).put(headerType.toByte)
      bb.putLong(granule).putInt(1).putInt(0).putInt(0)
      bb.put(1.toByte).put(payload.length.toByte).put(payload)
      bb.array()
    }
    val idh = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idh.put(0x01.toByte).put("vorbis".getBytes("ASCII"))
    idh.putInt(0).put(1.toByte).putInt(16000)
    idh.putInt(0).putInt(0).putInt(0)
    idh.put(0xb8.toByte).put(1.toByte)
    page(0x02, -1L, idh.array()) ++ page(0x04, 32000L, Array.fill[Byte](10)(5))
  }

  private def mp4Valid: Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val mvhd = box("mvhd", java.nio.ByteBuffer.allocate(24)
      .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(7000).array())
    val hdlr = box("hdlr", java.nio.ByteBuffer.allocate(13)
      .putInt(0).putInt(0).put("vide".getBytes("ISO-8859-1"))
      .put(0.toByte).array())
    box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", mvhd ++ box("trak", box("mdia", hdlr)))
  }

  private def pthValid: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    Seq("archive/data.pkl" -> Array.fill[Byte](10)(7),
      "archive/data/0" -> Array.fill[Byte](20)(3)).foreach { case (n, b) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(b); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def pngValid: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 1, 0x00ff00)
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  // -- mutation generators ----------------------------------------------

  private def mutantsOf(seed: Array[Byte]): Gen[Array[Byte]] = Gen.oneOf(
    // random truncation (including empty)
    Gen.choose(0, seed.length).map(seed.take),
    // 1-3 random byte flips
    for {
      k <- Gen.choose(1, 3)
      picks <- Gen.listOfN(k, Gen.zip(
        Gen.choose(0, seed.length - 1), Gen.choose(0, 255)))
    } yield {
      val out = seed.clone()
      picks.foreach { case (i, v) => out(i) = v.toByte }
      out
    },
    // pure garbage of comparable size
    Gen.choose(0, 128).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)))

  /** The property: decoding terminates with a value or an Exception —
    * a fatal Error (OOM from a hostile header) fails the test here
    * instead of killing an executor in production.
    */
  private def survives(decode: Array[Byte] => Any)(bytes: Array[Byte]): Boolean =
    try { decode(bytes); true }
    catch {
      case _: Exception => true
      case e: Throwable => fail(s"fatal ${e.getClass.getName}: ${e.getMessage}")
    }

  private def fuzz(seed: Array[Byte], decode: Array[Byte] => Any): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(mutantsOf(seed))(survives(decode)))
    assert(res.passed, res.status.toString)
  }

  test("npy decode survives mutants and garbage") {
    assert(NpyCodec.decodeNpy(npyValid).data.toSeq == Seq(1f, 2f, 3f))
    fuzz(npyValid, NpyCodec.decodeNpy)
  }

  test("wav decode survives mutants and garbage") {
    assert(WavCodec.decodeWav(wavValid).n_frames == 4)
    fuzz(wavValid, WavCodec.decodeWav)
  }

  test("y4m decode survives mutants and garbage") {
    assert(VideoCodec.decodeMeta(y4mValid).n_frames == 2)
    fuzz(y4mValid, VideoCodec.decodeMeta)
    fuzz(y4mValid, VideoCodec.sampleLumaFrames(_, 1))
  }

  test("mp3 metadata decode survives mutants and garbage") {
    val m = AudioMetaCodec.decodeMp3Meta(mp3Valid)
    assert(m.n_frames == 2 && m.n_samples == 2304 && m.channels == 1 &&
      m.sample_rate == 44100 && m.duration_ms == 2304L * 1000 / 44100 &&
      m.bitrate_kbps == 128 && m.version == "MPEG1" && m.layer == 3)
    fuzz(mp3Valid, AudioMetaCodec.decodeMp3Meta)
  }

  test("flac metadata decode survives mutants and garbage") {
    val m = AudioMetaCodec.decodeFlacMeta(flacValid)
    assert(m.sample_rate == 16000 && m.channels == 2 &&
      m.bits_per_sample == 16 && m.n_samples == 48000L &&
      m.duration_ms == 3000L)
    fuzz(flacValid, AudioMetaCodec.decodeFlacMeta)
  }

  test("mp3 ID3 tags skip; mid-stream description change throws") {
    // ID3v2 (13 pad bytes) before the frames and ID3v1 after: tolerated
    val bos = new ByteArrayOutputStream()
    bos.write("ID3".getBytes("ASCII")); bos.write(3); bos.write(0); bos.write(0)
    bos.write(0); bos.write(0); bos.write(0); bos.write(13)
    (0 until 13).foreach(_ => bos.write(0))
    bos.write(mp3Valid)
    bos.write("TAG".getBytes("ASCII")); (0 until 125).foreach(_ => bos.write(0))
    assert(AudioMetaCodec.decodeMp3Meta(bos.toByteArray).n_frames == 2)
    // same frames but the second flips to stereo: the track metadata is
    // no longer well-defined — refuse, don't average
    val mixed = mp3Valid.clone()
    val secondHdr = 144 * 128000 / 44100 // first frame had padding 0
    mixed(secondHdr + 3) = 0x00.toByte
    val e = intercept[IllegalArgumentException](AudioMetaCodec.decodeMp3Meta(mixed))
    assert(e.getMessage.contains("changed mid-file"))
  }

  test("flac STREAMINFO after a padding block parses; bad magic throws") {
    val withPad = {
      val b = flacValid
      val bos = new ByteArrayOutputStream()
      bos.write(b, 0, 4)
      bos.write(0x01); bos.write(0); bos.write(0); bos.write(2) // PADDING first
      bos.write(0); bos.write(0)
      bos.write(b, 4, b.length - 4) // then STREAMINFO (last)
      bos.toByteArray
    }
    assert(AudioMetaCodec.decodeFlacMeta(withPad).n_samples == 48000L)
    intercept[IllegalArgumentException](
      AudioMetaCodec.decodeFlacMeta("OggS0000".getBytes("ASCII")))
  }

  test("ogg metadata decode survives mutants and garbage") {
    val m = AudioMetaCodec.decodeOggMeta(oggValid)
    assert(m.codec == "vorbis" && m.sample_rate == 16000 &&
      m.channels == 1 && m.n_samples == 32000L && m.duration_ms == 2000L)
    fuzz(oggValid, AudioMetaCodec.decodeOggMeta)
  }

  test("webm metadata decode survives mutants and garbage") {
    // EBML header + Segment(Info(scale 1ms, duration 2500.0 f64),
    // Tracks(video + audio))
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    val scale = el(Array(0x2a, 0xd7, 0xb1).map(_.toByte),
      Array(0x0f, 0x42, 0x40).map(_.toByte))
    val dur = el(Array(0x44, 0x89).map(_.toByte),
      java.nio.ByteBuffer.allocate(8)
        .putLong(java.lang.Double.doubleToLongBits(2500.0)).array())
    val info = el(Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte), scale ++ dur)
    def track(t: Int) = el(Array(0xae.toByte),
      el(Array(0x83.toByte), Array(t.toByte)))
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte),
      track(1) ++ track(2))
    val webm = el(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte), Array.empty) ++
      el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), info ++ tracks)
    val m = graft.functions.ContainerMetaCodec.decodeWebmMeta(webm)
    assert(m.timescale_ns == 1000000L && m.duration_ms == 2500L &&
      m.n_tracks == 2 && m.track_types == Seq(1, 2))
    fuzz(webm, graft.functions.ContainerMetaCodec.decodeWebmMeta)
  }

  test("mp4 metadata decode survives mutants and garbage") {
    val m = ContainerMetaCodec.decodeMp4Meta(mp4Valid)
    assert(m.timescale == 1000 && m.duration_ms == 7000L &&
      m.n_tracks == 1 && m.handlers == Seq("vide"))
    fuzz(mp4Valid, ContainerMetaCodec.decodeMp4Meta)
  }

  test("pth listing survives mutants and garbage") {
    val p = ContainerMetaCodec.decodePthMeta(pthValid)
    assert(p.n_entries == 2 && p.total_bytes == 30L &&
      p.names == Seq("archive/data.pkl", "archive/data/0"))
    fuzz(pthValid, ContainerMetaCodec.decodePthMeta)
  }

  test("mvhd v1 truncated to 28-31 payload bytes throws, never reads garbage") {
    // the v1 duration is 8 bytes at payload offset 24: a 28-byte
    // payload passes a naive >=28 check yet the read escapes the box
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val shortV1 = box("mvhd", java.nio.ByteBuffer.allocate(28)
      .putInt(0x01000000).putLong(0L).putLong(0L).putInt(1000).array())
    val payload = box("moov", shortV1 ++ box("free", Array.fill[Byte](16)(0x7f)))
    val e = intercept[IllegalArgumentException](
      ContainerMetaCodec.decodeMp4Meta(payload))
    assert(e.getMessage.contains("short mvhd v1"))
  }

  test("pth decompression bomb throws instead of inflating unboundedly") {
    // ~64 KB of zeros DEFLATEs to ~100 bytes; a few such entries give
    // an inflated/archive ratio far past the 64x cap
    val bos = new ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    (0 until 64).foreach { i =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"archive/zeros$i"))
      z.write(new Array[Byte](1 << 16))
      z.closeEntry()
    }
    z.close()
    val bomb = bos.toByteArray
    assert(bomb.length < 64 * (1 << 16) / 64, "fixture not compressible enough")
    val e = intercept[IllegalArgumentException](
      ContainerMetaCodec.decodePthMeta(bomb))
    assert(e.getMessage.contains("decompression bomb"))
  }

  test("mp4 hostile box sizes throw, never loop or over-allocate") {
    // size 0 on an inner box means "to end of window" and must not
    // loop; a size smaller than the header must throw
    val tiny = java.nio.ByteBuffer.allocate(16)
      .putInt(3).put("moov".getBytes("ISO-8859-1")).putInt(0).putInt(0).array()
    intercept[IllegalArgumentException](ContainerMetaCodec.decodeMp4Meta(tiny))
    // a box claiming 2 GB on a small payload throws bounds, not OOM
    val huge = java.nio.ByteBuffer.allocate(16)
      .putInt(Int.MaxValue).put("moov".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).array()
    intercept[IllegalArgumentException](ContainerMetaCodec.decodeMp4Meta(huge))
  }

  test("image decode survives mutants and garbage") {
    assert(ImageCodec.decodeAs("rgb8", pngValid).isDefined)
    fuzz(pngValid, ImageCodec.decodeAs("rgb8", _))
  }

  // -- targeted regressions: the fatal classes --------------------------

  test("npy header claiming gigabytes on a tiny payload throws, not OOM") {
    // shape (1000000000,) f4 declares 4 GB; the member holds 8 bytes.
    val header = "{'descr': '<f4', 'fortran_order': False, 'shape': (1000000000,), }"
    val bos = new ByteArrayOutputStream()
    bos.write(0x93); bos.write("NUMPY".getBytes("ASCII"))
    bos.write(1); bos.write(0)
    bos.write(header.length & 0xff); bos.write(header.length >> 8)
    bos.write(header.getBytes("ISO-8859-1"))
    bos.write(Array.fill[Byte](8)(1))
    val e = intercept[IllegalArgumentException](NpyCodec.decodeNpy(bos.toByteArray))
    assert(e.getMessage.contains("overruns payload"))
  }

  test("y4m frame size overflowing Int throws, not OOM or backward walk") {
    // 40000x40000 C420 = 2.4e9 frame bytes: overflows Int32 negative,
    // which pre-fix passed the overrun check vacuously (6.4 GB luma
    // allocation) and stepped the frame walk backwards (decodeMeta
    // cycled forever on a crafted member).
    val hostile =
      ("YUV4MPEG2 W40000 H40000 F25:1 C420\n" + "FRAME\n" + "x" * 64)
        .getBytes("ASCII")
    val e = intercept[IllegalArgumentException](VideoCodec.decodeMeta(hostile))
    assert(e.getMessage.contains("exceeds payload"))
    intercept[IllegalArgumentException](VideoCodec.sampleLumaFrames(hostile, 1))
  }

  test("wav chunk declaring more bytes than the member holds throws") {
    val bad = wavValid.clone()
    // data chunk size field sits at offset 40 in this fixture
    bad(40) = 0x7f.toByte; bad(41) = 0x7f.toByte
    bad(42) = 0x7f.toByte; bad(43) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](WavCodec.decodeWav(bad))
    assert(e.getMessage.contains("overruns payload"))
  }

  // -- UDF tier: every failure renders as NULL end-to-end ---------------

  test("column UDFs null all malformed payloads, never throw") {
    import spark.implicits._
    val garbage: Array[Byte] = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val truncatedPng = pngValid.take(20) // valid signature, corrupt body
    val rows = Seq(("garbage", garbage), ("png_trunc", truncatedPng))
      .toDF("kind", "payload")
    val out = rows.select(
      $"kind",
      NpyCodec.decodeNpyUdf($"payload").as("npy"),
      NpyCodec.decodeNpzUdf($"payload").as("npz"),
      WavCodec.decodeWavUdf($"payload").as("wav"),
      VideoCodec.decodeMetaUdf($"payload").as("y4m"),
      VideoCodec.sampleLumaFramesUdf(1)($"payload").as("luma"),
      ImageCodec.decodeUdf("rgb8")($"payload").as("img"),
      AudioMetaCodec.decodeMp3MetaUdf($"payload").as("mp3"),
      AudioMetaCodec.decodeFlacMetaUdf($"payload").as("flac"),
      ContainerMetaCodec.decodeMp4MetaUdf($"payload").as("mp4"),
      ContainerMetaCodec.decodePthMetaUdf($"payload").as("pth"))
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      Seq(1, 3, 4, 5, 6, 7, 8, 9, 10).foreach(i =>
        assert(r.isNullAt(i), s"${r.getString(0)} col $i should be null"))
      // npz: a non-zip payload yields no entries (empty map), a corrupt
      // inner npy nulls — both are "nothing decoded", never a throw
      assert(r.isNullAt(2) || r.getMap[String, Any](2).isEmpty,
        s"${r.getString(0)} npz should be null or empty")
    }
  }
}
