package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Numpy `.npy` / `.npz` tensor decode — the wds autodecode handler a
  * training corpus reaches first for non-image tensor members
  * (reference sdata/dataset.py:204-232 delegates these extensions to
  * `wds.autodecode.decoders`; format spec: numpy NEP-1 / public
  * `numpy.lib.format` docs).
  *
  * Output is a typed struct the rest of the engine can aggregate on:
  * `struct(shape: array<int>, data: array<float>)` — every supported
  * dtype is widened to float32, matching how training pipelines consume
  * tensors. One UDF call per member, pure byte parsing, no codec
  * library; on the hot path this sits beside the image decoders in the
  * mapPartitions-friendly non-codegen tier (binary parsing has no
  * builtin-Column form).
  *
  * Format handled: magic `\x93NUMPY`, version 1.x (2-byte LE header
  * length) and 2.x/3.x (4-byte LE header length), python-literal header
  * dict with `descr`, `fortran_order`, `shape`. Supported descr codes:
  * f4/f8, i1/i2/i4/i8, u1/u2/u4, bool — little- or big-endian.
  * Fortran-order payloads are transposed to C order on decode so
  * `data` always reads row-major.
  *
  * Error convention matches [[ImageCodec.decodeUdf]]: the strict
  * [[decodeNpy]]/[[decodeNpz]] APIs throw on malformed payloads; the
  * Column UDFs return NULL for them (the decode stage has no per-row
  * policy hook, and a corrupt member must not fail a skip-policy
  * pipeline) — route nulls via [[graft.core.ErrorPolicy]]/filters
  * downstream, same as undecodable images.
  */
object NpyCodec {

  final case class Tensor(shape: Array[Int], data: Array[Float])

  /** Parse one `.npy` byte payload. */
  def decodeNpy(bytes: Array[Byte]): Tensor = {
    require(bytes.length >= 10, s"npy too short: ${bytes.length} bytes")
    require(
      bytes(0) == 0x93.toByte && new String(bytes, 1, 5, "ASCII") == "NUMPY",
      "bad npy magic")
    val major = bytes(6) & 0xff
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerOff) =
      if (major == 1) (buf.getShort(8) & 0xffff, 10)
      else (buf.getInt(8), 12) // v2/v3: 4-byte LE length
    val header = new String(bytes, headerOff, headerLen, "ISO-8859-1")
    require(headerLen >= 0 && headerOff.toLong + headerLen <= bytes.length,
      s"npy header overruns payload: len=$headerLen")
    val descr = headerField(header, "descr")
    val fortran = headerField(header, "fortran_order").startsWith("True")
    val shape = parseShape(headerField(header, "shape"))
    require(shape.forall(_ >= 0), s"npy negative dim: ${shape.mkString(",")}")
    val n = shape.foldLeft(1L)(_ * _)
    require(n <= Int.MaxValue, s"npy tensor too large: $n elements")
    val dataOff = headerOff + headerLen
    // Bound the DECLARED size by the ACTUAL payload before any
    // allocation: a corrupt header claiming shape (2e9,) on a 50-byte
    // member must throw here, not attempt a multi-GB array (an
    // OutOfMemoryError is fatal — the UDF's null-on-malformed contract
    // can only catch exceptions).
    require(dataOff.toLong + n * itemSize(descr) <= bytes.length,
      s"npy data overruns payload: $n elems of $descr in ${bytes.length} bytes")
    val out = readData(bytes, dataOff, descr, n.toInt)
    if (fortran && shape.length > 1) Tensor(shape, fortranToC(out, shape))
    else Tensor(shape, out)
  }

  /** Parse a `.npz` (zip of npy members) payload to (name, tensor)
    * pairs; entry names keep numpy's convention of dropping the
    * `.npy` suffix.
    */
  def decodeNpz(bytes: Array[Byte]): Seq[(String, Tensor)] = {
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Tensor)]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory && e.getName.endsWith(".npy")) {
        val bos = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var k = zin.read(tmp)
        while (k >= 0) { bos.write(tmp, 0, k); k = zin.read(tmp) }
        out += (e.getName.stripSuffix(".npy") -> decodeNpy(bos.toByteArray))
      }
      e = zin.getNextEntry
    }
    zin.close()
    out.toSeq
  }

  // -- header parsing (python-literal dict, whitespace-tolerant) --------

  private def headerField(header: String, key: String): String = {
    val i = header.indexOf(s"'$key'")
    require(i >= 0, s"npy header missing '$key': $header")
    val colon = header.indexOf(':', i)
    var j = colon + 1
    while (j < header.length && header(j) == ' ') j += 1
    header(j) match {
      case '\'' =>
        val end = header.indexOf('\'', j + 1)
        header.substring(j + 1, end)
      case '(' =>
        val end = header.indexOf(')', j)
        header.substring(j, end + 1)
      case _ =>
        var end = j
        while (end < header.length && header(end) != ',' && header(end) != '}') end += 1
        header.substring(j, end).trim
    }
  }

  private def parseShape(s: String): Array[Int] = {
    val inner = s.stripPrefix("(").stripSuffix(")").trim
    if (inner.isEmpty) Array(1) // 0-d scalar → shape [1]
    else inner.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
  }

  private def itemSize(descr: String): Int =
    descr.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=') match {
      case "f8" | "i8" => 8
      case "f4" | "i4" | "u4" => 4
      case "i2" | "u2" => 2
      case "i1" | "u1" | "b1" => 1
      case other => throw new IllegalArgumentException(
        s"unsupported npy dtype: $descr ($other)")
    }

  private def readData(bytes: Array[Byte], off: Int, descr: String, n: Int): Array[Float] = {
    val order =
      if (descr.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val code = descr.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=')
    val buf = ByteBuffer.wrap(bytes, off, bytes.length - off).order(order)
    val out = new Array[Float](n)
    var i = 0
    code match {
      case "f4" => while (i < n) { out(i) = buf.getFloat(off + 4 * i); i += 1 }
      case "f8" => while (i < n) { out(i) = buf.getDouble(off + 8 * i).toFloat; i += 1 }
      case "i1" => while (i < n) { out(i) = bytes(off + i).toFloat; i += 1 }
      case "u1" | "b1" => while (i < n) { out(i) = (bytes(off + i) & 0xff).toFloat; i += 1 }
      case "i2" => while (i < n) { out(i) = buf.getShort(off + 2 * i).toFloat; i += 1 }
      case "u2" => while (i < n) { out(i) = (buf.getShort(off + 2 * i) & 0xffff).toFloat; i += 1 }
      case "i4" => while (i < n) { out(i) = buf.getInt(off + 4 * i).toFloat; i += 1 }
      case "u4" => while (i < n) { out(i) = (buf.getInt(off + 4 * i) & 0xffffffffL).toFloat; i += 1 }
      case "i8" => while (i < n) { out(i) = buf.getLong(off + 8 * i).toFloat; i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported npy dtype: $descr ($other)")
    }
    out
  }

  /** Transpose a fortran-order (column-major) flat payload to C order. */
  private def fortranToC(data: Array[Float], shape: Array[Int]): Array[Float] = {
    val ndim = shape.length
    val n = data.length
    // fortran strides: stride(0)=1, stride(k)=stride(k-1)*shape(k-1)
    val fStride = new Array[Int](ndim)
    fStride(0) = 1
    var k = 1
    while (k < ndim) { fStride(k) = fStride(k - 1) * shape(k - 1); k += 1 }
    val out = new Array[Float](n)
    val idx = new Array[Int](ndim)
    var c = 0
    while (c < n) {
      var f = 0
      var d = 0
      while (d < ndim) { f += idx(d) * fStride(d); d += 1 }
      out(c) = data(f)
      // increment C-order index (last dim fastest)
      d = ndim - 1
      var carry = true
      while (d >= 0 && carry) {
        idx(d) += 1
        if (idx(d) == shape(d)) { idx(d) = 0; d -= 1 } else carry = false
      }
      c += 1
    }
    out
  }

  // -- Column API -------------------------------------------------------

  /** `binary => struct(shape array<int>, data array<float>)`, null for
    * undecodable payloads.
    */
  val decodeNpyUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeNpy(bytes)).toOption
    }
    c => f(c)
  }

  /** `binary => map<string, struct(shape, data)>` for `.npz` archives,
    * null for undecodable payloads.
    */
  val decodeNpzUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) None
      else scala.util.Try(decodeNpz(bytes).toMap).toOption
    }
    c => f(c)
  }
}
