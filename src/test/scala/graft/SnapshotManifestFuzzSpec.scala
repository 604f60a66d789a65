package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Hostile-input hardening for the manifest plane: a corrupted,
  * truncated, or hand-mangled log file must fail LOUDLY (an exception
  * a caller can act on) or be provably ignored (tmp debris) — never
  * parse into a wrong file list, a phantom version, or a silent
  * empty table. The codec-fuzz discipline applied to the table format's
  * own metadata.
  */
class SnapshotManifestFuzzSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapfuzz-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", concat(lit("row"), $"id").as("payload"))

  private def build(name: String): String = {
    val t = freshTable(name)
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(50, 80), t, "append", Seq("id"))
    t
  }

  /** Overwrite a log file's bytes, deleting Hadoop's local `.crc`
    * sidecar so the checksum layer doesn't mask the mutation.
    */
  private def mangle(t: String, file: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(t, "_log", file)
    Files.write(p, bytes)
    Files.deleteIfExists(Paths.get(t, "_log", s".$file.crc"))
  }

  private def readManifestBytes(t: String, file: String): Array[Byte] =
    Files.readAllBytes(Paths.get(t, "_log", file))

  test("truncated manifest fails loudly, other versions stay readable") {
    val t = build("trunc")
    val orig = readManifestBytes(t, "v00002.json")
    for (cut <- Seq(0, 1, orig.length / 2, orig.length - 1)) {
      mangle(t, "v00002.json", orig.take(cut))
      intercept[Exception] { SnapshotLog.read(s, t).count() }
      // v1 resolves independently — a bad head never poisons history
      assert(SnapshotLog.read(s, t, Some(1)).count() == 50)
    }
    mangle(t, "v00002.json", orig)
    assert(SnapshotLog.read(s, t).count() == 80)
  }

  test("byte-flipped manifests never parse into a silently-wrong table") {
    val t = build("flip")
    val orig = readManifestBytes(t, "v00002.json")
    val expected = 80L
    val rnd = new scala.util.Random(42)
    var loud = 0
    (0 until 60).foreach { _ =>
      val b = orig.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      mangle(t, "v00002.json", b)
      // outcome must be: loud failure, or a parse that still yields the
      // right answer (the flip hit a JSON-insignificant byte or only
      // metadata like stats, which affect pruning candidacy, not rows).
      // A silent wrong row count is the one forbidden outcome — unless
      // the flip landed inside the row-count/path payload itself, which
      // an end-to-end content check catches:
      try {
        val n = SnapshotLog.read(s, t).count()
        if (n != expected) {
          // the flip corrupted semantic payload but still parsed: the
          // only acceptable such flips are ones that changed the file
          // LIST (path bytes) — then the read must have FAILED instead;
          // reaching here with a wrong count means silent corruption
          // of the rows/stats fields the read doesn't verify. Ensure
          // the mutated field is NOT the path/file list (those throw).
          // We tolerate wrong counts only when the JSON no longer
          // matches the original file list — i.e. the count came from
          // honestly reading a DIFFERENT (still-existing) file set,
          // which cannot happen: paths are content-addressed by
          // attempt UUID. So: fail.
          fail(s"silent wrong answer: $n != $expected after a byte flip")
        }
      } catch { case _: Throwable => loud += 1 }
    }
    mangle(t, "v00002.json", orig)
    assert(SnapshotLog.read(s, t).count() == expected)
    assert(loud > 0) // the fuzz actually exercised failure paths
  }

  test("manifest with wrong JSON shape fails loudly, never empty-tables") {
    val t = build("shape")
    for (bad <- Seq("{}", "[]", "null", "42", """{"version":2}""",
        """{"kind":"delta","version":2,"parent":0,"op":"append",""" +
          """"epoch":-1,"ts":0,"schema":"id BIGINT","add":[],"remove":[]}""")) {
      mangle(t, "v00002.json", bad.getBytes("UTF-8"))
      intercept[Exception] { SnapshotLog.read(s, t).count() }
    }
  }

  test("a delta whose parent is missing fails loudly (no partial resolution)") {
    val t = freshTable("chain")
    // many commits so some are deltas
    (0 until 5).foreach(i => SnapshotLog.commit(df(i * 10, i * 10 + 10),
      t, "append", Seq("id")))
    // find a delta version and delete its parent manifest
    val deltaV = (2L to 5L).find(v => !SnapshotLog.isCheckpoint(s, t, v)).get
    Files.delete(Paths.get(t, "_log", f"v${deltaV - 1}%05d.json"))
    Files.deleteIfExists(Paths.get(t, "_log", f".v${deltaV - 1}%05d.json.crc"))
    intercept[Exception] { SnapshotLog.read(s, t, Some(deltaV)).count() }
  }

  test("tmp debris and foreign files in the log dir are ignored") {
    val t = build("debris")
    Files.write(Paths.get(t, "_log", "v00003.json.tmp-deadbeef"),
      "garbage".getBytes("UTF-8"))
    Files.write(Paths.get(t, "_log", "not-a-manifest.txt"),
      "hello".getBytes("UTF-8"))
    Files.write(Paths.get(t, "_log", "v123.json"), // wrong digit count
      "garbage".getBytes("UTF-8"))
    assert(SnapshotLog.latestVersion(s, t).contains(2L))
    assert(SnapshotLog.read(s, t).count() == 80)
  }

  test("mangled constraint and tag sidecars fail loudly or read as absent, never as wrong maps") {
    val t = build("sidecars")
    SnapshotLog.addConstraint(s, t, "id_ok", "id >= 0")
    SnapshotLog.createTag(s, t, "rel")
    // constraint sidecar: truncation → loud (parse error)
    val consFile = new java.io.File(s"$t/_log").listFiles()
      .map(_.getName).find(_.startsWith("_constraints.v")).get
    val consOrig = readManifestBytes(t, consFile)
    mangle(t, consFile, consOrig.take(3))
    intercept[Exception] { SnapshotLog.constraints(s, t) }
    mangle(t, consFile, consOrig)
    assert(SnapshotLog.constraints(s, t).keySet == Set("id_ok"))
    // tag file: truncation → loud for that read; restore works
    val tagOrig = readManifestBytes(t, "_tag-rel.json")
    mangle(t, "_tag-rel.json", Array[Byte]())
    intercept[Exception] { SnapshotLog.tags(s, t) }
    mangle(t, "_tag-rel.json", tagOrig)
    assert(SnapshotLog.tags(s, t) == Map("rel" -> 2L))
  }
}
