package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** The incremental-manifest contract: commits publish add/remove deltas
  * vs their parent with full checkpoints every CheckpointEvery versions
  * (and whenever a delta would not be smaller), resolution replays the
  * chain exactly, and a broken chain fails loudly.
  */
class DeltaManifestSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"deltamf-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def slice(b: Long) =
    s.range(b * 100, (b + 1) * 100).select($"id", ($"id" % 7).as("k"))

  private def manifestBytes(t: String, v: Long): Long =
    new java.io.File(t, f"_log/v$v%05d.json").length()

  test("a table recreated at the same path never serves cached resolutions") {
    val t = freshTable("recreate")
    SnapshotLog.commit(slice(0), t, "append", Seq("id"))
    SnapshotLog.commit(slice(1), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 200) // resolutions now cached
    // out-of-protocol teardown + rebuild at the SAME path and versions:
    // the (mtime, length) validation must force a re-read, not a ghost
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    SnapshotLog.commit(slice(2).unionByName(slice(3)), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 200)
    assert(SnapshotLog.read(s, t).agg(min($"id")).head.getLong(0) == 200L)
    assert(SnapshotLog.read(s, t, Some(1L)).count() == 200)
  }

  test("a same-length recreate inside one mtime tick still invalidates the cache") {
    val t = freshTable("inode")
    SnapshotLog.commit(slice(0), t, "append", Seq("id"))
    assert(SnapshotLog.manifest(s, t, 1L).op == "append") // now cached
    // out-of-protocol delete + recreate with IDENTICAL length and the
    // ORIGINAL mtime — the worst case for (mtime, length) validation on
    // a coarse-mtime filesystem. The fileKey (inode) component must
    // still catch it: every recreate allocates a fresh inode.
    val mf = java.nio.file.Paths.get(t, "_log", "v00001.json")
    val orig = java.nio.file.Files.readAllBytes(mf)
    val origMtime = java.nio.file.Files.getLastModifiedTime(mf)
    val doctored = new String(orig, "UTF-8")
      .replaceFirst("append", "zppend") // the op — v1's only "append"
      .getBytes("UTF-8")
    assert(doctored.length == orig.length, "fixture must keep the length")
    java.nio.file.Files.delete(mf)
    java.nio.file.Files.write(mf, doctored)
    java.nio.file.Files.setLastModifiedTime(mf, origMtime)
    assert(SnapshotLog.manifest(s, t, 1L).op == "zppend",
      "cache served a ghost across a same-length same-mtime recreate")
  }

  test("append chain: deltas between checkpoints, exact resolution everywhere") {
    val t = freshTable("chain")
    (0 until 13).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    // v1 has no parent -> full; v10 is the checkpoint; the rest deltas
    val kinds = (1L to 13L).map(v => SnapshotLog.isCheckpoint(s, t, v))
    assert(kinds === Seq(true, false, false, false, false, false, false,
      false, false, true, false, false, false))
    // every version resolves to its exact prefix content
    Seq(1L, 5L, 9L, 10L, 11L, 13L).foreach { v =>
      val n = v * 100
      assert(SnapshotLog.read(s, t, Some(v)).count() === n)
      assert(SnapshotLog.read(s, t, Some(v)).agg(sum($"id")).head.getLong(0)
        === (0L until n).sum)
      assert(SnapshotLog.manifest(s, t, v).files.size === v.toInt)
    }
    // the commit-cost claim, measured: a delta appends one entry, a
    // checkpoint re-serializes ten — the delta must be much smaller
    assert(manifestBytes(t, 11) * 3 < manifestBytes(t, 10),
      s"delta v11 ${manifestBytes(t, 11)}B vs checkpoint v10 ${manifestBytes(t, 10)}B")
  }

  test("adaptive policy: checkpoint cadence follows the byte ratio, not the version count") {
    val t = freshTable("adaptive")
    s.conf.set(SnapshotLog.CheckpointPolicyConf, "adaptive")
    try {
      // a WIDE base (40 files, each a manifest entry with stats) then
      // 60 one-file appends: fixed cadence would checkpoint 6 times,
      // re-serializing the 40+ entries each time; adaptive waits until
      // the accumulated delta bytes pay for one checkpoint
      SnapshotLog.commit(s.range(0, 4000).repartition(40)
        .select($"id", ($"id" % 7).as("k")), t, "append", Seq("id"))
      val n = 60
      (0 until n).foreach(b => SnapshotLog.commit(
        slice(100L + b).coalesce(1), t, "append", Seq("id")))
      val last = 1L + n
      val fulls = (1L to last).filter(v => SnapshotLog.isCheckpoint(s, t, v))
      assert(fulls.head === 1L, "v1 has no parent, must be full")
      assert(fulls.size >= 2, "amortization must eventually checkpoint")
      val second = fulls(1)
      assert(second - 2L > SnapshotLog.CheckpointEvery,
        s"adaptive delta run to v$second should outlast the fixed cadence")
      // the trigger is EXACTLY the byte rule: the deltas the publish of
      // `second` walked (v2..second-1) reach the base checkpoint's
      // size; one delta fewer (what second-1's publish saw) did not
      val base = manifestBytes(t, 1L)
      val walked = (2L until second).map(manifestBytes(t, _)).sum
      assert(walked >= base, s"walked $walked B must reach base $base B")
      assert(walked - manifestBytes(t, second - 1) < base,
        "one delta fewer stayed under the threshold")
      // resolution stays exact through the long chain
      assert(SnapshotLog.read(s, t, Some(last)).count() === 4000 + n * 100)
      assert(SnapshotLog.manifest(s, t, last).files.size === 40 + n)
      assert(SnapshotLog.read(s, t, Some(second - 1)).count()
        === 4000 + (second - 2) * 100)
    } finally s.conf.unset(SnapshotLog.CheckpointPolicyConf)
  }

  test("adaptive policy: hop cap forces a checkpoint under tiny deltas") {
    val t = freshTable("adaptive-cap")
    s.conf.set(SnapshotLog.CheckpointPolicyConf, "adaptive")
    try {
      // an enormous base manifest (300 files): the byte rule alone
      // would allow chains far past the cap; MaxDeltaChain binds first
      SnapshotLog.commit(s.range(0, 3000).repartition(300)
        .select($"id", ($"id" % 7).as("k")), t, "append", Seq("id"))
      val n = SnapshotLog.MaxDeltaChain + 5
      (0 until n).foreach(b => SnapshotLog.commit(
        slice(200L + b).coalesce(1), t, "append", Seq("id")))
      val fulls = (2L to (1L + n)).filter(v => SnapshotLog.isCheckpoint(s, t, v))
      assert(fulls.nonEmpty, "cap must force a checkpoint")
      assert(fulls.head === 2L + SnapshotLog.MaxDeltaChain,
        s"first forced checkpoint at ${fulls.head}, " +
          s"expected ${2L + SnapshotLog.MaxDeltaChain}")
      assert(SnapshotLog.read(s, t).count() === 3000 + n * 100)
    } finally s.conf.unset(SnapshotLog.CheckpointPolicyConf)
  }

  test("changed entries (DV mask) ride the delta and shadow their parent entry") {
    val t = freshTable("dv")
    (0 until 3).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    val st = SnapshotLog.deleteWhereDV(s, t, "id", 50L, 59L).get
    assert(st.filesMasked === 1)
    assert(!SnapshotLog.isCheckpoint(s, t, 4L)) // 1 changed entry of 3
    val m = SnapshotLog.manifest(s, t, 4L)
    assert(m.files.size === 3)
    assert(m.files.count(_.dv.isDefined) === 1)
    assert(SnapshotLog.read(s, t).count() === 290)
  }

  test("overwrite and restore publish full manifests when a delta would not be smaller") {
    val t = freshTable("ow")
    (0 until 3).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    SnapshotLog.commit(slice(9).coalesce(1), t, "overwrite", Seq("id"))
    assert(SnapshotLog.isCheckpoint(s, t, 4L)) // add 1 + remove 3 >= 1
    assert(SnapshotLog.read(s, t).count() === 100)
    val v = SnapshotLog.restore(s, t, 3L)
    assert(SnapshotLog.read(s, t, Some(v)).count() === 300)
  }

  test("aligned delete is a remove-only delta") {
    val t = freshTable("del")
    (0 until 4).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    val st = SnapshotLog.deleteWhere(s, t, "id", 100L, 199L).get
    assert(st.filesDropped === 1 && st.filesRewritten === 0)
    assert(!SnapshotLog.isCheckpoint(s, t, 5L))
    assert(SnapshotLog.read(s, t).count() === 300)
    assert(SnapshotLog.manifest(s, t, 5L).files.size === 3)
  }

  test("a broken chain fails loudly, not silently") {
    val t = freshTable("broken")
    (0 until 4).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    // v3 is a delta; destroying its parent's manifest must break v3/v4
    // resolution with a clear error while v1 stays readable
    assert(new java.io.File(t, "_log/v00002.json").delete())
    assert(SnapshotLog.read(s, t, Some(1L)).count() === 100)
    intercept[java.io.FileNotFoundException] {
      SnapshotLog.manifest(s, t, 4L)
    }
  }

  test("expireVersions backs the cutoff to a checkpoint and reclaims only unreferenced data") {
    val t = freshTable("expire")
    // v1-v3 appends, v4 overwrite (their files become history-only),
    // v5-v11 appends — checkpoint lands at v10
    (0 until 3).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    SnapshotLog.commit(slice(0).coalesce(1), t, "overwrite", Seq("id"))
    (1 until 8).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    assert(SnapshotLog.latestVersion(s, t).contains(11L))
    val (expired, deleted) = SnapshotLog.expireVersions(s, t, keepLast = 2)
    // requested cutoff 10 IS the checkpoint; v1..v9 expire; only the
    // three pre-overwrite files were referenced by nothing surviving
    assert(expired === (1L to 9L))
    assert(deleted.size === 3)
    // survivors stay exactly readable, the expired prefix fails loudly
    assert(SnapshotLog.read(s, t, Some(10L)).count() === 700)
    assert(SnapshotLog.read(s, t).count() === 800)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0)
      === (0L until 800).sum)
    intercept[java.io.FileNotFoundException] {
      SnapshotLog.read(s, t, Some(9L)).count()
    }
    // history tolerates the expired prefix; stats still metadata-only
    assert(SnapshotLog.history(s, t).count() === 2)
    assert(SnapshotLog.tableStats(s, t).rows === 800L)
    // idempotent: nothing left to expire at the same retention
    assert(SnapshotLog.expireVersions(s, t, keepLast = 2) === ((Nil, Nil)))
  }

  test("expireOlderThan retires by publish timestamp with the same checkpoint backing") {
    val t = freshTable("age")
    (0 until 13).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    // cutoff at v12's publish time: v12/v13 are new enough; the cutoff
    // then backs onto the v10 checkpoint so survivors resolve
    val cut = SnapshotLog.manifest(s, t, 12L).ts
    assert(cut > 0L)
    val (expired, _) = SnapshotLog.expireOlderThan(s, t, cut)
    assert(expired === (1L to 9L), s"expired $expired")
    assert(SnapshotLog.read(s, t, Some(10L)).count() === 1000)
    assert(SnapshotLog.read(s, t).count() === 1300)
    // a cutoff in the deep past expires nothing more
    assert(SnapshotLog.expireOlderThan(s, t, 1L) === ((Nil, Nil)))
  }

  test("deep history keeps every op kind correct across checkpoints") {
    val t = freshTable("ops")
    (0 until 12).foreach(b => SnapshotLog.commit(
      slice(b.toLong).coalesce(1), t, "append", Seq("id")))
    val up = s.range(250, 260).select($"id", lit(99L).as("k"))
    SnapshotLog.upsert(up, t, "id")                       // v13: rewrite 1 file
    SnapshotLog.deleteWhere(s, t, "id", 400L, 499L)       // v14: drop 1 file
    assert(SnapshotLog.read(s, t).count() === 1100)
    assert(SnapshotLog.read(s, t).where($"k" === 99L).count() === 10)
    // time travel across the whole mutation history still exact
    assert(SnapshotLog.read(s, t, Some(12L)).count() === 1200)
    assert(SnapshotLog.tableStats(s, t).rows === 1100)
  }
}
