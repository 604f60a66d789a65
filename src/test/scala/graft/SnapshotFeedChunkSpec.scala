package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Bounded change-feed consumption over LONG version ranges: a
  * 500+-version mixed history (appends, CoW deletes/upserts, DV
  * deletes, MOR upserts/deletes, compactions, restores) must replay
  * through [[SnapshotLog.changeFeedChunks]] /
  * `replicateChangeFeed(maxVersionsPerBatch = N)` to the same final
  * state as a direct read — with one bounded-plan job per chunk and
  * one destination commit per chunk, never a range-sized union plan
  * or a commit per version. This is the catch-up-consumer shape: a
  * mirror that slept through thousands of source commits.
  *
  * The history is built mutation-TARGETED (narrow ranges that
  * stats-prune to a file or two, MOR debt cleared on a cadence) — the
  * same discipline a real ingest keeps, and what keeps this spec's
  * wall-clock proportional to versions, not versions × table.
  */
class SnapshotFeedChunkSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapchunk-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  /** 500+ tiny versions mean thousands of tiny shuffles; 32 reduce
    * partitions apiece is pure scheduling overhead here (suites run
    * sequentially, so the session tweak is safe to scope to the test).
    */
  private def withFastShuffle[A](body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def rows(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload")).coalesce(1)

  private def state(t: String) =
    SnapshotLog.read(s, t).groupBy($"id", $"k", $"payload")
      .agg(count(lit(1)).as("n"))

  private def assertSame(a: String, b: String): Unit = {
    assert(state(a).exceptAll(state(b)).count() == 0 &&
      state(b).exceptAll(state(a)).count() == 0,
      s"mirror $b diverged from $a")
  }

  /** Grow `src` by `n` versions of mixed ops; `next` is the first
    * unused id (returned updated). Deterministic by construction.
    * Mutations target NARROW key ranges (recent appends), so each op
    * touches O(1) files through stats candidacy.
    */
  private def grow(src: String, n: Int, next0: Long): Long = {
    var next = next0
    val v0 = SnapshotLog.latestVersion(s, src).getOrElse(0L)
    (1 to n).foreach { i =>
      val v = v0 + i
      if (v % 127 == 0) {
        // coalesce the world: caps the file count the later ops scan
        SnapshotLog.compact(s, src, 1L << 30, Seq("id"))
      } else if (v % 97 == 0) {
        // restore two back: the op that DROPS eq-deletes / re-adds
        // files without touching entries — the A1 feed case, in-history
        SnapshotLog.restore(s, src,
          SnapshotLog.latestVersion(s, src).get - 2)
      } else if (v % 89 == 0) {
        // debt-only compaction (size threshold 1 byte): stats-probed
        // candidates only — keeps reads few-legged without a rewrite
        SnapshotLog.compact(s, src, 1L, Seq("id"))
      } else if (v % 83 == 0) {
        SnapshotLog.deleteKeysMOR(
          s.range(next - 40, next - 37).toDF("id"), src, "id")
      } else if (v % 79 == 0) {
        SnapshotLog.upsertMOR(
          s.range(next - 20, next - 18).select($"id",
            lit(88L).as("k"), concat(lit("mor"), lit(v)).as("payload")),
          src, "id", Seq("id"))
      } else if (v % 73 == 0) {
        // narrow DV delete: stats route it to the file(s) holding the
        // band, never a full-table position scan
        SnapshotLog.deleteWhereDV(s, src, "id", next - 12, next - 11)
      } else if (v % 71 == 0) {
        SnapshotLog.upsert(
          s.range(next - 30, next - 28).select($"id",
            lit(77L).as("k"), concat(lit("upd"), lit(v)).as("payload")),
          src, "id", Seq("id"))
      } else if (v % 61 == 0) {
        SnapshotLog.deleteWhere(s, src, "id", next - 50, next - 48, Seq("id"))
      } else {
        SnapshotLog.commit(rows(next, next + 2), src, "append", Seq("id"))
        next += 2
      }
      // ops other than append don't always bump the version (empty
      // nets / no-op compactions skip); top up with an append so the
      // version count keeps marching
      if (SnapshotLog.latestVersion(s, src).get < v) {
        SnapshotLog.commit(rows(next, next + 1), src, "append", Seq("id"))
        next += 1
      }
    }
    next
  }

  test("a 500+-version mixed history mirrors chunk-by-chunk to the exact final state") { withFastShuffle {
    val src = freshTable("long-src")
    val dst = freshTable("long-dst")
    SnapshotLog.commit(rows(0, 100), src, "append", Seq("id"))
    var next = grow(src, 309, 100L)

    // catch-up #1: 310 versions behind, 64 per chunk (the final-state
    // equality below covers this half too — no midpoint table diff)
    val r1 = SnapshotLog.replicateChangeFeed(s, src, dst, "id", Seq("id"),
      maxVersionsPerBatch = 64)
    assert(r1.isDefined)
    val srcV1 = SnapshotLog.latestVersion(s, src).get
    val dstV1 = SnapshotLog.latestVersion(s, dst).get
    // one commit per CHUNK, not per source version
    assert(dstV1 <= math.ceil(srcV1 / 64.0).toLong + 1,
      s"$dstV1 destination commits for $srcV1 source versions")
    assert(r1.get._1 == srcV1)

    // sleep through another 200 versions, then catch up again
    next = grow(src, 200, next)
    val srcV2 = SnapshotLog.latestVersion(s, src).get
    assert(srcV2 >= 510, s"history only reached $srcV2 versions")
    val r2 = SnapshotLog.replicateChangeFeed(s, src, dst, "id", Seq("id"),
      maxVersionsPerBatch = 32)
    assert(r2.isDefined && r2.get._1 == srcV2)
    assertSame(src, dst)
    val dstV2 = SnapshotLog.latestVersion(s, dst).get
    assert(dstV2 - dstV1 <= math.ceil((srcV2 - srcV1) / 32.0).toLong,
      s"resume made ${dstV2 - dstV1} commits for ${srcV2 - srcV1} versions")

    // idempotent: nothing to do
    assert(SnapshotLog.replicateChangeFeed(s, src, dst, "id", Seq("id"),
      maxVersionsPerBatch = 32).isEmpty)

    // the chunk iterator itself: bounded contiguous ranges covering
    // exactly (0, srcV2], produced lazily
    val chunks = SnapshotLog.changeFeedChunks(s, src, 0L, Some(srcV2), 64)
      .map { case (f, t, _) => (f, t) }.toSeq
    assert(chunks.size == math.ceil(srcV2 / 64.0).toInt)
    assert(chunks.head._1 == 0L && chunks.last._2 == srcV2)
    chunks.foreach { case (f, t) => assert(t - f <= 64 && t > f) }
    chunks.sliding(2).foreach {
      case Seq((_, t1), (f2, _)) => assert(t1 == f2)
      case _ =>
    }
  } }

  test("chunked and per-version mirrors land the identical state") { withFastShuffle {
    val src = freshTable("eq-src")
    val a = freshTable("eq-dst-perv")
    val b = freshTable("eq-dst-chunk")
    SnapshotLog.commit(rows(0, 60), src, "append", Seq("id"))
    // a hand-mixed wave: every mutation shape inside one chunk span
    SnapshotLog.commit(rows(60, 70), src, "append", Seq("id"))
    SnapshotLog.deleteWhere(s, src, "id", 5L, 9L, Seq("id"))
    SnapshotLog.upsert(s.range(20, 23).select($"id", lit(77L).as("k"),
      lit("upd").as("payload")), src, "id", Seq("id"))
    SnapshotLog.upsertMOR(s.range(30, 33).select($"id", lit(88L).as("k"),
      lit("mor").as("payload")), src, "id", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(40, 44).toDF("id"), src, "id")
    SnapshotLog.deleteWhereDV(s, src, "id", 50L, 52L)
    SnapshotLog.restore(s, src, SnapshotLog.latestVersion(s, src).get - 2)
    SnapshotLog.commit(rows(70, 76), src, "append", Seq("id"))
    assert(SnapshotLog.replicateChangeFeed(s, src, a, "id", Seq("id")).isDefined)
    assert(SnapshotLog.replicateChangeFeed(s, src, b, "id", Seq("id"),
      maxVersionsPerBatch = 8).isDefined)
    assertSame(src, a)
    assertSame(src, b)
    // the chunked mirror spent far fewer commits
    assert(SnapshotLog.latestVersion(s, b).get <
      SnapshotLog.latestVersion(s, a).get)
  } }
}
