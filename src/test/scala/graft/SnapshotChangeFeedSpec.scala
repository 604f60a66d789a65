package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Row-level change feed (the `table_changes` capability): inserts and
  * deletes per committed version over every mutation shape, computed
  * from the files that changed hands only — appends, CoW deletes, DV
  * deletes, upserts, CDC applies, restores; compaction contributes
  * nothing; ranges span evolves and renames by aligning to the end
  * schema through physical names.
  */
class SnapshotChangeFeedSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapcdf-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  private def feed(t: String, from: Long, to: Option[Long] = None) =
    SnapshotLog.readChangeFeed(s, t, from, to)

  private def byType(fdf: org.apache.spark.sql.DataFrame): Map[(String, Long), (Long, Long)] =
    fdf.groupBy($"_change_type", $"_commit_version")
      .agg(count(lit(1)).as("n"), sum($"id").as("sum_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("appends feed as inserts, exactly once per version") {
    val t = freshTable("appends")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(50, 80), t, "append", Seq("id"))
    val m = byType(feed(t, 0))
    assert(m(("insert", 1L)) == (50L, (0L until 50).sum))
    assert(m(("insert", 2L)) == (30L, (50L until 80).sum))
    assert(m.size == 2) // no deletes anywhere
    // (from=1] sees only v2
    assert(byType(feed(t, 1)) == Map(("insert", 2L) -> (30L, (50L until 80).sum)))
  }

  test("CoW delete feeds the removed rows as deletes; rewritten survivors do not churn") {
    val t = freshTable("cow")
    (0 until 2).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    // partial overlap of file 1: rows 0..49 go, 50..99 survive via rewrite
    SnapshotLog.deleteWhere(s, t, "id", 0L, 49L, Seq("id"))
    val m = byType(feed(t, 2))
    assert(m(("delete", 3L)) == (50L, (0L until 50).sum))
    // multiset diff: the 50 surviving rows move files but are NOT churn
    assert(!m.contains(("insert", 3L)))
  }

  test("the per-version diff is multiset-exact under duplicate rows") {
    // the entry diff is a fused signed-weight aggregation (one
    // exchange) replacing the old exceptAll PAIR — this property pins
    // the equivalence where they could diverge: rows repeated with
    // DIFFERENT multiplicities on the two sides of a rewrite. Per
    // version, the feed must equal the full-state multiset diff
    // (insert = state(v) \\ state(v-1), delete = the reverse, with
    // exact counts — exceptAll both ways as the reference oracle).
    val t = freshTable("multiset")
    // v1: full tuples repeated 3x each
    val dup3 = df(0, 20)
    SnapshotLog.commit(dup3.unionAll(dup3).unionAll(dup3).coalesce(1),
      t, "append", Seq("id"))
    // v2: overwrite shifts multiplicities (2x of a shifted range) —
    // shared tuples change count, some vanish, some appear
    val dup2 = df(10, 30)
    SnapshotLog.commit(dup2.unionAll(dup2).coalesce(1), t,
      "overwrite", Seq("id"))
    // v3: CoW delete rewrites a duplicate-bearing file
    SnapshotLog.deleteWhere(s, t, "id", 12L, 15L, Seq("id"))
    (1L to 3L).foreach { v =>
      val f = feed(t, v - 1, Some(v))
      val ins = f.where($"_change_type" === "insert")
        .drop("_change_type", "_commit_version")
      val del = f.where($"_change_type" === "delete")
        .drop("_change_type", "_commit_version")
      val cur = SnapshotLog.read(s, t, Some(v))
      val prev = if (v == 1L) cur.limit(0)
        else SnapshotLog.read(s, t, Some(v - 1))
      val refIns = cur.exceptAll(prev)
      val refDel = prev.exceptAll(cur)
      assert(ins.exceptAll(refIns).count() == 0 &&
        refIns.exceptAll(ins).count() == 0,
        s"v$v inserts diverge from the multiset state diff")
      assert(del.exceptAll(refDel).count() == 0 &&
        refDel.exceptAll(del).count() == 0,
        s"v$v deletes diverge from the multiset state diff")
    }
  }

  test("DV delete feeds exactly the masked rows") {
    val t = freshTable("dv")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteMatchingDV(s, t, $"id" % 10 === 3)
    val m = byType(feed(t, 1))
    assert(m(("delete", 2L)) == (10L, (0L until 100).filter(_ % 10 == 3).sum))
    assert(!m.contains(("insert", 2L)))
    // extending the mask feeds only the NEWLY masked rows
    SnapshotLog.deleteMatchingDV(s, t, $"id" % 10 === 7)
    val m2 = byType(feed(t, 2))
    assert(m2(("delete", 3L)) == (10L, (0L until 100).filter(_ % 10 == 7).sum))
  }

  test("upsert feeds delete+insert pairs for changed rows only") {
    val t = freshTable("upsert")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    val updates = s.range(10, 15).select($"id", lit(99L).as("k"),
      lit("updated").as("payload"))
    SnapshotLog.upsert(updates, t, "id", Seq("id"))
    val f = feed(t, 1)
    val ins = f.where($"_change_type" === "insert")
    val del = f.where($"_change_type" === "delete")
    // exactly the 5 changed rows on each side — the other 95 rows were
    // rewritten into the new file but are multiset-identical
    assert(ins.count() == 5 && del.count() == 5)
    assert(ins.where($"payload" === "updated").count() == 5)
    assert(del.where($"payload".startsWith("row")).count() == 5)
    assert(del.agg(sum($"id")).head.getLong(0) == (10L until 15).sum)
  }

  test("restore feeds the content it reverts; compaction feeds nothing") {
    val t = freshTable("restore")
    SnapshotLog.commit(df(0, 60).repartition(2), t, "append", Seq("id"))
    SnapshotLog.commit(df(60, 90).repartition(1), t, "append", Seq("id"))
    // compaction: physical rewrite, logical no-op
    SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    assert(feed(t, 2, Some(3)).count() == 0)
    // restore to v1: v2's rows (60..89) feed as deletes
    SnapshotLog.restore(s, t, 1L)
    val m = byType(feed(t, 3))
    assert(m(("delete", 4L)) == (30L, (60L until 90).sum))
    assert(!m.contains(("insert", 4L)))
  }

  test("a range spanning evolve and rename aligns to the end schema via physical names") {
    val t = freshTable("evolve-rename")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    SnapshotLog.evolveSchema(s, t,
      SnapshotLog.manifest(s, t, 1L).schemaDdl + ",extra BIGINT")
    SnapshotLog.commit(df(20, 30).withColumn("extra", $"id" * 2), t,
      "append", Seq("id"))
    SnapshotLog.renameColumn(s, t, "k", "bucket")
    SnapshotLog.commit(df(30, 40).withColumnRenamed("k", "bucket")
      .withColumn("extra", $"id" * 3), t, "append", Seq("id"))
    val f = feed(t, 0)
    assert(f.columns.toSeq ==
      Seq("id", "bucket", "payload", "extra", "_change_type", "_commit_version"))
    // v1 rows: pre-evolve (extra null), pre-rename k serves as bucket
    assert(f.where($"_commit_version" === 1).count() == 20)
    assert(f.where($"_commit_version" === 1 && $"extra".isNull).count() == 20)
    assert(f.where($"_commit_version" === 1).agg(sum($"bucket")).head.getLong(0) ==
      (0L until 20).map(_ % 7).sum)
    // evolve and rename themselves contribute no rows
    assert(f.where($"_commit_version".isin(2, 4)).count() == 0)
    assert(f.where($"_commit_version" === 5).agg(sum($"extra")).head.getLong(0) ==
      (30L until 40).map(_ * 3).sum)
  }

  test("replicateChangeFeed mirrors a mutating table exactly-once, resumable") {
    val src = freshTable("repl-src")
    val dst = freshTable("repl-dst")
    def sync() = SnapshotLog.replicateChangeFeed(s, src, dst, "id", Seq("id"))
    def same(): Unit = {
      val a = SnapshotLog.read(s, src).groupBy($"id", $"k", $"payload")
        .agg(count(lit(1)).as("n"))
      val b = SnapshotLog.read(s, dst).groupBy($"id", $"k", $"payload")
        .agg(count(lit(1)).as("n"))
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
    SnapshotLog.commit(df(0, 100).repartition(2), src, "append", Seq("id"))
    assert(sync().isDefined)
    same()
    assert(sync().isEmpty) // up to date: no phantom commits
    // a mutation wave: CoW delete + upsert + DV delete, then one sync
    SnapshotLog.deleteWhere(s, src, "id", 0L, 9L, Seq("id"))
    SnapshotLog.upsert(
      s.range(50, 55).select($"id", lit(77L).as("k"), lit("upd").as("payload")),
      src, "id", Seq("id"))
    SnapshotLog.deleteMatchingDV(s, src, $"id" % 25 === 3)
    assert(sync().isDefined)
    same()
    // id=53 (%25==3) was DV-deleted after the upsert: 4 survive
    assert(SnapshotLog.read(s, dst).where($"payload" === "upd").count() == 4)
    assert(sync().isEmpty)
    // compaction on src is a logical no-op: nothing replicates
    SnapshotLog.compact(s, src, 1L << 30, Seq("id"))
    assert(sync().isEmpty)
    same()
    // late appends resume from the ledger
    SnapshotLog.commit(df(200, 220), src, "append", Seq("id"))
    assert(sync().isDefined)
    same()
  }

  test("the feed's plan reads ONLY the files that changed hands") {
    val t = freshTable("plan")
    (0 until 3).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    // delete overlaps file 1 only: files 0 and 2 must never be scanned
    SnapshotLog.deleteWhere(s, t, "id", 120L, 150L, Seq("id"))
    val feed = SnapshotLog.readChangeFeed(s, t, 3L)
    val read = feed.inputFiles.toSet
    val m3 = SnapshotLog.manifest(s, t, 3L)
    val untouched = m3.files.map(_.path)
      .filter(p => SnapshotLog.manifest(s, t, 4L).files.exists(_.path == p))
    assert(untouched.nonEmpty)
    untouched.foreach(p => assert(!read.exists(_.endsWith(p.substring(p.lastIndexOf('/') + 1))),
      s"feed scanned unchanged file $p"))
    assert(read.nonEmpty)
  }

  test("the feed works on a branch fork (parent-referenced files resolve)") {
    val t = freshTable("branch-feed")
    SnapshotLog.commit(df(0, 50).repartition(1), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "aud")
    SnapshotLog.commit(df(50, 60), bt, "append", Seq("id"))
    SnapshotLog.deleteWhere(s, bt, "id", 0L, 9L, Seq("id"))
    // from the fork marker: the branch's own additions and deletions
    val feed = SnapshotLog.readChangeFeed(s, bt, 1L)
    val m = byType(feed)
    assert(m(("insert", 2L)) == (10L, (50L until 60).sum))
    assert(m(("delete", 3L)) == (10L, (0L until 10).sum))
    // from zero: the creation marker feeds the fork base as inserts
    assert(SnapshotLog.readChangeFeed(s, bt, 0L)
      .where($"_change_type" === "insert" && $"_commit_version" === 1)
      .count() == 50)
  }

  test("restore past a MOR key delete re-surfaces the un-masked rows as inserts") {
    val t = freshTable("restore-mor")
    SnapshotLog.commit(df(0, 40).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(5, 15).toDF("id"), t, "id") // v2
    // v3: restore to v1 drops the eq-delete while every file entry
    // stays identical — the masked rows come back as inserts
    SnapshotLog.restore(s, t, 1L)
    val m = byType(feed(t, 2))
    assert(m(("insert", 3L)) == (10L, (5L until 15).sum))
    assert(!m.contains(("delete", 3L)))
    // and the whole-history feed still replays to the final state
    val net = feed(t, 0).withColumn("w",
        when($"_change_type" === "insert", 1L).otherwise(-1L))
      .groupBy($"id", $"k", $"payload").agg(sum($"w").as("n"))
      .where($"n" =!= 0)
    val fin = SnapshotLog.read(s, t)
      .groupBy($"id", $"k", $"payload").agg(count(lit(1)).as("n"))
    assert(net.exceptAll(fin).count() == 0 && fin.exceptAll(net).count() == 0)
  }

  test("restore past a MOR upsert feeds the new rows out and the originals back") {
    val t = freshTable("restore-morup")
    SnapshotLog.commit(df(0, 30).repartition(1), t, "append", Seq("id"))
    SnapshotLog.upsertMOR(
      s.range(3, 8).select($"id", lit(9L).as("k"), lit("u").as("payload")),
      t, "id", Seq("id")) // v2: new files + eq-delete
    SnapshotLog.restore(s, t, 1L) // v3
    val f = feed(t, 2)
    val ins = f.where($"_change_type" === "insert")
    val del = f.where($"_change_type" === "delete")
    // the upserted values leave (their files dropped), originals return
    assert(del.count() == 5 && del.where($"payload" === "u").count() == 5)
    assert(ins.count() == 5 && ins.where($"payload".startsWith("row")).count() == 5)
    assert(ins.agg(sum($"id")).head.getLong(0) == (3L until 8).sum)
  }

  test("restore dropping ONE of two eq-deletes re-surfaces only its keys") {
    val t = freshTable("restore-partial")
    SnapshotLog.commit(df(0, 40).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(0, 10).toDF("id"), t, "id") // v2: A
    SnapshotLog.deleteKeysMOR(s.range(5, 20).toDF("id"), t, "id") // v3: B
    SnapshotLog.restore(s, t, 2L) // v4: drops B, keeps A
    val m = byType(feed(t, 3))
    // keys 5..9 are still masked by A; only 10..19 come back
    assert(m(("insert", 4L)) == (10L, (10L until 20).sum))
    assert(!m.contains(("delete", 4L)))
    assert(SnapshotLog.read(s, t).where($"id" < 10).count() == 0)
  }

  test("a mirror converges across a restore past MOR ops") {
    val src = freshTable("mirror-restore-src")
    val dst = freshTable("mirror-restore-dst")
    def sync() = SnapshotLog.replicateChangeFeed(s, src, dst, "id", Seq("id"))
    def same(): Unit = {
      val a = SnapshotLog.read(s, src).groupBy($"id", $"k", $"payload")
        .agg(count(lit(1)).as("n"))
      val b = SnapshotLog.read(s, dst).groupBy($"id", $"k", $"payload")
        .agg(count(lit(1)).as("n"))
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
    SnapshotLog.commit(df(0, 50).repartition(1), src, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(10, 30).toDF("id"), src, "id")
    assert(sync().isDefined); same()
    // the divergence ADVICE flagged: restore to pre-MOR state
    SnapshotLog.restore(s, src, 1L)
    assert(sync().isDefined)
    same()
    assert(SnapshotLog.read(s, dst).count() == 50)
  }

  test("the feed replays to the current table state") {
    val t = freshTable("replay")
    SnapshotLog.commit(df(0, 80).repartition(2), t, "append", Seq("id"))
    SnapshotLog.deleteWhere(s, t, "id", 10L, 19L, Seq("id"))
    SnapshotLog.upsert(
      s.range(30, 35).select($"id", lit(50L).as("k"), lit("u").as("payload")),
      t, "id", Seq("id"))
    SnapshotLog.deleteMatchingDV(s, t, $"id" % 20 === 1)
    // inserts minus deletes across the whole feed == final content
    val f = feed(t, 0)
    val net = f.withColumn("w",
        when($"_change_type" === "insert", 1L).otherwise(-1L))
      .groupBy($"id", $"k", $"payload").agg(sum($"w").as("n"))
      .where($"n" =!= 0)
    val fin = SnapshotLog.read(s, t)
      .groupBy($"id", $"k", $"payload").agg(count(lit(1)).as("n"))
    assert(net.exceptAll(fin).count() == 0 && fin.exceptAll(net).count() == 0)
  }

  test("a feed range expired by retention refuses with the re-bootstrap action") {
    val t = freshTable("expired")
    (0 until 12).foreach(i =>
      SnapshotLog.commit(df(i * 10L, i * 10L + 10), t, "append", Seq("id")))
    // expiry backs onto the v10 checkpoint: v1..v9 manifests + data gone
    val (gone, _) = SnapshotLog.expireVersions(s, t, keepLast = 3)
    assert(gone == (1L to 9L))
    // a consumer checkpointed before retained history cannot catch up
    val e = intercept[SnapshotLog.ChangeFeedExpiredException] {
      SnapshotLog.readChangeFeed(s, t, 2L)
    }
    assert(e.getMessage.contains("re-bootstrap"))
    intercept[SnapshotLog.ChangeFeedExpiredException] {
      SnapshotLog.readChangeFeed(s, t, 0L)
    }
    // chunked consumption hits the same typed refusal on first chunk
    intercept[SnapshotLog.ChangeFeedExpiredException] {
      SnapshotLog.changeFeedChunks(s, t, 1L, maxVersionsPerChunk = 2)
        .foreach(_._3.count())
    }
    // a range within retained history still serves
    assert(SnapshotLog.readChangeFeed(s, t, 10L)
      .where($"_change_type" === "insert").count() == 20)
    // the append-only incremental read honors the same contract
    intercept[SnapshotLog.ChangeFeedExpiredException] {
      SnapshotLog.readChanges(s, t, 2L)
    }
    assert(SnapshotLog.readChanges(s, t, 10L).count() == 20)
  }

  test("a mirror that fell behind retention refuses instead of diverging") {
    val t = freshTable("expired-mirror-src")
    val d = freshTable("expired-mirror-dst")
    (0 until 3).foreach(i =>
      SnapshotLog.commit(df(i * 10L, i * 10L + 10), t, "append", Seq("id")))
    // mirror catches up to v3, then the source advances and expires
    assert(SnapshotLog.replicateChangeFeed(s, t, d, "id", Seq("id"),
      maxVersionsPerBatch = 64).isDefined)
    (3 until 12).foreach(i =>
      SnapshotLog.commit(df(i * 10L, i * 10L + 10), t, "append", Seq("id")))
    // expiry backs onto the v10 checkpoint — the mirror's v3 ckpt is gone
    assert(SnapshotLog.expireVersions(s, t, keepLast = 3)._1.nonEmpty)
    intercept[SnapshotLog.ChangeFeedExpiredException] {
      SnapshotLog.replicateChangeFeed(s, t, d, "id", Seq("id"),
        maxVersionsPerBatch = 64)
    }
    // the refusal left the mirror untouched at its checkpoint
    assert(SnapshotLog.read(s, d).count() == 30)
  }
}
