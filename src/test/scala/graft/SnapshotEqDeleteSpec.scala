package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Equality-delete merge-on-read upserts (the Iceberg v2 sequence-
  * number design): upsertMOR/deleteKeysMOR touch NO existing file;
  * reads anti-join the outstanding key sets by data sequence number
  * (a delete applies only to files written strictly before it);
  * compaction materializes and clears the debt; retention, branches,
  * time travel, renames, and the change feed all compose.
  */
class SnapshotEqDeleteSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapeq-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("upsertMOR rewrites nothing: old files stay, updates win, later appends keep their rows") {
    val t = freshTable("basic")
    (0 until 3).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    val filesBefore = SnapshotLog.manifest(s, t, 3L).files.map(_.path).toSet
    val updates = s.range(50, 55).unionByName(s.range(250, 255))
      .select($"id", lit(99L).as("k"), lit("upd").as("payload"))
    SnapshotLog.upsertMOR(updates, t, "id", Seq("id"))
    val m = SnapshotLog.manifest(s, t, 4L)
    // zero rewrites: every prior file is still in the manifest
    assert(filesBefore.subsetOf(m.files.map(_.path).toSet))
    assert(m.eqDeletes.size == 1 && m.eqDeletes.head.rows == 10)
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 300) // replaced, not duplicated
    assert(got.where($"payload" === "upd").count() == 10)
    assert(got.where($"id" === 52).select($"k").head.getLong(0) == 99L)
    // rows the update didn't touch are intact
    assert(got.where($"payload" === "row49").count() == 1)
    // an APPEND AFTER the MOR delete keeps its rows even on key collision
    // (its files postdate the delete's sequence number)
    SnapshotLog.commit(s.range(50, 52).select($"id", lit(1L).as("k"),
      lit("late").as("payload")), t, "append", Seq("id"))
    val after = SnapshotLog.read(s, t)
    assert(after.where($"payload" === "late").count() == 2)
    assert(after.where($"id" === 50).count() == 2) // upd + late: both visible
  }

  test("chained MOR upserts: latest wins per key, each batch O(batch)") {
    val t = freshTable("chain")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    SnapshotLog.upsertMOR(s.range(10, 20).select($"id", lit(1L).as("k"),
      lit("v1").as("payload")), t, "id", Seq("id"))
    SnapshotLog.upsertMOR(s.range(15, 25).select($"id", lit(2L).as("k"),
      lit("v2").as("payload")), t, "id", Seq("id"))
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 100)
    assert(got.where($"payload" === "v1").count() == 5)  // 10..14
    assert(got.where($"payload" === "v2").count() == 10) // 15..24
    assert(got.where($"payload".startsWith("row")).count() == 85)
  }

  test("deleteKeysMOR erases by key without touching any file; empty set is a no-op") {
    val t = freshTable("delkeys")
    SnapshotLog.commit(df(0, 100).repartition(2), t, "append", Seq("id"))
    val v = SnapshotLog.deleteKeysMOR(
      s.range(0, 100).where($"id" % 10 === 3).toDF("id"), t, "id")
    assert(v.contains(2L))
    assert(SnapshotLog.manifest(s, t, 2L).files.map(_.path) ==
      SnapshotLog.manifest(s, t, 1L).files.map(_.path))
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 90)
    assert(got.where($"id" % 10 === 3).count() == 0)
    assert(SnapshotLog.deleteKeysMOR(s.range(0, 0).toDF("id"), t, "id").isEmpty)
    // stats report the outstanding key debt
    assert(SnapshotLog.tableStats(s, t).eqDeleteKeys == 10L)
  }

  test("compact materializes equality deletes and clears the outstanding set") {
    val t = freshTable("compact")
    SnapshotLog.commit(df(0, 200).repartition(2), t, "append", Seq("id"))
    SnapshotLog.upsertMOR(s.range(20, 30).select($"id", lit(5L).as("k"),
      lit("upd").as("payload")), t, "id", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(100, 110).toDF("id"), t, "id")
    val before = SnapshotLog.read(s, t)
      .groupBy($"id", $"k", $"payload").agg(count(lit(1)).as("n"))
    val v = SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    assert(v.isDefined)
    val m = SnapshotLog.manifest(s, t, v.get)
    assert(m.eqDeletes.isEmpty, "compaction must clear the eq-delete debt")
    val after = SnapshotLog.read(s, t)
      .groupBy($"id", $"k", $"payload").agg(count(lit(1)).as("n"))
    assert(before.exceptAll(after).count() == 0 &&
      after.exceptAll(before).count() == 0)
    assert(SnapshotLog.tableStats(s, t).eqDeleteKeys == 0L)
  }

  test("time travel, retention, and vacuum respect equality deletes") {
    val t = freshTable("retention")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(0, 10).toDF("id"), t, "id")
    SnapshotLog.commit(df(100, 120), t, "append", Seq("id"))
    // v1 predates the delete: full content
    assert(SnapshotLog.read(s, t, Some(1)).count() == 100)
    assert(SnapshotLog.read(s, t, Some(2)).count() == 90)
    assert(SnapshotLog.read(s, t).count() == 110)
    // vacuum never touches a referenced eq-delete dir
    SnapshotLog.vacuum(s, t)
    assert(SnapshotLog.read(s, t).count() == 110)
    // expiry keeps the eq dir while any surviving version references it
    SnapshotLog.expireVersions(s, t, keepLast = 2)
    assert(SnapshotLog.read(s, t).count() == 110)
    assert(SnapshotLog.read(s, t, Some(2)).count() == 90)
  }

  test("renames compose: the key set rides the physical name") {
    val t = freshTable("rename")
    SnapshotLog.commit(df(0, 50).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(0, 5).toDF("id"), t, "id")
    SnapshotLog.renameColumn(s, t, "id", "doc_id")
    val got = SnapshotLog.read(s, t)
    assert(got.columns.toSeq == Seq("doc_id", "k", "payload"))
    assert(got.count() == 45 && got.where($"doc_id" < 5).count() == 0)
    // a MOR upsert AFTER the rename keys on the new logical name
    SnapshotLog.upsertMOR(s.range(10, 12).select($"id".as("doc_id"),
      lit(9L).as("k"), lit("upd").as("payload")), t, "doc_id", Seq("doc_id"))
    val got2 = SnapshotLog.read(s, t)
    assert(got2.count() == 45)
    assert(got2.where($"payload" === "upd").count() == 2)
  }

  test("branches fork and publish the eq-delete state; WAP audit sees MOR content") {
    val t = freshTable("branch")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(0, 10).toDF("id"), t, "id")
    val bt = SnapshotLog.createBranch(s, t, "load")
    assert(SnapshotLog.read(s, bt).count() == 90)
    SnapshotLog.upsertMOR(s.range(50, 55).select($"id", lit(7L).as("k"),
      lit("upd").as("payload")), bt, "id", Seq("id"))
    assert(SnapshotLog.read(s, bt).where($"payload" === "upd").count() == 5)
    assert(SnapshotLog.read(s, t).where($"payload" === "upd").count() == 0)
    SnapshotLog.fastForward(s, t, "load")
    val main = SnapshotLog.read(s, t)
    assert(main.count() == 90)
    assert(main.where($"payload" === "upd").count() == 5)
  }

  test("the change feed carries MOR deletes and inserts with candidate-file pruning") {
    val t = freshTable("cdf")
    (0 until 3).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    // keys land only in file 1's interval: files 0 and 2 must not scan
    SnapshotLog.upsertMOR(s.range(120, 125).select($"id", lit(3L).as("k"),
      lit("upd").as("payload")), t, "id", Seq("id"))
    val feed = SnapshotLog.readChangeFeed(s, t, 3L)
    val ins = feed.where($"_change_type" === "insert")
    val del = feed.where($"_change_type" === "delete")
    assert(ins.count() == 5 && ins.where($"payload" === "upd").count() == 5)
    assert(del.count() == 5)
    assert(del.agg(sum($"id")).head.getLong(0) == (120L until 125).sum)
    assert(del.where($"payload".startsWith("row")).count() == 5)
    // a mirror replicates the MOR history exactly
    val dst = freshTable("cdf-dst")
    SnapshotLog.replicateChangeFeed(s, t, dst, "id", Seq("id"))
    val a = SnapshotLog.read(s, t).groupBy($"id", $"k", $"payload")
      .agg(count(lit(1)).as("n"))
    val b = SnapshotLog.read(s, dst).groupBy($"id", $"k", $"payload")
      .agg(count(lit(1)).as("n"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("CoW ops on a table with outstanding eq-deletes stay correct") {
    val t = freshTable("mixed")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(90, 100).toDF("id"), t, "id")
    // CoW upsert reads eq-visible rows and rewrites; its new file
    // postdates the delete, so rewritten survivors keep their rows
    SnapshotLog.upsert(s.range(0, 5).select($"id", lit(8L).as("k"),
      lit("cow").as("payload")), t, "id", Seq("id"))
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 90)
    assert(got.where($"payload" === "cow").count() == 5)
    assert(got.where($"id" >= 90).count() == 0)
    // CoW range delete composes too
    SnapshotLog.deleteWhere(s, t, "id", 10L, 19L, Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 80)
    // and a positional DV delete on top: both mask layers apply; a DV
    // that lands on an eq-hidden physical row is harmless double-masking
    SnapshotLog.deleteMatchingDV(s, t, $"id" % 20 === 5)
    val fin = SnapshotLog.read(s, t)
    assert(fin.where($"id" % 20 === 5).count() == 0)
    // survivors {0..9, 20..89} minus ids 5,25,45,65,85
    assert(fin.count() == 75)
  }

  test("streaming CDC ingestion: foreachBatch MOR upserts are exactly-once across restarts") {
    val t = freshTable("stream-cdc")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    def batch(e: Long, lo: Long, hi: Long) = SnapshotLog.upsertMORBatch(
      s.range(lo, hi).select($"id", lit(e).as("k"),
        concat(lit("e"), lit(e)).as("payload")), t, e, "id", Seq("id"))
    assert(batch(0, 10, 20).isDefined)
    assert(batch(1, 15, 25).isDefined)
    // restart replays epoch 1: must be skipped, content unchanged
    assert(batch(1, 15, 25).isEmpty)
    assert(batch(2, 200, 205).isDefined) // pure inserts
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 105)
    assert(got.where($"payload" === "e0").count() == 5)  // 10..14
    assert(got.where($"payload" === "e1").count() == 10) // 15..24
    assert(got.where($"payload" === "e2").count() == 5)  // 200..204
    // compaction absorbs the accumulated debt; content unchanged
    SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    assert(SnapshotLog.tableStats(s, t).eqDeleteKeys == 0L)
    assert(SnapshotLog.read(s, t).count() == 105)
    assert(SnapshotLog.read(s, t).where($"payload" === "e1").count() == 10)
  }

  test("compact rewrites only files that MAY hold masked keys (stats-probed debt)") {
    val t = freshTable("probe")
    // 4 disjoint-range files with id stats; point deletes touch ONE
    (0 until 4).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    SnapshotLog.deleteKeysMOR(s.range(250, 260).toDF("id"), t, "id")
    val before = SnapshotLog.manifest(s, t, 5L).files.map(_.path).toSet
    val v = SnapshotLog.compact(s, t, 1L, Seq("id")) // size never qualifies
    assert(v.isDefined)
    val m = SnapshotLog.manifest(s, t, v.get)
    assert(m.eqDeletes.isEmpty)
    // exactly one file (the 200..299 range) was rewritten
    assert(m.files.map(_.path).toSet.intersect(before).size == 3,
      s"compact rewrote ${4 - m.files.map(_.path).toSet.intersect(before).size} files for a 1-file delete")
    assert(SnapshotLog.read(s, t).count() == 390)
    assert(SnapshotLog.read(s, t).where($"id" >= 250 && $"id" < 260).count() == 0)
    // deletes whose keys exist nowhere clear with a metadata-only commit
    SnapshotLog.deleteKeysMOR(s.range(5000, 5010).toDF("id"), t, "id")
    val files0 = SnapshotLog.tableStats(s, t).files
    val v2 = SnapshotLog.compact(s, t, 1L, Seq("id"))
    assert(v2.isDefined)
    val m2 = SnapshotLog.manifest(s, t, v2.get)
    assert(m2.eqDeletes.isEmpty && m2.files.size == files0)
    assert(SnapshotLog.read(s, t).count() == 390)
  }

  test("scoped compact rewrites one bucket; deletes with out-of-scope candidates survive") {
    val t = freshTable("scoped")
    // four single-file buckets [0,100) .. [300,400)
    (0 until 4).foreach(i => SnapshotLog.commit(
      df(i * 100L, i * 100L + 100).repartition(1), t, "append", Seq("id")))
    // ONE delete spanning two buckets: 150..159 (b1) and 250..259 (b2)
    SnapshotLog.deleteKeysMOR(
      s.range(150, 160).unionByName(s.range(250, 260)).toDF("id"), t, "id")
    val before = SnapshotLog.manifest(s, t, 5L).files.map(_.path).toSet
    // pass 1: scope = bucket 1 — rewrites it, must NOT drop the delete
    // (bucket 2 still holds masked rows it applies to)
    val v6 = SnapshotLog.compact(s, t, targetBytes = 1L << 30,
      statsCols = Seq("id"), where = Seq(SnapshotLog.ColumnRange.between("id", 100L, 199L))).get
    val m6 = SnapshotLog.manifest(s, t, v6)
    assert(m6.eqDeletes.size == 1, "a scoped pass un-deleted rows")
    // exactly one file changed hands; the other three are untouched
    assert((before -- m6.files.map(_.path).toSet).size == 1)
    assert((m6.files.map(_.path).toSet -- before).size == 1)
    val rows6 = SnapshotLog.read(s, t)
    assert(rows6.count() == 380)
    assert(rows6.where($"id".between(150, 159) ||
      $"id".between(250, 259)).count() == 0)
    // pass 2: scope = bucket 2 — the delete's LAST candidate rewrites,
    // so the debt clears
    val v7 = SnapshotLog.compact(s, t, targetBytes = 1L << 30,
      statsCols = Seq("id"), where = Seq(SnapshotLog.ColumnRange.between("id", 200L, 299L))).get
    assert(SnapshotLog.manifest(s, t, v7).eqDeletes.isEmpty)
    assert(SnapshotLog.read(s, t).count() == 380)
    // a scope with nothing to do commits nothing
    assert(SnapshotLog.compact(s, t, targetBytes = 1L,
      statsCols = Seq("id"), where = Seq(SnapshotLog.ColumnRange.between("id", 0L, 99L))).isEmpty)
    assert(SnapshotLog.latestVersion(s, t).contains(v7))
  }

  test("morAutoCompactEvery makes ingest debt sawtooth instead of growing") {
    val t = freshTable("autocompact")
    SnapshotLog.commit(df(0, 200).repartition(2), t, "append", Seq("id"))
    s.conf.set(SnapshotLog.MorAutoCompactEveryConf, "4")
    try {
      val debts = (1 to 10).map { e =>
        val updates = s.range(e * 7L, e * 7L + 5)
          .select($"id", lit(e.toLong).as("k"),
            concat(lit("e"), lit(e)).as("payload"))
        assert(SnapshotLog.upsertMORBatch(updates, t, e.toLong, "id",
          Seq("id")).isDefined)
        val v = SnapshotLog.latestVersion(s, t).get
        SnapshotLog.manifest(s, t, v).eqDeletes.size
      }
      // ceiling respected: debt never exceeds the trigger...
      assert(debts.max <= 4, s"debt trace $debts exceeded the ceiling")
      // ...and actually sawtooths (a compaction cleared it mid-run)
      assert(debts.contains(0) || debts.sliding(2).exists {
        case Seq(a, b) => b < a; case _ => false }, s"debt trace $debts never fell")
      // replay of an epoch after auto-compaction is still detected
      assert(SnapshotLog.upsertMORBatch(df(0, 5), t, 10L, "id", Seq("id")).isEmpty)
      // content: every key got its LAST epoch's value
      val got = SnapshotLog.read(s, t)
      assert(got.count() == 200 + (1 to 10).flatMap(e =>
        e * 7L until e * 7L + 5).distinct.count(_ >= 200))
      (1 to 10).foreach { e =>
        val ids = (e * 7L until e * 7L + 5)
        val laterIds = ((e + 1) to 10).flatMap(x => x * 7L until x * 7L + 5).toSet
        val expect = ids.filterNot(laterIds)
        assert(got.where($"payload" === s"e$e").count() == expect.size,
          s"epoch $e survivors")
      }
    } finally s.conf.unset(SnapshotLog.MorAutoCompactEveryConf)
  }

  test("MOR ops refuse duplicate keys and fail streams loudly mid-range") {
    val t = freshTable("guards")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotLog.upsertMOR(
        s.range(0, 4).select(($"id" % 2).as("id"), lit(0L).as("k"),
          lit("x").as("payload")), t, "id", Seq("id"))
    }
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_eq_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      SnapshotLog.deleteKeysMOR(s.range(0, 2).toDF("id"), t, "id")
      SnapshotLog.commit(df(20, 30), t, "append", Seq("id"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(e: Throwable): Seq[String] =
        if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
      assert(msgs(ex).exists(_.contains("delete-keys-mor")))
    } finally q.stop()
  }
}
