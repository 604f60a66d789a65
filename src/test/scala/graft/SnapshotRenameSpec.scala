package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Metadata-only column renames (column mapping, name mode): old files
  * keep serving under the new name via their rename-stable physical
  * names, writes land physical, stats re-key so pruning survives, time
  * travel serves each version's own names, and the unsafe shapes
  * (collisions, constrained columns) refuse loudly.
  */
class SnapshotRenameSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snaprename-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("rename is metadata-only: old files serve the new name, appends land physical, time travel keeps old names") {
    val t = freshTable("basic")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id", "k"))
    val dataFilesBefore = SnapshotLog.manifest(s, t, 1L).files.map(_.path)
    val v = SnapshotLog.renameColumn(s, t, "k", "bucket")
    assert(v == 2L)
    // zero data movement: the exact same files
    assert(SnapshotLog.manifest(s, t, 2L).files.map(_.path) == dataFilesBefore)
    // reads serve the new name over the OLD files
    val r = SnapshotLog.read(s, t)
    assert(r.columns.toSeq == Seq("id", "bucket", "payload"))
    assert(r.agg(sum($"bucket")).head.getLong(0) == (0L until 100).map(_ % 7).sum)
    // an append AFTER the rename uses the new logical name and lands
    // under the physical name — both eras read uniformly
    SnapshotLog.commit(df(100, 150).withColumnRenamed("k", "bucket"),
      t, "append", Seq("id", "bucket"))
    val all = SnapshotLog.read(s, t)
    assert(all.count() == 150)
    assert(all.agg(sum($"bucket")).head.getLong(0) ==
      (0L until 150).map(_ % 7).sum)
    // time travel serves each version's OWN names
    assert(SnapshotLog.read(s, t, Some(1)).columns.toSeq ==
      Seq("id", "k", "payload"))
    assert(SnapshotLog.read(s, t, Some(1)).agg(sum($"k")).head.getLong(0) ==
      (0L until 100).map(_ % 7).sum)
  }

  test("manifest stats re-key: pruning, point lookups, and upserts keep working on the renamed column") {
    val t = freshTable("stats")
    // 4 disjoint single-file ranges on id
    (0 until 4).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id"),
      bloomCols = Seq("id")))
    SnapshotLog.renameColumn(s, t, "id", "doc_id")
    // range pruning on the NEW name hits one file
    val (pruned, scanned, total) =
      SnapshotLog.readPruned(s, t, "doc_id", 120L, 180L)
    assert(total == 4 && scanned == 1)
    assert(pruned.count() == 61)
    // bloom point lookup on the new name
    val (rows, opened, rangeCand, _) = SnapshotLog.readPoint(s, t, "doc_id", 250L)
    assert(rows.count() == 1 && opened == 1 && rangeCand == 1)
    // upsert keyed by the new name rewrites only the touched file
    val up = s.range(50, 55).select($"id".as("doc_id"), lit(99L).as("k"),
      lit("upd").as("payload"))
    val st = SnapshotLog.upsert(up, t, "doc_id", Seq("doc_id"))
    assert(st.filesRewritten == 1 && st.filesKept == 3)
    val got = SnapshotLog.read(s, t)
    assert(got.where($"payload" === "upd").count() == 5)
    assert(got.count() == 400)
  }

  test("copy-on-write delete, DV delete, and compact survive a rename") {
    val t = freshTable("mutate")
    (0 until 3).foreach(i => SnapshotLog.commit(
      df(i * 100, i * 100 + 100).repartition(1), t, "append", Seq("id")))
    SnapshotLog.renameColumn(s, t, "id", "doc_id")
    val del = SnapshotLog.deleteWhere(s, t, "doc_id", 0L, 99L, Seq("doc_id"))
    assert(del.get.filesDropped == 1) // stats pruned it without a read
    val dv = SnapshotLog.deleteMatchingDV(s, t,
      col("payload").rlike("^row15.$")) // row150..row159
    assert(dv.isDefined && dv.get.rowsDeleted == 10)
    val afterDv = SnapshotLog.read(s, t)
    assert(afterDv.where($"payload".rlike("^row15.$")).count() == 0)
    val compacted = SnapshotLog.compact(s, t, targetBytes = 1L << 30,
      statsCols = Seq("doc_id"))
    assert(compacted.isDefined)
    val fin = SnapshotLog.read(s, t)
    assert(fin.columns.toSeq == Seq("doc_id", "k", "payload"))
    assert(fin.count() == afterDv.count())
    assert(fin.agg(sum($"doc_id")).head.getLong(0) ==
      afterDv.agg(sum($"doc_id")).head.getLong(0))
  }

  test("rename chains and rename-back collapse to identity mapping") {
    val t = freshTable("chain")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.renameColumn(s, t, "k", "b1")
    SnapshotLog.renameColumn(s, t, "b1", "b2")
    assert(SnapshotLog.read(s, t).agg(sum($"b2")).head.getLong(0) ==
      (0L until 50).map(_ % 7).sum)
    // rename back to the physical name drops the mapping entry
    SnapshotLog.renameColumn(s, t, "b2", "k")
    val m = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get)
    assert(m.physical.isEmpty)
    assert(SnapshotLog.read(s, t).agg(sum($"k")).head.getLong(0) ==
      (0L until 50).map(_ % 7).sum)
  }

  test("never-renamed tables keep the bare scan plan — no aliasing projection tax") {
    val t = freshTable("fastpath")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    val plain = SnapshotLog.read(s, t).queryExecution.optimizedPlan
    // physical map empty → readFilesRaw returns the scan itself; the
    // column-mapping feature must cost NOTHING until a rename happens
    assert(!plain.toString.contains("Project"),
      s"unexpected projection over a never-renamed table:\n$plain")
    // and the renamed table's read is exactly one collapsed projection
    SnapshotLog.renameColumn(s, t, "k", "bucket")
    val renamed = SnapshotLog.read(s, t).queryExecution.optimizedPlan
    assert(renamed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p }.size <= 1)
  }

  test("unsafe renames refuse loudly") {
    val t = freshTable("guards")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    // to an existing logical name
    intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(s, t, "k", "payload") }
    // constrained column
    SnapshotLog.addConstraint(s, t, "k_range", "k BETWEEN 0 AND 6")
    val ex = intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(s, t, "k", "bucket") }
    assert(ex.getMessage.contains("k_range"))
    SnapshotLog.dropConstraint(s, t, "k_range")
    SnapshotLog.renameColumn(s, t, "k", "bucket")
    // evolving a NEW column whose name is a renamed column's physical
    // name allocates a FRESH physical slot: old files (whose physical
    // 'k' bytes belong to logical 'bucket') serve the new 'k' as NULL
    // instead of aliasing two logical columns onto one parquet column
    val ddl = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).schemaDdl
    SnapshotLog.evolveSchema(s, t, ddl + ",k BIGINT")
    val r = SnapshotLog.read(s, t)
    assert(r.where($"k".isNotNull).count() == 0,
      "re-added 'k' aliased the renamed column's old bytes")
    assert(r.where($"bucket".isNotNull).count() == 20)
    // writes land under the fresh physical name and read back
    SnapshotLog.commit(s.range(20, 25).select($"id",
      ($"id" % 7).as("bucket"), lit("x").as("payload"),
      lit(99L).as("k")), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).where($"k" === 99L).count() == 5)
    assert(SnapshotLog.read(s, t).where($"bucket".isNotNull).count() == 25)
    // renaming ONTO a still-occupied physical name refuses
    intercept[IllegalArgumentException] {
      SnapshotLog.renameColumn(s, t, "payload", "k") }
  }

  test("restore and branches carry the column mapping; a stream started after a rename decodes physical files") {
    val t = freshTable("carry")
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"))
    SnapshotLog.renameColumn(s, t, "k", "bucket")
    SnapshotLog.commit(df(40, 60).withColumnRenamed("k", "bucket"),
      t, "append", Seq("id"))
    // restore to the renamed version keeps the mapping
    SnapshotLog.restore(s, t, 2L)
    assert(SnapshotLog.read(s, t).columns.toSeq == Seq("id", "bucket", "payload"))
    assert(SnapshotLog.read(s, t).count() == 40)
    // a branch forked from a renamed table reads and appends correctly
    val bt = SnapshotLog.createBranch(s, t, "aud")
    SnapshotLog.commit(df(100, 110).withColumnRenamed("k", "bucket"),
      bt, "append", Seq("id"))
    assert(SnapshotLog.read(s, bt).agg(sum($"bucket")).head.getLong(0) ==
      ((0L until 40) ++ (100L until 110)).map(_ % 7).sum)
    SnapshotLog.fastForward(s, t, "aud")
    assert(SnapshotLog.read(s, t).count() == 50)
    // stream started after the rename: files carry the physical name
    // 'k'; rows must surface under 'bucket'
    val from = SnapshotLog.latestVersion(s, t).get
    val q = s.readStream.format("graft-snapshot").option("table", t)
      .option("startingVersion", from.toString).load()
      .writeStream.format("memory").queryName("snap_stream_renamed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      SnapshotLog.commit(df(200, 210).withColumnRenamed("k", "bucket"),
        t, "append", Seq("id"))
      q.processAllAvailable()
      val got = s.table("snap_stream_renamed")
      assert(got.columns.toSeq == Seq("id", "bucket", "payload"))
      assert(got.count() == 10)
      assert(got.agg(sum($"bucket")).head.getLong(0) ==
        (200L until 210).map(_ % 7).sum)
    } finally q.stop()
  }
}
