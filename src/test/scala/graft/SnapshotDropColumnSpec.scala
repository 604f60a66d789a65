package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Metadata-only column DROP (column mapping): zero data movement,
  * time travel keeps the column, the physical slot tombstones so a
  * re-ADD of the same name serves NULL (never the old bytes), writes
  * conform to the narrowed schema, the change feed aligns across the
  * drop, and the unsafe shapes refuse loudly.
  */
class SnapshotDropColumnSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapdrop-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("drop is metadata-only; time travel keeps the column; writes conform") {
    val t = freshTable("basic")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id", "k"))
    val filesBefore = SnapshotLog.manifest(s, t, 1L).files.map(_.path)
    val v = SnapshotLog.dropColumn(s, t, "k")
    assert(v == 2L)
    val m2 = SnapshotLog.manifest(s, t, 2L)
    assert(m2.op == "drop-column")
    assert(m2.files.map(_.path) == filesBefore, "drop moved data")
    // the dropped column's stats are gone; the others survive
    assert(m2.files.forall(f => !f.stats.contains("k")))
    assert(m2.files.forall(f => f.stats.contains("id")))
    val r = SnapshotLog.read(s, t)
    assert(r.columns.toSeq == Seq("id", "payload"))
    assert(r.count() == 100)
    // time travel serves v1 WITH the column
    val v1 = SnapshotLog.read(s, t, Some(1L))
    assert(v1.columns.toSeq == Seq("id", "k", "payload"))
    assert(v1.agg(sum($"k")).head.getLong(0) == (0L until 100).map(_ % 7).sum)
    // appends conform to the narrowed schema
    SnapshotLog.commit(s.range(100, 120).select($"id",
      concat(lit("row"), $"id").as("payload")), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 120)
    // and a pre-drop writer shape (still carrying k) refuses: the
    // table doesn't know that column anymore
    intercept[IllegalArgumentException] {
      SnapshotLog.commit(df(120, 130), t, "append", Seq("id"))
    }
  }

  test("re-ADDING a dropped name serves NULL from pre-drop files — no resurrection") {
    val t = freshTable("readd")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.dropColumn(s, t, "k")
    val ddl = SnapshotLog.manifest(s, t, 2L).schemaDdl
    SnapshotLog.evolveSchema(s, t, ddl + ",k BIGINT")
    val r = SnapshotLog.read(s, t)
    assert(r.columns.toSeq == Seq("id", "payload", "k"))
    assert(r.where($"k".isNotNull).count() == 0,
      "re-added column resurrected the dropped values")
    // new writes carry values under the fresh physical slot
    SnapshotLog.commit(s.range(50, 60).select($"id",
      lit("x").as("payload"), lit(42L).as("k")), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).where($"k" === 42L).count() == 10)
    assert(SnapshotLog.read(s, t).where($"k".isNull).count() == 50)
    // the fresh slot is a REAL mapping entry — visible in the manifest
    val phys = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).physical
    assert(phys.get("k").exists(_ != "k"), s"no fresh physical slot: $phys")
  }

  test("drop composes with rename, the change feed, and incremental reads") {
    val t = freshTable("compose")
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"))          // v1
    SnapshotLog.renameColumn(s, t, "k", "bucket")                  // v2
    SnapshotLog.dropColumn(s, t, "bucket")                         // v3
    SnapshotLog.commit(s.range(40, 50).select($"id",
      lit("y").as("payload")), t, "append", Seq("id"))             // v4
    // feed over the whole range aligns to the END schema: the dropped
    // column is simply absent; row identity is unaffected
    val feed = SnapshotLog.readChangeFeed(s, t, 0L)
    assert(feed.columns.toSet ==
      Set("id", "payload", "_change_type", "_commit_version"))
    assert(feed.where($"_change_type" === "insert").count() == 50)
    // the metadata-only drop itself feeds nothing
    assert(feed.where($"_commit_version" === 3L).count() == 0)
    // the incremental batch read spans the metadata-only DDL with the
    // same END-schema alignment: exactly v4's rows, no dropped column
    val inc = SnapshotLog.readChanges(s, t, 2L, Some(4L))
    assert(inc.columns.toSet == Set("id", "payload"))
    assert(inc.count() == 10)
    assert(inc.agg(org.apache.spark.sql.functions.sum($"id"))
      .head.getLong(0) == (40L until 50).sum)
    // a REWRITE inside the range still refuses loudly
    SnapshotLog.deleteWhere(s, t, "id", 0L, 4L, Seq("id"))         // v5
    val e = intercept[Exception] {
      SnapshotLog.readChanges(s, t, 2L, Some(5L)).count()
    }
    assert(e.getMessage.contains("delete"))
  }

  test("unsafe drops refuse loudly") {
    val t = freshTable("guards")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id", "k"))
    intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "nope") }
    // constrained column
    SnapshotLog.addConstraint(s, t, "k_range", "k BETWEEN 0 AND 6")
    val ec = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "k") }
    assert(ec.getMessage.contains("k_range"))
    SnapshotLog.dropConstraint(s, t, "k_range")
    // layout column
    SnapshotLog.setLayout(s, t, "range", Seq("k"), 2)
    val el = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "k") }
    assert(el.getMessage.contains("layout"))
    SnapshotLog.clearLayout(s, t)
    // eq-delete key
    SnapshotLog.deleteKeysMOR(s.range(5, 8).toDF("k"), t, "k")
    val ee = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "k") }
    assert(ee.getMessage.contains("compact"))
    SnapshotLog.compact(s, t, 1L << 30, Seq("id", "k"))
    SnapshotLog.dropColumn(s, t, "k")
    assert(SnapshotLog.read(s, t).columns.toSeq == Seq("id", "payload"))
    // last-column guard
    val t2 = freshTable("last")
    SnapshotLog.commit(s.range(0, 5).toDF("id"), t2, "append", Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t2, "id") }
  }

  test("SQL: ALTER TABLE DROP COLUMN routes and repoints; re-ADD serves NULL") {
    val t = freshTable("sql")
    SnapshotLog.commit(df(0, 30), t, "append", Seq("id"))
    graft.sql.GraftSql.registerSnapshot(s, "dropv", t, None, Seq("id"))
    graft.sql.GraftSql.dml(s, "ALTER TABLE dropv DROP COLUMN k")
    assert(s.sql("SELECT * FROM dropv").columns.toSeq == Seq("id", "payload"))
    graft.sql.GraftSql.dml(s, "ALTER TABLE dropv ADD COLUMN k BIGINT")
    assert(s.sql("SELECT count(*) FROM dropv WHERE k IS NOT NULL")
      .head.getLong(0) == 0L)
    assert(s.sql("SELECT count(*) FROM dropv").head.getLong(0) == 30L)
  }
}
