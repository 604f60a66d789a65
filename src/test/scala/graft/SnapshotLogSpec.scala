package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** The manifest-log table contract: versioned atomic commits, time
  * travel, relocatable relative paths, crash/conflict behavior, and
  * manifest-level file pruning.
  */
class SnapshotLogSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snaptest-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("append commits version and time travel reads each snapshot") {
    val t = freshTable("tt")
    assert(SnapshotLog.commit(df(0, 100), t, "append", Seq("id")) == 1L)
    assert(SnapshotLog.commit(df(100, 250), t, "append", Seq("id")) == 2L)
    assert(SnapshotLog.latestVersion(s, t).contains(2L))
    assert(SnapshotLog.read(s, t, Some(1)).count() == 100)
    assert(SnapshotLog.read(s, t).count() == 250)
    // exact content, not just counts
    assert(SnapshotLog.read(s, t, Some(1)).agg(sum($"id")).head.getLong(0) == (0L until 100).sum)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) == (0L until 250).sum)
  }

  test("overwrite replaces latest but history stays readable") {
    val t = freshTable("ow")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(1000, 1010), t, "overwrite", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 10)
    assert(SnapshotLog.read(s, t, Some(1)).count() == 50)
    assert(SnapshotLog.read(s, t).agg(min($"id")).head.getLong(0) == 1000L)
  }

  test("crashed commit leaves no visible state; conflicting version refuses") {
    val t = freshTable("crash")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    // a crashed publication = stray tmp manifest; readers must ignore it
    Files.writeString(Paths.get(t, "_log", "v00002.json.tmp-dead"), "{garbage")
    assert(SnapshotLog.latestVersion(s, t).contains(1L))
    assert(SnapshotLog.read(s, t).count() == 10)
    // two committers that both read latest=1 race for v2: the second
    // publication of the same version refuses loudly
    SnapshotLog.commitAs(df(10, 20), t, 2L, "append", Seq("id"))
    intercept[IllegalStateException] {
      SnapshotLog.commitAs(df(20, 30), t, 2L, "append", Seq("id"))
    }
    // the losing committer left no visible state: v2 is the winner's
    assert(SnapshotLog.read(s, t).count() == 20)
  }

  test("table is relocatable (manifest paths are relative)") {
    val t = freshTable("rel")
    SnapshotLog.commit(df(0, 30), t, "append", Seq("id"))
    val moved = freshTable("rel-moved")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(moved))
    Files.move(Paths.get(t), Paths.get(moved))
    assert(SnapshotLog.read(s, moved).count() == 30)
  }

  test("manifest pruning skips non-overlapping files and keeps results exact") {
    val t = freshTable("prune")
    // four range-disjoint files via four commits
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 100, b * 100 + 100).repartition(1), t, "append", Seq("id"))
    val (pruned, kept, total) = SnapshotLog.readPruned(s, t, "id", 150L, 249L)
    assert(total == 4)
    assert(kept == 2, s"[150,249] overlaps exactly files [100,200) and [200,300), got $kept")
    assert(pruned.inputFiles.length == 2) // the scan leaf really only sees 2 files
  }

  test("all-null stats column never prunes") {
    val t = freshTable("nulls")
    val d = s.range(0, 10).select($"id", lit(null).cast("long").as("maybe"))
    SnapshotLog.commit(d, t, "append", Seq("maybe"))
    val (pruned, kept, total) = SnapshotLog.readPruned(s, t, "maybe", 5L, 6L)
    assert(kept == total) // unknown stats: cannot skip
    assert(pruned.count() == 0) // residual predicate still applies
  }

  test("pruned read equals unpruned filtered read") {
    val t = freshTable("prune-eq")
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 100, b * 100 + 100).repartition(1), t, "append", Seq("id"))
    val (pruned, _, _) = SnapshotLog.readPruned(s, t, "id", 150L, 249L)
    val full = SnapshotLog.read(s, t).where($"id".between(150, 249))
    assert(pruned.agg(count(lit(1)), sum($"id")).head.toSeq ==
      full.agg(count(lit(1)), sum($"id")).head.toSeq)
    assert(pruned.count() == 100)
  }
}
