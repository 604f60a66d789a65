package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

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

  test("compact merges small files into a new version; history intact") {
    val t = freshTable("compact")
    for (b <- 0 until 6)
      SnapshotLog.commit(df(b * 10, b * 10 + 10).repartition(1), t, "append", Seq("id"))
    val m0 = SnapshotLog.manifest(s, t, 6L)
    assert(m0.files.size == 6)
    val v = SnapshotLog.compact(s, t, 1L << 20, Seq("id"))
    assert(v.contains(7L))
    val m1 = SnapshotLog.manifest(s, t, 7L)
    assert(m1.files.size < 6) // all 6 tiny files qualified and merged
    // content identical before/after; pre-compaction snapshot unchanged
    assert(SnapshotLog.read(s, t).agg(count(lit(1)), sum($"id")).head.toSeq ==
      SnapshotLog.read(s, t, Some(6)).agg(count(lit(1)), sum($"id")).head.toSeq)
    // stats survive the rewrite: pruning still works on the compacted set
    val (_, kept, total) = SnapshotLog.readPruned(s, t, "id", 0L, 5L)
    assert(kept <= total)
  }

  test("vacuum deletes only unreferenced files") {
    val t = freshTable("vacuum")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    // fake a crashed attempt: orphan data dir with a file
    val orphanDir = Paths.get(t, "data", "v00099-deadbeef")
    Files.createDirectories(orphanDir)
    Files.writeString(orphanDir.resolve("part-orphan.parquet"), "junk")
    val before = SnapshotLog.read(s, t).count()
    val deleted = SnapshotLog.vacuum(s, t)
    assert(deleted == Seq("data/v00099-deadbeef/part-orphan.parquet"))
    assert(!Files.exists(orphanDir)) // empty attempt dir removed too
    assert(SnapshotLog.read(s, t).count() == before) // table untouched
    // a second vacuum is a no-op
    assert(SnapshotLog.vacuum(s, t).isEmpty)
  }

  test("streaming append is exactly-once under epoch replay") {
    val t = freshTable("stream")
    assert(SnapshotLog.appendStreamBatch(df(0, 10), t, 0L, Seq("id")).contains(1L))
    assert(SnapshotLog.appendStreamBatch(df(10, 20), t, 1L, Seq("id")).contains(2L))
    // restart replays epoch 1: must be skipped, not duplicated
    assert(SnapshotLog.appendStreamBatch(df(10, 20), t, 1L, Seq("id")).isEmpty)
    assert(SnapshotLog.read(s, t).count() == 20)
    assert(SnapshotLog.appendStreamBatch(df(20, 30), t, 2L, Seq("id")).contains(3L))
    assert(SnapshotLog.read(s, t).count() == 30)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) == (0L until 30).sum)
  }

  test("stream epochs interleave with batch compaction") {
    val t = freshTable("stream-compact")
    SnapshotLog.appendStreamBatch(df(0, 10).repartition(1), t, 0L, Seq("id"))
    SnapshotLog.appendStreamBatch(df(10, 20).repartition(1), t, 1L, Seq("id"))
    assert(SnapshotLog.compact(s, t, 1L << 20, Seq("id")).isDefined)
    // replay of epoch 1 after compaction (epoch walks past the compact
    // commit to the last stream commit) is still detected
    assert(SnapshotLog.appendStreamBatch(df(10, 20), t, 1L, Seq("id")).isEmpty)
    assert(SnapshotLog.appendStreamBatch(df(20, 25), t, 2L, Seq("id")).isDefined)
    assert(SnapshotLog.read(s, t).count() == 25)
  }

  test("deleteWhere classifies files: kept untouched, aligned drop metadata-only") {
    val t = freshTable("delete")
    // 4 range-bucketed files: [0,25) [25,50) [50,75) [75,100)
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 25, b * 25 + 25).repartition(1), t, "append", Seq("id"))
    val m0 = SnapshotLog.manifest(s, t, 4L)
    // delete [25, 60]: file 2 fully covered (dropped, never read),
    // file 3 partially (rewritten), files 1 and 4 disjoint (kept)
    val st = SnapshotLog.deleteWhere(s, t, "id", 25L, 60L, Seq("id")).get
    assert(st == SnapshotLog.MutationStats(5L, 2, 1, 1))
    val m1 = SnapshotLog.manifest(s, t, 5L)
    // kept files are the parent's very entries — no rewrite happened
    assert(m0.files.map(_.path).toSet.intersect(m1.files.map(_.path).toSet).size == 2)
    assert(SnapshotLog.read(s, t).count() == 100 - 36)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
      (0L until 100).filterNot(i => i >= 25 && i <= 60).sum)
    // time travel still serves the pre-delete snapshot
    assert(SnapshotLog.read(s, t, Some(4)).count() == 100)
    // a delete matching nothing commits nothing
    assert(SnapshotLog.deleteWhere(s, t, "id", 5000L, 6000L, Seq("id")).isEmpty)
    assert(SnapshotLog.latestVersion(s, t).contains(5L))
  }

  test("upsert rewrites only files an update key lands in; inserts are free") {
    val t = freshTable("upsert")
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 25, b * 25 + 25).repartition(1), t, "append", Seq("id"))
    val m0 = SnapshotLog.manifest(s, t, 4L)
    // updates hit file 2 only ([25,50)); inserts land beyond every file
    val updates = df(30, 35).withColumn("payload", lit("UPDATED"))
      .unionByName(df(1000, 1003))
    val st = SnapshotLog.upsert(updates, t, "id", Seq("id"))
    assert(st == SnapshotLog.MutationStats(5L, 3, 0, 1))
    val m1 = SnapshotLog.manifest(s, t, 5L)
    assert(m0.files.map(_.path).toSet.intersect(m1.files.map(_.path).toSet).size == 3)
    assert(SnapshotLog.read(s, t).count() == 103) // 100 + 3 inserts, no dup keys
    assert(SnapshotLog.read(s, t).where($"payload" === "UPDATED").count() == 5)
    assert(SnapshotLog.read(s, t).where($"id" >= 1000).count() == 3)
    // untouched rows of the rewritten file survive
    assert(SnapshotLog.read(s, t).where($"id".between(25, 49)).count() == 25)
    // latest-wins: no key appears twice
    assert(SnapshotLog.read(s, t).groupBy($"id").count().where($"count" > 1).count() == 0)
    // empty updates: no commit
    assert(SnapshotLog.upsert(updates.limit(0), t, "id", Seq("id")).version == 5L)
  }

  test("readChanges returns exactly the rows a version range added") {
    val t = freshTable("changes")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    SnapshotLog.commit(df(100, 150), t, "append", Seq("id"))
    SnapshotLog.appendStreamBatch(df(150, 160), t, 0L, Seq("id"))
    val inc = SnapshotLog.readChanges(s, t, 1L)
    assert(inc.count() == 60)
    assert(inc.agg(min($"id"), max($"id")).head.toSeq == Seq(100L, 159L))
    // incremental consumption in steps covers the table exactly once
    val steps = (0L until 3L).map(v =>
      SnapshotLog.readChanges(s, t, v, Some(v + 1)))
    assert(steps.map(_.count()).sum == SnapshotLog.read(s, t).count())
    // a rewriting version in the range refuses: the diff would lie
    SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotLog.readChanges(s, t, 1L)
    }
    // ranges past the rewrite work again
    assert(SnapshotLog.readChanges(s, t, 4L).count() == 0)
  }

  test("schema evolution: explicit, metadata-only, additive; old files read null") {
    val t = freshTable("evolve")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    // an append smuggling a new column is rejected — schema changes go
    // through evolveSchema, never ride in on a write
    intercept[IllegalArgumentException] {
      SnapshotLog.commit(df(10, 20).withColumn("extra", $"id" * 2), t,
        "append", Seq("id"))
    }
    val widened = SnapshotLog.manifest(s, t, 1L).schemaDdl + ",extra BIGINT"
    assert(SnapshotLog.evolveSchema(s, t, widened) == 2L)
    // the evolve touched no data: same files, one new manifest
    assert(SnapshotLog.manifest(s, t, 2L).files ==
      SnapshotLog.manifest(s, t, 1L).files)
    SnapshotLog.commit(df(10, 20).withColumn("extra", $"id" * 2), t,
      "append", Seq("id"))
    val latest = SnapshotLog.read(s, t)
    assert(latest.columns.contains("extra"))
    assert(latest.where($"extra".isNull).count() == 10) // old files
    assert(latest.where($"extra" === $"id" * 2).count() == 10)
    // time travel serves the old version with its OWN schema
    assert(!SnapshotLog.read(s, t, Some(1)).columns.contains("extra"))
    // a writer predating the evolve keeps working: missing nullable
    // column null-fills
    SnapshotLog.commit(df(20, 25), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).where($"extra".isNull).count() == 15)
    // non-additive evolution is refused loudly
    intercept[IllegalArgumentException] { // type change
      SnapshotLog.evolveSchema(s, t, "id BIGINT,k STRING,payload STRING,extra BIGINT,x2 STRING")
    }
    intercept[IllegalArgumentException] { // dropped column
      SnapshotLog.evolveSchema(s, t, "id BIGINT,k BIGINT,x2 STRING")
    }
    intercept[IllegalArgumentException] { // nothing added
      SnapshotLog.evolveSchema(s, t, SnapshotLog.manifest(s, t, 2L).schemaDdl)
    }
  }

  test("KMV sketches give metadata-only NDV; merge dedupes across files") {
    val t = freshTable("ndv")
    // the same 5 k-values land in BOTH files: an additive merge would
    // report ~10, the KMV union must report the exact 5 (< K: exact path)
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"), ndvCols = Seq("k"))
    SnapshotLog.commit(df(40, 80), t, "append", Seq("id"), ndvCols = Seq("k"))
    val st = SnapshotLog.tableStats(s, t)
    assert(st.approxNdv("k") == 7.0) // ids 0..79 cover k = id % 7 fully
    // a column no sketch was requested for is absent, not zero
    assert(!st.approxNdv.contains("id"))
    // a file without the sketch makes the column unreportable (never a
    // silent under-count)
    SnapshotLog.commit(df(80, 90), t, "append", Seq("id"))
    assert(!SnapshotLog.tableStats(s, t).approxNdv.contains("k"))
    // sketches round-trip the manifest JSON (delta encoding included)
    val m = SnapshotLog.manifest(s, t, 2L)
    assert(m.files.forall(_.ndvs.contains("k")))
  }

  test("timestamp time travel resolves the newest version at or before the instant") {
    val t = freshTable("asof")
    val before = System.currentTimeMillis() - 1
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    Thread.sleep(15)
    val t1 = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotLog.commit(df(10, 30), t, "append", Seq("id"))
    assert(SnapshotLog.versionAt(s, t, t1).contains(1L))
    assert(SnapshotLog.readAsOf(s, t, t1).count() == 10)
    assert(SnapshotLog.readAsOf(s, t, System.currentTimeMillis()).count() == 30)
    // before the table existed: loud, not empty
    assert(SnapshotLog.versionAt(s, t, before).isEmpty)
    intercept[IllegalArgumentException] { SnapshotLog.readAsOf(s, t, before) }
    // expired history stops resolving (retention bounds the lookback)
    SnapshotLog.commit(df(30, 40), t, "append", Seq("id"))
    (1 to 9).foreach(i =>
      SnapshotLog.commit(df(40 + i * 10, 50 + i * 10), t, "append", Seq("id")))
    SnapshotLog.expireVersions(s, t, keepLast = 2)
    assert(SnapshotLog.versionAt(s, t, t1).isEmpty)
  }

  test("evolution interacts with mutation ops: upsert, delete, compact, streams") {
    val t = freshTable("evolve-mix")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    SnapshotLog.evolveSchema(s, t,
      SnapshotLog.manifest(s, t, 1L).schemaDdl + ",extra BIGINT")
    SnapshotLog.commit(df(20, 30).withColumn("extra", $"id" * 2), t,
      "append", Seq("id"))
    // upsert spanning a pre-evolution file: update columns carry the
    // evolved schema; rewritten old rows materialize extra=null
    val ups = Seq((5L, 5L, "up5", java.lang.Long.valueOf(500L)),
      (25L, 4L, "up25", java.lang.Long.valueOf(2500L)),
      (100L, 2L, "new100", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "k", "payload", "extra")
    SnapshotLog.upsert(ups, t, "id", Seq("id"))
    val after = SnapshotLog.read(s, t)
    assert(after.count() == 31)
    assert(after.where($"id" === 5L && $"payload" === "up5" && $"extra" === 500L).count() == 1)
    assert(after.where($"id" === 100L && $"extra".isNull).count() == 1)
    // untouched pre-evolution rows still serve null
    assert(after.where($"id" === 6L && $"extra".isNull).count() == 1)
    // range delete classified from stats works across the boundary
    SnapshotLog.deleteWhere(s, t, "id", 10L, 12L, Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 28)
    // a stream append missing the evolved column null-fills
    SnapshotLog.appendStreamBatch(df(200, 205), t, 0L, Seq("id"))
    // compaction rewrites everything under the evolved schema
    SnapshotLog.compact(s, t, 1L << 20, Seq("id"))
    val fin = SnapshotLog.read(s, t)
    assert(fin.count() == 33)
    assert(fin.where($"extra".isNotNull).count() == 11) // 9 appended + 2 upserted
    // time travel before the evolve still reads the 3-column schema
    assert(!SnapshotLog.read(s, t, Some(1L)).columns.contains("extra"))
  }

  test("tableStats answers count/min/max from the manifest alone") {
    val t = freshTable("stats")
    SnapshotLog.commit(df(5, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(50, 100), t, "append", Seq("id"))
    val st = SnapshotLog.tableStats(s, t)
    assert(st.rows == 95 && st.files >= 2 && st.bytes > 0)
    assert(st.colRanges("id") == (5L, 99L))
    assert(SnapshotLog.tableStats(s, t, Some(1)).rows == 45)
    // an all-null file carries no stats and contributes no non-null
    // value — the folded range stays exact
    val t2 = freshTable("stats-null")
    SnapshotLog.commit(df(0, 10).withColumn("maybe", lit(null).cast("long")),
      t2, "append", Seq("id", "maybe"))
    SnapshotLog.commit(df(10, 20).withColumn("maybe", $"id" + 100),
      t2, "append", Seq("id", "maybe"))
    assert(SnapshotLog.tableStats(s, t2).colRanges("maybe") == (110L, 119L))
  }

  test("concurrent appenders all succeed via retry; history stays linear") {
    val t = freshTable("concurrent")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = SnapshotLog.commitWithRetry(
            df(i * 10, i * 10 + 10), t, "append", Seq("id"))
        })
      }
      assert(futures.map(_.get()).sorted == (1L to 8L).toSeq)
      assert(SnapshotLog.read(s, t).count() == 80)
      assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
        (0L until 80).sum)
      // every intermediate version is readable and appends exactly once
      assert((1L to 8L).map(v => SnapshotLog.read(s, t, Some(v)).count()) ==
        (1L to 8L).map(_ * 10))
      // losing attempts' data dirs are vacuumable debris, never corruption
      SnapshotLog.vacuum(s, t)
      assert(SnapshotLog.read(s, t).count() == 80)
    } finally pool.shutdown()
  }

  test("32 mixed writers on 8 threads: linear history, no lost evolve, exact content") {
    val t = freshTable("stress")
    // base: ids 0..99, k = id % 7
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    // generic CAS retry for ops without built-in retry (evolve, upsert);
    // upsert additionally re-reads the CURRENT schema per attempt, since
    // a racing evolve legitimately changes the required column set
    def retrying[A](op: () => A): A = {
      var n = 0
      while (true) {
        try return op()
        catch {
          case _: IllegalStateException if n < 40 => n += 1
          case e: IllegalArgumentException
            if n < 40 && e.getMessage != null &&
              e.getMessage.contains("columns") => n += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
    try {
      val tasks: Seq[java.util.concurrent.Callable[Unit]] =
        // 24 appends of disjoint ranges [1000+i*10, +10)
        (0 until 24).map { i =>
          new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              SnapshotLog.commitWithRetry(
                df(1000 + i * 10, 1000 + i * 10 + 10), t, "append", Seq("id"))
              ()
            }
          }
        } ++
          // 6 upserts over disjoint base keys [j*5, j*5+5) -> k = 100+j
          (0 until 6).map { j =>
            new java.util.concurrent.Callable[Unit] {
              def call(): Unit = retrying { () =>
                val schema = org.apache.spark.sql.types.StructType.fromDDL(
                  SnapshotLog.manifest(s, t,
                    SnapshotLog.latestVersion(s, t).get).schemaDdl)
                val base = df(j * 5, j * 5 + 5).withColumn("k", lit(100L + j))
                val conformed = s.createDataFrame(base.rdd, base.schema) // stable
                  .select(schema.fieldNames.map(n =>
                    if (base.columns.contains(n)) col(n)
                    else lit(null).cast(schema(n).dataType).as(n)).toIndexedSeq: _*)
                SnapshotLog.upsert(conformed, t, "id", Seq("id"))
                ()
              }
            }
          } ++
          // 2 evolves adding distinct columns — BOTH must survive
          Seq("extra_a", "extra_b").map { c =>
            new java.util.concurrent.Callable[Unit] {
              def call(): Unit = retrying { () =>
                val ddl = SnapshotLog.manifest(s, t,
                  SnapshotLog.latestVersion(s, t).get).schemaDdl
                SnapshotLog.evolveSchema(s, t, ddl + s",$c STRING")
                ()
              }
            }
          }
      import scala.jdk.CollectionConverters._
      val futures = pool.invokeAll(tasks.asJava)
      futures.asScala.foreach(_.get()) // propagate any failure
      // linear history: exactly 1 base + 32 ops, every version readable
      val latest = SnapshotLog.latestVersion(s, t).get
      assert(latest == 33L, s"expected 33 versions, got $latest")
      (1L to latest).foreach(v => SnapshotLog.read(s, t, Some(v)).count())
      // no lost evolve: both added columns present in the final schema
      val finalSchema = org.apache.spark.sql.types.StructType.fromDDL(
        SnapshotLog.manifest(s, t, latest).schemaDdl)
      assert(finalSchema.fieldNames.contains("extra_a") &&
        finalSchema.fieldNames.contains("extra_b"),
        s"lost evolve: ${finalSchema.fieldNames.toSeq}")
      // exact content: 100 base + 240 appended rows; each upserted key
      // holds ITS upsert's k (disjoint ranges -> no last-wins ambiguity)
      val fin = SnapshotLog.read(s, t)
      assert(fin.count() == 340)
      assert(fin.agg(sum($"id")).head.getLong(0) ==
        (0L until 100).sum + (1000L until 1240).sum)
      (0 until 6).foreach { j =>
        val ks = fin.where($"id" >= j * 5 && $"id" < j * 5 + 5)
          .select($"k").distinct().collect().map(_.getLong(0)).toSeq
        assert(ks == Seq(100L + j), s"upsert $j keys: $ks")
      }
      // untouched base keys keep their original k
      assert(fin.where($"id" === 50L).head.getLong(1) == 50L % 7)
      // losing attempts are vacuumable debris, never corruption
      SnapshotLog.vacuum(s, t)
      assert(SnapshotLog.read(s, t).count() == 340)
    } finally pool.shutdown()
  }

  test("tags pin versions immutably, survive races, and guard retention") {
    val t = freshTable("tags")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.commit(df(10, 30), t, "append", Seq("id"))
    assert(SnapshotLog.createTag(s, t, "v1-tag", Some(1L)) == 1L)
    assert(SnapshotLog.createTag(s, t, "latest-tag") == 2L) // default: latest
    assert(SnapshotLog.readTag(s, t, "v1-tag").count() == 10)
    assert(SnapshotLog.readTag(s, t, "latest-tag").count() == 30)
    // immutable: re-creating refuses; dangling version refuses
    intercept[IllegalArgumentException] {
      SnapshotLog.createTag(s, t, "v1-tag", Some(2L))
    }
    intercept[Exception] { SnapshotLog.createTag(s, t, "dangling", Some(99L)) }
    intercept[IllegalArgumentException] { SnapshotLog.readTag(s, t, "nope") }
    // retention: keepLast=1 would expire v1, but the tag holds it
    SnapshotLog.commit(df(30, 40), t, "append", Seq("id"))
    assert(SnapshotLog.expireVersions(s, t, 1)._1.isEmpty)
    assert(SnapshotLog.readTag(s, t, "v1-tag").count() == 10)
    // deleting the tag releases the guard
    SnapshotLog.deleteTag(s, t, "v1-tag")
    SnapshotLog.deleteTag(s, t, "latest-tag")
    intercept[IllegalArgumentException] { SnapshotLog.deleteTag(s, t, "v1-tag") }
    // concurrent tag creation on DIFFERENT names: both survive (the
    // CAS re-read/re-merge, not last-writer-wins)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      import scala.jdk.CollectionConverters._
      val calls: Seq[java.util.concurrent.Callable[Long]] =
        (0 until 8).map { i =>
          new java.util.concurrent.Callable[Long] {
            def call(): Long = SnapshotLog.createTag(s, t, s"race-$i", Some(1L + i % 3))
          }
        }
      pool.invokeAll(calls.asJava).asScala.foreach(_.get())
      assert(SnapshotLog.tags(s, t).keySet == (0 until 8).map(i => s"race-$i").toSet)
    } finally pool.shutdown()
  }

  test("sidecar generations past the zero padding keep newest-wins and a safe sweep") {
    val t = freshTable("sidecar-gen")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.addConstraint(s, t, "first", "id >= 0")
    // simulate a long-lived table whose sidecar generation outgrew the
    // %05d padding: lexicographically "v100000" < "v99999", so a
    // name-compared sweep would delete the NEWEST file
    val logDir = Paths.get(t, "_log")
    val cur = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_constraints.v")).toSeq.head
    Files.move(logDir.resolve(cur), logDir.resolve("_constraints.v99999.json"))
    Files.deleteIfExists(logDir.resolve("." + cur + ".crc"))
    SnapshotLog.addConstraint(s, t, "second", "id < 1000000")
    assert(SnapshotLog.constraints(s, t).keySet == Set("first", "second"),
      "the newest sidecar generation was lost to the sweep")
    SnapshotLog.addConstraint(s, t, "third", "id IS NOT NULL OR id IS NULL")
    assert(SnapshotLog.constraints(s, t).keySet ==
      Set("first", "second", "third"))
  }

  test("branches: zero-copy fork, isolated writes, WAP fast-forward, safe teardown") {
    val t = freshTable("branch")
    SnapshotLog.commit(df(0, 100).repartition(4, $"id"), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "load")
    assert(SnapshotLog.listBranches(s, t) == Seq("load"))
    // the fork shares the parent's files by reference: same content,
    // and the branch dir holds NO data yet
    assert(SnapshotLog.read(s, bt).count() == 100)
    assert(!Files.exists(Paths.get(bt, "data")))
    // writes land on the branch only
    SnapshotLog.commit(df(100, 120), bt, "append", Seq("id"))
    SnapshotLog.deleteWhere(s, bt, "id", 0L, 9L, Seq("id"))
    assert(SnapshotLog.read(s, bt).count() == 110)
    assert(SnapshotLog.read(s, t).count() == 100) // main untouched
    // DV delete on the branch masks PARENT-referenced files in place
    assert(SnapshotLog.deleteWhereDV(s, bt, "id", 20L, 24L).isDefined)
    assert(SnapshotLog.read(s, bt).count() == 105)
    assert(SnapshotLog.read(s, bt).agg(sum($"id")).head.getLong(0) ==
      (10L until 120).sum - (20L until 25).sum)
    assert(SnapshotLog.read(s, t).count() == 100)
    // duplicate fork and nested fork refuse
    intercept[IllegalArgumentException] { SnapshotLog.createBranch(s, t, "load") }
    intercept[IllegalArgumentException] { SnapshotLog.createBranch(s, bt, "sub") }
    // WAP publish: one metadata-only commit makes main = branch
    val v = SnapshotLog.fastForward(s, t, "load")
    assert(v == 2L)
    assert(SnapshotLog.read(s, t).count() == 105)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
      SnapshotLog.read(s, bt).agg(sum($"id")).head.getLong(0))
    assert(SnapshotLog.read(s, t, Some(1)).count() == 100) // history intact
    // a second fast-forward refuses (main advanced past the fork base)
    intercept[IllegalArgumentException] { SnapshotLog.fastForward(s, t, "load") }
    // teardown refuses while main references branch-local files...
    intercept[IllegalArgumentException] { SnapshotLog.dropBranch(s, t, "load") }
    // ...until compaction migrates them into root data and the
    // referencing history expires
    SnapshotLog.compact(s, t, Long.MaxValue, Seq("id"))
    SnapshotLog.expireVersions(s, t, 1)
    SnapshotLog.dropBranch(s, t, "load")
    assert(SnapshotLog.listBranches(s, t).isEmpty)
    assert(SnapshotLog.read(s, t).count() == 105) // content survives the drop
  }

  test("append-only branches rebase onto an advanced main; mutating branches refuse") {
    val t = freshTable("branch-rebase")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.createBranch(s, t, "load")
    val bt = SnapshotLog.branchPath(t, "load")
    SnapshotLog.commit(df(100, 120), bt, "append", Seq("id"))
    // main advances during the load: publish refuses
    SnapshotLog.commit(df(50, 60), t, "append", Seq("id"))
    intercept[IllegalArgumentException] { SnapshotLog.fastForward(s, t, "load") }
    // rebase re-points the fork (metadata-only) and keeps the adds
    SnapshotLog.rebaseBranch(s, t, "load")
    assert(SnapshotLog.read(s, bt).count() == 80) // 60 main + 20 branch
    // idempotence guard: already based on latest
    intercept[IllegalArgumentException] { SnapshotLog.rebaseBranch(s, t, "load") }
    val v = SnapshotLog.fastForward(s, t, "load")
    assert(SnapshotLog.read(s, t).count() == 80)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
      (0L until 60).sum + (100L until 120).sum)
    assert(v == 3L)
    // a branch that MUTATED shared history cannot rebase
    SnapshotLog.createBranch(s, t, "scrub")
    val st = SnapshotLog.branchPath(t, "scrub")
    SnapshotLog.deleteWhere(s, st, "id", 0L, 9L, Seq("id"))
    SnapshotLog.commit(df(500, 501), t, "append", Seq("id"))
    intercept[IllegalArgumentException] { SnapshotLog.rebaseBranch(s, t, "scrub") }
  }

  test("root vacuum and expiry treat live-branch references as live") {
    val t = freshTable("branch-retain")
    SnapshotLog.commit(df(0, 50).repartition(2, $"id"), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "fork")
    // main moves on: overwrite drops every v1 file from main's view
    SnapshotLog.commit(df(1000, 1010), t, "overwrite", Seq("id"))
    // vacuum must keep v1's files (the branch still reads them)
    assert(SnapshotLog.vacuum(s, t).isEmpty)
    assert(SnapshotLog.read(s, bt).count() == 50)
    // expiry drops v1's manifest but NOT its branch-referenced data
    val (expired, deleted) = SnapshotLog.expireVersions(s, t, 1)
    assert(expired == Seq(1L))
    assert(deleted.isEmpty, s"branch-referenced files deleted: $deleted")
    assert(SnapshotLog.read(s, bt).count() == 50)
    assert(SnapshotLog.read(s, bt).agg(sum($"id")).head.getLong(0) ==
      (0L until 50).sum)
  }

  test("clustered compaction makes range pruning effective") {
    val t = freshTable("cluster")
    // 4 commits of interleaved ids (id % 4 == b): every file spans the
    // whole id range, so a narrow range predicate can prune NOTHING
    for (b <- 0 until 4)
      SnapshotLog.commit(df(0, 400).where($"id" % 4 === b).repartition(1),
        t, "append", Seq("id"))
    val (_, keptBefore, totalBefore) =
      SnapshotLog.readPruned(s, t, "id", 0L, 40L)
    assert(keptBefore == 4 && totalBefore == 4) // layout defeats stats
    // clustering rewrite into a 2-file byte budget: range-partition +
    // sort on id, so each output owns a disjoint id interval
    val totalBytes = SnapshotLog.manifest(s, t, 4L).files.map(_.bytes).sum
    val v = SnapshotLog.compact(s, t, totalBytes / 2 + 1, Seq("id"),
      clusterBy = Seq("id")).get
    val (pruned, keptAfter, totalAfter) =
      SnapshotLog.readPruned(s, t, "id", 0L, 40L)
    assert(totalAfter == 2, s"expected 2 clustered files, got $totalAfter")
    assert(keptAfter == 1, s"clustered layout still scans $keptAfter/$totalAfter")
    // content identical through the clustering rewrite
    assert(SnapshotLog.read(s, t).agg(count(lit(1)), sum($"id")).head.toSeq ==
      SnapshotLog.read(s, t, Some(v - 1)).agg(count(lit(1)), sum($"id")).head.toSeq)
    assert(pruned.count() == 41)
  }

  test("readPoint: bloom skips in-range absent keys, never present ones") {
    val t = freshTable("bloom")
    // two files holding only EVEN ids — every odd id is inside a file's
    // [min,max] but absent, the case range stats cannot skip
    SnapshotLog.commit(df(0, 100).where($"id" % 2 === 0).repartition(1), t,
      "append", Seq("id"), Seq("id"))
    SnapshotLog.commit(df(100, 200).where($"id" % 2 === 0).repartition(1), t,
      "append", Seq("id"), Seq("id"))
    // present keys: always found (one-sided), bloom opens ⊆ range set
    for (k <- Seq(0L, 48L, 102L, 198L)) {
      val (rows, opened, range, total) = SnapshotLog.readPoint(s, t, "id", k)
      assert(rows.count() == 1 && opened == 1 && range == 1 && total == 2,
        s"k=$k opened=$opened range=$range")
    }
    // in-range absent keys skip both files (50 keys in 4096 bits: FP≈0,
    // and deterministic for this fixed fixture)
    val opens = (1L to 17L by 2).map { k =>
      val (rows, opened, range, _) = SnapshotLog.readPoint(s, t, "id", k)
      assert(rows.count() == 0 && range == 1)
      opened
    }
    assert(opens.sum == 0, s"bloom failed to skip: $opens")
    // outside every range: bloom never consulted
    val (_, o2, r2, _) = SnapshotLog.readPoint(s, t, "id", 5000L)
    assert(o2 == 0 && r2 == 0)
    // a bloom-less table still answers point lookups (range-only)
    val t2 = freshTable("bloom-less")
    SnapshotLog.commit(df(0, 50), t2, "append", Seq("id"))
    val (rows2, o3, r3, _) = SnapshotLog.readPoint(s, t2, "id", 7L)
    assert(rows2.count() == 1 && o3 == r3)
  }

  test("readSemiJoin prunes to the files a key batch actually lands in") {
    val t = freshTable("semijoin")
    // four range-disjoint files of EVEN ids with blooms
    (0 until 4).foreach(b => SnapshotLog.commit(
      df(b * 100L, b * 100L + 100).where($"id" % 2 === 0).repartition(1),
      t, "append", Seq("id"), Seq("id")))
    // keys land in files 0 and 2 only — exact candidacy keeps 2 of 4,
    // and never the span-between files a coarse [lo,hi] test would keep
    val keys = Seq(4L, 40L, 204L, 250L).toDF("k")
    val (rows, opened, cand, total) =
      SnapshotLog.readSemiJoin(s, t, "id", keys, "k")
    assert(total == 4 && cand == 2 && opened == 2)
    assert(rows.select($"id").collect().map(_.getLong(0)).sorted
      === Array(4L, 40L, 204L, 250L))
    // in-range ABSENT keys: range candidacy keeps the file, the bloom
    // probe drops it — zero files open, zero rows, never a false miss
    val odd = Seq(5L, 41L, 205L).toDF("k")
    val (rows2, o2, c2, _) = SnapshotLog.readSemiJoin(s, t, "id", odd, "k")
    assert(rows2.count() == 0 && o2 == 0 && c2 == 2,
      s"opened=$o2 cand=$c2")
    // empty key batch: nothing scans
    val (rows3, o3, c3, _) =
      SnapshotLog.readSemiJoin(s, t, "id", Seq.empty[Long].toDF("k"), "k")
    assert(rows3.count() == 0 && o3 == 0 && c3 == 0)
    // duplicate keys don't multiply rows (semi-join semantics)
    val dup = Seq(4L, 4L, 4L).toDF("k")
    val (rows4, _, _, _) = SnapshotLog.readSemiJoin(s, t, "id", dup, "k")
    assert(rows4.count() == 1)
  }

  test("restore is a metadata-only rollback; history reports every commit") {
    val t = freshTable("restore")
    SnapshotLog.commit(df(0, 30), t, "append", Seq("id"))
    SnapshotLog.commit(df(30, 60), t, "append", Seq("id"))
    SnapshotLog.commit(df(1000, 1005), t, "overwrite", Seq("id"))
    // oops — roll back to version 2 without touching data
    val filesBefore = SnapshotLog.manifest(s, t, 2L).files.map(_.path)
    assert(SnapshotLog.restore(s, t, 2L) == 4L)
    assert(SnapshotLog.read(s, t).count() == 60)
    assert(SnapshotLog.manifest(s, t, 4L).files.map(_.path) == filesBefore)
    // the bad version stays readable; a restore is itself undoable
    assert(SnapshotLog.read(s, t, Some(3)).count() == 5)
    SnapshotLog.restore(s, t, 3L)
    assert(SnapshotLog.read(s, t).count() == 5)
    // history reports one row per commit with the op chain
    val h = SnapshotLog.history(s, t).orderBy($"version")
      .select($"op", $"n_rows").as[(String, Long)].collect().toSeq
    assert(h == Seq(("append", 30L), ("append", 60L), ("overwrite", 5L),
      ("restore", 60L), ("restore", 5L)))
    // vacuum after restore keeps every referenced file
    SnapshotLog.vacuum(s, t)
    assert(SnapshotLog.read(s, t, Some(2)).count() == 60)
  }

  test("maintenance racing committers: loser throws, table never corrupts") {
    val t = freshTable("race")
    for (b <- 0 until 6)
      SnapshotLog.commit(df(b * 10, b * 10 + 10).repartition(1), t, "append", Seq("id"))
    // compact and an appender race for the same version: exactly one
    // wins the rename CAS; the compact loser surfaces the conflict
    // (callers re-run maintenance), the retry-committer always lands
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 4) {
        val compactF = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
          def call(): Option[Long] =
            try SnapshotLog.compact(s, t, 1L << 20, Seq("id"))
            catch { case _: IllegalStateException => None } // lost the race
        })
        val appendF = pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = SnapshotLog.commitWithRetry(
            df(100 + round * 10, 110 + round * 10), t, "append", Seq("id"))
        })
        appendF.get(); compactF.get()
        // whatever interleaving happened, the table answers correctly
        val expect = 60 + (round + 1) * 10
        assert(SnapshotLog.read(s, t).count() == expect,
          s"round $round: row count diverged")
      }
      assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
        (0L until 60).sum + (100L until 140).sum)
      // history is linear: versions 1..latest all present and readable
      val latest = SnapshotLog.latestVersion(s, t).get
      (1L to latest).foreach(v => SnapshotLog.manifest(s, t, v))
    } finally pool.shutdown()
  }

  test("per-file null counts ride the manifest and prune IS NULL / IS NOT NULL") {
    import org.apache.spark.sql.sources.{IsNotNull, IsNull}
    val t = freshTable("nulls")
    // three files: band all-null / fully populated / half-null
    SnapshotLog.commit(s.range(0, 50).select($"id",
      lit(null).cast("long").as("band")).coalesce(1), t, "append",
      Seq("id", "band"))
    SnapshotLog.commit(s.range(50, 100).select($"id",
      ($"id" % 9).as("band")).coalesce(1), t, "append", Seq("id", "band"))
    SnapshotLog.commit(s.range(100, 150).select($"id",
      when($"id" % 2 === 0, $"id" % 9).as("band")).coalesce(1), t,
      "append", Seq("id", "band"))
    // exact counts round-trip through the manifest (footer-harvested)
    val m = SnapshotLog.manifest(s, t, 3L)
    assert(m.files.map(_.nulls("band")).sorted == Seq(0L, 25L, 50L))
    assert(m.files.forall(_.nulls("id") == 0L))
    // IS NULL skips the fully-populated file; IS NOT NULL the all-null
    val (dfN, keptN, total) = SnapshotLog.readFiltered(s, t, Seq(IsNull("band")))
    assert((keptN, total) == ((2, 3)) && dfN.count() == 75)
    val (dfNN, keptNN, _) = SnapshotLog.readFiltered(s, t, Seq(IsNotNull("band")))
    assert(keptNN == 2 && dfNN.count() == 75)
    // combined with a range: conjunction prunes on both stats kinds
    val (dfC, keptC, _) = SnapshotLog.readFiltered(s, t,
      Seq(IsNotNull("band"),
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 100L)))
    assert(keptC == 1 && dfC.count() == 25)
    // null counts survive the delta encoding (v2/v3 are deltas)
    assert(!SnapshotLog.isCheckpoint(s, t, 3L))
    // metadata-only aggregate: count(*) WHERE band IS NULL, zero reads
    val st = SnapshotLog.tableStats(s, t)
    assert(st.nullCounts("band") == 75L && st.nullCounts("id") == 0L)
  }

  test("IN-list pruning runs the two-tier test per value (ranges, then Blooms)") {
    import org.apache.spark.sql.sources.In
    val t = freshTable("inlist")
    // two bloomed files of even ids: [0,98] and [100,198]
    SnapshotLog.commit(s.range(0, 50).select(($"id" * 2).as("id")).coalesce(1),
      t, "append", Seq("id"), Seq("id"))
    SnapshotLog.commit(s.range(50, 100).select(($"id" * 2).as("id")).coalesce(1),
      t, "append", Seq("id"), Seq("id"))
    // present key in file 2 + absent odd key inside file 1's range:
    // ranges keep both, the Bloom drops file 1
    val (df, kept, total) = SnapshotLog.readFiltered(s, t,
      Seq(In("id", Array(120L, 33L))))
    assert((kept, total) == ((1, 2)))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(120L))
    // all probes outside every range: nothing opens
    val (df2, kept2, _) = SnapshotLog.readFiltered(s, t,
      Seq(In("id", Array(-5L, 1000L))))
    assert(kept2 == 0 && df2.count() == 0)
    // EqualTo gets the same Bloom tier
    val (df3, kept3, _) = SnapshotLog.readFiltered(s, t,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 33L)))
    assert(kept3 == 0 && df3.count() == 0)
    // a CROSS-TYPED probe (Integer vs the long column) must never let
    // the Bloom's string-rendering mismatch ("120" would match here,
    // but the guard is typed, not lucky) lose rows: the range tier
    // keeps the file and the row comes back
    val (df4, kept4, _) = SnapshotLog.readFiltered(s, t,
      Seq(org.apache.spark.sql.sources.EqualTo("id",
        java.lang.Integer.valueOf(120))))
    assert(kept4 == 1 && df4.collect().map(_.getLong(0)).toSeq == Seq(120L))
  }

  test("CHECK constraints guard every row-adding path, Delta null semantics") {
    val t = freshTable("constraints")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    // registering validates the EXISTING table first
    intercept[IllegalArgumentException] {
      SnapshotLog.addConstraint(s, t, "impossible", "id < 0")
    }
    SnapshotLog.addConstraint(s, t, "id_bound", "id < 1000")
    SnapshotLog.addConstraint(s, t, "k_range", "k BETWEEN 0 AND 6")
    assert(SnapshotLog.constraints(s, t).keySet == Set("id_bound", "k_range"))
    // a valid append lands; a violating one refuses BEFORE publishing
    SnapshotLog.commit(df(50, 60), t, "append", Seq("id"))
    val vBefore = SnapshotLog.latestVersion(s, t).get
    intercept[IllegalArgumentException] {
      SnapshotLog.commit(df(2000, 2010), t, "append", Seq("id"))
    }
    assert(SnapshotLog.latestVersion(s, t).get == vBefore)
    // upsert, retry-append, and stream-append enforce too
    intercept[IllegalArgumentException] {
      SnapshotLog.upsert(df(0, 1).withColumn("k", lit(99L)), t, "id", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.commitWithRetry(df(3000, 3001), t, "append", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.appendStreamBatch(df(5000, 5001), t, 99L, Seq("id"))
    }
    // CDC: a violating UPSERT refuses; a DELETE row is exempt (it
    // removes, it cannot violate a CHECK)
    intercept[IllegalArgumentException] {
      SnapshotLog.applyChanges(Seq((3000L, 1L, "x", "U"))
        .toDF("id", "k", "payload", "op"), t, "id")
    }
    SnapshotLog.applyChanges(Seq((5L, 99L, "x", "D"))
      .toDF("id", "k", "payload", "op"), t, "id")
    // NULL passes (Delta semantics)
    SnapshotLog.commit(s.range(100, 101).select($"id",
      lit(null).cast("long").as("k"), lit("p").as("payload")), t,
      "append", Seq("id"))
    // drop releases the guard; the surviving constraint still binds
    SnapshotLog.dropConstraint(s, t, "id_bound")
    SnapshotLog.commit(df(2000, 2010), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 50 + 10 - 1 + 1 + 10)
  }

  test("constraints enforce on the rows ACTUALLY written — a non-deterministic input cannot land violating rows") {
    val t = freshTable("ndet-constraints")
    SnapshotLog.commit(df(0, 5), t, "append", Seq("id"))
    SnapshotLog.addConstraint(s, t, "k_small", "k <= 5")
    // a stateful non-deterministic column: each EVALUATION of the frame
    // yields fresh, larger values. A probe-then-write scheme evaluates
    // twice — the probe sees passing values, the write lands different
    // (violating) ones. Write-time enforcement evaluates exactly once,
    // on the written rows, so whatever lands must satisfy the CHECK.
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val nd = udf(() => counter.incrementAndGet()).asNondeterministic()
    val in = s.range(100, 105).repartition(1)
      .select($"id", nd().as("k"), lit("p").as("payload"))
    try SnapshotLog.commit(in, t, "append", Seq("id"))
    catch { case _: IllegalArgumentException => () } // refusing is also sound
    val landed = SnapshotLog.read(s, t).where($"id" >= 100)
    assert(landed.where($"k" > 5).count() == 0,
      "violating rows landed past the constraint")
  }

  test("opt-in pre-write probe fast-fails a deterministic violation; guard stays authoritative") {
    val t = freshTable("preprobe-constraints")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.addConstraint(s, t, "id_bound", "id < 1000")
    SnapshotLog.addConstraint(s, t, "k_range", "k BETWEEN 0 AND 6")
    s.conf.set(SnapshotLog.ConstraintPreProbeConf, "true")
    try {
      // deterministic violation: the probe catches it with one
      // short-circuit scan and names the constraint (no write attempt,
      // no task retries); table version unchanged
      val vBefore = SnapshotLog.latestVersion(s, t).get
      val ex = intercept[IllegalArgumentException] {
        SnapshotLog.commit(df(2000, 2010), t, "append", Seq("id"))
      }
      assert(ex.getMessage.contains("id_bound"))
      assert(SnapshotLog.latestVersion(s, t).get == vBefore)
      // a passing commit still lands under the probe
      SnapshotLog.commit(df(10, 20), t, "append", Seq("id"))
      assert(SnapshotLog.read(s, t).count() == 20)
      // the in-write guard is still the authority: a non-deterministic
      // input that passes the probe cannot land violating rows
      val counter = new java.util.concurrent.atomic.AtomicLong(0)
      val nd = udf(() => counter.incrementAndGet()).asNondeterministic()
      val in = s.range(100, 105).repartition(1)
        .select($"id", nd().as("k"), lit("p").as("payload"))
      try SnapshotLog.commit(in, t, "append", Seq("id"))
      catch { case _: IllegalArgumentException => () } // refusing is also sound
      assert(SnapshotLog.read(s, t).where($"k" > 6).count() == 0)
    } finally s.conf.unset(SnapshotLog.ConstraintPreProbeConf)
  }

  test("constraint sidecar publishes versioned-newest-wins; legacy file still reads") {
    val t = freshTable("constraints-versioned")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    // legacy un-versioned sidecar (pre-versioning layout) is honored
    Files.writeString(Paths.get(t, "_log", "_constraints.json"),
      """{"legacy_bound":"id < 100"}""")
    assert(SnapshotLog.constraints(s, t) == Map("legacy_bound" -> "id < 100"))
    // registration supersedes it with a versioned file — at no point is
    // the sidecar absent (no delete-then-rename window)
    SnapshotLog.addConstraint(s, t, "k_range", "k BETWEEN 0 AND 6")
    assert(SnapshotLog.constraints(s, t).keySet == Set("legacy_bound", "k_range"))
    val logDir = Paths.get(t, "_log")
    val versioned = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("_constraints.v") && n.endsWith(".json")).toSeq
    assert(versioned.nonEmpty, "no versioned constraints file published")
    // drop publishes the NEXT version; the newest file always wins
    SnapshotLog.dropConstraint(s, t, "legacy_bound")
    assert(SnapshotLog.constraints(s, t).keySet == Set("k_range"))
    intercept[IllegalArgumentException] {
      SnapshotLog.commit(df(0, 1).withColumn("k", lit(99L)), t, "append", Seq("id"))
    }
  }

  test("legacy manifests without the kind header still resolve and walk (adaptive)") {
    val t = freshTable("legacy-manifest")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    SnapshotLog.commit(df(20, 40), t, "append", Seq("id"))
    // simulate a pre-header manifest: strip the "kind" field from v2
    val p2 = Paths.get(t, "_log", "v00002.json")
    val stripped = Files.readString(p2)
      .replaceFirst("\"kind\":\"(full|delta)\",", "")
    Files.writeString(p2, stripped)
    // hand-edit invalidates the local-FS checksum sidecar; drop it
    Files.deleteIfExists(p2.getParent.resolve("." + p2.getFileName + ".crc"))
    assert(SnapshotLog.read(s, t).count() == 40)
    // adaptive cadence must fall back to a full parse for the legacy
    // file and keep committing
    s.conf.set("spark.graft.snapshot.checkpointPolicy", "adaptive")
    try {
      SnapshotLog.commit(df(40, 60), t, "append", Seq("id"))
      assert(SnapshotLog.read(s, t).count() == 60)
    } finally s.conf.unset("spark.graft.snapshot.checkpointPolicy")
  }

  test("corrupt manifests fail loudly, never silently mis-answer") {
    val t = freshTable("corrupt")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.commit(df(10, 20), t, "append", Seq("id"))
    // truncated JSON: reads of that version throw, they do not guess
    val p2 = Paths.get(t, "_log", "v00002.json")
    val good = Files.readAllBytes(p2)
    Files.write(p2, good.take(good.length / 2))
    intercept[Exception] { SnapshotLog.read(s, t).count() }
    // earlier intact versions remain readable
    assert(SnapshotLog.read(s, t, Some(1)).count() == 10)
    // valid JSON with a missing required field is also loud
    Files.writeString(p2, """{"version":2,"parent":1}""")
    intercept[Exception] { SnapshotLog.read(s, t).count() }
    // restored manifest reads again
    Files.write(p2, good)
    assert(SnapshotLog.read(s, t).count() == 20)
  }

  test("deleteWhereDV masks rows without rewriting any data file") {
    val t = freshTable("dv")
    // 4 range-bucketed files: [0,25) [25,50) [50,75) [75,100)
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 25, b * 25 + 25).repartition(1), t, "append", Seq("id"))
    val m0 = SnapshotLog.manifest(s, t, 4L)
    // delete [25, 60]: [25,50) fully covered → dropped (metadata-only),
    // [50,75) partial → masked by a DV, the others untouched
    val st = SnapshotLog.deleteWhereDV(s, t, "id", 25L, 60L).get
    assert(st == SnapshotLog.DvStats(5L, 2, 1, 1, 36L))
    val m1 = SnapshotLog.manifest(s, t, 5L)
    // NO new data file exists: every surviving entry is a parent file
    assert(m1.files.map(_.path).toSet.subsetOf(m0.files.map(_.path).toSet))
    assert(m1.files.count(_.dv.isDefined) == 1)
    assert(m1.files.find(_.dv.isDefined).get.dv.get.rows == 11L) // 50..60
    // reads mask the positions out; aggregates are exact
    assert(SnapshotLog.read(s, t).count() == 64)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
      (0L until 100).filterNot(i => i >= 25 && i <= 60).sum)
    // untouched rows of the masked file survive
    assert(SnapshotLog.read(s, t).where($"id".between(61, 74)).count() == 14)
    // time travel still serves the pre-delete snapshot
    assert(SnapshotLog.read(s, t, Some(4)).count() == 100)
    // metadata accounting: live rows net of masks, mask debt reported
    val ts = SnapshotLog.tableStats(s, t)
    assert(ts.rows == 64 && ts.deletedRows == 11)
    assert(SnapshotLog.history(s, t).where($"version" === 5)
      .select($"n_rows").head.getLong(0) == 64L)
    // a delete matching nothing commits nothing
    assert(SnapshotLog.deleteWhereDV(s, t, "id", 5000L, 6000L).isEmpty)
    assert(SnapshotLog.latestVersion(s, t).contains(5L))
  }

  test("repeated DV deletes merge; compaction materializes the mask") {
    val t = freshTable("dv-merge")
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 25, b * 25 + 25).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteWhereDV(s, t, "id", 25L, 60L) // leaves 64 live rows
    // arbitrary-predicate delete: stats can't prune, every file scans;
    // live matches are ids ending in 1 → 1,11,21 | 61,71 | 81,91
    val st = SnapshotLog.deleteMatchingDV(s, t, col("id") % 10 === 1).get
    assert(st == SnapshotLog.DvStats(6L, 0, 0, 3, 7L))
    val m = SnapshotLog.manifest(s, t, 6L)
    // the twice-masked file carries the UNION of both rounds
    assert(m.files.flatMap(_.dv.map(_.rows)).sorted == Seq(2L, 3L, 13L))
    assert(SnapshotLog.read(s, t).count() == 57)
    // a DV-deleted key is gone from point lookups too
    val (hit, _, _, _) = SnapshotLog.readPoint(s, t, "id", 61L)
    assert(hit.count() == 0)
    assert(SnapshotLog.tableStats(s, t).deletedRows == 18)
    // compaction pays the mask debt: same content, no DVs left
    val expect = SnapshotLog.read(s, t)
      .agg(count(lit(1)), sum($"id")).head.toSeq
    val v = SnapshotLog.compact(s, t, 1L << 20, Seq("id")).get
    assert(SnapshotLog.read(s, t).agg(count(lit(1)), sum($"id")).head.toSeq == expect)
    assert(SnapshotLog.manifest(s, t, v).files.forall(_.dv.isEmpty))
    assert(SnapshotLog.tableStats(s, t).deletedRows == 0)
    // vacuum keeps DV sidecars referenced by historical versions:
    // every version (pre-delete, masked, compacted) stays readable
    SnapshotLog.vacuum(s, t)
    assert(SnapshotLog.read(s, t, Some(4)).count() == 100)
    assert(SnapshotLog.read(s, t, Some(5)).count() == 64)
    assert(SnapshotLog.read(s, t, Some(6)).count() == 57)
    assert(SnapshotLog.read(s, t).count() == 57)
  }

  test("applyChanges merges a CDC batch: upserts, deletes, inserts in one commit") {
    val t = freshTable("apply")
    for (b <- 0 until 4)
      SnapshotLog.commit(df(b * 25, b * 25 + 25).repartition(1), t, "append", Seq("id"))
    val m0 = SnapshotLog.manifest(s, t, 4L)
    // updates hit file 2 ([25,50)), deletes hit file 4 ([75,100)),
    // inserts land beyond every file interval
    val changes = df(30, 35).withColumn("payload", lit("UPDATED"))
      .withColumn("op", lit("U"))
      .unionByName(df(75, 80).where($"id" % 2 === 1).withColumn("op", lit("D")))
      .unionByName(df(1000, 1003).withColumn("op", lit("U")))
    val st = SnapshotLog.applyChanges(changes, t, "id")
    assert(st == SnapshotLog.MutationStats(5L, 2, 0, 2))
    val m1 = SnapshotLog.manifest(s, t, 5L)
    assert(m0.files.map(_.path).toSet.intersect(m1.files.map(_.path).toSet).size == 2)
    val now = SnapshotLog.read(s, t)
    assert(now.count() == 100) // 100 - 3 deletes (75,77,79) + 3 inserts
    assert(now.where($"payload" === "UPDATED").count() == 5)
    assert(now.where($"id".isin(75L, 77L, 79L)).count() == 0)
    assert(now.where($"id".isin(76L, 78L)).count() == 2) // neighbors survive
    assert(now.where($"id" >= 1000).count() == 3)
    assert(now.groupBy($"id").count().where($"count" > 1).count() == 0)
    // a delete for an absent key (beyond every file interval) is a
    // no-op: nothing rewritten, a batch of ONLY missed deletes commits
    // no version at all
    val miss = df(5000, 5001).withColumn("op", lit("D"))
    assert(SnapshotLog.applyChanges(miss, t, "id").filesRewritten == 0)
    assert(SnapshotLog.latestVersion(s, t).contains(5L))
    // duplicate keys must be pre-resolved (latest-wins) by the caller
    intercept[IllegalArgumentException] {
      SnapshotLog.applyChanges(changes.unionByName(changes.limit(1)), t, "id")
    }
    // op vocabulary is closed
    intercept[IllegalArgumentException] {
      SnapshotLog.applyChanges(df(0, 1).withColumn("op", lit("X")), t, "id")
    }
    // a NULL-key change row refuses with the ACTUAL cause — the keyed
    // machinery's anti-join and containment flags skip NULLs, so the
    // row could never land or delete anything; before the keyed-count
    // fix this tripped the misleading "duplicate keys" refusal (the
    // raw count-vs-countDistinct comparison blamed the wrong thing)
    val nullKey = df(0, 1).withColumn("id", lit(null).cast("long"))
      .withColumn("op", lit("U"))
    val eNull = intercept[IllegalArgumentException] {
      SnapshotLog.applyChanges(changes.unionByName(nullKey), t, "id")
    }
    assert(eNull.getMessage.contains("NULL"), eNull.getMessage)
    assert(!eNull.getMessage.contains("duplicate"), eNull.getMessage)
    // empty changelog: no commit
    assert(SnapshotLog.applyChanges(changes.limit(0), t, "id").filesRewritten == 0)
  }

  test("replicateChanges mirrors a table incrementally, exactly-once") {
    val t = freshTable("repl-src")
    val d = freshTable("repl-dst")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(50, 100), t, "append", Seq("id"))
    // first pull: everything up to src v2, one dst commit
    assert(SnapshotLog.replicateChanges(s, t, d, Seq("id")).contains((2L, 1L)))
    assert(SnapshotLog.read(s, d).count() == 100)
    // incremental pull moves ONLY the delta
    SnapshotLog.commit(df(100, 120), t, "append", Seq("id"))
    assert(SnapshotLog.replicateChanges(s, t, d, Seq("id")).contains((3L, 2L)))
    assert(SnapshotLog.read(s, d).count() == 120)
    assert(SnapshotLog.read(s, d).agg(sum($"id")).head.getLong(0) ==
      (0L until 120).sum)
    // up to date: no-op, no empty commits
    assert(SnapshotLog.replicateChanges(s, t, d).isEmpty)
    assert(SnapshotLog.latestVersion(s, d).contains(2L))
    // a rewriting source version refuses loudly (the diff would lie)
    SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    intercept[IllegalArgumentException] {
      SnapshotLog.replicateChanges(s, t, d)
    }
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
