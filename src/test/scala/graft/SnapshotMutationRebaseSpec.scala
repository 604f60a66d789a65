package graft

import java.nio.file.Paths

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.{LocalLinkLogStore, LogStore, SnapshotLog}

/** Conflict-checked rebase of the mutating ops (the WriteSerializable
  * contract): a mutation that loses the version CAS rebases onto the
  * new latest when the concurrent commits are logically disjoint, and
  * refuses with ConcurrentMutationException when they are not.
  *
  * Races are injected DETERMINISTICALLY through the LogStore
  * beforePublish seam: the competitor's commit runs inside the op
  * under test's check-to-act window, exactly once, so every test sees
  * the same interleaving every run. A final thread-pool case exercises
  * the same logic under real nondeterministic contention.
  */
class SnapshotMutationRebaseSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"rebase-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long, payload: String = "row") =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit(payload), $"id").as("payload"))

  /** Three single-file commits with disjoint id ranges [0,100),
    * [100,200), [200,300) — stats route mutations to exactly one file.
    */
  private def seed3(t: String): Unit =
    Seq(0L, 100L, 200L).foreach(lo =>
      SnapshotLog.commit(df(lo, lo + 100).repartition(1), t, "append",
        Seq("id")))

  /** Run `body` with a LogStore that fires `inject` exactly once, in
    * the check-to-act window of the first MANIFEST publish — i.e. the
    * competitor commits between the op's read and its CAS.
    */
  private var injN = 0
  private def withInjection(inject: => Unit)(body: => Unit): Unit = {
    injN += 1
    val name = s"rebase-inject-$injN"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    LogStore.register(name, new LocalLinkLogStore {
      override protected def beforePublish(fs: FileSystem,
          dest: Path): Unit =
        if (dest.getName.matches("v\\d+\\.json") &&
          fired.compareAndSet(false, true)) inject
    })
    s.conf.set(LogStore.ConfKey, name)
    try body finally s.conf.unset(LogStore.ConfKey)
  }

  test("a CoW delete rebases over a concurrent append — both land") {
    val t = freshTable("del-over-append")
    seed3(t)
    withInjection { SnapshotLog.commit(df(300, 350), t, "append", Seq("id")); () } {
      val st = SnapshotLog.deleteWhere(s, t, "id", 0L, 99L).get
      assert(st.version == 5L, "append won v4, delete rebased to v5")
      assert(st.filesDropped == 1)
    }
    assert(SnapshotLog.read(s, t).count() == 250) // 300 - 100 + 50
    assert(SnapshotLog.read(s, t).agg(min($"id")).head.getLong(0) == 100L)
    assert(SnapshotLog.read(s, t).agg(max($"id")).head.getLong(0) == 349L)
  }

  test("two mutations touching DIFFERENT files both land, no caller retry") {
    val t = freshTable("disjoint-cow")
    seed3(t)
    withInjection { SnapshotLog.upsert(df(250, 260, "upd"), t, "id"); () } {
      val st = SnapshotLog.deleteWhere(s, t, "id", 0L, 99L).get
      assert(st.version == 5L)
    }
    val rows = SnapshotLog.read(s, t)
    assert(rows.count() == 200)
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
    assert(rows.where($"id" < 100).count() == 0)
  }

  test("a concurrent rewrite of the SAME file conflicts loudly, table intact") {
    val t = freshTable("same-file")
    seed3(t)
    withInjection { SnapshotLog.upsert(df(50, 60, "upd"), t, "id"); () } {
      val e = intercept[SnapshotLog.ConcurrentMutationException] {
        SnapshotLog.deleteWhere(s, t, "id", 0L, 99L)
      }
      assert(e.getMessage.contains("rerun"))
    }
    // only the injected upsert is visible; nothing was half-applied
    assert(SnapshotLog.latestVersion(s, t).contains(4L))
    val rows = SnapshotLog.read(s, t)
    assert(rows.count() == 300)
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
    // and the loser genuinely lost a race it could win on rerun
    assert(SnapshotLog.deleteWhere(s, t, "id", 0L, 99L).get.version == 5L)
    assert(SnapshotLog.read(s, t).count() == 200)
  }

  test("a new equality delete conflicts with a CoW rewrite that read those rows") {
    val t = freshTable("eq-vs-cow")
    seed3(t)
    withInjection {
      SnapshotLog.deleteKeysMOR(s.range(150, 160).toDF("id"), t, "id"); ()
    } {
      intercept[SnapshotLog.ConcurrentMutationException] {
        SnapshotLog.upsert(df(140, 160, "upd"), t, "id")
      }
    }
    // serial order delete→upsert holds: the keys stay deleted
    assert(SnapshotLog.read(s, t).count() == 290)
    assert(SnapshotLog.read(s, t).where($"id".between(150, 159)).count() == 0)
  }

  test("a MOR upsert rebases over a CoW delete and still wins by seq") {
    val t = freshTable("mor-over-del")
    seed3(t)
    withInjection { SnapshotLog.deleteWhere(s, t, "id", 0L, 99L); () } {
      SnapshotLog.upsertMOR(df(150, 160, "upd"), t, "id")
    }
    val rows = SnapshotLog.read(s, t)
    assert(rows.count() == 200)
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
    assert(rows.where($"id".between(150, 159) &&
      !$"payload".startsWith("upd")).count() == 0)
  }

  test("a MOR key delete rebases over an append; its keys miss the new rows") {
    val t = freshTable("mor-del-over-append")
    seed3(t)
    withInjection { SnapshotLog.commit(df(300, 350), t, "append", Seq("id")); () } {
      assert(SnapshotLog.deleteKeysMOR(
        s.range(0, 10).toDF("id"), t, "id").contains(5L))
    }
    assert(SnapshotLog.read(s, t).count() == 340) // 300 + 50 - 10
    assert(SnapshotLog.read(s, t).agg(min($"id")).head.getLong(0) == 10L)
  }

  test("an epoch replayed by a second driver mid-rebase resolves to None") {
    val t = freshTable("epoch-race")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    val batch = df(40, 50, "upd")
    withInjection { SnapshotLog.upsertMORBatch(batch, t, 7L, "id"); () } {
      // same micro-batch, same epoch, different "driver": the ledger
      // check passed up-front, the competitor landed mid-publish — the
      // rebase loop must detect the replay, not double-commit
      assert(SnapshotLog.upsertMORBatch(batch, t, 7L, "id").isEmpty)
    }
    assert(SnapshotLog.latestVersion(s, t).contains(2L))
    val rows = SnapshotLog.read(s, t)
    assert(rows.count() == 100)
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
  }

  test("a stream micro-batch rebases over a concurrent compaction") {
    val t = freshTable("stream-over-compact")
    seed3(t)
    // eq-delete debt so the injected compact genuinely rewrites files
    SnapshotLog.deleteKeysMOR(s.range(10, 20).toDF("id"), t, "id")
    withInjection { SnapshotLog.compact(s, t, targetBytes = 1L << 30,
      statsCols = Seq("id")); () } {
      assert(SnapshotLog.appendStreamBatch(df(300, 350), t, 0L,
        Seq("id")).isDefined)
    }
    // both landed: compaction materialized the key delete, batch appended
    assert(SnapshotLog.read(s, t).count() == 340) // 300 - 10 + 50
    assert(SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).eqDeletes.isEmpty)
    // the epoch ledger recorded the batch (replay skips)
    assert(SnapshotLog.appendStreamBatch(df(300, 350), t, 0L,
      Seq("id")).isEmpty)
  }

  test("a stream micro-batch conflicts loudly with a concurrent schema evolve") {
    val t = freshTable("stream-vs-evolve")
    seed3(t)
    val widened = org.apache.spark.sql.types.StructType(
      SnapshotLog.read(s, t).schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType)).toDDL
    withInjection { SnapshotLog.evolveSchema(s, t, widened); () } {
      // the batch was aligned to the pre-evolve schema — republishing
      // it under the widened DDL would silently pin the old schema
      intercept[SnapshotLog.ConcurrentMutationException] {
        SnapshotLog.appendStreamBatch(df(300, 350), t, 0L, Seq("id"))
      }
    }
    // the evolve is visible, the table intact; the batch lands on rerun
    assert(SnapshotLog.read(s, t).columns.contains("extra"))
    assert(SnapshotLog.appendStreamBatch(df(300, 350), t, 0L,
      Seq("id")).isDefined)
    assert(SnapshotLog.read(s, t).count() == 350)
  }

  test("a rename retries over a concurrent append and lands on a busy table") {
    val t = freshTable("rename-over-append")
    seed3(t)
    withInjection { SnapshotLog.commit(df(300, 350), t, "append", Seq("id")); () } {
      assert(SnapshotLog.renameColumn(s, t, "payload", "body") == 5L)
    }
    val rows = SnapshotLog.read(s, t)
    assert(rows.columns.contains("body") && !rows.columns.contains("payload"))
    assert(rows.count() == 350) // the racer's file serves under the new name
    assert(rows.where($"body".startsWith("row")).count() == 350)
  }

  test("an evolve retries over a concurrent MOR upsert; both are visible") {
    val t = freshTable("evolve-over-mor")
    seed3(t)
    val widened = org.apache.spark.sql.types.StructType(
      SnapshotLog.read(s, t).schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType)).toDDL
    withInjection { SnapshotLog.upsertMOR(df(10, 20, "upd"), t, "id"); () } {
      assert(SnapshotLog.evolveSchema(s, t, widened) == 5L) // mor won v4
    }
    val rows = SnapshotLog.read(s, t)
    assert(rows.columns.contains("extra"))
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
    assert(rows.count() == 300)
  }

  test("a rename losing to a rename of the SAME column fails its own validation") {
    val t = freshTable("rename-vs-rename")
    seed3(t)
    withInjection { SnapshotLog.renameColumn(s, t, "payload", "body"); () } {
      val e = intercept[IllegalArgumentException] {
        SnapshotLog.renameColumn(s, t, "payload", "body2")
      }
      assert(e.getMessage.contains("no column 'payload'"))
    }
    // the winner's rename is intact; a rerun against the new name lands
    assert(SnapshotLog.read(s, t).columns.contains("body"))
    assert(SnapshotLog.renameColumn(s, t, "body", "body2") == 5L)
    assert(SnapshotLog.read(s, t).where($"body2".startsWith("row"))
      .count() == 300)
  }

  test("a compact racing a restore refuses to rebase — MOR-deleted rows stay deleted") {
    val t = freshTable("compact-vs-restore")
    // v1: one file [0,300); v2: MOR-delete keys 200..209 (masks the v1
    // file); v3: CoW delete [100,299] rewrites it down to [0,100) with a
    // NEWER seq — the eq-delete now provably applies to nothing, so
    // compact takes its metadata-only drop branch
    SnapshotLog.commit(df(0, 300).repartition(1), t, "append", Seq("id"))
    SnapshotLog.deleteKeysMOR(s.range(200, 210).toDF("id"), t, "id")
    SnapshotLog.deleteWhere(s, t, "id", 100L, 299L, statsCols = Seq("id"))
    withInjection { SnapshotLog.restore(s, t, 2L); () } {
      // the injected restore re-surfaces the v1 file that CONTAINS the
      // deleted keys; rebasing the eq-delete drop over it (touched = ∅,
      // nothing else changed) would silently resurrect those 10 rows
      val e = intercept[SnapshotLog.ConcurrentMutationException] {
        SnapshotLog.compact(s, t, targetBytes = 1L, statsCols = Seq("id"))
      }
      assert(e.getMessage.contains("restore"))
    }
    // the restore is visible and the delete still masks the restored file
    assert(SnapshotLog.latestVersion(s, t).contains(4L))
    assert(SnapshotLog.read(s, t).count() == 290)
    assert(SnapshotLog.read(s, t).where($"id".between(200, 209)).count() == 0)
    // a rerun sees the debt as REAL (the restored file holds the keys)
    // and materializes it with a genuine rewrite
    assert(SnapshotLog.compact(s, t, targetBytes = 1L,
      statsCols = Seq("id")).isDefined)
    assert(SnapshotLog.read(s, t).count() == 290)
    assert(SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).eqDeletes.isEmpty)
  }

  test("a MOR upsert refuses to rebase over a branch fast-forward") {
    val t = freshTable("mor-vs-ff")
    SnapshotLog.commit(df(0, 100).repartition(1), t, "append", Seq("id"))
    val b = SnapshotLog.createBranch(s, t, "wip")
    SnapshotLog.commit(df(100, 150, "wip"), b, "append", Seq("id"))
    withInjection { SnapshotLog.fastForward(s, t, "wip"); () } {
      // fast-forward is history movement like restore: it republishes
      // branch state whose seqs predate the upsert's read point
      val e = intercept[SnapshotLog.ConcurrentMutationException] {
        SnapshotLog.upsertMOR(df(10, 20, "upd"), t, "id")
      }
      assert(e.getMessage.contains("fast-forward"))
    }
    // the fast-forward is intact; the upsert lands cleanly on rerun
    assert(SnapshotLog.read(s, t).count() == 150)
    SnapshotLog.upsertMOR(df(10, 20, "upd"), t, "id")
    val rows = SnapshotLog.read(s, t)
    assert(rows.count() == 150)
    assert(rows.where($"payload".startsWith("upd")).count() == 10)
    assert(rows.where($"id".between(10, 19) &&
      !$"payload".startsWith("upd")).count() == 0)
  }

  test("TWO real JVMs mutate one table concurrently; the rebase lands every op") {
    val t = freshTable("xproc")
    // two single-file seeds: writer A owns id < 150, writer B id >= 150
    Seq(0L, 150L).foreach(lo =>
      SnapshotLog.commit(df(lo, lo + 150).repartition(1), t, "append",
        Seq("id")))
    val dir = java.nio.file.Paths.get("target", "rebase-xproc-barrier")
      .toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    java.nio.file.Files.createDirectories(dir)
    val rounds = 6
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    def spawn(id: String) = new ProcessBuilder(javaBin, "-Xmx2g", "-cp", cp,
        "graft.MutationRaceMain", t, id, rounds.toString, dir.toString)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(dir.toFile, s"child-$id.log"))
      .start()
    val a = spawn("A")
    val b = spawn("B")
    try {
      (0 until rounds).foreach { r =>
        Thread.sleep(300)
        java.nio.file.Files.createFile(dir.resolve(s"go-$r"))
      }
      assert(a.waitFor(240, java.util.concurrent.TimeUnit.SECONDS) &&
        b.waitFor(240, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(a.exitValue() == 0 && b.exitValue() == 0,
        "a child failed — a cross-process mutation conflicted or diverged")
      // every op landed exactly once on a strictly linear history
      def versions(id: String): Seq[Long] =
        new String(java.nio.file.Files.readAllBytes(
          dir.resolve(s"result-$id")), "UTF-8")
          .split("\n").filter(_.nonEmpty).map(_.split(" ")(1).toLong).toSeq
      val all = versions("A") ++ versions("B")
      assert(all.size == 2 * rounds && all.distinct.size == all.size)
      assert(all.toSet == (3L to (2L + 2 * rounds)).toSet,
        s"versions not contiguous: ${all.sorted}")
      assert(SnapshotLog.latestVersion(s, t).contains(2L + 2 * rounds))
      (1L to (2L + 2 * rounds)).foreach(v => SnapshotLog.manifest(s, t, v))
      // content equals the serial per-key model: writers' key spaces
      // are disjoint, so any interleaving must produce this exact state
      // A upserts its window every round; B upserts on even rounds and
      // MOR-deletes two of its own keys on odd rounds
      val upWin = (tag: String, base: Long, rs: Seq[Int]) => rs
        .flatMap(r => (base + r * 10L until base + r * 10L + 5)
          .map(i => i -> s"$tag$r$i")).toMap
      val ups = upWin("A", 0L, 0 until rounds) ++
        upWin("B", 150L, (0 until rounds).filter(_ % 2 == 0))
      val delKeys = (0 until rounds).filter(_ % 2 == 1)
        .flatMap(r => Seq(150L + 100 + r, 150L + 100 + r + 1)).toSet
      val expect = (0L until 300L).flatMap { i =>
        if (delKeys(i)) None
        else Some((i, i % 7, ups.getOrElse(i, s"row$i")))
      }.sorted
      val got = SnapshotLog.read(s, t)
        .select($"id", $"k", $"payload").as[(Long, Long, String)]
        .collect().toSeq.sorted
      assert(got == expect, "cross-process raced content diverged")
    } finally { a.destroyForcibly(); b.destroyForcibly(); () }
  }

  test("6 disjoint mutators on 4 threads all land with zero caller retries") {
    val t = freshTable("stress")
    // six single-file commits: [0,50) .. [250,300)
    (0 until 6).foreach(i => SnapshotLog.commit(
      df(i * 50L, i * 50L + 50).repartition(1), t, "append", Seq("id")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val ops: Seq[() => Unit] = Seq(
        () => { SnapshotLog.deleteWhere(s, t, "id", 0L, 49L); () },
        () => { SnapshotLog.deleteWhere(s, t, "id", 50L, 99L); () },
        () => { SnapshotLog.upsert(df(100, 110, "upd"), t, "id"); () },
        () => { SnapshotLog.upsert(df(150, 160, "upd"), t, "id"); () },
        () => { SnapshotLog.deleteKeysMOR(
          s.range(200, 210).toDF("id"), t, "id"); () },
        // appends ride their own OCC loop (commitWithRetry) — plain
        // commit is the version-pinned CAS surface and may lose
        () => { SnapshotLog.commitWithRetry(df(300, 350), t, "append",
          Seq("id")); () })
      val futures = ops.map(op =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = op()
        }))
      futures.foreach(_.get()) // any ConcurrentMutationException fails here
      val rows = SnapshotLog.read(s, t)
      assert(rows.count() == 300 - 100 - 10 + 50)
      assert(rows.where($"payload".startsWith("upd")).count() == 20)
      assert(rows.where($"id" < 100).count() == 0)
      assert(rows.where($"id".between(200, 209)).count() == 0)
      // history stayed linear and fully readable
      val latest = SnapshotLog.latestVersion(s, t).get
      assert(latest == 12L)
      (1L to latest).foreach(v => SnapshotLog.manifest(s, t, v))
    } finally pool.shutdown()
  }
}
