package graft

import java.nio.file.Paths
import java.util.concurrent.{CountDownLatch, Executors}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot._

/** The pluggable commit primitive: exactly-one-winner exclusivity under
  * concurrent and under DETERMINISTICALLY INJECTED races (a competitor
  * publishing inside the check-to-act window — the exact lost-publish
  * failure an 8-way tag race exposed on local-FS rename), for both safe
  * impls (local hard link, conditional put); plus end-to-end snapshot
  * races — tags, commits, constraint updates — green against each.
  */
class LogStoreSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def fs: FileSystem = FileSystem.getLocal(
    s.sparkContext.hadoopConfiguration).getRawFileSystem

  private def freshDir(name: String): Path = {
    val p = Paths.get("target", s"logstore-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    java.nio.file.Files.createDirectories(p)
    new Path(p.toString)
  }

  private def readBytes(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  private def withStore[A](name: String)(body: => A): A = {
    s.conf.set(LogStore.ConfKey, name)
    try body finally s.conf.unset(LogStore.ConfKey)
  }

  private val safeStores: Seq[(String, () => LogStore)] = Seq(
    "local-link" -> (() => new LocalLinkLogStore),
    "conditional-put" -> (() => new ConditionalPutLogStore),
    "conditional-put-file" -> (() => new FileClaimLogStore))

  // ---- primitive-level exclusivity ------------------------------------

  for ((name, mk) <- safeStores)
    test(s"$name: N simultaneous publishers, exactly one winner, every round") {
      val dir = freshDir(s"prim-$name")
      val store = mk()
      val pool = Executors.newFixedThreadPool(8)
      try {
        (0 until 30).foreach { round =>
          val dest = new Path(dir, f"obj-$round%03d.json")
          val latch = new CountDownLatch(1)
          val futures = (0 until 8).map { i =>
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean = {
                latch.await()
                store.publishExclusive(fs, dest, s"writer-$i".getBytes("UTF-8"))
              }
            })
          }
          latch.countDown()
          val wins = futures.map(_.get())
          assert(wins.count(identity) == 1, s"round $round: ${wins.count(identity)} winners")
          // the stored bytes are exactly the winner's — no torn/mixed state
          val winner = wins.indexOf(true)
          assert(readBytes(dest) == s"writer-$winner")
          // losers left no visible debris the log plane would list
          val listed = store.list(fs, new Path(dir, "obj-*.json")).map(_.getPath.getName)
          assert(listed.count(_ == dest.getName) == 1)
        }
      } finally pool.shutdown()
    }

  // ---- deterministic injected race: competitor lands in the window ----

  for ((name, mk) <- Seq[(String, (FileSystem, Path, Array[Byte]) => HadoopBackedLogStore)](
    "local-link" -> ((f, d, b) => new LocalLinkLogStore {
      override protected def beforePublish(fs2: FileSystem, dest: Path): Unit =
        assert(new LocalLinkLogStore().publishExclusive(f, d, b))
    }),
    "conditional-put" -> ((f, d, b) => new ConditionalPutLogStore {
      override protected def beforePublish(fs2: FileSystem, dest: Path): Unit =
        assert(new ConditionalPutLogStore().publishExclusive(f, d, b))
    }),
    "conditional-put-file" -> ((f, d, b) => new FileClaimLogStore {
      override protected def beforePublish(fs2: FileSystem, dest: Path): Unit =
        assert(new FileClaimLogStore().publishExclusive(f, d, b))
    })))
    test(s"$name: a competitor publishing inside the check-to-act window is never lost") {
      val dir = freshDir(s"inject-$name")
      val dest = new Path(dir, "contended.json")
      val store = mk(fs, dest, "competitor".getBytes("UTF-8"))
      // our publish attempt has the competitor land mid-flight: we MUST
      // lose, and the competitor's bytes MUST survive untouched
      assert(!store.publishExclusive(fs, dest, "ours".getBytes("UTF-8")))
      assert(readBytes(dest) == "competitor")
    }

  test("exists-then-rename on local FS LOSES the competitor's publish — why auto never picks it here") {
    // the round-9 bug, reproduced deterministically: local rename(2)
    // overwrites, so the rename store's check-to-act window admits a
    // second winner that silently erases the first publish. This is
    // exactly what the safe impls above refuse to do — and why the
    // rename store's contract is HDFS-only (rename refuses an existing
    // destination there, making the same window safe).
    val dir = freshDir("inject-rename")
    val dest = new Path(dir, "contended.json")
    val store = new HdfsRenameLogStore {
      override protected def beforePublish(fs2: FileSystem, d: Path): Unit =
        assert(new HdfsRenameLogStore().publishExclusive(fs, dest,
          "competitor".getBytes("UTF-8")))
    }
    val won = store.publishExclusive(fs, dest, "ours".getBytes("UTF-8"))
    assert(won, "local rename overwrote — both writers 'won'")
    assert(readBytes(dest) == "ours", "the competitor's publish was silently lost")
  }

  // ---- end-to-end snapshot races against both safe impls --------------

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"logstore-tbl-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", concat(lit("row"), $"id").as("payload"))

  for ((name, _) <- safeStores) {
    test(s"$name: 8-way tag race — every distinct name survives") {
      withStore(name) {
        val t = freshTable(s"tags-$name")
        SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
        val pool = Executors.newFixedThreadPool(8)
        try {
          val latch = new CountDownLatch(1)
          val futures = (0 until 8).map { i =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                latch.await()
                SnapshotLog.createTag(s, t, s"tag-$i")
              }
            })
          }
          latch.countDown()
          futures.foreach(_.get())
          assert(SnapshotLog.tags(s, t).keySet == (0 until 8).map(i => s"tag-$i").toSet)
        } finally pool.shutdown()
      }
    }

    test(s"$name: concurrent committers serialize into linear history") {
      withStore(name) {
        val t = freshTable(s"commits-$name")
        val pool = Executors.newFixedThreadPool(8)
        try {
          val futures = (0 until 8).map { i =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = SnapshotLog.commitWithRetry(
                df(i * 10, i * 10 + 10), t, "append", Seq("id"))
            })
          }
          assert(futures.map(_.get()).sorted == (1L to 8L))
          assert(SnapshotLog.read(s, t).count() == 80)
          assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
            (0L until 80).sum)
        } finally pool.shutdown()
      }
    }

    test(s"$name: racing constraint updates compose — no lost add/drop") {
      withStore(name) {
        val t = freshTable(s"cons-$name")
        SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
        // 8 concurrent adds of DISTINCT constraints: each CAS retry must
        // re-read and re-merge (a stale pre-merged map would erase the
        // winner's constraint — the lost-update the fix closes)
        val pool = Executors.newFixedThreadPool(8)
        try {
          val latch = new CountDownLatch(1)
          val futures = (0 until 8).map { i =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = {
                latch.await()
                SnapshotLog.addConstraint(s, t, s"c$i", s"id >= -$i")
              }
            })
          }
          latch.countDown()
          futures.foreach(_.get())
          assert(SnapshotLog.constraints(s, t).keySet ==
            (0 until 8).map(i => s"c$i").toSet)
          // concurrent add × drop: both effects must land regardless of order
          val latch2 = new CountDownLatch(1)
          val fAdd = pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = { latch2.await(); SnapshotLog.addConstraint(s, t, "c8", "id >= -8") }
          })
          val fDrop = pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = { latch2.await(); SnapshotLog.dropConstraint(s, t, "c0") }
          })
          latch2.countDown()
          fAdd.get(); fDrop.get()
          assert(SnapshotLog.constraints(s, t).keySet ==
            ((1 until 9).map(i => s"c$i")).toSet)
        } finally pool.shutdown()
      }
    }
  }

  test("conditional-put survives a full snapshot round-trip (commit, evolve, tag, time travel)") {
    withStore("conditional-put") {
      val t = freshTable("roundtrip-cput")
      assert(SnapshotLog.commit(df(0, 100), t, "append", Seq("id")) == 1L)
      assert(SnapshotLog.commit(df(100, 150), t, "append", Seq("id")) == 2L)
      SnapshotLog.evolveSchema(s, t,
        "id BIGINT, payload STRING, extra BIGINT")
      SnapshotLog.createTag(s, t, "rel")
      assert(SnapshotLog.read(s, t, Some(1)).count() == 100)
      assert(SnapshotLog.readTag(s, t, "rel").count() == 150)
      assert(SnapshotLog.read(s, t).columns.contains("extra"))
    }
  }

  test("deleting a tag mid-listing reads as absent, not a crash") {
    val t = freshTable("tag-fnfe")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.createTag(s, t, "keep")
    SnapshotLog.createTag(s, t, "gone")
    // simulate the glob→open window: delete the file BEHIND the listing
    // by racing deleteTag against tags() many times — and directly, by
    // removing the file after a listing would have seen it
    SnapshotLog.deleteTag(s, t, "gone")
    assert(SnapshotLog.tags(s, t).keySet == Set("keep"))
    // retention's tag-protection pass proceeds on the surviving tags
    SnapshotLog.commit(df(10, 20), t, "append", Seq("id"))
    val (expired, _) = SnapshotLog.expireVersions(s, t, 1)
    assert(expired.isEmpty) // oldest tag (v1) protects everything
  }

  // ---- claim lifecycle (the round-10 ADVICE findings) ------------------

  test("conditional-put: claims release on success, on failure, and on pre-decided destinations") {
    val dir = freshDir("claims-bounded")
    def ours = {
      val it = ConditionalPutLogStore.claims.keySet().iterator()
      var n = 0
      while (it.hasNext) if (it.next().contains("claims-bounded")) n += 1
      n
    }
    val store = new ConditionalPutLogStore
    assert(store.publishExclusive(fs, new Path(dir, "a.json"), "x".getBytes))
    assert(ours == 0, "a successful publish left its claim behind")
    // a publish that explodes AFTER winning its claim must release it —
    // the wart where the destination became unpublishable in-process
    val boom = new ConditionalPutLogStore {
      override protected def writeTemp(fs2: FileSystem, dest: Path,
          bytes: Array[Byte]): Path = throw new RuntimeException("disk full")
    }
    intercept[RuntimeException] {
      boom.publishExclusive(fs, new Path(dir, "b.json"), "x".getBytes)
    }
    assert(ours == 0, "a failed publish leaked its claim")
    // the destination is NOT bricked: a healthy retry lands it
    assert(store.publishExclusive(fs, new Path(dir, "b.json"), "y".getBytes))
    assert(readBytes(new Path(dir, "b.json")) == "y")
    // losing to an already-decided destination doesn't hold a claim
    assert(!store.publishExclusive(fs, new Path(dir, "a.json"), "z".getBytes))
    assert(ours == 0)
  }

  for (name <- Seq("conditional-put", "conditional-put-file"))
    test(s"$name: delete-tag then create-tag of the same name works (claims are not consumed)") {
      withStore(name) {
        val t = freshTable(s"retag-$name")
        SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
        SnapshotLog.createTag(s, t, "rel")
        SnapshotLog.commit(df(10, 20), t, "append", Seq("id"))
        SnapshotLog.deleteTag(s, t, "rel")
        // the ADVICE failure: this threw 'tag already exists' forever
        SnapshotLog.createTag(s, t, "rel")
        assert(SnapshotLog.tags(s, t) == Map("rel" -> 2L))
      }
    }

  // ---- cross-process exclusion (the .claim hard-link CAS) --------------

  test("conditional-put-file: a foreign process's claim blocks publish without touching the destination") {
    val dir = freshDir("foreign-claim")
    val dest = new Path(dir, "held.json")
    // forge the claim as another process would have left it mid-publish
    fs.create(new Path(dir, "held.json.claim"), false).close()
    val store = new FileClaimLogStore
    assert(!store.publishExclusive(fs, dest, "ours".getBytes))
    assert(!fs.exists(dest), "a blocked publish touched the destination")
    // the holder finishes (or an operator clears the stale claim)...
    fs.delete(new Path(dir, "held.json.claim"), false)
    assert(store.publishExclusive(fs, dest, "ours".getBytes))
    assert(readBytes(dest) == "ours")
    // ...and a completed publish holds no claim
    assert(!fs.exists(new Path(dir, "held.json.claim")))
  }

  test("sweepStaleClaims frees crashed writers' locks, never a live or absent one") {
    val dir = freshDir("claim-sweep")
    val dest = new Path(dir, "v00009.json")
    val stale = new Path(dir, "v00009.json.claim")
    fs.create(stale, false).close() // a writer died between claim+release
    // too-young claims are LIVE by definition: a generous TTL skips them
    assert(FileClaimLogStore.sweepStaleClaims(fs, dir, 60000L).isEmpty)
    assert(!new FileClaimLogStore().publishExclusive(fs, dest, "x".getBytes))
    // past the TTL the sweep frees exactly the stale lock
    val swept = FileClaimLogStore.sweepStaleClaims(fs, dir, -1L)
    assert(swept.map(_.getName) == Seq("v00009.json.claim"))
    assert(new FileClaimLogStore().publishExclusive(fs, dest, "x".getBytes))
    assert(readBytes(dest) == "x")
    // nothing left to sweep after a healthy publish released its claim
    assert(FileClaimLogStore.sweepStaleClaims(fs, dir, -1L).isEmpty)
    // the table-level sweep walks main + branch log planes
    val t = java.nio.file.Paths.get("target", "logstore-sweep-tbl")
      .toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    SnapshotLog.commit(s.range(0, 10).toDF("id"), t, "append", Seq("id"))
    val b = SnapshotLog.createBranch(s, t, "wip")
    fs.create(new Path(s"$t/_log/v00099.json.claim"), false).close()
    fs.create(new Path(s"$b/_log/v00099.json.claim"), false).close()
    assert(SnapshotLog.sweepStaleClaims(s, t, ttlMs = -1L).size == 2)
    assert(SnapshotLog.sweepStaleClaims(s, t, ttlMs = -1L).isEmpty)
  }

  test("POSIX-only stores refuse a non-local filesystem as a config error, not a lost race") {
    // a LocalFileSystem that reports a foreign scheme — the shape of
    // registering the hard-link stores against an object-store shim,
    // where java.nio links would miss their targets and every publish
    // would read as a permanent "concurrent commit"
    val foreign = new org.apache.hadoop.fs.LocalFileSystem {
      override def getScheme: String = "s3x"
      override def getUri: java.net.URI = new java.net.URI("s3x:///")
    }
    foreign.initialize(new java.net.URI("file:///"),
      s.sparkContext.hadoopConfiguration)
    val dir = freshDir("foreign-fs")
    val dest = new Path(dir, "v00001.json")
    val ef = intercept[IllegalArgumentException] {
      new FileClaimLogStore().publishExclusive(foreign, dest, "x".getBytes)
    }
    assert(ef.getMessage.contains("POSIX") && ef.getMessage.contains("s3x"))
    val el = intercept[IllegalArgumentException] {
      new LocalLinkLogStore().publishExclusive(foreign, dest, "x".getBytes)
    }
    assert(el.getMessage.contains("POSIX") && el.getMessage.contains("s3x"))
    assert(!fs.exists(dest), "a refused publish touched the destination")
    // the same stores on a genuinely local fs still publish fine
    assert(new FileClaimLogStore().publishExclusive(fs, dest, "x".getBytes))
  }

  test("conditional-put-file: TWO real JVMs exclude each other — exactly one winner per object") {
    val dir = freshDir("fork-race")
    val rounds = 12
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    def spawn(id: String) = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.LogStoreRaceMain", dir.toString, id, rounds.toString)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(dir.toString, s"child-$id.log"))
      .start()
    val a = spawn("A")
    val b = spawn("B")
    try {
      // release the rounds one by one so both JVMs' attempts overlap
      (0 until rounds).foreach { r =>
        Thread.sleep(25)
        java.nio.file.Files.createFile(
          Paths.get(dir.toString, s"go-$r"))
      }
      assert(a.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) &&
        b.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(a.exitValue() == 0 && b.exitValue() == 0)
      def wins(id: String): Map[Int, Int] =
        new String(java.nio.file.Files.readAllBytes(
          Paths.get(dir.toString, s"result-$id")), "UTF-8")
          .split("\n").filter(_.nonEmpty)
          .map { l => val p = l.split(" "); p(0).toInt -> p(1).toInt }.toMap
      val wa = wins("A"); val wb = wins("B")
      (0 until rounds).foreach { r =>
        assert(wa(r) + wb(r) == 1,
          s"round $r: ${wa(r) + wb(r)} winners across two JVMs")
        val expect = if (wa(r) == 1) "writer-A" else "writer-B"
        assert(readBytes(new Path(dir, f"obj-$r%03d.json")) == expect)
        // no stale claim survives a completed round
        assert(!fs.exists(new Path(dir, f"obj-$r%03d.json.claim")))
      }
    } finally { a.destroyForcibly(); b.destroyForcibly(); () }
  }

  test("unknown logstore name refuses loudly; registry extends the seam") {
    val dir = freshDir("registry")
    s.conf.set(LogStore.ConfKey, "no-such-store")
    try {
      val ex = intercept[IllegalArgumentException] {
        SnapshotLog.commit(df(0, 5), dir.toString + "/t", "append", Seq("id"))
      }
      assert(ex.getMessage.contains("no-such-store"))
    } finally s.conf.unset(LogStore.ConfKey)
    LogStore.register("spec-custom", new LocalLinkLogStore)
    withStore("spec-custom") {
      val t = freshTable("custom")
      assert(SnapshotLog.commit(df(0, 5), t, "append", Seq("id")) == 1L)
      assert(SnapshotLog.read(s, t).count() == 5)
    }
  }
}
