package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog
import graft.sources.snapshot.SnapshotLog.LayoutSpec

/** Declared clustering layout as a manifest property (the partition-
  * spec idea): setLayout is one metadata write; appends and stream
  * batches conform WITHOUT the writer re-stating the layout; surgical
  * mutations keep their granularity but sort; compact re-establishes
  * the layout; the spec survives renames, restore, branches, and the
  * delta-manifest encoding; pruned reads prove the clustering.
  */
class SnapshotLayoutSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snaplayout-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("appends conform to a declared range layout without re-stating it") {
    val t = freshTable("range")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "range", Seq("id"), 4)
    assert(SnapshotLog.layoutOf(s, t).contains(LayoutSpec("range", Seq("id"), 4)))
    // a deliberately scrambled append: the layout must organize it
    SnapshotLog.commit(df(100, 500).repartition(13, $"k"), t, "append", Seq("id"))
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    val newFiles = m.files.filter(_.path.contains("v00003"))
    assert(newFiles.size == 4, s"append produced ${newFiles.size} files, wanted 4")
    // disjoint tight ranges: every file's [min,max] window is exclusive
    val ranges = newFiles.flatMap(_.stats.get("id"))
      .map { case (mn, mx) => (mn.asInstanceOf[Long], mx.asInstanceOf[Long]) }
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, mx1), (mn2, _)) => assert(mx1 < mn2,
        s"file ranges overlap: $ranges")
      case _ =>
    }
    // content is untouched by the reorganization
    assert(SnapshotLog.read(s, t).count() == 500)
    assert(SnapshotLog.read(s, t).agg(sum($"id")).head.getLong(0) ==
      (0L until 500).sum)
    // a pruned read over the conformed region opens a strict subset
    val (pruned, scanned, total) = SnapshotLog.readPruned(s, t, "id", 450L, 499L)
    assert(pruned.count() == 50)
    assert(scanned < total, s"pruned read scanned $scanned of $total files")
  }

  test("upsert keeps its surgical granularity under a layout; compact re-establishes it") {
    val t = freshTable("upsert")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "range", Seq("id"), 3)
    SnapshotLog.commit(df(100, 400), t, "append", Seq("id"))
    // a 2-key upsert must NOT rewrite beyond its candidate files
    val st = SnapshotLog.upsert(
      s.range(150, 152).select($"id", lit(9L).as("k"), lit("u").as("payload")),
      t, "id", Seq("id"))
    assert(st.filesRewritten <= 2,
      s"surgical upsert rewrote ${st.filesRewritten} files under a layout")
    // compact conforms the whole table back to the declared clustering
    SnapshotLog.compact(s, t, 1L << 30, Seq("id"))
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    assert(m.layout.contains(LayoutSpec("range", Seq("id"), 3)))
    val ranges = m.files.flatMap(_.stats.get("id"))
      .map { case (mn, mx) => (mn.asInstanceOf[Long], mx.asInstanceOf[Long]) }
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, mx1), (mn2, _)) => assert(mx1 < mn2)
      case _ =>
    }
    assert(SnapshotLog.read(s, t).where($"payload" === "u").count() == 2)
  }

  test("bucket layout hash-co-locates; zorder layout interleaves two columns") {
    val t = freshTable("bucket")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "bucket", Seq("k"), 4)
    SnapshotLog.commit(df(50, 450), t, "append", Seq("id", "k"))
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    val newFiles = m.files.filter(f => f.path.contains("v00003") && f.rows > 0)
    assert(newFiles.size <= 4 && newFiles.size >= 2)
    // hash bucketing: disjoint k sets per file → distinct stat windows
    val perFile = newFiles.flatMap(_.stats.get("k")).toSet
    assert(perFile.size == newFiles.size)

    val tz = freshTable("zorder")
    SnapshotLog.commit(df(0, 50), tz, "append", Seq("id"))
    SnapshotLog.setLayout(s, tz, "zorder", Seq("id", "k"), 4)
    SnapshotLog.commit(df(50, 450), tz, "append", Seq("id", "k"))
    assert(SnapshotLog.read(s, tz).count() == 450)
    assert(SnapshotLog.manifest(s, tz, SnapshotLog.latestVersion(s, tz).get)
      .files.count(_.path.contains("v00003")) == 4)
    intercept[IllegalArgumentException] {
      SnapshotLog.setLayout(s, tz, "zorder", Seq("id"), 4) // needs 2 cols
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.setLayout(s, tz, "range", Seq("nope"), 4) // unknown col
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.setLayout(s, tz, "hive", Seq("id"), 4) // unknown kind
    }
  }

  test("setLayout refuses column types the write path cannot honor") {
    val t = freshTable("types")
    SnapshotLog.commit(df(0, 50)
      .withColumn("tags", map(lit("a"), $"id")), t, "append", Seq("id"))
    // zorder scales into 16-bit lanes: numerics and strings (via the
    // ord64 surrogate) qualify; a map has no order at all
    val ez = intercept[IllegalArgumentException] {
      SnapshotLog.setLayout(s, t, "zorder", Seq("id", "tags"), 4)
    }
    assert(ez.getMessage.contains("numeric and string"))
    // range/bucket need an ordering/hash — maps have neither
    Seq("range", "bucket").foreach { kind =>
      val em = intercept[IllegalArgumentException] {
        SnapshotLog.setLayout(s, t, kind, Seq("tags"), 4)
      }
      assert(em.getMessage.contains("unorderable"))
    }
    // strings ARE orderable: range over payload is a valid declaration
    SnapshotLog.setLayout(s, t, "range", Seq("payload"), 2)
    SnapshotLog.commit(df(50, 150)
      .withColumn("tags", map(lit("a"), $"id")), t, "append", Seq("id"))
    assert(SnapshotLog.read(s, t).count() == 150)
    assert(SnapshotLog.layoutOf(s, t).contains(
      LayoutSpec("range", Seq("payload"), 2)))
  }

  test("zorder layout over a STRING dimension clusters via the ord64 surrogate") {
    val t = freshTable("zstr")
    // payload prefixes split the key space into 4 distinct groups
    def g(lo: Long, hi: Long) = s.range(lo, hi).select($"id",
      ($"id" % 7).as("k"),
      concat(element_at(array(lit("alpha"), lit("golf"), lit("omega"),
        lit("zulu")), (($"id" * 131) % 4 + 1).cast("int")),
        lit("-"), $"id").as("payload"))
    SnapshotLog.commit(g(0, 50), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "zorder", Seq("payload", "id"), 4)
    // scrambled append CONFORMS: 4 files clustered on (ord64(payload), id)
    SnapshotLog.commit(g(50, 450).repartition(13, $"k"), t, "append",
      Seq("id", "payload"))
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    val v3 = m.files.filter(f => f.path.contains("v00003") && f.rows > 0)
    assert(v3.size == 4)
    assert(SnapshotLog.read(s, t).count() == 450)
    // clustering is real: under a hash scatter EVERY file's [min,max]
    // payload window spans the whole alpha..zulu vocabulary; under the
    // z-layout most files sit inside one payload half-band (a boundary
    // file may straddle where the curve jumps bands — that's the
    // z-order trade, not a failure)
    val vocab = Seq("alpha", "golf", "omega", "zulu")
    val windows = v3.flatMap(_.stats.get("payload")).map {
      case (mn, mx) => (vocab.indexOf(mn.toString.takeWhile(_ != '-')),
        vocab.indexOf(mx.toString.takeWhile(_ != '-')))
    }
    assert(windows.size == 4 && windows.forall(w => w._1 >= 0 && w._2 >= 0))
    assert(windows.count { case (a, b) => b - a <= 1 } >= 2,
      s"zorder over ord64 did not cluster the string dimension: $windows")
  }

  test("the layout survives rename (re-keyed), restore, stream appends, and delta manifests") {
    val t = freshTable("carry")
    SnapshotLog.commit(df(0, 60), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "range", Seq("k"), 2)
    // rename the layout column: the spec follows it
    SnapshotLog.renameColumn(s, t, "k", "bucket")
    assert(SnapshotLog.layoutOf(s, t).contains(LayoutSpec("range", Seq("bucket"), 2)))
    // stream appends conform (and the spec rides delta manifests: many
    // commits so delta encoding engages)
    (1 to 12).foreach { e =>
      SnapshotLog.appendStreamBatch(
        df(60 + e * 10, 70 + e * 10).withColumnRenamed("k", "bucket"),
        t, e.toLong, Seq("id"))
    }
    assert(SnapshotLog.layoutOf(s, t).contains(LayoutSpec("range", Seq("bucket"), 2)))
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    assert(m.files.count(_.path.contains(f"v${m.version}%05d")) == 2)
    // restore carries the target's layout (declared-after → None there)
    val vDeclared = 2L
    SnapshotLog.restore(s, t, 1L)
    assert(SnapshotLog.layoutOf(s, t).isEmpty)
    SnapshotLog.restore(s, t, vDeclared)
    assert(SnapshotLog.layoutOf(s, t).contains(LayoutSpec("range", Seq("k"), 2)))
    // clearLayout stops conforming
    SnapshotLog.clearLayout(s, t)
    assert(SnapshotLog.layoutOf(s, t).isEmpty)
    val vBefore = SnapshotLog.latestVersion(s, t).get
    SnapshotLog.commit(df(1000, 1010).repartition(3), t, "append", Seq("id"))
    val m2 = SnapshotLog.manifest(s, t, vBefore + 1)
    assert(m2.files.count(_.path.contains(f"v${vBefore + 1}%05d")) == 3)
  }

  test("a branch fork inherits the layout and conforms its own appends") {
    val t = freshTable("branch")
    SnapshotLog.commit(df(0, 60), t, "append", Seq("id"))
    SnapshotLog.setLayout(s, t, "range", Seq("id"), 2)
    val bt = SnapshotLog.createBranch(s, t, "wap")
    assert(SnapshotLog.layoutOf(s, bt).contains(LayoutSpec("range", Seq("id"), 2)))
    SnapshotLog.commit(df(60, 160).repartition(5), bt, "append", Seq("id"))
    val m = SnapshotLog.manifest(s, bt, SnapshotLog.latestVersion(s, bt).get)
    assert(m.files.count(_.path.contains("v00002")) == 2)
    // fast-forward publishes the layout back to main
    SnapshotLog.fastForward(s, t, "wap")
    assert(SnapshotLog.layoutOf(s, t).contains(LayoutSpec("range", Seq("id"), 2)))
  }
}
