package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Streaming FROM a snapshot table (versions-as-offsets): each committed
  * version is consumed exactly once, restarts resume from the
  * checkpointed version, pruning and schema evolution behave like the
  * batch read, and non-append history fails the stream loudly.
  */
class SnapshotStreamSourceSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapstream-src-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  private def df(lo: Long, hi: Long) =
    s.range(lo, hi).select($"id", ($"id" % 7).as("k"),
      concat(lit("row"), $"id").as("payload"))

  test("versions stream exactly once as they commit") {
    val t = freshTable("once")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_once")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_once").count() == 100)
      SnapshotLog.commit(df(100, 250), t, "append", Seq("id"))
      SnapshotLog.commit(df(250, 300), t, "append", Seq("id"))
      q.processAllAvailable()
      val rows = s.table("snap_stream_once")
      assert(rows.count() == 300) // exactly once: no re-reads
      assert(rows.agg(sum($"id")).head.getLong(0) == (0L until 300).sum)
      // payloads decoded, not just counted
      assert(rows.where($"payload" === "row123").count() == 1)
    } finally q.stop()
  }

  test("restart resumes from the checkpointed version (foreachBatch)") {
    val t = freshTable("resume")
    val cp = freshTable("resume-cp")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = s.readStream.format("graft-snapshot").option("table", t).load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select($"id").collect().foreach(r => got.add(r.getLong(0))); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(got.size() == 50)
    SnapshotLog.commit(df(50, 80), t, "append", Seq("id"))
    run() // NEW query, SAME checkpoint: only the new version arrives
    assert(got.size() == 80)
    assert(got.iterator().asScala.toSeq.sorted == (0L until 80))
    run() // nothing new: no rows
    assert(got.size() == 80)
  }

  test("column pruning and schema evolution match the batch read") {
    val t = freshTable("evolve")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.evolveSchema(s, t,
      SnapshotLog.manifest(s, t, 1L).schemaDdl + ",extra BIGINT")
    SnapshotLog.commit(df(10, 20).withColumn("extra", $"id" * 2), t,
      "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .select($"id", $"extra") // prunes k/payload at the parquet level
      .writeStream.format("memory").queryName("snap_stream_evolve")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = s.table("snap_stream_evolve")
      assert(rows.count() == 20)
      assert(rows.where($"extra".isNull).count() == 10) // pre-evolve files
      assert(rows.where($"extra" === $"id" * 2).count() == 10)
    } finally q.stop()
  }

  test("startingVersion skips already-processed history") {
    val t = freshTable("startv")
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"))
    SnapshotLog.commit(df(40, 70), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("snap_stream_startv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = s.table("snap_stream_startv")
      assert(rows.count() == 30) // v1's files skipped
      assert(rows.agg(min($"id")).head.getLong(0) == 40L)
    } finally q.stop()
  }

  test("array columns stream bit-faithfully, including nulls and empties") {
    val t = freshTable("arrays")
    val rows = Seq(
      (1L, Seq(1.5f, -2.25f, 3.0f)),
      (2L, Seq.empty[Float]),
      (3L, null.asInstanceOf[Seq[Float]]),
      (4L, Seq(0.0f, Float.MinPositiveValue)))
    SnapshotLog.commit(rows.toDF("id", "vec"), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_arrays")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("snap_stream_arrays")
        .collect().map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
      assert(got(1L).get == Seq(1.5f, -2.25f, 3.0f))
      assert(got(2L).get.isEmpty)
      assert(got(3L).isEmpty) // null array stays null
      assert(got(4L).get == Seq(0.0f, Float.MinPositiveValue))
    } finally q.stop()
  }

  test("struct columns stream field-faithfully, including nulls") {
    val t = freshTable("structs")
    val src = s.range(0, 20).select($"id",
      when($"id" % 5 === 0, lit(null)).otherwise(struct(
        ($"id" * 3).as("a"),
        when($"id" % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), $"id")).as("b"),
        when($"id" % 4 === 0, lit(null).cast("array<float>"))
          .otherwise(array(($"id" + 0.5).cast("float"),
            lit(-1.25f))).as("vec"))).as("m"))
    SnapshotLog.commit(src.where($"id" < 10), t, "append", Seq("id"))
    SnapshotLog.commit(src.where($"id" >= 10), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_structs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("snap_stream_structs").orderBy($"id")
        .collect().map(r => r.getLong(0) -> r.get(1))
      val want = src.orderBy($"id").collect().map(r => r.getLong(0) -> r.get(1))
      assert(got.toSeq == want.toSeq) // every field, every null, both files
    } finally q.stop()
  }

  test("nested structs, array<struct>, and array<array> stream faithfully") {
    val t = freshTable("deepnest")
    // depth-2 struct with nulls at every level, an array of structs,
    // and a nested float array — the multimodal-metadata shapes
    val src = s.range(0, 24).select($"id",
      when($"id" % 7 === 0, lit(null)).otherwise(struct(
        ($"id" * 2).as("a"),
        when($"id" % 3 === 0, lit(null)).otherwise(struct(
          concat(lit("n"), $"id").as("tag"),
          when($"id" % 4 === 0, lit(null).cast("long"))
            .otherwise($"id" + 100).as("v"))).as("inner"))).as("m"),
      when($"id" % 5 === 0, lit(null)).otherwise(array(
        struct($"id".as("k"), ($"id" % 2 === 0).as("even")),
        struct(($"id" + 1).as("k"), lit(false).as("even")))).as("ann"),
      array(array(($"id" + 0.25).cast("float")),
        array(lit(1.5f), lit(-2.5f))).as("frames"))
    SnapshotLog.commit(src.where($"id" < 12), t, "append", Seq("id"))
    SnapshotLog.commit(src.where($"id" >= 12), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_deep")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("snap_stream_deep").orderBy($"id").collect()
        .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3)))
      val want = src.orderBy($"id").collect()
        .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3)))
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("map columns stream entry-faithfully, including null values, empties, and depth-2 nesting") {
    val t = freshTable("maps")
    // multimodal metadata's native shape: top-level map<string,long>
    // (with an empty map and a null-valued entry), a map at depth 2
    // inside a struct, and a map with array values
    val in = s.range(0, 6).select($"id",
      when($"id" === 5, map())
        .otherwise(map(lit("a"), $"id", lit("b"),
          when($"id" === 4, lit(null).cast("long")).otherwise($"id" * 10)))
        .as("m"),
      struct($"id".as("inner_id"),
        map(lit("w"), ($"id" % 3).cast("long")).as("tags")).as("meta"),
      map(lit("frames"), array($"id", $"id" + 1)).as("mv"))
    SnapshotLog.commit(in.where($"id" % 2 === 0), t, "append", Nil)
    SnapshotLog.commit(in.where($"id" % 2 === 1), t, "append", Nil)
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_maps")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("snap_stream_maps")
      assert(got.count() == 6)
      // streamed rows must equal the batch read, entry for entry
      val batch = SnapshotLog.read(s, t)
      assert(got.select($"id", to_json($"m"), to_json($"meta"), to_json($"mv"))
        .collect().map(_.toSeq).toSet ==
        batch.select($"id", to_json($"m"), to_json($"meta"), to_json($"mv"))
          .collect().map(_.toSeq).toSet)
      // spot semantics: element_at over the streamed frame
      assert(got.where($"id" === 2).select(element_at($"m", "b")).head.getLong(0) == 20L)
      assert(got.where($"id" === 4).select(element_at($"m", "b")).head.isNullAt(0))
      assert(got.where($"id" === 5).select(size($"m")).head.getInt(0) == 0)
      assert(got.select(sum(element_at($"meta.tags", "w"))).head.getLong(0) ==
        (0 until 6).map(_ % 3).sum)
      assert(got.where($"id" === 3)
        .select(element_at($"mv", "frames")).head.getSeq[Long](0) == Seq(3L, 4L))
    } finally q.stop()
  }

  test("unsupported column shapes are refused at stream construction") {
    val t = freshTable("badtypes")
    // complex-keyed maps stay batch-read territory (scalar keys stream)
    SnapshotLog.commit(
      s.range(0, 3).select($"id",
        map(struct($"id".as("a")), $"id").as("m")), t, "append", Nil)
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_bad")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("read it in batch")),
      messages(e).mkString("; "))
  }

  test("maxVersionsPerTrigger bounds backlog catch-up batches") {
    val t = freshTable("throttle")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    SnapshotLog.commit(df(10, 30), t, "append", Seq("id"))
    SnapshotLog.commit(df(30, 60), t, "append", Seq("id"))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = s.readStream.format("graft-snapshot").option("table", t)
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.count()); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // the three-version backlog arrives as one batch per version, in
    // commit order — never one giant catch-up batch
    assert(batches.iterator().asScala.toSeq == Seq(10L, 20L, 30L))
  }

  test("pushed range filters prune files per batch by manifest stats") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    import graft.sources.snapshot.{SnapshotMicroBatchStream, SnapshotOffset}
    val t = freshTable("prune")
    // four single-file versions with disjoint id ranges
    Seq((0L, 100L), (100L, 200L), (200L, 300L), (300L, 400L)).foreach {
      case (lo, hi) =>
        SnapshotLog.commit(df(lo, hi).repartition(1), t, "append", Seq("id"))
    }
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("table", t))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      SnapshotLog.manifest(s, t, 4L).schemaDdl)
    def partitions(filters: org.apache.spark.sql.sources.Filter*): Int =
      new SnapshotMicroBatchStream(schema, opts, filters.toArray)
        .planInputPartitions(SnapshotOffset(0), SnapshotOffset(4)).length
    assert(partitions() == 4)
    assert(partitions(GreaterThanOrEqual("id", 250L)) == 2)
    assert(partitions(GreaterThanOrEqual("id", 250L), LessThan("id", 300L)) == 1)
    assert(partitions(GreaterThanOrEqual("id", 1000L)) == 0)
    // unknown column never prunes
    assert(partitions(GreaterThanOrEqual("nope", 1L)) == 4)
    // end-to-end: the filter reaches the stream and content is exact
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .where($"id" >= 250L && $"id" < 310L)
      .writeStream.format("memory").queryName("snap_stream_pruned")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = s.table("snap_stream_pruned").agg(
        count(lit(1)), min($"id"), max($"id")).head
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((60L, 250L, 309L)))
    } finally q.stop()
  }

  test("streaming a WAP branch defaults past the fork marker: only branch-local additions arrive") {
    val t = freshTable("branch-default")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "audit")
    // the stream's default start is the fork marker (v1), so the
    // parent's 100 fork-base rows are NOT replayed — the audit stream
    // carries exactly what the load lands on the branch
    val q = s.readStream.format("graft-snapshot").option("table", bt).load()
      .writeStream.format("memory").queryName("snap_stream_branch")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_branch").count() == 0)
      SnapshotLog.commit(df(100, 130), bt, "append", Seq("id"))
      SnapshotLog.commit(df(130, 140), bt, "append", Seq("id"))
      q.processAllAvailable()
      val rows = s.table("snap_stream_branch")
      assert(rows.count() == 40)
      assert(rows.agg(sum($"id")).head.getLong(0) == (100L until 140).sum)
    } finally q.stop()
  }

  test("streaming a branch from startingVersion=0 replays the fork base too") {
    val t = freshTable("branch-v0")
    SnapshotLog.commit(df(0, 50), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "full")
    SnapshotLog.commit(df(50, 60), bt, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", bt)
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("snap_stream_branch_v0")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // v1 (creation marker) is append-shaped from empty: fork base +
      // the branch append both arrive, each exactly once
      assert(s.table("snap_stream_branch_v0").count() == 60)
      assert(s.table("snap_stream_branch_v0").agg(sum($"id")).head.getLong(0) ==
        (0L until 60).sum)
    } finally q.stop()
  }

  test("a rebase inside the streamed range fails loudly; a restart resumes past the new marker") {
    val t = freshTable("branch-rebase")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    val bt = SnapshotLog.createBranch(s, t, "load")
    SnapshotLog.commit(df(100, 110), bt, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", bt).load()
      .writeStream.format("memory").queryName("snap_stream_rebase")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_rebase").count() == 10)
      // main advances; the branch rebases — shared history re-points
      SnapshotLog.commit(df(20, 30), t, "append", Seq("id"))
      SnapshotLog.rebaseBranch(s, t, "load")
      SnapshotLog.commit(df(110, 115), bt, "append", Seq("id"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("rebase") ||
        Option(ex.getCause).exists(_.getMessage.contains("rebase")))
    } finally q.stop()
    // a FRESH stream (default start) resumes past the new fork marker:
    // only post-rebase branch-local additions arrive
    val q2 = s.readStream.format("graft-snapshot").option("table", bt).load()
      .writeStream.format("memory").queryName("snap_stream_rebase2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val rows = s.table("snap_stream_rebase2")
      assert(rows.count() == 5)
      assert(rows.agg(sum($"id")).head.getLong(0) == (110L until 115).sum)
    } finally q2.stop()
  }

  test("a rename mid-stream composes like evolve: no files change, decode rides physical names") {
    val t = freshTable("rename-mid")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_ren_mid")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_ren_mid").count() == 20)
      SnapshotLog.renameColumn(s, t, "k", "bucket")
      SnapshotLog.commit(df(20, 30).withColumnRenamed("k", "bucket"),
        t, "append", Seq("id"))
      q.processAllAvailable()
      // the stream keeps its construction-time schema (old names), and
      // post-rename files decode through the stable physical name
      val got = s.table("snap_stream_ren_mid")
      assert(got.count() == 30)
      assert(got.agg(sum($"k")).head.getLong(0) == (0L until 30).map(_ % 7).sum)
    } finally q.stop()
  }

  test("a mid-stream rename of a PREVIOUSLY-renamed column still decodes (mapping era = stream construction)") {
    val t = freshTable("rename-twice")
    SnapshotLog.commit(df(0, 20), t, "append", Seq("id")) // physical name: k
    SnapshotLog.renameColumn(s, t, "k", "b") // stream era: b -> k
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_ren2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_ren2").count() == 20)
      // the ADVICE case: rename the already-renamed column INSIDE the
      // streamed range — the latest manifest now keys its mapping by
      // 'c', and a per-batch lookup with the stream's name 'b' would
      // miss and request a column no file carries (silent null-fill)
      SnapshotLog.renameColumn(s, t, "b", "c")
      SnapshotLog.commit(df(20, 30).withColumnRenamed("k", "c"),
        t, "append", Seq("id"))
      q.processAllAvailable()
      val got = s.table("snap_stream_ren2")
      assert(got.columns.toSeq == Seq("id", "b", "payload"))
      assert(got.count() == 30)
      // both eras decode through the stable physical name k — no nulls
      assert(got.where($"b".isNull).count() == 0)
      assert(got.agg(sum($"b")).head.getLong(0) == (0L until 30).map(_ % 7).sum)
    } finally q.stop()
  }

  test("a mid-stream DROP COLUMN of an unselected column streams through without restart") {
    val t = freshTable("dropthrough")
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"))
    // Spark does not push a streaming projection into the v2 source, so
    // the stream DECLARES its columns — which is also what makes the
    // per-file reader decode two columns instead of three
    val q = s.readStream.format("graft-snapshot").option("table", t)
      .option("columns", "id, payload").load()
      .writeStream.format("memory").queryName("snap_stream_dropthrough")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("snap_stream_dropthrough").count() == 40)
      // metadata-only drop of the UNSELECTED column, then a post-drop
      // append under the surviving schema — the running stream must
      // carry both the drop version (no files) and the new batch
      SnapshotLog.dropColumn(s, t, "k")
      SnapshotLog.commit(
        s.range(40, 60).select($"id", concat(lit("row"), $"id").as("payload")),
        t, "append", Seq("id"))
      q.processAllAvailable()
      val rows = s.table("snap_stream_dropthrough")
      assert(rows.count() == 60, "the stream did not survive the drop")
      assert(rows.agg(sum($"id")).head.getLong(0) == (0L until 60).sum)
      assert(rows.where($"payload" === "row55").count() == 1)
    } finally q.stop()
  }

  test("restart across a RENAME: undeclared rides the checkpoint, declared refuses by name") {
    val t = freshTable("renrestart")
    val cp = freshTable("renrestart-cp")
    SnapshotLog.commit(df(0, 30), t, "append", Seq("id"))
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    def run(cols: String): Unit = {
      val q = s.readStream.format("graft-snapshot").option("table", t)
        .option("columns", cols).load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run("id, payload")
    assert(got.get() == 30)
    // rename the UNDECLARED column between runs: the same checkpoint
    // rides through the DDL version and serves only the new batch
    SnapshotLog.renameColumn(s, t, "k", "kk")
    SnapshotLog.commit(df(30, 50).withColumnRenamed("k", "kk"), t,
      "append", Seq("id"))
    run("id, payload")
    assert(got.get() == 50, "restart across an undeclared rename double-read or dropped")
    // rename a DECLARED column: the restart refuses at construction,
    // naming the missing column (the user's declared projection is the
    // contract — silently serving a renamed column would un-pin it)
    SnapshotLog.renameColumn(s, t, "payload", "body")
    val e = intercept[Exception] { run("id, payload") }
    assert(e.getMessage.contains("payload"), e.getMessage)
    // declaring the NEW name works and resumes the same checkpoint
    SnapshotLog.commit(
      s.range(50, 60).select($"id", ($"id" % 7).as("kk"),
        concat(lit("row"), $"id").as("body")), t, "append", Seq("id"))
    run("id, body")
    assert(got.get() == 60,
      "the re-declared stream lost the checkpoint or re-read history")
  }

  test("startingTimestamp resolves the start offset; exclusive with startingVersion") {
    val t = freshTable("startts")
    SnapshotLog.commit(df(0, 40), t, "append", Seq("id"))
    Thread.sleep(60) // separate the commit instants
    val between = System.currentTimeMillis()
    Thread.sleep(60)
    SnapshotLog.commit(df(40, 70), t, "append", Seq("id"))
    // epoch-millis between v1 and v2: only v2's rows stream
    val q = s.readStream.format("graft-snapshot").option("table", t)
      .option("startingTimestamp", between.toString).load()
      .writeStream.format("memory").queryName("snap_start_ts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = s.table("snap_start_ts")
      assert(rows.count() == 30, "startingTimestamp served the wrong versions")
      assert(rows.agg(min(col("id"))).head.getLong(0) == 40L)
    } finally q.stop()
    // an instant before the table existed streams everything
    val q2 = s.readStream.format("graft-snapshot").option("table", t)
      .option("startingTimestamp", "2000-01-01").load()
      .writeStream.format("memory").queryName("snap_start_ts0")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(s.table("snap_start_ts0").count() == 70)
    } finally q2.stop()
    // INCLUSIVE boundary (the Delta contract): a version committed
    // exactly AT the given instant is served, never skipped — the
    // offset resolves strictly-before (versionAt(millis - 1))
    val v2Ts = {
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_log", "v00002.json")), "UTF-8")
      """"ts"\s*:\s*(\d+)""".r.findFirstMatchIn(raw).get.group(1).toLong
    }
    val q3 = s.readStream.format("graft-snapshot").option("table", t)
      .option("startingTimestamp", v2Ts.toString).load()
      .writeStream.format("memory").queryName("snap_start_at")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      assert(s.table("snap_start_at").count() == 30,
        "a commit stamped exactly at startingTimestamp was skipped")
    } finally q3.stop()
    // both options at once refuse loudly; garbage refuses naming the shape
    val e = intercept[Exception] {
      val qq = s.readStream.format("graft-snapshot").option("table", t)
        .option("startingTimestamp", between.toString)
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("snap_start_both").start()
      try qq.processAllAvailable() finally qq.stop()
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
    val e2 = intercept[Exception] {
      val qq = s.readStream.format("graft-snapshot").option("table", t)
        .option("startingTimestamp", "not-a-time").load()
        .writeStream.format("memory").queryName("snap_start_bad").start()
      try qq.processAllAvailable() finally qq.stop()
    }
    assert(e2.getMessage.contains("startingTimestamp"), e2.getMessage)
  }

  test("Trigger.AvailableNow drains the start-pinned backlog in bounded batches, then terminates") {
    val t = freshTable("availnow")
    val cp = freshTable("availnow-cp")
    SnapshotLog.commit(df(0, 30), t, "append", Seq("id"))
    SnapshotLog.commit(df(30, 50), t, "append", Seq("id"))
    SnapshotLog.commit(df(50, 60), t, "append", Seq("id"))
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    def run(): Unit = {
      val q = s.readStream.format("graft-snapshot").option("table", t)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) { batches.incrementAndGet(); got.addAndGet(n) }
          ()
        }.start()
      assert(q.awaitTermination(120000),
        "Trigger.AvailableNow did not self-terminate")
    }
    run() // drains the 3-version backlog one version per batch, stops
    assert(got.get() == 60, s"drained ${got.get()} of 60 rows")
    assert(batches.get() == 3,
      s"expected 3 bounded catch-up batches, saw ${batches.get()}")
    // a later commit is NOT consumed until the next run, which resumes
    // from the checkpoint and drains exactly the new version
    SnapshotLog.commit(df(60, 80), t, "append", Seq("id"))
    run()
    assert(got.get() == 80, s"restart drained ${got.get()} of 80 rows")
    assert(batches.get() == 4)
  }

  test("a mid-stream DROP COLUMN of a SELECTED column refuses, naming it") {
    val t = freshTable("dropused")
    SnapshotLog.commit(df(0, 10), t, "append", Seq("id"))
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .select($"id", $"k")
      .writeStream.format("memory").queryName("snap_stream_dropused")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      SnapshotLog.dropColumn(s, t, "k")
      SnapshotLog.commit(
        s.range(10, 20).select($"id", concat(lit("row"), $"id").as("payload")),
        t, "append", Seq("id"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = e.getCause match {
        case null => e.getMessage
        case c => c.getMessage + e.getMessage
      }
      assert(msg.contains("dropped column") || msg.contains("'k'") ||
        msg.contains(" k "), msg)
    } finally q.stop()
  }

  test("non-append history inside the range fails the stream loudly") {
    val t = freshTable("reject")
    SnapshotLog.commit(df(0, 100), t, "append", Seq("id"))
    SnapshotLog.deleteWhere(s, t, "id", 0L, 10L).get
    val q = s.readStream.format("graft-snapshot").option("table", t).load()
      .writeStream.format("memory").queryName("snap_stream_reject")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("append-only")), messages(e).mkString("; "))
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext
      def next() = it.next()
    }
  }
}
