package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** Continuous tar ingestion: shards-as-offsets micro-batch streaming
  * (SURVEY.md §4.4). New shards appearing between triggers are picked
  * up exactly once.
  */
class WdsTarStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def mkDir() = {
    val d = Paths.get("target", "stream-tars-" + System.nanoTime()).toAbsolutePath
    Files.createDirectories(d)
    d
  }

  private val dir = mkDir()

  private def writeTar(name: String, keys: Seq[String]): Unit =
    writeTarIn(dir, name, keys)

  private def writeTarIn(d: java.nio.file.Path, name: String, keys: Seq[String]): Unit = {
    val out = new TarArchiveOutputStream(new FileOutputStream(d.resolve(name).toFile))
    keys.foreach { k =>
      val bytes = s"payload-$k".getBytes("UTF-8")
      val e = new TarArchiveEntry(s"$k.txt")
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.close()
  }

  test("micro-batch stream ingests shards exactly once as they appear") {
    writeTar("shard-000000.tar", Seq("a1", "a2"))
    val stream = spark.readStream.format("wds-tar")
      .option("path", dir.toString)
      .option("extensions", "txt")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("tar_stream")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tar_stream").count() == 2)
      // a new shard lands between triggers
      writeTar("shard-000001.tar", Seq("b1", "b2", "b3"))
      q.processAllAvailable()
      val rows = spark.table("tar_stream")
      assert(rows.count() == 5) // exactly once: 2 + 3, no re-reads
      assert(rows.select("__key__").collect().map(_.getString(0)).sorted.toSeq ==
        Seq("a1", "a2", "b1", "b2", "b3"))
    } finally q.stop()
  }

  test("pushed filters reach the streaming path: url prunes partitions, key skips samples") {
    val d3 = mkDir()
    writeTarIn(d3, "shard-000000.tar", Seq("k1", "k2"))
    writeTarIn(d3, "shard-000001.tar", Seq("k3", "m4"))
    import org.apache.spark.sql.functions.col
    val stream = spark.readStream.format("wds-tar")
      .option("path", d3.toString)
      .option("extensions", "txt")
      .load()
      .filter(col("__url__").endsWith("shard-000001.tar") &&
        col("__key__").startsWith("k"))
    val q = stream.writeStream
      .format("memory").queryName("tar_stream_pushed")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // shard 0 pruned, m4 skipped in-reader, k3 survives; and the
      // offset still committed BOTH shards (progress is
      // filter-independent) — a new shard keeps streaming normally
      assert(spark.table("tar_stream_pushed").collect()
        .map(_.getString(0)).toSeq == Seq("k3"))
      writeTarIn(d3, "shard-000002.tar", Seq("k9"))
      q.processAllAvailable()
      // shard 2 fails the url predicate → still no extra rows
      assert(spark.table("tar_stream_pushed").count() == 1)
    } finally q.stop()
  }

  test("streaming wds-tar SINK: tar stream → transform → tar shards, round-trip") {
    // the continuous re-sharding loop: read a growing tar corpus as a
    // stream, uppercase the payload, write tar shards back — then scan
    // the written shards with the batch source and check content
    val src = mkDir()
    val out = mkDir()
    val ckpt = mkDir()
    writeTarIn(src, "shard-000000.tar", Seq("r1", "r2"))
    import org.apache.spark.sql.functions._
    val stream = spark.readStream.format("wds-tar")
      .option("path", src.toString)
      .option("extensions", "txt")
      .load()
      .select(col("__key__"),
        upper(col("txt").cast("string")).cast("binary").as("txt"))
    val q = stream.writeStream
      .format("wds-tar")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // second epoch: a new source shard lands between triggers
      writeTarIn(src, "shard-000001.tar", Seq("r3"))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.format("wds-tar")
      .option("path", out.toString)
      .option("extensions", "txt")
      .load()
      .select(col("__key__"), col("txt").cast("string").as("txt"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(written == Map(
      "r1" -> "PAYLOAD-R1", "r2" -> "PAYLOAD-R2", "r3" -> "PAYLOAD-R3"))
    // epoch-deterministic shard names, rename-on-commit: no .inprogress
    // leftovers, at least two epochs' shards present (dotfiles are the
    // local filesystem's .crc siblings, not shards)
    val allNames = out.toFile.listFiles().map(_.getName).toSeq
    assert(allNames.forall(!_.endsWith(".inprogress")), allNames.toString)
    val names = allNames.filterNot(_.startsWith("."))
    assert(names.count(_.matches("shard-e\\d+-p\\d+\\.tar")) == names.size)
    assert(names.map(_.replaceAll("-p\\d+\\.tar$", "")).distinct.size >= 2,
      s"expected shards from >= 2 epochs, got $names")
  }

  test("createStream: config-built continuous pipeline with stream-static meta join") {
    val d = mkDir()
    val metaDir = Paths.get(d.toString + "_info")
    Files.createDirectories(metaDir)
    def tarWith(dd: java.nio.file.Path, name: String, members: Seq[(String, String)]): Unit = {
      val out = new TarArchiveOutputStream(new FileOutputStream(dd.resolve(name).toFile))
      members.foreach { case (n, c) =>
        val bytes = c.getBytes("UTF-8")
        val e = new TarArchiveEntry(n)
        e.setSize(bytes.length.toLong)
        out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
      }
      out.close()
    }
    tarWith(d, "shard-000000.tar", Seq("c1.txt" -> "alpha", "c1.cls" -> "5",
      "c2.txt" -> "beta", "c2.cls" -> "6"))
    tarWith(metaDir, "shard-000000.tar", Seq("c1.txt" -> "41", "c2.txt" -> "42"))
    val config = graft.pipeline.PipelineConfig(
      urls = Seq(d.toString),
      extensions = Seq("txt", "cls"),
      metaSuffixes = Seq("info"),
      postprocessors = Seq(graft.pipeline.FilterStage(
        graft.operators.LambdaFilter(Seq("cls"),
          c => c > org.apache.spark.sql.functions.lit(0)))))
    val q = graft.pipeline.GraftPipeline.createStream(spark, config)
      .writeStream.format("memory").queryName("pipe_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("pipe_stream").collect()
        .map(r => r.getAs[String]("__key__") ->
          ((r.getAs[String]("txt"), r.getAs[Long]("cls"),
            r.getAs[String]("txt_info")))).toMap
      assert(rows == Map(
        "c1" -> (("alpha", 5L, "41")),
        "c2" -> (("beta", 6L, "42"))))
      // main + meta shards arriving together are joined by the batch
      // that ingests them (the static side re-plans per micro-batch)
      tarWith(d, "shard-000001.tar", Seq("c3.txt" -> "gamma", "c3.cls" -> "7"))
      tarWith(metaDir, "shard-000001.tar", Seq("c3.txt" -> "43"))
      q.processAllAvailable()
      val all = spark.table("pipe_stream").collect()
      assert(all.length == 3)
      assert(all.map(_.getAs[String]("__key__")).sorted.toSeq == Seq("c1", "c2", "c3"))
    } finally q.stop()
  }

  test("createStream rejects batch-only semantics loudly") {
    val d = mkDir()
    def cfg = graft.pipeline.PipelineConfig(
      urls = Seq(d.toString), extensions = Seq("txt"))
    intercept[IllegalArgumentException](graft.pipeline.GraftPipeline
      .createStream(spark, cfg.copy(sampleShuffleSeed = Some(1))))
    intercept[IllegalArgumentException](graft.pipeline.GraftPipeline
      .createStream(spark, cfg.copy(metaJoin = "zip")))
    intercept[IllegalArgumentException](graft.pipeline.GraftPipeline
      .createStream(spark, cfg.copy(urls = Seq(d.toString, d.toString))))
  }

  test("streaming sink replay: re-committing the same shard name overwrites, never duplicates") {
    // the idempotency mechanism under micro-batch retry: a replayed
    // epoch writes the same deterministic final name; commit drops the
    // stale file before rename
    import org.apache.spark.sql.types._
    import org.apache.spark.util.SerializableConfiguration
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val outDir = mkDir().toString
    val schema = StructType(Seq(
      StructField("__key__", StringType), StructField("txt", BinaryType)))
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    def commitOnce(payload: String, taskId: Long): Unit = {
      val w = new graft.sources.wdstar.WdsTarDataWriter(outDir, schema, conf,
        metaSuffixes = Nil,
        shardName = "shard-e000001-p00000.tar",
        tmpName = s".shard-e000001-p00000-$taskId.tar.inprogress",
        overwriteFinal = true)
      w.write(InternalRow(UTF8String.fromString("k1"),
        payload.getBytes("UTF-8")))
      w.commit()
    }
    commitOnce("first attempt", taskId = 7)
    commitOnce("replayed epoch", taskId = 8) // same shard, new task id
    val rows = spark.read.format("wds-tar")
      .option("path", outDir).option("extensions", "txt").load().collect()
    assert(rows.length == 1, s"duplicated shards: ${rows.length} rows")
    assert(new String(rows(0).getAs[Array[Byte]]("txt")) == "replayed epoch")
  }

  test("streaming replay sweeps stale rolled chunks from a fatter previous attempt") {
    import org.apache.spark.sql.types._
    import org.apache.spark.util.SerializableConfiguration
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val outDir = mkDir().toString
    val schema = StructType(Seq(
      StructField("__key__", StringType), StructField("txt", BinaryType)))
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    def commitRows(n: Int, maxPerShard: Long, taskId: Long): Unit = {
      val w = new graft.sources.wdstar.WdsTarDataWriter(outDir, schema, conf,
        metaSuffixes = Nil,
        shardName = "shard-e000002-p00000.tar",
        tmpName = s".shard-e000002-p00000-$taskId.tar.inprogress",
        overwriteFinal = true, maxSamples = maxPerShard)
      (0 until n).foreach(i => w.write(InternalRow(
        UTF8String.fromString(f"k$i%03d"), s"v$i".getBytes("UTF-8"))))
      w.commit()
    }
    commitRows(10, maxPerShard = 3, taskId = 1) // 4 chunks: c0..c0003
    assert(new java.io.File(outDir).list().count(_.endsWith(".tar")) == 4)
    commitRows(10, maxPerShard = 6, taskId = 2) // replay packs into 2
    val tars = new java.io.File(outDir).list().filter(_.endsWith(".tar"))
    assert(tars.length == 2, s"stale chunks survived: ${tars.sorted.mkString(",")}")
    val rows = spark.read.format("wds-tar")
      .option("path", outDir).option("extensions", "txt").load()
    assert(rows.count() == 10, "replay duplicated or lost samples")
  }

  test("shard sorting before the committed prefix fails loudly, no silent re-read") {
    val d2 = mkDir()
    writeTarIn(d2, "shard-000005.tar", Seq("x1"))
    val stream = spark.readStream.format("wds-tar")
      .option("path", d2.toString)
      .option("extensions", "txt")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("tar_stream_ooo")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tar_stream_ooo").count() == 1)
      // a late shard that sorts BEFORE the committed one shifts slice
      // indices — must be rejected, not double-read
      writeTarIn(d2, "shard-000001.tar", Seq("late"))
      val e = intercept[Exception](q.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
      assert(messages(e).exists(_.contains("not an append")), e.toString)
    } finally q.stop()
  }

  test("restart from checkpoint: committed shards stay processed-once, new shards resume") {
    // The production restart story end-to-end: run a tar→tar pipeline,
    // STOP the query, land more source shards, start a NEW query from
    // the same checkpoint — the committed offset must carry across
    // processes, so nothing is re-read (no duplicate content, no
    // re-written epoch shards) and the new shards flow through. This is
    // what makes the epoch-deterministic shard naming + rename-on-commit
    // protocol safe under scheduled restarts, not just in-process retry.
    val src = mkDir()
    val out = mkDir()
    val ckpt = mkDir()
    import org.apache.spark.sql.functions._
    writeTarIn(src, "shard-000000.tar", Seq("s1", "s2"))
    def startQuery() = spark.readStream.format("wds-tar")
      .option("path", src.toString)
      .option("extensions", "txt")
      .load()
      .select(col("__key__"),
        upper(col("txt").cast("string")).cast("binary").as("txt"))
      .writeStream
      .format("wds-tar")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    def shardNames() = out.toFile.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    def shardMtimes() = out.toFile.listFiles()
      .filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified()).toMap
    val firstRunShards = shardNames()
    assert(firstRunShards.nonEmpty)
    val firstRunMtimes = shardMtimes()
    // source grows while no query is running
    writeTarIn(src, "shard-000001.tar", Seq("s3"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    // first run's shards are untouched (same names, same mtimes — the
    // restarted query neither re-read shard 0 nor re-wrote its epochs)
    val after = shardMtimes()
    firstRunShards.foreach { n =>
      assert(after.contains(n), s"restart dropped shard $n")
      assert(after(n) == firstRunMtimes(n), s"restart re-wrote shard $n")
    }
    assert(shardNames().size > firstRunShards.size,
      "restarted query wrote no new shards")
    // content union: every sample exactly once across both runs
    val written = spark.read.format("wds-tar")
      .option("path", out.toString)
      .option("extensions", "txt")
      .load()
      .select(col("__key__"), col("txt").cast("string").as("txt"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(written.length == 3, s"expected 3 samples once each: ${written.toSeq}")
    assert(written.toMap == Map("s1" -> "PAYLOAD-S1", "s2" -> "PAYLOAD-S2",
      "s3" -> "PAYLOAD-S3"))
  }
}
