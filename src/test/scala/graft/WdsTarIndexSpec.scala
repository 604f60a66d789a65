package graft

import java.io.RandomAccessFile
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.wdstar.WdsTarIndex

/** The offset-index sidecar (`index=true` writes, seek-based selective
  * reads): sidecar correctness against the walked shard, and the
  * behavioral proof that indexed reads actually SEEK — non-matching
  * regions are corrupted on disk, so a reader that walked the tar
  * would die where the indexed reader succeeds.
  */
class WdsTarIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get

  private def mkDir() = {
    val d = Paths.get("target", "idx-tars-" + System.nanoTime()).toAbsolutePath
    Files.createDirectories(d)
    d
  }

  /** Writes an indexed single-shard corpus `k0..k4, m0..m2` and returns
    * (dir, shardFile, idx entries).
    */
  private def writeCorpus(): (java.nio.file.Path, java.io.File, Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = mkDir()
    val rows = ((0 until 5).map(i => (f"k$i", s"payload-k$i")) ++
      (0 until 3).map(i => (f"m$i", s"payload-m$i")))
    rows.toDF("__key__", "txt")
      .coalesce(1)
      .write.format("wds-tar")
      .option("path", dir.toString)
      .option("index", "true")
      .mode("append")
      .save()
    val shard = dir.toFile.listFiles().filter(_.getName.endsWith(".tar")).head
    val idxFile = new java.io.File(shard.getPath + ".idx")
    assert(idxFile.exists(), s"no sidecar beside ${shard.getName}")
    (dir, shard, WdsTarIndex.parse(Files.readAllBytes(idxFile.toPath)))
  }

  /** Out-of-band tampering invalidates Hadoop's local-FS `.crc`
    * siblings — drop them so reads see the tampered bytes instead of a
    * ChecksumException.
    */
  private def dropCrcs(dir: java.nio.file.Path): Unit =
    dir.toFile.listFiles().filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())

  private def readKeys(dir: String, opts: Map[String, String] = Map.empty,
      filtered: Boolean = true) = {
    val base = spark.read.format("wds-tar")
      .option("path", dir).option("extensions", "txt")
    val withOpts = opts.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
    val df = withOpts.load()
    val sel = if (filtered) df.filter(col("__key__").startsWith("k")) else df
    sel.select(col("__key__"), col("txt").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
  }

  test("sidecar entries mirror the walked shard: same keys, ordered 512-aligned offsets") {
    val (dir, _, entries) = writeCorpus()
    val walked = spark.read.format("wds-tar")
      .option("path", dir.toString).option("extensions", "txt")
      .option("index", "false")
      .load().select("__key__").collect().map(_.getString(0)).toSeq
    assert(entries.map(_._2) == walked)
    assert(entries.map(_._1) == entries.map(_._1).sorted)
    assert(entries.map(_._1).distinct.size == entries.size)
    entries.foreach { case (off, k) =>
      assert(off % 512 == 0, s"offset $off of '$k' not header-aligned")
    }
  }

  test("indexed read equals the walk under a pushed key predicate") {
    val (dir, _, _) = writeCorpus()
    val indexed = readKeys(dir.toString)
    val walk = readKeys(dir.toString, Map("index" -> "false"))
    assert(indexed == (0 until 5).map(i => f"k$i" -> s"payload-k$i").sorted)
    assert(indexed == walk)
  }

  test("indexed reads seek: corrupted non-matching samples are never touched") {
    val (dir, shard, entries) = writeCorpus()
    // overwrite every byte of the m* samples' regions (header included)
    // with 0xFF — garbage that fails the tar header checksum (all-zero
    // would read as a clean end-of-archive marker instead): from each
    // m-entry's offset to the next entry's offset (or EOF)
    val offs = entries.map(_._1) :+ shard.length()
    val raf = new RandomAccessFile(shard, "rw")
    try entries.zipWithIndex.foreach { case ((off, key), i) =>
      if (key.startsWith("m")) {
        raf.seek(off)
        raf.write(Array.fill[Byte]((offs(i + 1) - off).toInt)(0xff.toByte))
      }
    } finally raf.close()
    dropCrcs(dir)
    // the walk dies on the corrupt region under fail policy...
    intercept[Exception] {
      readKeys(dir.toString, Map("index" -> "false"))
    }
    // ...the indexed read never visits it
    assert(readKeys(dir.toString) ==
      (0 until 5).map(i => f"k$i" -> s"payload-k$i").sorted)
  }

  test("a shard with zero matches is never opened") {
    val (dir, shard, _) = writeCorpus()
    // corrupt the ENTIRE tar: any open/walk would fail
    val raf = new RandomAccessFile(shard, "rw")
    try { raf.seek(0); raf.write(Array.fill[Byte](shard.length().toInt)(0x5a)) }
    finally raf.close()
    dropCrcs(dir)
    val got = spark.read.format("wds-tar")
      .option("path", dir.toString).option("extensions", "txt")
      .load()
      .filter(col("__key__").startsWith("zzz"))
      .collect()
    assert(got.isEmpty)
  }

  test("stale index offsets fail loudly, or skip per-sample under skip policy") {
    val (dir, shard, entries) = writeCorpus()
    // point k1's entry at k3's offset: stem check must catch it
    val k3off = entries.find(_._2 == "k3").get._1
    val doctored = entries.map { case (off, k) =>
      if (k == "k1") (k3off, k) else (off, k)
    }
    Files.write(Paths.get(shard.getPath + ".idx"), WdsTarIndex.render(doctored))
    dropCrcs(dir)
    val e = intercept[Exception] { readKeys(dir.toString) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    // k1's doctored offset corrupts TWO regions: k1's own (seek target
    // starts sample k3, not k1) and k0's (its end is k1's index entry,
    // so the region now swallows k1/k2 as foreign members) — either way
    // the index inconsistency is loud, never silent mis-assembly
    assert(messages(e).exists(m => m.contains("does not start sample") ||
      m.contains("contains foreign member")), e.toString)
    // skip policy: exactly the samples with corrupt index regions drop
    // (k0 and k1); re-seeking isolates everything after them
    val skipped = readKeys(dir.toString, Map("errorPolicy" -> "skip"))
    assert(skipped == Seq("k2", "k3", "k4").map(k => k -> s"payload-$k"))
  }

  test("streaming sink writes sidecars too") {
    import org.apache.spark.sql.functions._
    val src = mkDir(); val out = mkDir(); val ckpt = mkDir()
    import spark.implicits._
    Seq(("s1", "x")).toDF("__key__", "txt").coalesce(1)
      .write.format("wds-tar").option("path", src.toString).mode("append").save()
    val q = spark.readStream.format("wds-tar")
      .option("path", src.toString).option("extensions", "txt")
      .load()
      .select(col("__key__"), col("txt"))
      .writeStream.format("wds-tar")
      .option("path", out.toString)
      .option("index", "true")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val names = out.toFile.listFiles().map(_.getName).filterNot(_.startsWith("."))
    val tars = names.filter(_.endsWith(".tar"))
    assert(tars.nonEmpty)
    tars.foreach(t => assert(names.contains(t + ".idx"), s"no sidecar for $t"))
  }
}
