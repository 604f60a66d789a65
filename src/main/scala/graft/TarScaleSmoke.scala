package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the tar source/sink paths (driver-side tooling, like
  * Bench): generates a 64-shard corpus (4× the gate fixture's shard
  * count, ~650 MB, 320k samples) with an aligned `_info` meta sibling,
  * then times the six configurations whose scale behavior round 7
  * added or changed — 1:1 scan, packed scan, shuffle meta join, zip
  * meta join, and a 1-in-1000 selective fetch as both a skipping walk
  * and an index-sidecar seek — asserting same-shape configurations
  * return the SAME aggregate before printing one JSON line. The point is not the absolute numbers (a
  * 650 MB corpus on local[32] is IO-noise territory) but that the new
  * paths hold correctness and don't regress wall-time at a scale tier
  * above the gate fixtures.
  */
object TarScaleSmoke {
  private val Shards = 64
  private val SamplesPerShard = 5000

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Paths.get("target", "tar-smoke").toAbsolutePath
    val metaDir = Paths.get("target", "tar-smoke_info").toAbsolutePath
    // _READY_V2: v2 adds .tar.idx offset sidecars (selective-fetch runs)
    if (!Files.exists(dir.resolve("_READY_V2"))) {
      Files.createDirectories(dir); Files.createDirectories(metaDir)
      (0 until Shards).foreach { s =>
        val main = new TarArchiveOutputStream(
          new FileOutputStream(dir.resolve(f"shard-$s%06d.tar").toFile))
        val meta = new TarArchiveOutputStream(
          new FileOutputStream(metaDir.resolve(f"shard-$s%06d.tar").toFile))
        val idx = Seq.newBuilder[(Long, String)]
        (0 until SamplesPerShard).foreach { i =>
          val id = s * SamplesPerShard + i
          val txt = (s"sample $id payload " + ("x" * (100 + id % 300))).getBytes("UTF-8")
          val cls = (id % 97).toString.getBytes("UTF-8")
          val info = ((id * 31) % 100).toString.getBytes("UTF-8")
          def put(out: TarArchiveOutputStream, name: String, bytes: Array[Byte]): Unit = {
            val e = new TarArchiveEntry(name); e.setSize(bytes.length.toLong)
            out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
          }
          idx += ((main.getBytesWritten, f"s$id%08d"))
          put(main, f"s$id%08d.txt", txt)
          put(main, f"s$id%08d.cls", cls)
          put(meta, f"s$id%08d.txt", info)
        }
        main.close(); meta.close()
        Files.write(dir.resolve(f"shard-$s%06d.tar.idx"),
          graft.sources.wdstar.WdsTarIndex.render(idx.result()))
      }
      Files.createFile(dir.resolve("_READY_V2"))
    }
    val shards = (0 until Shards).map(i => f"$dir/shard-$i%06d.tar")

    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(length($"txt"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    def timed(name: String)(body: => (Long, Long)): (String, Double, (Long, Long)) = {
      val t0 = System.nanoTime()
      val res = body
      (name, (System.nanoTime() - t0) / 1e9, res)
    }

    // warmup (untimed): JVM + codegen + page cache, so the first timed
    // configuration isn't charged the session's startup cost
    agg(spark.read.format("wds-tar")
      .option("shards", shards.mkString(","))
      .option("extensions", "txt,cls").load())

    val runs = Seq(
      timed("scan_1to1") {
        agg(spark.read.format("wds-tar")
          .option("shards", shards.mkString(","))
          .option("extensions", "txt,cls").load())
      },
      timed("scan_packed") {
        // ~10.24 MB/shard, zero open cost, 45 MB budget → 16 partitions
        agg(spark.read.format("wds-tar")
          .option("shards", shards.mkString(","))
          .option("extensions", "txt,cls")
          .option("maxPartitionBytes", (45L * 1024 * 1024).toString)
          .option("openCostInBytes", "0").load())
      },
      timed("meta_join_shuffle") {
        agg(graft.pipeline.GraftPipeline.create(spark, graft.pipeline.PipelineConfig(
          urls = Seq(s"$dir/shard-{000000..${"%06d".format(Shards - 1)}}.tar"),
          extensions = Seq("txt", "cls"), metaSuffixes = Seq("info"))))
      },
      timed("meta_join_zip") {
        agg(graft.pipeline.GraftPipeline.create(spark, graft.pipeline.PipelineConfig(
          urls = Seq(s"$dir/shard-{000000..${"%06d".format(Shards - 1)}}.tar"),
          extensions = Seq("txt", "cls"), metaSuffixes = Seq("info"),
          metaJoin = "zip")))
      })

    // selective fetch: 1-in-1000 keys (ids divisible by 1000 → 320 of
    // 320k samples) — the walk streams every shard skipping in-reader;
    // the indexed read consults 64 tiny sidecars and seeks to 320
    // samples. Same pushed predicate, same aggregate.
    def fetch(useIndex: Boolean) =
      agg(spark.read.format("wds-tar")
        .option("shards", shards.mkString(","))
        .option("extensions", "txt,cls")
        .option("index", useIndex.toString).load()
        .filter($"__key__".endsWith("000")))
    val fetchRuns = Seq(
      timed("fetch_walk")(fetch(useIndex = false)),
      timed("fetch_indexed")(fetch(useIndex = true)))
    val fetchAggs = fetchRuns.map(_._3).distinct
    require(fetchAggs.length == 1, s"fetch configurations disagree: $fetchAggs")
    require(fetchAggs.head._1 == Shards.toLong * SamplesPerShard / 1000,
      s"fetch row count ${fetchAggs.head._1}")

    val aggs = runs.map(_._3).distinct
    require(aggs.length == 1, s"configurations disagree: $aggs")
    val (n, bytes) = aggs.head
    require(n == Shards.toLong * SamplesPerShard, s"row count $n")

    // write path with in-task rolling: the full corpus re-shards from 8
    // tasks into ~8 MB chunks (maxShardBytes) — the writer contract a
    // continuous re-sharding pipeline runs; the round-trip aggregate
    // must survive and every rolled shard must respect the bound
    val rollDir = Paths.get("target", "tar-smoke-rolled").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(rollDir.toFile)
    val rollRun = timed("write_rolled") {
      spark.read.format("wds-tar")
        .option("shards", shards.mkString(","))
        .option("extensions", "txt,cls").load()
        .repartition(8)
        .write.format("wds-tar")
        .option("path", rollDir.toString)
        .option("maxShardBytes", (8L * 1024 * 1024).toString)
        .mode("overwrite").save()
      agg(spark.read.format("wds-tar")
        .option("path", rollDir.toString)
        .option("extensions", "txt,cls").load())
    }
    require(rollRun._3 == aggs.head,
      s"rolled round-trip diverged: ${rollRun._3} != ${aggs.head}")
    val rolled = rollDir.toFile.list().filter(_.endsWith(".tar"))
    require(rolled.length > 16, s"rolling produced only ${rolled.length} shards")
    val maxLen = rolled.map(f => new java.io.File(rollDir.toFile, f).length()).max
    require(maxLen <= 9L * 1024 * 1024,
      s"a rolled shard is $maxLen B, bound was 8 MiB (+1 sample slop)")

    val json = (runs ++ fetchRuns :+ rollRun)
      .map { case (name, sec, _) => s""""$name":$sec""" }
      .mkString(s"""{"n_samples":$n,"payload_bytes":$bytes,""" +
        s""""n_rolled_shards":${rolled.length},""", ",", "}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_tar_smoke.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
