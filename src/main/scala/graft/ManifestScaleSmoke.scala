package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.snapshot.SnapshotLog

/** Manifest-SCALE smoke (driver-side tooling, like Bench): every other
  * snapshot measurement runs at 64 files — this one proves the
  * metadata plane itself holds at the file/version counts a 100 TB
  * table actually has. Two synthetic histories exercise the paths
  * whose cost model the manifest log exists to bound:
  *
  *  1. DEEP: a 10,000-version history (real base commit + synthetic
  *     delta manifests with a checkpoint every 500, the cadence the
  *     adaptive policy produces for steady small commits). Measures
  *     latest-version discovery, full manifest resolution through the
  *     delta chain, metadata-only stats, the files view, a pruned read
  *     that executes, and — the commit-side claim — 20 REAL appends on
  *     top of the 10k-version history under the adaptive checkpoint
  *     policy, whose wantCheckpoint walk must stay O(chain) header
  *     peeks, never a checkpoint parse.
  *  2. WIDE: a 100,000-file checkpoint manifest. Measures resolution
  *     (one big JSON parse), stats folding, the files view, and
  *     manifest pruning that keeps only the 4 real files out of
  *     100,004 and then actually scans them.
  *
  * Synthetic entries reference files that never exist — valid for
  * every metadata-plane measurement; the executed reads prune to the
  * REAL files by predicate range (synthetic stats live in a disjoint
  * key range), so the scan that runs is a real scan. Each measurement
  * asserts its answer (counts, kept-file sets) before the JSON line
  * writes, so the artifact records a correct configuration.
  */
object ManifestScaleSmoke {

  private val DeepVersions = 10000
  private val CheckpointEveryDeep = 500
  private val WideFiles = 100000
  private val RealRows = 4000L

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def synEntry(i: Int): java.util.LinkedHashMap[String, Object] = {
    val fm = new java.util.LinkedHashMap[String, Object]()
    fm.put("path", f"data/v-synthetic/part-$i%06d.parquet")
    fm.put("rows", java.lang.Long.valueOf(1000L))
    fm.put("bytes", java.lang.Long.valueOf(100000L))
    val sm = new java.util.LinkedHashMap[String, Object]()
    val cm = new java.util.LinkedHashMap[String, Object]()
    cm.put("min", java.lang.Long.valueOf(1000000L + i.toLong * 1000))
    cm.put("max", java.lang.Long.valueOf(1000000L + i.toLong * 1000 + 999))
    sm.put("id", cm)
    fm.put("stats", sm)
    fm.put("nulls", {
      val nm = new java.util.LinkedHashMap[String, Object]()
      nm.put("id", java.lang.Long.valueOf(0L)); nm
    })
    fm
  }

  /** Hand-render one manifest in the log's JSON layout (kind header
    * first — see SnapshotLog.renderJson); parse compatibility is
    * verified by every read this smoke times.
    */
  private def writeManifest(logDir: java.nio.file.Path, v: Long, parent: Long,
      schema: String, full: Option[Seq[Object]], add: Seq[Object]): Unit = {
    val root = new java.util.LinkedHashMap[String, Object]()
    root.put("kind", if (full.isDefined) "full" else "delta")
    root.put("version", java.lang.Long.valueOf(v))
    root.put("parent", java.lang.Long.valueOf(parent))
    root.put("op", "append")
    root.put("epoch", java.lang.Long.valueOf(-1L))
    root.put("ts", java.lang.Long.valueOf(System.currentTimeMillis()))
    root.put("schema", schema)
    full match {
      case Some(entries) =>
        val arr = new java.util.ArrayList[Object]()
        entries.foreach(arr.add)
        root.put("files", arr)
      case None =>
        val arr = new java.util.ArrayList[Object]()
        add.foreach(arr.add)
        root.put("add", arr)
        root.put("remove", new java.util.ArrayList[Object]())
    }
    Files.write(logDir.resolve(f"v$v%05d.json"),
      mapper.writeValueAsString(root).getBytes("UTF-8"))
  }

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"manifest-smoke-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def usedMb(): Long = {
      val rt = Runtime.getRuntime
      System.gc()
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }

    val out = new scala.collection.mutable.LinkedHashMap[String, Any]()

    // ---- DEEP: 10k versions -------------------------------------------
    val deep = freshTable("deep")
    val base = spark.range(0, RealRows)
      .select($"id", concat(lit("p"), $"id").as("payload"))
      .repartition(4, $"id")
    SnapshotLog.commit(base, deep, "append", Seq("id"))
    val schema = SnapshotLog.manifest(spark, deep, 1L).schemaDdl
    val baseEntries: Seq[Object] = {
      // re-encode the real entries through the smoke's writer so full
      // checkpoints carry them alongside the synthetic tail
      val m = SnapshotLog.manifest(spark, deep, 1L)
      m.files.map { fe =>
        val fm = new java.util.LinkedHashMap[String, Object]()
        fm.put("path", fe.path)
        fm.put("rows", java.lang.Long.valueOf(fe.rows))
        fm.put("bytes", java.lang.Long.valueOf(fe.bytes))
        val sm = new java.util.LinkedHashMap[String, Object]()
        fe.stats.foreach { case (c, (mn, mx)) =>
          val cm = new java.util.LinkedHashMap[String, Object]()
          cm.put("min", mn.asInstanceOf[Object])
          cm.put("max", mx.asInstanceOf[Object])
          sm.put(c, cm)
        }
        fm.put("stats", sm)
        fm
      }
    }
    val logDir = Paths.get(deep, "_log")
    val (tBuild, _) = timed {
      val acc = scala.collection.mutable.ArrayBuffer[Object](baseEntries: _*)
      (2 to DeepVersions).foreach { v =>
        val e = synEntry(v)
        acc += e
        if (v % CheckpointEveryDeep == 0)
          writeManifest(logDir, v, v - 1, schema, Some(acc.toSeq), Nil)
        else
          writeManifest(logDir, v, v - 1, schema, None, Seq(e))
      }
    }
    out += "deep_versions" -> DeepVersions
    out += "deep_build_sec" -> tBuild

    val m0 = usedMb()
    val (tLatest, latest) = timed(SnapshotLog.latestVersion(spark, deep).get)
    require(latest == DeepVersions.toLong, s"latest $latest")
    val (tResolve, m) = timed(SnapshotLog.manifest(spark, deep, latest))
    require(m.files.size == 4 + DeepVersions - 1, s"files ${m.files.size}")
    out += "deep_latest_sec" -> tLatest
    out += "deep_resolve_sec" -> tResolve
    out += "deep_resolve_driver_mb" -> (usedMb() - m0)

    val (tStats, st) = timed(SnapshotLog.tableStats(spark, deep))
    require(st.rows == RealRows + (DeepVersions - 1) * 1000L, s"rows ${st.rows}")
    out += "deep_stats_sec" -> tStats

    val (tFiles, nFiles) = timed(SnapshotLog.fileManifest(spark, deep).count())
    require(nFiles == 4 + DeepVersions - 1)
    out += "deep_files_view_sec" -> tFiles

    val (tPruned, prunedRes) = timed {
      val (df, kept, total) = SnapshotLog.readFiltered(spark, deep, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 0L),
        org.apache.spark.sql.sources.LessThanOrEqual("id", 100L)))
      (df.count(), kept, total)
    }
    require(prunedRes._1 == 101L && prunedRes._3 == 4 + DeepVersions - 1,
      s"pruned $prunedRes")
    require(prunedRes._2 <= 4, s"kept ${prunedRes._2} real-range files")
    out += "deep_pruned_read_sec" -> tPruned
    out += "deep_pruned_kept" -> prunedRes._2

    // 20 real commits on TOP of the 10k-version history, adaptive policy
    spark.conf.set(SnapshotLog.CheckpointPolicyConf, "adaptive")
    val commitTimes =
      try (1 to 20).map { i =>
        val df = spark.range(RealRows + i * 10, RealRows + i * 10 + 10)
          .select($"id", concat(lit("p"), $"id").as("payload")).coalesce(1)
        timed(SnapshotLog.commit(df, deep, "append", Seq("id")))._1
      } finally spark.conf.unset(SnapshotLog.CheckpointPolicyConf)
    out += "deep_commit_avg_sec" -> commitTimes.sum / commitTimes.size
    out += "deep_commit_max_sec" -> commitTimes.max
    val (tResolve2, m2) = timed(
      SnapshotLog.manifest(spark, deep, DeepVersions + 20L))
    require(m2.files.size == 4 + DeepVersions - 1 + 20)
    out += "deep_resolve_after_commits_sec" -> tResolve2

    // branch ops on the deep history: fork, append, publish — all
    // metadata-only, so each should cost manifest-write time even with
    // 10k files shared by reference
    val (tFork, bt) = timed(SnapshotLog.createBranch(spark, deep, "wap"))
    // pruned read THROUGH the branch: parent references resolve to the
    // root's real files; synthetic entries prune out on stats
    val (tBranchRead, bres) = timed {
      val (df, kept, total) = SnapshotLog.readFiltered(spark, bt, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 0L),
        org.apache.spark.sql.sources.LessThanOrEqual("id", 100L)))
      (df.count(), kept, total)
    }
    require(bres._1 == 101L && bres._3 == 4 + DeepVersions - 1 + 20,
      s"branch pruned read $bres")
    SnapshotLog.commit(
      spark.range(900000, 900010)
        .select($"id", concat(lit("b"), $"id").as("payload")).coalesce(1),
      bt, "append", Seq("id"))
    val (tPublish, _) = timed(SnapshotLog.fastForward(spark, deep, "wap"))
    val (tAfter, mAfter) = timed(
      SnapshotLog.manifest(spark, deep, DeepVersions + 21L))
    require(mAfter.files.size == 4 + DeepVersions - 1 + 20 + 1)
    out += "deep_branch_fork_sec" -> tFork
    out += "deep_branch_read_sec" -> tBranchRead
    out += "deep_branch_publish_sec" -> tPublish
    out += "deep_resolve_after_publish_sec" -> tAfter
    require(tFork < 5.0 && tPublish < 5.0,
      s"branch ops not metadata-cheap: fork $tFork, publish $tPublish")

    // ---- WIDE: one 100k-file checkpoint -------------------------------
    val wide = freshTable("wide")
    SnapshotLog.commit(base, wide, "append", Seq("id"))
    val wideSchema = SnapshotLog.manifest(spark, wide, 1L).schemaDdl
    val wideBase = {
      val m1 = SnapshotLog.manifest(spark, wide, 1L)
      m1.files.map { fe =>
        val fm = new java.util.LinkedHashMap[String, Object]()
        fm.put("path", fe.path)
        fm.put("rows", java.lang.Long.valueOf(fe.rows))
        fm.put("bytes", java.lang.Long.valueOf(fe.bytes))
        val sm = new java.util.LinkedHashMap[String, Object]()
        fe.stats.foreach { case (c, (mn, mx)) =>
          val cm = new java.util.LinkedHashMap[String, Object]()
          cm.put("min", mn.asInstanceOf[Object])
          cm.put("max", mx.asInstanceOf[Object])
          sm.put(c, cm)
        }
        fm.put("stats", sm)
        fm
      }
    }
    val (tWideBuild, _) = timed {
      writeManifest(Paths.get(wide, "_log"), 2L, 1L, wideSchema,
        Some(wideBase ++ (0 until WideFiles).map(synEntry)), Nil)
    }
    val manifestBytes = Files.size(Paths.get(wide, "_log", "v00002.json"))
    out += "wide_files" -> (WideFiles + 4)
    out += "wide_build_sec" -> tWideBuild
    out += "wide_manifest_mb" -> manifestBytes / (1024.0 * 1024.0)

    val w0 = usedMb()
    val (tWideResolve, wm) = timed(SnapshotLog.manifest(spark, wide, 2L))
    require(wm.files.size == WideFiles + 4)
    out += "wide_resolve_sec" -> tWideResolve
    out += "wide_resolve_driver_mb" -> (usedMb() - w0)

    val (tWideStats, wst) = timed(SnapshotLog.tableStats(spark, wide))
    require(wst.rows == RealRows + WideFiles.toLong * 1000L)
    out += "wide_stats_sec" -> tWideStats

    val (tWideFiles, wn) = timed(SnapshotLog.fileManifest(spark, wide).count())
    require(wn == WideFiles + 4)
    out += "wide_files_view_sec" -> tWideFiles

    val (tWidePruned, wp) = timed {
      val (df, kept, total) = SnapshotLog.readFiltered(spark, wide, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 0L),
        org.apache.spark.sql.sources.LessThanOrEqual("id", 100L)), Some(2L))
      (df.count(), kept, total)
    }
    require(wp._1 == 101L && wp._2 <= 4 && wp._3 == WideFiles + 4,
      s"wide pruned $wp")
    out += "wide_pruned_read_sec" -> tWidePruned
    out += "wide_pruned_kept" -> wp._2

    // column-mapping rename on the 100k-file manifest: ONE manifest
    // write re-keying 100k entries' stats driver-side — metadata-only,
    // no data file touched; reads and pruning serve the new name
    val (tWideRename, _) = timed(
      SnapshotLog.renameColumn(spark, wide, "id", "doc_id"))
    val (prunedRenamed, keptRenamed, totalRenamed) =
      SnapshotLog.readFiltered(spark, wide, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 0L),
        org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 100L)))
    require(prunedRenamed.count() == 101L && keptRenamed <= 4 &&
      totalRenamed == WideFiles + 4, "rename broke wide pruning")
    out += "wide_rename_sec" -> tWideRename

    // change feed of one small append on the 100k-file table: the
    // per-version diff maps 100k entries driver-side, then reads ONLY
    // the new file — O(churn) data cost at any manifest width
    val vBefore = SnapshotLog.latestVersion(spark, wide).get
    SnapshotLog.commit(
      spark.range(200000L, 200100L).select(col("id").as("doc_id"),
        concat(lit("p"), col("id")).as("payload")).repartition(1),
      wide, "append", Seq("doc_id"))
    val (tWideCdf, cdfAgg) = timed {
      val f = SnapshotLog.readChangeFeed(spark, wide, vBefore)
      (f.count(), f.inputFiles.length)
    }
    require(cdfAgg._1 == 100L, s"wide CDF rows ${cdfAgg._1}")
    require(cdfAgg._2 == 1, s"wide CDF scanned ${cdfAgg._2} files, want 1")
    out += "wide_cdf_1append_sec" -> tWideCdf

    // cost-shape assertions the artifact certifies
    require(tResolve < 10.0, s"deep resolve took $tResolve s")
    require(tWideResolve < 10.0, s"wide resolve took $tWideResolve s")
    require(commitTimes.sum / commitTimes.size < 5.0,
      s"commit avg ${commitTimes.sum / commitTimes.size} s on deep history")

    val json = out.map {
      // Locale.ROOT: a comma-decimal default locale would emit
      // unparseable JSON
      case (k, v: Double) =>
        s""""$k":${String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))}"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println(json)
    Files.write(Paths.get("BENCH_snapshot_manifest.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
