package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.snapshot.SnapshotLog

/** Scale smoke for the snapshot-table format (driver-side tooling, like
  * Bench): builds a 64-version / 64-file bloomed table from sf0.1
  * lineitem range buckets, then times the paths whose cost model the
  * format exists to change — full read, manifest-pruned read (1 of 64
  * files), metadata-only stats (zero data files), incremental
  * manifest-diff read, 50 bloom-skipped point lookups, a metadata-only
  * aligned retention delete, the mutation family (single-file DV mask,
  * two-file CDC apply, 1- and 4-file upserts with a linear
  * cost-vs-changed-files assertion), compaction, and 8 CONCURRENT
  * committers racing the publish CAS through `commitWithRetry`. Every timed path asserts its answer against a
  * direct scan before the JSON line is written, so the artifact records
  * agreeing configurations, not just wall-times. The point is the cost
  * SHAPE (pruned ≪ full, stats ≈ 0, bloom opens ≈ 0 of 50, aligned
  * delete moves no bytes), not absolute numbers on a local page cache.
  */
object SnapshotScaleSmoke {
  private val Buckets = 64

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): (String, Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      (name, (System.nanoTime() - t0) / 1e9, r)
    }
    def agg(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("l_quantity")).cast("long")).head
      (r.getLong(0), r.getLong(1))
    }

    // even keys only: sf0.1 orderkeys are DENSE, so the even-keyed half
    // makes every odd value an in-range ABSENT key — the probe class
    // that exercises bloom skipping (range stats cannot skip it).
    // SPARK_GRAFT_SNAP_REPLICAS=R replicates the corpus R× with even
    // key offsets (parity preserved) for higher scale tiers — the
    // artifact then lands in BENCH_snapshot_smoke_<R>x.json.
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SNAP_REPLICAS", "1").toInt
    val base0 = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .where(pmod(col("l_orderkey"), lit(2)) === 0)
    val span = base0.agg(max(col("l_orderkey"))).head.getLong(0) + 2
    val li =
      if (replicas == 1) base0
      else (0 until replicas).map(r => base0.withColumn("l_orderkey",
        col("l_orderkey") + lit(r * span))).reduce(_ unionByName _)
    val width = li.agg(max(col("l_orderkey"))).head.getLong(0) / Buckets + 1
    val t = java.nio.file.Paths.get("target", "snap-smoke").toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))

    // 64 sequential append commits, one range-bucket file each (stats +
    // bloom harvested per commit) — the per-commit overhead is the
    // ingest cost a micro-batch writer pays per epoch
    val (_, buildSec, _) = timed("build") {
      (0 until Buckets).foreach { b =>
        SnapshotLog.commit(
          li.where(expr(s"l_orderkey DIV $width") === b).repartition(1),
          t, "append", Seq("l_orderkey"), Seq("l_orderkey"),
          bloomBits = (1 << 15) * replicas) // keys/file grow with R
      }
    }
    val direct = agg(li)

    // delta-manifest accounting: 64 appends publish ~7 checkpoints and
    // ~57 single-entry deltas — the byte ratio IS the commit-metadata
    // claim (O(changed files), not O(table files)) measured on disk
    val logDirF = new java.io.File(t, "_log")
    val manifestKinds = (1 to Buckets).map { v =>
      (new java.io.File(logDirF, f"v$v%05d.json").length(),
        SnapshotLog.isCheckpoint(spark, t, v.toLong))
    }
    val ckpts = manifestKinds.filter(_._2).map(_._1)
    val deltas = manifestKinds.filterNot(_._2).map(_._1)
    val deltaAvgBytes = if (deltas.isEmpty) 0L else deltas.sum / deltas.size
    val lastCkptBytes = ckpts.lastOption.getOrElse(0L)
    require(deltas.nonEmpty && deltaAvgBytes * 5 < lastCkptBytes,
      s"delta manifests (avg ${deltaAvgBytes}B) not smaller than " +
        s"checkpoint (${lastCkptBytes}B)")
    val fixedTotalBytes = manifestKinds.map(_._1).sum

    // adaptive-cadence twin: the SAME 64 commits under
    // checkpointPolicy=adaptive — checkpoints space out geometrically
    // as the table (and so a checkpoint's own size) grows, cutting
    // total commit metadata vs the fixed every-10 clock; the content
    // and the per-version resolution must not move
    val tAd = java.nio.file.Paths.get("target", "snap-smoke-adaptive")
      .toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tAd))
    spark.conf.set(SnapshotLog.CheckpointPolicyConf, "adaptive")
    val (_, buildAdSec, _) =
      try timed("build_adaptive") {
        (0 until Buckets).foreach { b =>
          SnapshotLog.commit(
            li.where(expr(s"l_orderkey DIV $width") === b).repartition(1),
            tAd, "append", Seq("l_orderkey"), Seq("l_orderkey"),
            bloomBits = (1 << 15) * replicas)
        }
      } finally spark.conf.unset(SnapshotLog.CheckpointPolicyConf)
    require(agg(SnapshotLog.read(spark, tAd)) == direct,
      "adaptive-cadence table diverged from fixed-cadence content")
    val logDirAd = new java.io.File(tAd, "_log")
    val kindsAd = (1 to Buckets).map { v =>
      (new java.io.File(logDirAd, f"v$v%05d.json").length(),
        SnapshotLog.isCheckpoint(spark, tAd, v.toLong))
    }
    val ckptVersAd = (1 to Buckets).filter(v => kindsAd(v - 1)._2)
    val adaptiveTotalBytes = kindsAd.map(_._1).sum
    val gaps = ckptVersAd.zip(ckptVersAd.tail).map(p => p._2 - p._1)
    require(gaps.nonEmpty && gaps.last > 2 * gaps.head,
      s"adaptive checkpoint gaps $gaps should widen as the table grows")
    require(adaptiveTotalBytes < fixedTotalBytes,
      s"adaptive metadata ${adaptiveTotalBytes}B not below " +
        s"fixed ${fixedTotalBytes}B")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tAd))

    val full = timed("read_full")(agg(SnapshotLog.read(spark, t)))
    require(full._3 == direct, s"full read ${full._3} != direct $direct")

    // one-bucket range: the manifest must hand the scan exactly 1 file
    val lo = 7 * width
    val hi = 8 * width - 1
    val pruned = timed("read_pruned") {
      val (df, kept, total) =
        SnapshotLog.readPruned(spark, t, "l_orderkey", lo, hi)
      (agg(df), kept, total)
    }
    val directSlice = agg(li.where(col("l_orderkey").between(lo, hi)))
    require(pruned._3._1 == directSlice,
      s"pruned ${pruned._3._1} != direct slice $directSlice")
    require(pruned._3._2 == 1 && pruned._3._3 == Buckets,
      s"pruning opened ${pruned._3._2}/${pruned._3._3} files")

    // metadata-only: count/min/max with zero data-file reads
    val stats = timed("stats_meta")(SnapshotLog.tableStats(spark, t))
    require(stats._3.rows == direct._1 && stats._3.files == Buckets,
      s"stats ${stats._3} disagree with direct $direct")

    // incremental consumer catching up on the last 4 versions
    val changes = timed("read_changes") {
      SnapshotLog.readChanges(spark, t, (Buckets - 4).toLong).count()
    }
    val directTail = li.where(expr(s"l_orderkey DIV $width") >= Buckets - 4).count()
    require(changes._3 == directTail, s"changes ${changes._3} != $directTail")

    // 50 point lookups of in-range ABSENT keys (odd values — the table
    // holds only even keys): range stats alone open one file per probe;
    // the bloom tier skips nearly all (32k bits / ~1.2k keys per file →
    // FP well under 1%)
    val absentProbes = (0 until 50).map(i => 2L * i + 1)
    val lookups = timed("point_lookup_50") {
      absentProbes.map { k =>
        val (_, opened, range, _) = SnapshotLog.readPoint(spark, t, "l_orderkey", k)
        (opened, range)
      }
    }
    val openedTotal = lookups._3.map(_._1).sum
    val rangeTotal = lookups._3.map(_._2).sum
    require(rangeTotal >= 45 && openedTotal <= rangeTotal / 10,
      s"bloom opened $openedTotal of $rangeTotal range candidates")

    // aligned retention delete: the last bucket drops METADATA-ONLY
    // (classified from stats — no data file read or written)
    val delStats = timed("delete_aligned") {
      SnapshotLog.deleteWhere(spark, t, "l_orderkey",
        63L * width, 64L * width - 1, Seq("l_orderkey")).get
    }
    require(delStats._3.filesDropped >= 1 && delStats._3.filesRewritten == 0,
      s"aligned delete was not metadata-only: ${delStats._3}")
    val base = li.where(expr(s"l_orderkey DIV $width") < 63)
    val directBase = agg(base)
    require(agg(SnapshotLog.read(spark, t)) == directBase, "delete diverged")

    // merge-on-read DV delete (the qb7 shape): a range overlapping ONE
    // bucket partially masks exactly that file — zero rewrites at any
    // table size. A metadata-only restore() then rolls the content
    // back so later assertions keep comparing against directBase.
    val vBeforeDv = SnapshotLog.latestVersion(spark, t).get
    val dvLo = 50L * width
    val dvHi = 50L * width + width / 2
    val dvStats = timed("dv_delete_1file") {
      SnapshotLog.deleteWhereDV(spark, t, "l_orderkey", dvLo, dvHi).get
    }
    require(dvStats._3.filesMasked == 1 && dvStats._3.filesDropped == 0,
      s"partial-bucket DV delete was not single-file: ${dvStats._3}")
    val dvExpected = agg(base.where(
      !(col("l_orderkey") >= dvLo && col("l_orderkey") <= dvHi)))
    require(agg(SnapshotLog.read(spark, t)) == dvExpected,
      "DV delete content diverged")
    SnapshotLog.restore(spark, t, vBeforeDv)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after DV delete diverged")

    // CDC apply (the qb8 shape): one changelog carrying key-distinct
    // upserts into bucket 45 and deletes into bucket 55 rewrites
    // EXACTLY those two files — per-file-exact candidacy, cost scales
    // with changed files + changelog, never the table. restore() rolls
    // back for the later rounds.
    val vBeforeCdc = SnapshotLog.latestVersion(spark, t).get
    val isU = expr(s"l_orderkey DIV $width") === 45 && col("l_orderkey") % 50 === 0
    val isD = expr(s"l_orderkey DIV $width") === 55 && col("l_orderkey") % 500 === 0
    val uRows = li.where(isU).groupBy(col("l_orderkey"))
      .agg(max(col("l_quantity")).as("l_quantity"))
    val cdcChanges = uRows.withColumn("op", lit("U")).unionByName(
      li.where(isD).groupBy(col("l_orderkey"))
        .agg(max(col("l_quantity")).as("l_quantity"))
        .withColumn("op", lit("D")))
    val cdcStats = timed("cdc_apply_2files") {
      SnapshotLog.applyChanges(cdcChanges, t, "l_orderkey")
    }
    require(cdcStats._3.filesRewritten == 2,
      s"2-bucket CDC rewrote ${cdcStats._3.filesRewritten} files")
    // both predicates are pure key predicates, so key membership and
    // row predicate coincide; one union keeps the sum truncation shared
    val cdcExpected = agg(base.where(!isU && !isD).unionByName(uRows))
    require(agg(SnapshotLog.read(spark, t)) == cdcExpected,
      "CDC apply content diverged")
    SnapshotLog.restore(spark, t, vBeforeCdc)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after CDC apply diverged")

    // point upsert: updates land in ONE bucket → 1 of 63 files rewrites.
    // The batch is the keys' own detail rows — MULTIPLE rows per key,
    // i.e. replacement SETS, so it goes through upsertRows (the public
    // upsert now refuses ambiguous duplicate-key batches)
    val upStats = timed("upsert_1file") {
      SnapshotLog.upsertRows(
        li.where(expr(s"l_orderkey DIV $width") === 5 && col("l_orderkey") % 50 === 0),
        t, Seq("l_orderkey"), Seq("l_orderkey"))
    }
    require(upStats._3.filesRewritten == 1,
      s"point upsert rewrote ${upStats._3.filesRewritten} files")
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "idempotent upsert changed content")

    // compound-predicate UPDATE: the conjunct INTERSECTION classifies
    // to ONE bucket although the first conjunct alone spans 30 — the
    // rewrite set is the files NO conjunct excludes, never the widest
    // conjunct's span. restore() rolls the content back.
    val vBeforeCup = SnapshotLog.latestVersion(spark, t).get
    val cupStats = timed("compound_update_1of30") {
      SnapshotLog.updateWhere(spark, t,
        Seq(SnapshotLog.ColumnRange.between("l_orderkey",
            10L * width, 40L * width - 1),
          SnapshotLog.ColumnRange.between("l_orderkey",
            20L * width, 21L * width - 1)),
        Map("l_quantity" -> (col("l_quantity") + lit(1000000L))),
        Seq("l_orderkey")).get
    }
    require(cupStats._3.filesRewritten == 1,
      s"conjunct-intersection update rewrote " +
        s"${cupStats._3.filesRewritten} files (expected 1 of the 30 the " +
        "widest conjunct spans)")
    val cupHit = base.where(col("l_orderkey")
      .between(20L * width, 21L * width - 1)).count()
    require(agg(SnapshotLog.read(spark, t)) ==
      (directBase._1, directBase._2 + 1000000L * cupHit),
      "compound update content diverged")
    SnapshotLog.restore(spark, t, vBeforeCup)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after compound update diverged")

    // linearity: 4× the touched buckets rewrites EXACTLY 4 files, and
    // the wall-clock stays in the same regime as 4 single-file rounds
    // (generous bound — the guard is against O(table) behavior, not IO
    // noise). Asserted BEFORE the artifact writes.
    val upStats4 = timed("upsert_4files") {
      SnapshotLog.upsertRows(
        li.where(expr(s"l_orderkey DIV $width").isin(10, 20, 30, 40) &&
          col("l_orderkey") % 50 === 0),
        t, Seq("l_orderkey"), Seq("l_orderkey"))
    }
    require(upStats4._3.filesRewritten == 4,
      s"4-bucket upsert rewrote ${upStats4._3.filesRewritten} files")
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "idempotent 4-bucket upsert changed content")
    require(upStats4._2 <= upStats._2 * 8 + 2.0,
      s"4-file upsert cost ${upStats4._2}s vs 1-file ${upStats._2}s — " +
        "mutation cost is not scaling with changed files")

    // merge-on-read upsert of the SAME 4-bucket batch: no candidate
    // probe, no rewrite — write the batch + a key set, answer
    // unchanged (identical rows replace themselves); restore() rolls
    // back so later rounds keep their layout assumptions
    val vBeforeMor = SnapshotLog.latestVersion(spark, t).get
    val morBatch = li.where(expr(s"l_orderkey DIV $width").isin(10, 20, 30, 40)
        && col("l_orderkey") % 50 === 0)
      .groupBy(col("l_orderkey")).agg(max(col("l_quantity")).as("l_quantity"))
    val morCount = morBatch.count()
    val upMor = timed("upsert_mor_4buckets") {
      SnapshotLog.upsertMOR(morBatch, t, "l_orderkey", Seq("l_orderkey"))
    }
    val morExpected = agg(base.where(!(expr(s"l_orderkey DIV $width")
        .isin(10, 20, 30, 40) && col("l_orderkey") % 50 === 0))
      .unionByName(morBatch))
    require(agg(SnapshotLog.read(spark, t)) == morExpected,
      "MOR upsert content diverged")
    require(SnapshotLog.tableStats(spark, t).eqDeleteKeys == morCount,
      "MOR key debt not recorded")
    SnapshotLog.restore(spark, t, vBeforeMor)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after MOR upsert diverged")

    // composite-key MOR delete: one bucket's sampled (l_orderkey,
    // l_quantity) TUPLE set erases with zero rewrites — one keys-sized
    // sidecar carries BOTH columns, the read-side anti-join matches
    // the full tuple, and restore() re-surfaces the rows. Candidacy
    // for the eventual compact is the tuple-interval conjunction, so a
    // composite key only ever SHRINKS the debt set vs either column
    // alone.
    val vBeforeCk = SnapshotLog.latestVersion(spark, t).get
    val ckKeys = SnapshotLog.read(spark, t)
      .where(expr(s"l_orderkey DIV $width") === 33 &&
        col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_quantity"))
    val ckFiles = SnapshotLog.tableStats(spark, t).files
    val ckDel = timed("ckdelete_mor_1bucket") {
      SnapshotLog.deleteKeysMOR(ckKeys, t,
        Seq("l_orderkey", "l_quantity")).get
    }
    require(SnapshotLog.tableStats(spark, t).files == ckFiles,
      "composite MOR delete rewrote a data file")
    val ckExpected = agg(base.join(ckKeys,
      Seq("l_orderkey", "l_quantity"), "left_anti"))
    require(agg(SnapshotLog.read(spark, t)) == ckExpected,
      "composite tuple delete content diverged")
    SnapshotLog.restore(spark, t, vBeforeCk)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after composite delete diverged")

    // residual-bounded MERGE (the partition-bounded Delta merge): the
    // source spans EVERY bucket, but the ON residual bounds the merge
    // to 10 of 64 — the PROBE opens only the residual's buckets (the
    // key-interval test alone would candidate all 64, since source
    // keys land in every file's window) and the rewrite set scales
    // with the bounded partition, never the source span. restore()
    // rolls the content back.
    val vBeforeRm = SnapshotLog.latestVersion(spark, t).get
    val rmSrc = li.where(col("l_orderkey") % 50 === 0)
    val rmLo = 50L * width
    val rmHi = 60L * width - 1
    val residual = Seq(
      SnapshotLog.ColumnRange.between("l_orderkey", rmLo, rmHi))
    val (rmTgt, rmOpened, rmCand, _) = SnapshotLog.readSemiJoin(spark, t,
      Seq("l_orderkey"), rmSrc, Seq("l_orderkey"), None, 10000, residual)
    require(rmCand <= 10,
      s"residual probe candidated $rmCand files (expected <= 10 of 64)")
    val rmUpdates = rmTgt
      .where(col("l_orderkey").between(rmLo, rmHi)) // row-level residual
      .select(col("l_orderkey"),
        (col("l_quantity") + lit(500000L)).as("l_quantity"))
    val rmRun = timed("residual_merge_10of64") {
      SnapshotLog.mergeMatched(spark, t, Seq("l_orderkey"),
        Some(rmUpdates), None, residual, Seq("l_orderkey"))
    }
    require(rmRun._3.filesRewritten <= 10,
      s"residual merge rewrote ${rmRun._3.filesRewritten} files " +
        "(expected <= 10 of 64 — rewrites must scale with the bounded " +
        "partition, not the source span)")
    val rmHit = base.where(col("l_orderkey") % 50 === 0 &&
      col("l_orderkey").between(rmLo, rmHi)).count()
    require(agg(SnapshotLog.read(spark, t)) ==
      (directBase._1, directBase._2 + 500000L * rmHit),
      "residual merge content diverged")
    SnapshotLog.restore(spark, t, vBeforeRm)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after residual merge diverged")
    val _ = rmOpened // probe accounting asserted via rmCand

    // per-row replacement SETS at 64-file scale (upsertRows — the
    // primitive under duplicate-key MERGE clause resolution): every
    // touched key's rows are replaced by a TWO-row set, the update
    // band bounds tuple-interval candidacy to ~5 of 64 files, and the
    // rewrite set must scale with the band, never the table.
    val vBeforePr = SnapshotLog.latestVersion(spark, t).get
    val prLo = 20L * width
    val prHi = 25L * width - 1
    val prKeys = base
      .where(col("l_orderkey").between(prLo, prHi) &&
        col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey")).distinct()
    val prSets = prKeys
      .select(col("l_orderkey"), lit(700000L).as("l_quantity"))
      .unionByName(prKeys
        .select(col("l_orderkey"), lit(700001L).as("l_quantity")))
    // structural bound: the rewrite set is AT MOST the files whose
    // key interval overlaps the band (5 original bucket files plus
    // whatever wide files earlier rewrites left behind — the 4-bucket
    // upsert above merges its buckets' survivors into band-spanning
    // output), and that overlap set must stay a small fraction of the
    // table — the band, never the world
    val prManifest = SnapshotLog.manifest(spark, t,
      SnapshotLog.latestVersion(spark, t).get)
    val prOverlap = prManifest.files.count(_.stats.get("l_orderkey")
      .forall {
        case (mn: Number, mx: Number) =>
          mx.longValue() >= prLo && mn.longValue() <= prHi
        case _ => true
      })
    val prRun = timed("per_row_sets_5of64") {
      SnapshotLog.upsertRows(prSets, t, Seq("l_orderkey"),
        Seq("l_orderkey"))
    }
    require(prRun._3.filesRewritten <= prOverlap && prOverlap <= 10,
      s"per-row set upsert rewrote ${prRun._3.filesRewritten} files " +
        s"with $prOverlap band-overlapping (expected rewrites <= " +
        "overlap <= 10 of 64 — rewrites must scale with the update " +
        "band)")
    val prTouched = base.where(col("l_orderkey").between(prLo, prHi) &&
      col("l_orderkey") % 100 === 0)
    val (prRows, prQty) = agg(prTouched)
    val prN = prKeys.count()
    require(agg(SnapshotLog.read(spark, t)) ==
      (directBase._1 - prRows + 2 * prN,
        directBase._2 - prQty + prN * (700000L + 700001L)),
      "per-row replacement-set content diverged")
    SnapshotLog.restore(spark, t, vBeforePr)
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "restore after per-row sets diverged")

    // metadata-only schema evolution on the 63-file table: ONE manifest
    // write, zero data IO — wall-time stays in milliseconds no matter
    // how many files (or TB) the table holds, and every pre-evolution
    // file serves the new column as NULL
    val evolve = timed("evolve_schema") {
      SnapshotLog.evolveSchema(spark, t,
        SnapshotLog.manifest(spark, t,
          SnapshotLog.latestVersion(spark, t).get).schemaDdl + ",extra_tag STRING")
    }
    require(SnapshotLog.read(spark, t)
        .where(col("extra_tag").isNotNull).count() == 0,
      "evolved column must serve NULL from pre-evolution files")
    require(agg(SnapshotLog.read(spark, t)) == directBase,
      "evolve changed table content")

    // compact the small files; the full answer must not move
    val compactRun = timed("compact") {
      SnapshotLog.compact(spark, t, 256L << 20, Seq("l_orderkey")).get
    }
    val compactedFiles = SnapshotLog.tableStats(spark, t).files
    val fullCompacted = timed("read_full_compacted")(agg(SnapshotLog.read(spark, t)))
    require(fullCompacted._3 == directBase,
      s"compacted read ${fullCompacted._3} != $directBase")

    // 8 concurrent appenders (4 threads) racing the rename CAS: all
    // must land exactly once, serialized by retry, no data rewrite
    val v0 = SnapshotLog.latestVersion(spark, t).get
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val concurrent = timed("concurrent_commit8") {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = SnapshotLog.commitWithRetry(
            li.where(col("l_orderkey") % 2000 === 2L * i).repartition(1),
            t, "append", Seq("l_orderkey"))
        })
      }
      futures.map(_.get()).sorted
    }
    pool.shutdown()
    require(concurrent._3 == ((v0 + 1) to (v0 + 8)).toSeq,
      s"concurrent versions ${concurrent._3}")
    val afterConcurrent = agg(SnapshotLog.read(spark, t))
    val directAfter = agg(base.unionByName(
      li.where(col("l_orderkey") % 2000 < 16)))
    require(afterConcurrent == directAfter,
      s"concurrent result $afterConcurrent != $directAfter")

    // steady-state MOR ingest under the auto-compaction ceiling: 12 CDC
    // epochs with morAutoCompactEvery=4 — the debt sawtooths (never
    // exceeds the ceiling), replay detection survives the interleaved
    // compactions, and the stats-probed debt classifier keeps each
    // compaction rewriting only the buckets the batch keys touched,
    // never the whole 64-file table. This is the continuous-CDC-ingest
    // cost shape a 100 TB deployment runs 24/7.
    val vBeforeIngest = SnapshotLog.latestVersion(spark, t).get
    val beforeDf = SnapshotLog.read(spark, t, Some(vBeforeIngest))
    val bucketCol = expr(s"l_orderkey DIV $width")
    def ingestBatch(e: Int) = beforeDf
      .where(bucketCol === e && col("l_orderkey") % 50 === 0)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_quantity")).as("l_quantity"))
      .withColumn("extra_tag", lit(null).cast("string"))
    spark.conf.set(SnapshotLog.MorAutoCompactEveryConf, "4")
    spark.conf.set(SnapshotLog.MorAutoCompactTargetConf, (256L << 20).toString)
    var maxDebt = 0
    val morIngest = timed("mor_ingest12_autocompact4") {
      (1 to 12).foreach { e =>
        require(SnapshotLog.upsertMORBatch(ingestBatch(e), t, 1000L + e,
          "l_orderkey", Seq("l_orderkey")).isDefined, s"epoch $e skipped")
        maxDebt = math.max(maxDebt, SnapshotLog.manifest(spark, t,
          SnapshotLog.latestVersion(spark, t).get).eqDeletes.size)
      }
    }
    spark.conf.unset(SnapshotLog.MorAutoCompactEveryConf)
    spark.conf.unset(SnapshotLog.MorAutoCompactTargetConf)
    require(maxDebt <= 4, s"auto-compaction ceiling breached: $maxDebt debt")
    require(maxDebt >= 3, s"trace never approached the ceiling ($maxDebt) — trigger untested")
    // replayed epoch after interleaved compactions is still detected
    require(SnapshotLog.upsertMORBatch(ingestBatch(12), t, 1012L,
      "l_orderkey", Seq("l_orderkey")).isEmpty, "replay undetected")
    val touched = bucketCol.isin((1 to 12).map(_.toLong): _*) &&
      col("l_orderkey") % 50 === 0
    val expectedIngest = agg(beforeDf.where(!touched).unionByName(
      (1 to 12).map(ingestBatch).reduce(_ unionByName _)))
    require(agg(SnapshotLog.read(spark, t)) == expectedIngest,
      "steady-state ingest content diverged")

    // 6 DISJOINT mutators racing on 4 threads — 2 CoW upserts, a CoW
    // range delete, a MOR upsert, a MOR key delete, and an append, each
    // keyed to its own range bucket: the OCC rebase serializes all six
    // into a linear history with ZERO caller-side retry loops (any
    // ConcurrentMutationException fails the future). This is the
    // multi-writer shape a deployment actually runs — CDC appliers,
    // retention, and maintenance sharing one table — measured, then
    // content-checked against the relational expectation.
    val tMx = java.nio.file.Paths.get("target", "snap-smoke-mutators")
      .toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tMx))
    val w8 = li.agg(max(col("l_orderkey"))).head.getLong(0) / 8 + 1
    def mxBucket(b: Int) = expr(s"l_orderkey DIV $w8") === b
    (0 until 8).foreach(b => SnapshotLog.commit(
      li.where(mxBucket(b)).repartition(1), tMx, "append", Seq("l_orderkey")))
    def mxRepl(b: Int) = li
      .where(mxBucket(b) && pmod(col("l_orderkey"), lit(100)) === 0)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_quantity")).as("l_quantity"))
    val (mxLo, mxHi) = (5L * w8, 5L * w8 + w8 / 2)
    val mxPool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val mutators = timed("concurrent_mutators6") {
      val ops: Seq[() => Unit] = Seq(
        () => { SnapshotLog.upsert(mxRepl(1), tMx, "l_orderkey",
          Seq("l_orderkey")); () },
        () => { SnapshotLog.upsert(mxRepl(3), tMx, "l_orderkey",
          Seq("l_orderkey")); () },
        () => { SnapshotLog.deleteWhere(spark, tMx, "l_orderkey",
          mxLo, mxHi, Seq("l_orderkey")); () },
        () => { SnapshotLog.upsertMOR(mxRepl(6), tMx, "l_orderkey",
          Seq("l_orderkey")); () },
        () => { SnapshotLog.deleteKeysMOR(
          mxRepl(7).select("l_orderkey"), tMx, "l_orderkey"); () },
        () => { SnapshotLog.commitWithRetry(
          li.where(mxBucket(2)).repartition(1), tMx, "append",
          Seq("l_orderkey")); () })
      val fs = ops.map(op => mxPool.submit(
        new java.util.concurrent.Callable[Unit] { def call(): Unit = op() }))
      fs.foreach(_.get())
    }
    mxPool.shutdown()
    require(SnapshotLog.latestVersion(spark, tMx).contains(14L),
      "mutator history not linear: " + SnapshotLog.latestVersion(spark, tMx))
    val mxReplaced = (b: Int) =>
      mxBucket(b) && pmod(col("l_orderkey"), lit(100)) === 0
    val mxExpected = agg(li
      .where(!(col("l_orderkey") >= mxLo && col("l_orderkey") <= mxHi))
      .where(!mxReplaced(1) && !mxReplaced(3) &&
        !mxReplaced(6) && !mxReplaced(7))
      .unionByName(mxRepl(1)).unionByName(mxRepl(3)).unionByName(mxRepl(6))
      .unionByName(li.where(mxBucket(2))))
    require(agg(SnapshotLog.read(spark, tMx)) == mxExpected,
      "concurrent mutator content diverged")

    // scoped OPTIMIZE — the only maintenance shape that exists at
    // 100 TB: an 8-bucket table with a MOR delete spanning every
    // bucket; the WHERE-scoped pass rewrites EXACTLY the one in-scope
    // file (cost = the scope, not the table) and must keep the delete
    // outstanding for its 7 unrewritten candidates; the full pass then
    // clears the debt. Structure asserted before the timings land.
    val tSc = java.nio.file.Paths.get("target", "snap-smoke-scoped")
      .toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tSc))
    (0 until 8).foreach(b => SnapshotLog.commit(
      li.where(mxBucket(b)).repartition(1), tSc, "append", Seq("l_orderkey")))
    SnapshotLog.deleteKeysMOR(
      li.where(pmod(col("l_orderkey"), lit(1000)) === 0)
        .select("l_orderkey"), tSc, "l_orderkey")
    val scExpected = agg(li.where(pmod(col("l_orderkey"), lit(1000)) =!= 0))
    val preScoped = SnapshotLog.manifest(spark, tSc, 9L).files.map(_.path).toSet
    val scopedOpt = timed("optimize_scoped_1of8") {
      SnapshotLog.compact(spark, tSc, 256L << 20, Seq("l_orderkey"),
        where = Seq(SnapshotLog.ColumnRange.between("l_orderkey", 0L, w8 - 1))).get
    }
    val mScoped = SnapshotLog.manifest(spark, tSc, scopedOpt._3)
    require((preScoped intersect mScoped.files.map(_.path).toSet).size == 7 &&
      mScoped.files.size == 8,
      "scoped optimize did not rewrite exactly the one in-scope file")
    require(mScoped.eqDeletes.size == 1,
      "scoped optimize dropped a delete with unrewritten candidates")
    require(agg(SnapshotLog.read(spark, tSc)) == scExpected,
      "scoped optimize changed table content")
    val fullOpt = timed("optimize_full_8of8") {
      SnapshotLog.compact(spark, tSc, 256L << 20, Seq("l_orderkey")).get
    }
    require(SnapshotLog.manifest(spark, tSc, fullOpt._3).eqDeletes.isEmpty,
      "full optimize left debt outstanding")
    require(agg(SnapshotLog.read(spark, tSc)) == scExpected,
      "full optimize changed table content")

    val runs = Seq(
      ("build_64_commits", buildSec),
      ("build_64_commits_adaptive", buildAdSec),
      ("read_full", full._2),
      ("read_pruned_1of64", pruned._2),
      ("stats_meta", stats._2),
      ("read_changes_4of64", changes._2),
      ("point_lookup_50", lookups._2),
      ("delete_aligned", delStats._2),
      ("dv_delete_1file", dvStats._2),
      ("cdc_apply_2files", cdcStats._2),
      ("upsert_1file", upStats._2),
      ("upsert_4files", upStats4._2),
      ("compound_update_1of30", cupStats._2),
      ("upsert_mor_4buckets", upMor._2),
      ("ckdelete_mor_1bucket", ckDel._2),
      ("residual_merge_10of64", rmRun._2),
      ("per_row_sets_5of64", prRun._2),
      ("evolve_schema", evolve._2),
      ("compact", compactRun._2),
      ("read_full_compacted", fullCompacted._2),
      ("concurrent_commit8", concurrent._2),
      ("mor_ingest12_autocompact4", morIngest._2),
      ("concurrent_mutators6", mutators._2),
      ("optimize_scoped_1of8", scopedOpt._2),
      ("optimize_full_8of8", fullOpt._2))
    val json = runs.map { case (n, sec) => s""""$n":$sec""" }
      .mkString(s"""{"n_rows":${direct._1},"n_files_built":$Buckets,""" +
        s""""n_files_compacted":$compactedFiles,""" +
        s""""bloom_opened":$openedTotal,"range_candidates":$rangeTotal,""" +
        s""""mor_ingest_max_debt":$maxDebt,""" +
        s""""n_checkpoints":${ckpts.size},"manifest_delta_avg_bytes":$deltaAvgBytes,""" +
        s""""manifest_checkpoint_bytes":$lastCkptBytes,""" +
        s""""manifest_total_bytes_fixed":$fixedTotalBytes,""" +
        s""""manifest_total_bytes_adaptive":$adaptiveTotalBytes,""" +
        s""""n_checkpoints_adaptive":${ckptVersAd.size},""", ",", "}")
    println(json)
    val out = if (replicas == 1) "BENCH_snapshot_smoke.json"
      else s"BENCH_snapshot_smoke_${replicas}x.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
