package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.streaming.StreamOps

/** Streaming/batch duality: the streaming ops must produce the same
  * results as their batch twins when fed the same bounded input.
  */
class StreamOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  // Watermarks require TIMESTAMP (LTZ); the driver corpus carries
  // tz-naive micros which Spark 4 infers as TIMESTAMP_NTZ. Cast once
  // here — the session is pinned UTC, so the cast is wall-clock exact —
  // and use the SAME frame for the stream fixture and every batch twin.
  private lazy val events =
    Tables.load(spark, sf, "events").withColumn("ts", col("ts").cast("timestamp"))

  // stream source dir: events with ts already truncated to micros.
  // Self-heals a stale fixture whose schema drifted from the current
  // events frame (any column, not just the ts LTZ normalization).
  private lazy val srcDir = {
    val d = Paths.get("target", "stream-src").toAbsolutePath
    val stale = Files.exists(d.resolve("_SUCCESS")) &&
      spark.read.parquet(d.toString).schema != events.schema
    if (stale || !Files.exists(d.resolve("_SUCCESS"))) {
      events.write.mode("overwrite").parquet(d.toString)
    }
    d.toString
  }

  private lazy val schema = spark.read.parquet(srcDir).schema

  test("streaming hourly agg equals the batch aggregation") {
    val streamed = StreamOps.runBounded(spark, StreamOps.hourlyAgg,
      srcDir, schema, "hourly_out", OutputMode.Append())
      // append mode emits only closed windows; compare on the windows it emitted
      .select("hour", "event_type", "n", "sum_value")
    val batch = events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val joined = streamed.alias("s").join(batch.alias("b"), Seq("hour", "event_type"))
    assert(streamed.count() > 0)
    assert(joined.filter(col("s.n") =!= col("b.n") ||
      abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count() == 0)
  }

  test("streaming session_window emits sessions that match the batch operator") {
    val streamed = StreamOps.runBounded(spark, StreamOps.sessionWindowAgg,
      srcDir, schema, "sesswin_out", OutputMode.Append())
    val batch = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        col("n_events"), col("sum_value"))
    // append mode emits only watermark-closed sessions: every emitted
    // session must agree exactly with its batch twin
    val joined = streamed.alias("s")
      .join(batch.alias("b"), Seq("user_id", "sess_start"))
    assert(streamed.count() > 0, "no sessions closed — watermark too long for fixture")
    assert(joined.count() == streamed.count(), "emitted session missing from batch")
    assert(joined.filter(col("s.n_events") =!= col("b.n_events") ||
      abs(col("s.sum_value") - col("b.sum_value")) > 1e-6).count() == 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = StreamOps.runBounded(spark, StreamOps.intervalJoin(_),
      srcDir, schema, "ssjoin_out", OutputMode.Append())
    val ev = events
    val l = ev.select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = ev.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    val batch = l.join(r, expr(
      """user_id = r_user AND l_id != r_id
        |AND r_ts >= l_ts - INTERVAL 1 HOUR AND r_ts < l_ts""".stripMargin))
      .select(col("user_id"), col("l_id"), col("r_id"))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("stream-stream LEFT OUTER interval join: matches batch; nulls only after watermark") {
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.intervalJoin(df, "leftOuter"),
      srcDir, schema, "ssjoin_outer_out", OutputMode.Append())
    val ev = events
    val l = ev.select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = ev.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    val batch = l.join(r, expr(
      """user_id = r_user AND l_id != r_id
        |AND r_ts >= l_ts - INTERVAL 1 HOUR AND r_ts < l_ts""".stripMargin),
      "leftOuter")
      .select(col("user_id"), col("l_id"), col("r_id"))
    // 1. everything the stream emitted is a batch row (no spurious rows,
    //    no retracted outer results)
    assert(streamed.except(batch).count() == 0)
    // 2. matched results are complete — they emit as they join
    val batchMatched = batch.filter(col("r_id").isNotNull)
    assert(batchMatched.except(streamed).count() == 0)
    assert(streamed.filter(col("r_id").isNotNull).count() == batchMatched.count())
    // 3. the watermark-forced null path fired: unmatched left rows whose
    //    event-time bound passed the final watermark emitted with nulls
    //    (rows inside the final watermark window legitimately stay held)
    val streamedNulls = streamed.filter(col("r_id").isNull)
    assert(streamedNulls.count() > 0,
      "no null-extended rows emitted — watermark eviction never fired")
    assert(streamedNulls.except(batch.filter(col("r_id").isNull)).count() == 0)
  }

  test("streaming dedup passes exactly one row per distinct content digest") {
    // the corpus has near-dups but no exact dups — re-ingest 100 docs
    // under new ids so the digest-dedup path has real work to do
    val docsDir = Paths.get("target", "stream-docs").toAbsolutePath
    val base = Tables.load(spark, sf, "documents")
    val withDups = base.unionByName(
      base.limit(100).withColumn("doc_id", col("doc_id") + 1000000L))
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      withDups.write.mode("overwrite").parquet(docsDir.toString)
    }
    val docsSchema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingDedup(df),
      docsDir.toString, docsSchema, "dedup_out", OutputMode.Append())
    val batch = base.select(md5(col("text")).as("content_hash")).distinct()
    // one survivor per digest, covering every digest the corpus has
    assert(streamed.count() == batch.count())
    assert(streamed.select("content_hash").distinct().count() == streamed.count())
    assert(streamed.select("content_hash").except(batch).count() == 0)
    // the 100 re-ingested duplicates were dropped
    assert(streamed.count() == withDups.count() - 100)
  }

  test("streaming curation gate equals the batch rule columns row-for-row") {
    val docsDir = Paths.get("target", "stream-cur-docs").toAbsolutePath
    val base = Tables.load(spark, sf, "documents")
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      base.write.mode("overwrite").parquet(docsDir.toString)
    }
    val docsSchema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.curationGate(df),
      docsDir.toString, docsSchema, "curation_out", OutputMode.Append())
    val batch = StreamOps.curationGate(base)
    // stateless gate: identical survivor rows, non-trivial split
    assert(streamed.count() > 0 && streamed.count() < base.count())
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming CMS grid equals the batch sketch cell-for-cell") {
    val docsDir = Paths.get("target", "stream-cur-docs").toAbsolutePath
    val base = Tables.load(spark, sf, "documents")
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      base.write.mode("overwrite").parquet(docsDir.toString)
    }
    val docsSchema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingCms(df),
      docsDir.toString, docsSchema, "cms_out", OutputMode.Complete())
    val batch = graft.queries.TextQueries.cmsCells(
      base.select(explode(
        graft.functions.TextFunctions.tokens(lower(col("text")))).as("token")))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // state is sketch-bounded by construction
    assert(streamed.count() <= graft.queries.TextQueries.CmsW.toLong *
      graft.queries.TextQueries.CmsD)
  }

  test("streaming Bloom gate flags exactly the batch q9k rows, statelessly") {
    val base = Tables.load(spark, sf, "documents")
    val trainDir = Paths.get("target", "stream-bloom-docs").toAbsolutePath
    if (!Files.exists(trainDir.resolve("_SUCCESS"))) {
      base.filter(col("doc_id") % 50 =!= 0)
        .write.mode("overwrite").parquet(trainDir.toString)
    }
    val evalBits = graft.queries.TrainPrepQueries.bloomBitmap(
      base.filter(col("doc_id") % 50 === 0)
        .select(explode(graft.functions.FastText.shingleAnalyze(4)(col("text"))
          .getField("sh")).as("shingle")))
    val trainSchema = spark.read.parquet(trainDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingBloomGate(df, evalBits),
      trainDir.toString, trainSchema, "bloom_out", OutputMode.Append())
    val batch = graft.queries.TrainPrepQueries
      .queries("q9k_bloom_decontaminate")(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming similarity route equals the batch scoring row-for-row") {
    val base = Tables.load(spark, sf, "documents")
    val docsDir = Paths.get("target", "stream-simroute-docs").toAbsolutePath
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      base.write.mode("overwrite").parquet(docsDir.toString)
    }
    // probe vector compiled batch-side: doc 0's dense 16-dim hash-embed
    val sparse = base.filter(col("doc_id") === 0L)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .select(
        (graft.functions.PortableHash.detHash(col("tok")) % 16).as("dim"),
        (graft.functions.PortableHash.detHash(col("tok"), 7) % 2 * 2 - 1).as("sgn"))
      .groupBy(col("dim")).agg(org.apache.spark.sql.functions.sum(col("sgn")).as("w"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val probe = Seq.tabulate(16)(d => sparse.getOrElse(d, 0L))
    val schema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingSimilarityRoute(df, probe, minCos = 0.15),
      docsDir.toString, schema, "simroute_out", OutputMode.Append())
    val batch = StreamOps.streamingSimilarityRoute(base, probe, minCos = 0.15)
    assert(streamed.count() > 0, "threshold routes at least the probe doc itself")
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming BPE tokenization equals the batch token counts row-for-row") {
    val base = Tables.load(spark, sf, "documents")
    val docsDir = Paths.get("target", "stream-simroute-docs").toAbsolutePath
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      base.write.mode("overwrite").parquet(docsDir.toString)
    }
    // rules trained batch-side once; apply is a stateless projection
    val (merges, fin) = graft.operators.Bpe.train(
      graft.operators.Bpe.wordCounts(base, "text", 2000), 4)
    fin.unpersist()
    assert(merges.size === 4)
    val schema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingBpeTokenize(df, merges),
      docsDir.toString, schema, "bpe_out", OutputMode.Append())
    val batch = StreamOps.streamingBpeTokenize(base, merges)
    assert(streamed.count() === base.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // merged rules really compress: fewer subword tokens than chars
    val chars = base.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(col("text")))).head.getLong(0)
    val toks = batch.agg(org.apache.spark.sql.functions.sum(col("n_bpe_tokens")))
      .head.getLong(0)
    assert(toks > 0 && toks < chars)
  }

  test("streaming block excision equals the batch scrub row-for-row") {
    import spark.implicits._
    // hand case first: banned blocks vanish EVERYWHERE, order preserved
    val hand = Seq(
      (1L, "a b c d e f"), // blocks (bt=2): "a b","c d","e f"
      (2L, "c d x y"),     // "c d","x y"
      (3L, ""),            // token-less
      (4L, "c d")          // a doc that is ONLY a banned block
    ).toDF("doc_id", "text")
    val scrubbed = graft.functions.DedupFunctions
      .exciseAgainstBlockSet(hand, "doc_id", "text", 2, Seq("c d"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(scrubbed.toSeq == Seq(
      (1L, 3L, 2L, "a b e f", 4L),
      (2L, 2L, 1L, "x y", 2L),
      (3L, 0L, 0L, "", 0L),
      (4L, 1L, 0L, "", 0L)))
    // stream ≡ batch on the corpus: the scrub is a pure projection
    val base = Tables.load(spark, sf, "documents")
    val docsDir = Paths.get("target", "stream-simroute-docs").toAbsolutePath
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      base.write.mode("overwrite").parquet(docsDir.toString)
    }
    val banned = graft.functions.DedupFunctions
      .electDuplicateBlocks(base, "text", 8)
      .collect().map(_.getString(0)).toIndexedSeq
    assert(banned.nonEmpty, "corpus has recurring 8-token blocks")
    val schema = spark.read.parquet(docsDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingBlockExcise(df, 8, banned),
      docsDir.toString, schema, "excise_out", OutputMode.Append())
    val batch = StreamOps.streamingBlockExcise(base, 8, banned)
    assert(streamed.count() === base.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming incremental dedup: stream-static anti-join matches the batch q9f key set") {
    val base = Tables.load(spark, sf, "documents")
    val fpCol = graft.functions.FastText.textStatsUdf(col("text")).getField("fp")
    val isNew = col("source").isin((15 to 19).map("src" + _): _*)
    val batchDir = Paths.get("target", "stream-incr-docs").toAbsolutePath
    if (!Files.exists(batchDir.resolve("_SUCCESS"))) {
      base.filter(isNew).write.mode("overwrite").parquet(batchDir.toString)
    }
    val corpusFps = base.filter(!isNew).select(fpCol.as("fp")).distinct()
    val batchSchema = spark.read.parquet(batchDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingIncrementalDedup(df, corpusFps),
      batchDir.toString, batchSchema, "incr_dedup_out", OutputMode.Append())
    // batch twin (q9f picks min-id per fp; the stream picks first-seen,
    // which is micro-batch-order-dependent — compare the fp SET)
    val batchFps = graft.queries.DedupQueries.queries("q9f_incremental_dedup")(spark, sf)
      .select("fp")
    assert(streamed.count() > 0)
    assert(streamed.count() == batchFps.count())
    assert(streamed.select("fp").except(batchFps).count() == 0)
    assert(batchFps.except(streamed.select("fp")).count() == 0)
  }

  test("streaming MinHash near-dup pairs equal the batch q31 pair set") {
    val docsDir = Paths.get("target", "stream-mh-docs").toAbsolutePath
    if (!Files.exists(docsDir.resolve("_SUCCESS"))) {
      Tables.load(spark, sf, "documents")
        .write.mode("overwrite").parquet(docsDir.toString)
    }
    val docsSchema = spark.read.parquet(docsDir.toString).schema
    // precondition for exact equality: the fixture has no hot buckets
    // (on a hot bucket the stream is a documented bounded superset)
    val analyze = graft.functions.FastText.minhashAnalyze(
      graft.queries.DedupQueries.MinhashK, graft.queries.DedupQueries.ShingleN,
      graft.queries.DedupQueries.Bands, graft.queries.DedupQueries.RowsPerBand)
    val maxBucketN = Tables.load(spark, sf, "documents")
      .select(explode(analyze(col("text")).getField("buckets")).as("bucket"))
      .groupBy("bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucketN <= graft.queries.DedupQueries.MaxBucket,
      s"fixture has a hot bucket ($maxBucketN) — equality precondition broken")
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingMinhashPairs(spark, df),
      docsDir.toString, docsSchema, "mh_pairs_out", OutputMode.Append())
      .select(col("a_id"), col("b_id"), col("jaccard"))
    val batch = graft.queries.DedupQueries.queries("q31_minhash_pairs")(spark, sf)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    assert(streamed.count() > 0, "no near-dup pairs emitted — fixture should have near-dups")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("streaming MinHash hot-bucket guard caps state and emission") {
    import spark.implicits._
    // 20 identical docs: every band collides into one bucket. With
    // maxBucket=5 the first 5 members pair (C(5,2)=10, cross-band
    // deduped), the 6th arrival marks the bucket hot, the rest emit
    // nothing — emission is bounded by the cap, not the corpus.
    val hotDir = Paths.get("target", "stream-mh-hot").toAbsolutePath
    if (!Files.exists(hotDir.resolve("_SUCCESS"))) {
      (1L to 20L).map(i => (i, "the same exact text repeated for every single document here"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(hotDir.toString)
    }
    val hotSchema = spark.read.parquet(hotDir.toString).schema
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.streamingMinhashPairs(spark, df, maxBucket = 5),
      hotDir.toString, hotSchema, "mh_hot_out", OutputMode.Append())
    assert(streamed.count() == 10, s"expected C(5,2)=10 capped pairs, got ${streamed.count()}")
    assert(streamed.agg(max(col("b_id"))).head().getLong(0) <= 5L,
      "a doc past the hot-bucket cap leaked into a pair")
  }

  test("streaming sessionization matches the batch session counts") {
    val streamed = StreamOps.runBounded(spark,
      df => StreamOps.sessionize(spark, df),
      srcDir, schema, "sess_out", OutputMode.Update())
    // batch twin (same logic as q50 without the portable rounding)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("value"))
    val batch = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
    val joined = streamed.alias("s").join(batch.alias("b"), "user_id")
    assert(streamed.count() > 0)
    assert(joined.filter(col("s.n_sessions") =!= col("b.n_sessions") ||
      col("s.n_events") =!= col("b.n_events")).count() == 0)
  }

  test("bounded-state streaming dedup: in-window dups drop, expired-state dups re-emit") {
    import spark.implicits._
    val dir = Paths.get("target", "stream-dedup-bounded").toAbsolutePath.toString
    val f = new java.io.File(dir)
    if (f.exists()) { f.listFiles().foreach(_.delete()); f.delete() }
    def append(rows: Seq[(Long, String, Long)]): Unit = {
      rows.toDF("doc_id", "text", "secs")
        .select($"doc_id", $"text", timestamp_seconds($"secs").as("ts"))
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes: FileStreamSource batches by file timestamp
    }
    // batch 1: dup at t=0 and t=10 (in-window) + a unique row
    append(Seq((1L, "dup", 0L), (2L, "dup", 10L), (3L, "uniq", 5L)))
    // batches 2-3: advance the watermark far past the dup state's
    // expiry (10s + 60s); eviction lags one batch behind the watermark
    append(Seq((4L, "advance", 600L)))
    append(Seq((5L, "advance2", 1200L)))
    // batch 4: same content again, AFTER its state aged out → re-emits
    append(Seq((6L, "dup", 1800L)))
    val schema = spark.read.parquet(dir).schema
    val q = StreamOps.streamingDedupBounded(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
        tsCol = "ts", delay = "1 minute")
      .writeStream.format("memory").queryName("dedup_bounded_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table("dedup_bounded_out")
      .select($"doc_id").as[Long].collect().toSet
    // exactly one of the in-window dups survives (which one is
    // partition-order dependent); the post-expiry copy re-emits —
    // the bounded-state contract
    assert(out.intersect(Set(1L, 2L)).size == 1, s"in-window dedup broken: $out")
    assert(out.contains(3L) && out.contains(4L) && out.contains(5L), s"got $out")
    assert(out.contains(6L), s"state never aged out (no re-emission): $out")
  }

  test("streaming CDC upsert converges to the batch latest-wins merge under out-of-order delivery") {
    // qaj's formulaic changelog: base snapshot (v0) + updates/deletes
    // (v1) + inserts (v1)
    val docs = Tables.load(spark, sf, "documents")
    val changeLog = docs
      .select(col("doc_id"), col("text"), lit(0L).as("version"), lit("U").as("op"))
      .unionByName(docs
        .where(col("doc_id") % 7 === 0 || col("doc_id") % 13 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          lit(1L).as("version"),
          when(col("doc_id") % 13 === 0, "D").otherwise("U").as("op")))
      .unionByName(docs
        .where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"),
          lit(1L).as("version"), lit("U").as("op")))
    val logDir = Paths.get("target", "stream-cdc-log").toAbsolutePath
    if (!Files.exists(logDir.resolve("_SUCCESS"))) {
      // 8 files, hash-scattered: v1 changes land before their v0 base
      // rows in some micro-batches — the out-of-order case the state
      // resolution must absorb
      changeLog.repartition(8).write.mode("overwrite").parquet(logDir.toString)
    }
    val logSchema = spark.read.parquet(logDir.toString).schema
    val q = StreamOps.streamingCdcUpsert(
        spark.readStream.schema(logSchema)
          .option("maxFilesPerTrigger", 1).parquet(logDir.toString))
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Update()).start()
    try q.processAllAvailable()
    finally q.stop()
    // changelog consumer view: per key, the highest-version emission
    // wins; tombstones drop
    val streamedFinal = spark.table("cdc_out")
      .groupBy("doc_id")
      .agg(max_by(struct(col("op"), col("text")), col("version")).as("last"))
      .where(col("last.op") =!= "D")
      .select(col("doc_id"), col("last.text").as("text"))
    val batch = graft.operators.CdcMerge.latestWins(changeLog)
    assert(streamedFinal.count() == batch.count())
    assert(streamedFinal.except(batch).count() == 0)
    assert(batch.except(streamedFinal).count() == 0)
  }
}
