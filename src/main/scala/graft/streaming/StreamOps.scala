package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §4.4).
  *
  * The reference has no event-time semantics — its only streaming trait
  * is an unbounded cycle over finite shards (reference
  * sdata/datapipeline.py:472). This module is the north-star extension:
  * the same logical operators as the batch events pack
  * (graft.queries.EventsQueries), expressed over an unbounded source
  * with watermarks and state, so a pipeline written against the batch
  * engine has a streaming twin with identical per-window results on
  * bounded input.
  *
  * Scale design: both ops are keyed-state shuffles on (window/user) —
  * the standard streaming exchange; watermarks bound state size, and
  * `flatMapGroupsWithState` state is per-user O(1).
  */
object StreamOps {

  /** Tumbling event-time window aggregation with a watermark — the
    * streaming twin of q51_hourly_agg.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Native session-window aggregation with a watermark — the streaming
    * twin of q55_session_window (same built-in operator both modes; in
    * append mode only watermark-closed sessions emit).
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval self-join with watermarks: each event pairs
    * with the same user's events from the preceding hour. The
    * event-time range condition is what lets the engine bound join
    * state (rows age out once the watermark passes l_ts); without it a
    * stream-stream join buffers forever.
    *
    * `joinType` supports "inner" and "leftOuter". Left-outer adds the
    * watermark-forced null path: a left row that finds no match is held
    * in state until the watermark proves no matching right row can still
    * arrive (its event-time bound has passed), THEN emits null-extended —
    * the engine-level guarantee that outer results are final, never
    * retracted. Matched rows emit as they join, same as inner.
    */
  def intervalJoin(events: DataFrame, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftOuter").contains(joinType),
      s"intervalJoin supports inner/leftOuter, got '$joinType'")
    val l = events.select(col("user_id"), col("ts").as("l_ts"),
      col("event_id").as("l_id")).withWatermark("l_ts", "2 hours")
    val r = events.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id")).withWatermark("r_ts", "2 hours")
    l.join(r, expr(
      """user_id = r_user AND l_id != r_id
        |AND r_ts >= l_ts - INTERVAL 1 HOUR AND r_ts < l_ts""".stripMargin),
      joinType)
      .select(col("user_id"), col("l_id"), col("r_id"))
  }

  /** Streaming exact dedup — the streaming twin of q30: the FIRST
    * document per content digest passes, every later duplicate drops.
    * Spark's streaming `dropDuplicates` keeps one state row per distinct
    * digest (16-byte md5 key, not the document), so state is bounded by
    * distinct content, not throughput. A corpus with an ingest-time
    * column should use `withWatermark` + `dropDuplicatesWithinWatermark`
    * to age state out; the `documents` fixture has no event time, so
    * this is the unbounded-state variant (the reference has no streaming
    * at all — north-star surface).
    */
  def streamingDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .dropDuplicates("content_hash")

  /** Bounded-state streaming dedup: [[streamingDedup]]'s state grows
    * with every distinct digest forever — the exact-dedup contract,
    * but at 100 TB/day of stream the state store IS the corpus.
    * `dropDuplicatesWithinWatermark` is the production form when
    * duplicates cluster in time (retry storms, crawler re-fetches,
    * at-least-once sources): a digest's state ages out once the
    * watermark passes its event time + delay, so state holds only the
    * trailing window's digests. The documented tradeoff: a duplicate
    * arriving after its predecessor's state expired is emitted again
    * (StreamOpsSpec pins exactly this re-emission).
    */
  def streamingDedupBounded(docs: DataFrame, tsCol: String, delay: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(tsCol), md5(col(textCol)).as("content_hash"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming curation gate — the stateless slice of the batch
    * q9c_curation_v2 pipeline (Gopher rules + quality threshold), sharing
    * the thresholds and kernels with [[graft.queries.CurationQueries]] so
    * batch and stream keep one rulebook. Stateless by construction: every
    * rule is per-row arithmetic, so the stream needs no watermark and no
    * state store, and scales like any map-only stage. (The duplicated-
    * span ceiling is corpus-wide by definition and stays batch-side —
    * a stream cannot know a span's future document frequency.)
    */
  def curationGate(docs: DataFrame): DataFrame = {
    import graft.queries.CurationQueries._
    val nTok = graft.functions.TextFunctions.tokenCount(col("text"))
    val meanWl = graft.functions.Portable.pround(
      (length(col("text")).cast("double") - nTok.cast("double") + lit(1.0)) /
        greatest(nTok.cast("double"), lit(1.0)), 6)
    docs.select(col("doc_id"),
      nTok.as("n_words"),
      meanWl.as("mean_word_len"),
      graft.functions.TextFunctions.stopwordCount(col("text"),
        graft.functions.TextFunctions.stopwords.head._2).as("stop_hits"),
      graft.functions.FastText.qualityScoreUdf(col("text")).as("quality"))
      .filter(col("n_words") >= MinWords && col("n_words") <= MaxWords &&
        col("mean_word_len") >= MinMeanWl && col("mean_word_len") <= MaxMeanWl &&
        col("stop_hits") >= MinStopHits && col("quality") >= MinQuality)
  }

  /** Streaming incremental dedup — the streaming twin of
    * q9f_incremental_dedup: a document stream anti-joins the STATIC
    * corpus fingerprint table (stream-static joins need no watermark and
    * no state for the static side — Spark re-broadcasts or hash-joins it
    * per micro-batch), then `dropDuplicates` on the fingerprint removes
    * within-stream repeats with output-proportional keyed state. Same
    * fingerprint kernel as the batch query, so batch and stream agree on
    * what "duplicate" means.
    */
  def streamingIncrementalDedup(docsStream: DataFrame,
      corpusFps: DataFrame): DataFrame = {
    val fp = graft.functions.FastText.textStatsUdf(col("text")).getField("fp")
    docsStream.select(col("doc_id"), col("source"), fp.as("fp"))
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
      .dropDuplicates("fp")
  }

  /** Streaming count-min sketch — the batch sketch builder
    * ([[graft.queries.TextQueries.cmsCells]]) run as an incremental
    * streaming aggregation: every cell is an independent SUM, so the
    * state store holds at most d·w counter rows forever (sketch-sized
    * state by construction — the whole point of sketching a stream)
    * and each micro-batch folds in with map-side partials. Complete
    * mode re-emits the current grid; on bounded input the final grid
    * is cell-for-cell the batch sketch.
    */
  def streamingCms(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.cmsCells(
      docs.select(explode(
        graft.functions.TextFunctions.tokens(lower(col("text")))).as("token")))

  /** Streaming Bloom decontamination gate — the stateless twin of
    * q9k: the eval-set bitmap is compiled BATCH-side (eval suites are
    * static, tiny model state) and every streamed document probes it
    * per-row inside its own map stage: no join, no state store, no
    * watermark. The zero-false-negative contract carries over —
    * a streamed doc the exact join would flag always passes the gate.
    */
  def streamingBloomGate(docsStream: DataFrame, evalBits: Array[Long]): DataFrame =
    docsStream
      .select(col("doc_id").as("train_id"),
        graft.queries.TrainPrepQueries.bloomHitsUdf(evalBits)(
          graft.functions.FastText.shingleAnalyze(4)(col("text"))
            .getField("sh")).as("n_hits"))
      .filter(col("n_hits") >= 3)

  /** Streaming hash-embed similarity router — the streaming twin of
    * qad_hash_embed_topk's construction: every streamed document embeds
    * as the SAME 16-dim hashing-trick bag-of-words (portable token
    * hash → dim, ±1 sign hash) and scores against a FIXED probe vector
    * compiled batch-side (16 longs of model state, like the Bloom
    * gate's bitmap). Stateless per-row math — no join, no state store,
    * no watermark: rows at or above the cosine threshold route on.
    */
  def streamingSimilarityRoute(docsStream: DataFrame, probe: Seq[Long],
      minCos: Double): DataFrame = {
    require(probe.length == 16, s"probe must be 16-dim, got ${probe.length}")
    val probeNsq = math.sqrt(probe.map(w => (w * w).toDouble).sum)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val vec = transform(sequence(lit(0), lit(15)), d =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + when(graft.functions.PortableHash.detHash(t) % 16 === d,
          graft.functions.PortableHash.detHash(t, 7) % 2 * 2 - 1)
          .otherwise(lit(0L))))
    val probeCol = array(probe.map(lit): _*)
    docsStream
      .withColumn("v", vec)
      .withColumn("dot",
        aggregate(zip_with(col("v"), probeCol, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("nsq",
        aggregate(transform(col("v"), w => w * w), lit(0L), (acc, x) => acc + x))
      .filter(col("nsq") > 0)
      .select(col("doc_id"), graft.functions.Portable.pround(
        col("dot") / (sqrt(col("nsq")) * lit(probeNsq)), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Streaming BPE tokenization: the learned merge rules are driver
    * constants, so apply is a STATELESS per-row projection — identical
    * plan batch or stream, no state store, no watermark. Emits the
    * per-doc subword token count under the trained tokenizer — the
    * streaming admission-control shape ("does this doc fit the token
    * budget") for a continuously ingested corpus.
    */
  def streamingBpeTokenize(docsStream: DataFrame,
      merges: Seq[graft.operators.Bpe.Merge]): DataFrame =
    docsStream.select(col("doc_id"),
      aggregate(
        transform(graft.functions.TextFunctions.tokens(lower(col("text"))),
          w => size(graft.operators.Bpe.applyMerges(w, merges))),
        lit(0), (acc, n) => acc + n).as("n_bpe_tokens"))

  /** Streaming duplicate-block excision against a STATIC banned set:
    * the set is elected in batch
    * ([[graft.functions.DedupFunctions.electDuplicateBlocks]]) and
    * shipped as ONE broadcast digest-set
    * ([[graft.functions.BlockDigestSet]] — Bloom fast-reject + exact
    * sorted-digest verify), so the scrub is a stateless per-row
    * projection — identical plan batch or stream, no state store, no
    * watermark, no per-entry plan literals. The continuous-
    * decontamination shape for an ingest pipeline scrubbing known
    * boilerplate / leaked eval blocks.
    */
  def streamingBlockExcise(docsStream: DataFrame, blockTokens: Int,
      banned: graft.functions.BlockDigestSet): DataFrame =
    graft.functions.DedupFunctions.exciseAgainstBlockSet(
      docsStream, "doc_id", "text", blockTokens, banned)

  /** In-memory banned-list convenience (tests / hand sets) — same
    * broadcast digest-set path.
    */
  def streamingBlockExcise(docsStream: DataFrame, blockTokens: Int,
      banned: Seq[String]): DataFrame =
    streamingBlockExcise(docsStream, blockTokens,
      graft.functions.BlockDigestSet.fromStrings(banned))

  case class CdcRecord(doc_id: Long, text: String, version: Long, op: String)

  /** Streaming CDC latest-wins upsert — the keyed-state twin of
    * [[graft.operators.CdcMerge.latestWins]]: each arriving change
    * record advances its key's state to the highest version seen so
    * far and emits the key's CURRENT resolution (op 'D' rows emit as
    * tombstones — a changelog consumer drops them; append-mode sinks
    * can't retract, so the tombstone IS the delete). Convergent under
    * out-of-order delivery: a stale version arriving late re-emits the
    * unchanged current state, never regresses it.
    *
    * State bounds: one (version, op, text) row per key ever seen — the
    * materialized-view shape, sharded by key like any keyed stream; a
    * production deployment ages tombstones out with a state timeout
    * once downstream has consumed them.
    */
  def streamingCdcUpsert(changes: DataFrame): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col("doc_id").cast("long"), col("text"),
        col("version").cast("long"), col("op"))
      .as[CdcRecord]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[CdcRecord, CdcRecord](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[CdcRecord], state: GroupState[CdcRecord]) =>
          val incoming = rows.maxBy(_.version)
          val best = state.getOption match {
            case Some(s) if s.version >= incoming.version => s
            case _ => incoming
          }
          state.update(best)
          Iterator.single(best.copy(doc_id = id))
      }
      .toDF()
  }

  case class MinhashDocIn(doc_id: Long, sh: Seq[String], bucket: String)
  case class BucketMembers(members: List[(Long, Seq[String])], hot: Boolean)
  case class NearDupPair(a_id: Long, b_id: Long, jaccard: Double)

  /** Streaming MinHash+LSH near-dup mining — the streaming twin of
    * q31_minhash_pairs, parameterized by the SAME constants as the batch
    * pipeline (graft.queries.DedupQueries) so both mine one pair set.
    *
    * Topology: per-doc signatures (same `minhashAnalyze` kernel) explode
    * to (bucket, doc) rows; `flatMapGroupsWithState` keyed on the band
    * bucket holds the bucket's member list as state and pairs each
    * arriving doc against the members already seen, emitting
    * Jaccard-verified pairs (same `jaccardJvm` kernel, same threshold).
    * A second stateful stage (`dropDuplicates` on the id pair) removes
    * cross-band duplicates, exactly like the batch `distinct()`.
    *
    * State bounds (the 100 TB question): each bucket's member list is
    * capped at `maxBucket` signatures — once a bucket exceeds the cap it
    * is marked hot, its members are dropped, and it never pairs again
    * (the streaming rendering of the batch hot-bucket guard; pairs
    * emitted before the bucket went hot cannot be retracted in append
    * mode, so on a hot bucket the stream is a bounded superset of the
    * batch output — at most maxBucket²/2 extra candidate checks).
    * Pair-dedup state is one row per distinct emitted pair — output-,
    * not input-, proportional.
    */
  def streamingMinhashPairs(spark: SparkSession, docs: DataFrame,
      k: Int = graft.queries.DedupQueries.MinhashK,
      shingleN: Int = graft.queries.DedupQueries.ShingleN,
      bands: Int = graft.queries.DedupQueries.Bands,
      rowsPerBand: Int = graft.queries.DedupQueries.RowsPerBand,
      maxBucket: Int = graft.queries.DedupQueries.MaxBucket,
      minJaccard: Double = graft.queries.DedupQueries.MinJaccard): DataFrame = {
    import spark.implicits._
    val analyze = graft.functions.FastText.minhashAnalyze(k, shingleN, bands, rowsPerBand)
    docs.select(col("doc_id"), analyze(col("text")).as("a"))
      .select(col("doc_id"), col("a.sh").as("sh"), explode(col("a.buckets")).as("bucket"))
      .as[MinhashDocIn]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[MinhashDocIn], state: GroupState[BucketMembers]) =>
          var s = state.getOption.getOrElse(BucketMembers(Nil, hot = false))
          val out = List.newBuilder[NearDupPair]
          // sort the micro-batch slice so pairing order (and therefore
          // which band first emits a shared pair) is deterministic
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!s.hot && !s.members.exists(_._1 == r.doc_id)) {
              if (s.members.size >= maxBucket) {
                s = BucketMembers(Nil, hot = true) // free members: a hot bucket never pairs
              } else {
                s.members.foreach { case (oid, osh) =>
                  val j = graft.functions.FastText.jaccardJvm(r.sh, osh)
                  if (j >= minJaccard) {
                    val (a, b) = if (oid < r.doc_id) (oid, r.doc_id) else (r.doc_id, oid)
                    out += NearDupPair(a, b, j)
                  }
                }
                s = s.copy(members = (r.doc_id, r.sh) :: s.members)
              }
            }
          }
          state.update(s)
          out.result().iterator
      }
      .toDF()
      .dropDuplicates("a_id", "b_id")
  }

  case class EventIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionCount: Long, lastTs: Long, events: Long, total: Double)
  case class SessionOut(user_id: Long, n_sessions: Long, n_events: Long, total_value: Double)

  /** Gap-based sessionization with explicit keyed state — the streaming
    * twin of q50_sessionize (gap = 30 min). Emits a running per-user
    * summary on every trigger (Update mode).
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            val sec = e.ts.getTime / 1000
            val newSession = s.lastTs == Long.MinValue || sec - s.lastTs > 1800
            s = SessionState(
              s.sessionCount + (if (newSession) 1 else 0),
              sec, s.events + 1, s.total + e.value)
          }
          state.update(s)
          SessionOut(user, s.sessionCount, s.events, s.total)
      }
      .toDF()
  }

  /** Drives a bounded parquet directory through the streaming engine to
    * completion and returns the collected result from a memory sink —
    * the local smoke path (one micro-batch ≡ the batch result).
    */
  def runBounded(spark: SparkSession, df: DataFrame => DataFrame,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      queryName: String, mode: OutputMode): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    val q = df(src).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
