package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Permute, PortableHash, TextFunctions}
import graft.functions.Portable.pround

/** Training-set preparation operators over `documents`: deterministic
  * split assignment, TF-IDF term scoring, and token-budget sequence
  * packing — the last-mile ops between a curated corpus and a training
  * run.
  *
  * Scale notes: the split is a pure per-row hash (no shuffle beyond the
  * summary agg); TF-IDF is the inverted-index shape (explode → two hash
  * aggregations → re-join by term) whose cost is corpus token count,
  * never n²; packing uses a PARTITIONED running sum (pack within
  * `source`) — a global cumsum would serialize on one reducer at 100 TB,
  * the per-source window is the scalable form (sources pack
  * independently, which is also what a sharded writer wants).
  */
object TrainPrepQueries extends QueryPack {

  private val SplitSeed = 7
  private val PackBudget = 1024L
  private val ReservoirSeed = 11
  private val ReservoirK = 10
  private val QuotaSeed = 13
  private val QuotaTokens = 4000L
  private val UpsampleSeed = 17
  // qau/qav: PRP-based exact split / epoch sharding (functions.Permute)
  private val EpochSeed = 23
  private val EpochWorkers = 8
  // qao: DSIR hashed-feature geometry. 128 buckets is the toy-scale
  // analogue of the paper's 10k-dim hashed n-gram space; at 100 TB the
  // bucket count grows but the weight table stays driver/broadcast-sized.
  private val DsirSeed = 19
  private val DsirBuckets = 128L
  private val DsirTopK = 25
  // q9g: chunk width/stride in tokens (overlap = ChunkW - ChunkS)
  private val ChunkW = 32
  private val ChunkS = 24

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Bloom geometry — shared by the batch gate (q9k) and the streaming
    * twin ([[graft.streaming.StreamOps.streamingBloomGate]]) so both
    * probe the SAME bitmap bit-for-bit.
    */
  val BloomBits = 32768
  val BloomK = 3

  private def bloomBitOf(sg: String, h: Int): Int =
    (PortableHash.detHashJvm(s"$sg:bloom:$h") % BloomBits).toInt

  /** Compile a (small) shingle frame into the 4 KB bitmap — driver
    * model state, like the IVF centroids; the probing side then needs
    * no join at any scale.
    */
  def bloomBitmap(shingles: DataFrame): Array[Long] = {
    val bits = new Array[Long](BloomBits / 64)
    shingles.select(col("shingle")).distinct().collect().foreach { r =>
      (0 until BloomK).foreach { h =>
        val b = bloomBitOf(r.getString(0), h)
        bits(b >> 6) |= 1L << (b & 63)
      }
    }
    bits
  }

  /** Per-row membership count of a shingle array against the bitmap
    * (all k bits set ⇒ hit) — the closure broadcasts the 4 KB bitmap.
    */
  def bloomHitsUdf(bits: Array[Long]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((shingles: Seq[String]) => shingles.count { sg =>
      (0 until BloomK).forall { h =>
        val b = bloomBitOf(sg, h)
        (bits(b >> 6) & (1L << (b & 63))) != 0
      }
    }.toLong)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Overlapping fixed-width chunking — the document→passage primitive
    // for embedding/RAG and long-context packing: width-32 windows at
    // stride 24 (8-token overlap), short docs one whole-doc chunk. Pure
    // per-row generate (token array staged once, chunk count integer-
    // derived, posexplode over chunk indices) — no shuffle until the
    // output sort, embarrassingly parallel at any scale.
    "q9g_chunk_documents" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
        .select($"doc_id", $"toks", size($"toks").cast("long").as("ntok"))
        .withColumn("nch",
          when($"ntok" <= ChunkW, lit(1L))
            .otherwise(floor(($"ntok" - ChunkW + (ChunkS - 1)) / lit(ChunkS)) + 1))
        .select($"doc_id", $"toks", $"ntok",
          posexplode(sequence(lit(0L), $"nch" - 1)).as(Seq("ord", "chunk_id")))
        .select($"doc_id", $"chunk_id",
          least(lit(ChunkW.toLong), $"ntok" - $"chunk_id" * ChunkS).as("n_chunk_tokens"),
          concat_ws(" ", slice($"toks", ($"chunk_id" * ChunkS + 1).cast("int"), lit(ChunkW)))
            .as("chunk_text"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Deterministic train/val/test assignment: u = hash(doc_id, seed) in
    // [0,1); 80/10/10 by threshold. Replayable under retry, stable
    // across runs/engines — the property a split MUST have so no example
    // silently migrates between train and eval.
    "q90_split_train_val_test" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .withColumn("u", PortableHash.detUniform($"doc_id", SplitSeed))
        .withColumn("split",
          when($"u" < 0.8, "train").when($"u" < 0.9, "val").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount($"text")).as("n_tokens"))
        .orderBy($"split")
    }),

    // STRATIFIED train/val/test split: q90's hash split is exact only in
    // expectation — on a small or skewed source its realized fractions
    // drift, silently shifting the eval mixture. This variant ranks docs
    // in hash order WITHIN each source and cuts at exact integer
    // boundaries (floor(0.8·n), floor(0.9·n)), so every source's split
    // proportions are exact by construction while each assignment stays
    // a replayable function of (doc_id, seed). One rank window per
    // source + the rollup.
    "q9q_stratified_split" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy(PortableHash.detHash($"doc_id", SplitSeed), $"doc_id")
      docs(s, dir)
        .select($"source", $"doc_id",
          TextFunctions.tokenCount($"text").cast("long").as("tok"))
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
        .withColumn("split",
          when($"rk" <= expr("(8 * n) DIV 10"), "train")
            .when($"rk" <= expr("(9 * n) DIV 10"), "val")
            .otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
        .orderBy($"source", $"split")
    }),

    // TF-IDF top terms: explode lowercased tokens → per-(doc, term) tf,
    // per-term df, score = tf · ln((N+1)/(df+1)) summed over docs.
    // Inverted-index topology — both aggregations are hash-partial, the
    // only join moves (term, df) pairs.
    "q91_tfidf_top_terms" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val n = d.count() // driver-side scalar: corpus size for idf
      val terms = d.select($"doc_id",
          explode(TextFunctions.tokens(lower($"text"))).as("term"))
      // tf feeds BOTH the score join and the df aggregate — persist it
      // or the plan re-derives scan→explode→agg per branch (the
      // broadcast-re-execution rule; at scale that doubles the corpus
      // pass)
      val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .persist()
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      tf.join(df, Seq("term"))
        .groupBy($"term")
        .agg(max($"df").as("df"),
          pround(sum($"tf" * log(lit(n + 1.0) / ($"df" + 1.0))), 6).as("total_score"))
        .orderBy($"total_score".desc, $"term")
        .limit(20)
        .select($"term", $"df", $"total_score")
    }),

    // Weighted reservoir sample (A-Res, Efraimidis–Spirakis): per
    // language, the K docs with the largest ln(u)/weight key — each
    // doc's inclusion probability is proportional to its weight
    // (n_chars), yet the draw is a pure function of (doc_id, seed):
    // replayable, mergeable (top-K of a max-key is associative), one
    // window per group. The key rounds to 9 decimals before ranking so
    // cross-engine libm ulp differences can't flip adjacent ranks
    // (doc_id breaks rounded ties).
    "q94_weighted_reservoir" -> ((s, dir) => {
      import s.implicits._
      val u = (PortableHash.detHash($"doc_id", ReservoirSeed) + 0.5) /
        lit(4294967296.0) // (0,1): never exactly 0, ln stays finite
      val key = pround(log(u) / $"n_chars", 9)
      val w = Window.partitionBy($"lang").orderBy(col("rkey").desc, $"doc_id")
      docs(s, dir)
        .withColumn("rkey", key)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= ReservoirK)
        .select($"lang", $"rk", $"doc_id")
        .orderBy($"lang", $"rk")
    }),

    // Mixture quota selection: each source contributes docs (in
    // deterministic hash order) until its token quota fills — the
    // up/down-sampling recipe a data-mixture spec compiles to. The
    // straddling doc is included (quota is a floor, not a cap), so
    // every source with data contributes at least one doc. One window
    // per source, no shuffle beyond it.
    "q95_mixture_quota" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy(PortableHash.detHash($"doc_id", QuotaSeed), $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select($"source", $"doc_id",
          TextFunctions.tokenCount($"text").cast("long").as("tok"))
        .withColumn("cum", sum($"tok").over(w))
        .filter($"cum" - $"tok" < QuotaTokens)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_selected"), sum($"tok").as("tokens_selected"))
        .orderBy($"source")
    }),

    // Mixture rebalancing by UP-sampling: each source carries an epoch
    // weight (how many passes over it a training run makes — the
    // LLaMA/DoReMi-style mixture recipe); fractional epochs resolve by
    // deterministic stochastic rounding (hash-uniform < frac(w) ⇒ one
    // extra copy), so the EXPECTED token share matches the spec exactly
    // while every copy decision is a replayable pure function of
    // (doc_id, seed). Complements q95 (quota = down-sampling): together
    // they compile an arbitrary mixture spec. Per-row arithmetic + one
    // hash agg — no shuffle beyond the final per-source rollup; the
    // copies themselves would materialize with posexplode(sequence(...)),
    // row-expansion at the writer, never before.
    "q9i_mixture_upsample" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"source", $"doc_id",
          TextFunctions.tokenCount($"text").cast("long").as("tok"))
        .withColumn("w",
          lit(1.0) + (substring($"source", 4, 8).cast("int") % 4).cast("double") * 0.75)
        .withColumn("n_copies", floor($"w").cast("long") +
          when(PortableHash.detUniform($"doc_id", UpsampleSeed) < $"w" - floor($"w"), 1L)
            .otherwise(0L))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_copies").as("n_copies_out"),
          sum($"tok" * $"n_copies").as("tokens_out"))
        .orderBy($"source")
    }),

    // Decontamination: flag training documents sharing >= MinShared
    // distinct word-4-grams with any eval-set document (here: the
    // deterministic doc_id % 50 == 0 slice stands in for a benchmark
    // suite). The eval side is small by construction, so the shingle
    // join broadcasts it (AQE) and the scan over training shingles is
    // one pass — the standard benchmark-overlap sweep before a training
    // run, at corpus-token cost.
    "q93_decontaminate" -> ((s, dir) => {
      import s.implicits._
      // the shingle analysis feeds both the eval and train branches —
      // and q33/q9k consume the same frame, so it comes from the shared
      // staging table (one md5 kernel pass per session and corpus)
      val sh = TextStaging.shingle4(s, dir)
      val evalSet = sh.filter($"doc_id" % 50 === 0)
        .select($"doc_id".as("eval_id"), explode($"sh").as("shingle"))
      val train = sh.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id".as("train_id"), explode($"sh").as("shingle"))
      train.join(evalSet, Seq("shingle"))
        .groupBy($"train_id", $"eval_id")
        .agg(count(lit(1)).as("shared"))
        .filter($"shared" >= 3)
        .orderBy($"train_id", $"eval_id")
    }),

    // Bloom-filter decontamination pre-filter: the eval set's 4-gram
    // shingles compile into a 32768-bit / 3-hash Bloom bitmap (4 KB of
    // driver model state — eval suites are small by nature, same
    // argument as q93's broadcast), and the TRAINING side then needs NO
    // join at all: a per-row membership probe counts each doc's
    // bloom-hitting shingles in the same scan that read it. One-sided
    // error means zero false negatives — every true overlap q93 would
    // find survives this filter — so at 100 TB this pass prunes the
    // corpus down to candidate docs for pennies and the exact shingle
    // join (q93) runs only on what's left. Flags docs with ≥3 hits
    // (superset of q93's ≥3-shared contract, by construction).
    "q9k_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val sh = TextStaging.shingle4(s, dir)
      val evalBits = bloomBitmap(
        sh.filter($"doc_id" % 50 === 0).select(explode($"sh").as("shingle")))
      sh.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id".as("train_id"), bloomHitsUdf(evalBits)($"sh").as("n_hits"))
        .filter($"n_hits" >= 3)
        .orderBy($"train_id")
    }),

    // Token-budget packing: within each source, docs in id order fill
    // bins of PackBudget tokens; a doc's bin = exclusive-prefix-sum ÷
    // budget (fixed-boundary packing — the closed form a distributed
    // window can compute; greedy reset-on-overflow packing is inherently
    // sequential). Emits per-bin occupancy.
    "q92_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select($"source", $"doc_id",
          TextFunctions.tokenCount($"text").cast("long").as("tok"))
        .withColumn("prior", sum($"tok").over(w) - $"tok")
        .withColumn("bin", floor($"prior" / PackBudget).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").as("total_tokens"))
        .orderBy($"source", $"bin")
    }),

    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score every raw doc
    // by how target-like its hashed-token feature histogram is, where
    // the target distribution is defined by an exemplar slice (here the
    // lang='en' docs). Per-bucket importance weights are the smoothed
    // target/raw count ratio in integer MICRO-UNITS — ((tc+1)·10⁶) div
    // (rc+B) — and a doc's score is the count-weighted integer mean of
    // its buckets' weights, so every arithmetic step is exact BIGINT
    // (no float summation-order lottery, the q1g discipline) and the
    // oracle reproduces it bit-for-bit. Topology: ONE explode pass
    // compacted immediately into per-(doc,bucket) counts (≤B rows/doc,
    // persisted — it feeds the raw aggregate, the target aggregate and
    // the scoring join), a B-row weight table broadcast back, one
    // map-side-combinable agg per doc. At 100 TB the only corpus-sized
    // shuffle is the per-doc histogram; the model state (weight table)
    // stays broadcast-sized at any corpus scale.
    "qao_dsir_select" -> ((s, dir) => {
      import s.implicits._
      val db = docs(s, dir)
        .select($"doc_id", $"lang", $"source",
          explode(TextFunctions.tokens(lower($"text"))).as("tok"))
        .withColumn("bucket", PortableHash.detHash($"tok", DsirSeed) % DsirBuckets)
        .groupBy($"doc_id", $"lang", $"source", $"bucket")
        .agg(count(lit(1)).as("n"))
        .persist()
      val raw = db.groupBy($"bucket").agg(sum($"n").as("rc"))
      val tgt = db.filter($"lang" === "en")
        .groupBy($"bucket").agg(sum($"n").as("tc"))
      val wts = raw.join(tgt, Seq("bucket"), "left")
        .select($"bucket",
          expr(s"((coalesce(tc, 0L) + 1L) * 1000000L) DIV (rc + $DsirBuckets)")
            .as("wt"))
      db.join(broadcast(wts), Seq("bucket"))
        .groupBy($"doc_id", $"lang", $"source")
        .agg(sum($"n" * $"wt").as("sw"), sum($"n").as("nt"))
        .select($"doc_id", $"lang", $"source",
          expr("sw DIV nt").as("dsir_score_micro"))
        .orderBy($"dsir_score_micro".desc, $"doc_id")
        .limit(DsirTopK)
    }),

    // EXACT-count random split via a seeded pseudo-random permutation
    // (graft.functions.Permute): rank docs by id, permute the rank with
    // a cycle-walking Feistel PRP, cut the PERMUTED positions at exact
    // integer boundaries. q90's hash split is exact only in expectation
    // and q9q is exact per-source but needs a rank window per cut —
    // this form gives globally exact 80/10/10 counts from pure per-row
    // arithmetic on the rank. The rank window moves ids only (never
    // payload); at 100 TB ranks are a once-per-corpus artifact and every
    // re-split/epoch decision after that is shuffle-free. `pair_sum`
    // pins the doc→position pairing, not just the position set.
    "qau_exact_split" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select($"doc_id")
      val n = d.agg(count(lit(1)).as("n"))
      // distributed contiguous rank (never a single-task global window —
      // see operators.GlobalIndex): ids-only frame through the exchange
      graft.operators.GlobalIndex.rankIds(d, "doc_id", "i")
        .crossJoin(broadcast(n))
        .withColumn("p", Permute.permuteUdf(SplitSeed)($"i", $"n"))
        .withColumn("split",
          when($"p" < expr("(n * 8) DIV 10"), "train")
            .when($"p" < expr("(n * 9) DIV 10"), "val")
            .otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum($"p").as("sum_p"),
          sum($"p" * (PortableHash.detHash($"doc_id") % 997)).as("pair_sum"))
        .orderBy($"split")
    }),

    // Epoch re-shuffle without a shuffle: per epoch e, worker w reads
    // exactly the docs whose permuted rank falls in w's contiguous
    // stripe — a fresh balanced assignment every epoch (seed = base+e)
    // computed row-locally from the rank, no payload exchange, stable
    // under retries, disjoint-and-complete by bijectivity. This is the
    // reference's SplitByWorker ∘ shard-shuffle composition re-expressed
    // as arithmetic (reference sdata/custom_datapipes.py:108-141).
    // Worker stripe sizes are balanced to ±1 by construction.
    // Fill-in-the-middle transform (the FIM pretraining op, Bavarian et
    // al. 2022): each document splits at deterministic 40%/70% char
    // boundaries into (prefix, middle, suffix) and reassembles with
    // sentinels — PSM order for even ids, SPM for odd (the 50/50 mode
    // mix the recipe prescribes). Pure per-row substring arithmetic in
    // one codegen pass; the hash pins the md5 of every transformed doc,
    // so an off-by-one boundary or a mode mix-up cannot pass.
    "qbm_fim_transform" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .withColumn("p1", expr("CAST(length(text) AS BIGINT) * 4 DIV 10"))
        .withColumn("p2", expr("CAST(length(text) AS BIGINT) * 7 DIV 10"))
      val pre = substring($"text", lit(1), $"p1".cast("int"))
      val mid = expr("substring(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))")
      val suf = expr("substring(text, CAST(p2 + 1 AS INT))") // 2-arg: to end
      d.withColumn("fim",
          when($"doc_id" % 2 === 0,
            concat(lit("<PRE>"), pre, lit("<SUF>"), suf, lit("<MID>"), mid))
          .otherwise(
            concat(lit("<SUF>"), suf, lit("<PRE>"), pre, lit("<MID>"), mid)))
        .select($"doc_id", length($"fim").cast("long").as("n_chars_fim"),
          md5($"fim").as("fim_md5"))
        .orderBy($"doc_id")
    }),

    // Length-bucketed batching (dynamic batching): docs bucket to the
    // next multiple of 32 tokens; each bucket forms batches of 8 padded
    // to the bucket length. The report prices the padding — tokens
    // wasted on in-doc padding plus empty slots in ragged final batches
    // — the accounting a training-efficiency pass runs before fixing a
    // batch plan. One aggregation, map-side combinable.
    "qbn_length_batching" -> ((s, dir) => {
      import s.implicits._
      val B = 8L
      docs(s, dir)
        .select(TextFunctions.tokenCount($"text").cast("long").as("tok"))
        .withColumn("bucket", expr("((tok + 31) DIV 32) * 32"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"tok").as("sum_tok"),
          expr(s"(count(1) + ${B - 1}) DIV $B").as("n_batches"))
        .withColumn("pad_tokens", $"n_docs" * $"bucket" - $"sum_tok")
        .withColumn("slot_waste",
          ($"n_batches" * B - $"n_docs") * $"bucket")
        .orderBy($"bucket")
    }),

    // Signal distillation by EXACT least squares: fit the heuristic
    // quality score (micro-units) as a linear function of (token count,
    // char count) — the "replace the expensive scorer with a shippable
    // linear model" pass. The whole fit is ONE map-side-combinable
    // aggregation (the integer moment matrix) + an O(1) driver Cramer
    // solve in BigInt; no gradient iterations, no float reduction-order
    // nondeterminism. The oracle replays the identical normal equations
    // in 128-bit SQL arithmetic — coefficients AND the micro-unit
    // residual sum must match bit-for-bit. See functions.LinearFit for
    // the 100 TB rationale.
    "qbp_distill_linear" -> ((s, dir) => {
      import s.implicits._
      val feats = docs(s, dir).select(
        TextFunctions.tokenCount($"text").cast("long").as("x1"),
        $"n_chars".cast("long").as("x2"),
        floor(graft.functions.FastText.qualityScoreUdf($"text") * 1e6 + 0.5)
          .cast("long").as("y"))
      val fit = graft.functions.LinearFit.fit3(feats, $"x1", $"x2", $"y")
      feats
        .withColumn("r", $"y" -
          floor(lit(fit.w0) + lit(fit.w1) * $"x1" + lit(fit.w2) * $"x2" + 0.5)
            .cast("long"))
        .agg(sum($"r" * $"r").as("sse_micro2"))
        .withColumn("w0", lit(fit.w0))
        .withColumn("w1", lit(fit.w1))
        .withColumn("w2", lit(fit.w2))
        .withColumn("n_docs", lit(fit.n))
        .select($"w0", $"w1", $"w2", $"n_docs", $"sse_micro2")
    }),

    // Distilled-model APPLICATION: score the corpus with qbp's linear
    // model and price the distillation against the heuristic gate at
    // 0.5 — the confusion matrix a pipeline inspects before swapping a
    // scorer for its cheap surrogate. The linear score is pure per-row
    // codegen (two multiplies and two adds — no UDF, unlike the
    // heuristic it replaces), which is the point of distilling.
    "qbq_distill_apply" -> ((s, dir) => {
      import s.implicits._
      val feats = docs(s, dir).select(
        TextFunctions.tokenCount($"text").cast("long").as("x1"),
        $"n_chars".cast("long").as("x2"),
        floor(graft.functions.FastText.qualityScoreUdf($"text") * 1e6 + 0.5)
          .cast("long").as("y"))
      val fit = graft.functions.LinearFit.fit3(feats, $"x1", $"x2", $"y")
      feats
        .withColumn("pred",
          floor(lit(fit.w0) + lit(fit.w1) * $"x1" + lit(fit.w2) * $"x2" + 0.5)
            .cast("long"))
        .select(($"y" >= 500000L).as("heur"), ($"pred" >= 500000L).as("lin"))
        .agg(
          count(when($"heur" && $"lin", 1)).as("tp"),
          count(when(!$"heur" && $"lin", 1)).as("fp"),
          count(when($"heur" && !$"lin", 1)).as("fn"),
          count(when(!$"heur" && !$"lin", 1)).as("tn"))
    }),

    // Distributed contiguous indexing — the idx-addressable-dataset
    // primitive (epoch permutation, fetch-by-index, packing all start
    // from a dense rank): operators.GlobalIndex assigns ids via range
    // exchange + per-partition offsets, never a single-task global
    // window (qau/qav share the operator). The hash pins the complete
    // (rank, key, payload) pairing, so a partition/offset mispairing —
    // the operator's one failure mode — cannot hash-match.
    "qbl_contiguous_index" -> ((s, dir) => {
      import s.implicits._
      graft.operators.GlobalIndex.rankIds(
          docs(s, dir).select($"doc_id", $"n_chars"), "doc_id", "idx")
        .agg(count(lit(1)).as("n_rows"),
          max($"idx").as("max_idx"),
          sum($"idx" * $"doc_id").as("pair_sum"),
          sum($"idx" * $"n_chars").as("payload_pair_sum"))
    }),

    "qav_epoch_shards" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select($"doc_id")
      val n = d.agg(count(lit(1)).as("n"))
      // same distributed rank as qau — no global window anywhere
      val ranked = graft.operators.GlobalIndex.rankIds(d, "doc_id", "i")
        .crossJoin(broadcast(n))
      ranked
        .withColumn("p1", Permute.permuteUdf(EpochSeed + 1)($"i", $"n"))
        .withColumn("p2", Permute.permuteUdf(EpochSeed + 2)($"i", $"n"))
        .select($"doc_id", $"n",
          expr("stack(2, 1, p1, 2, p2)").as(Seq("epoch", "p")))
        .withColumn("worker", expr(s"(p * $EpochWorkers) DIV n"))
        .groupBy($"epoch", $"worker")
        .agg(count(lit(1)).as("n_docs"),
          sum($"p" * (PortableHash.detHash($"doc_id") % 997)).as("pair_sum"))
        .orderBy($"epoch", $"worker")
    })
  )

  override def oracles: Map[String, String] = {
    val tok = TextFunctions.tokenCountSql("text")
    Map(
      "q9g_chunk_documents" ->
        s"""WITH t AS (
           | SELECT doc_id, ${TextFunctions.tokensSql("text")} AS toks,
           |  length(${TextFunctions.tokensSql("text")})::BIGINT AS ntok
           | FROM documents),
           |n AS (SELECT *, CASE WHEN ntok <= $ChunkW THEN 1
           |        ELSE (ntok - $ChunkW + ${ChunkS - 1}) // $ChunkS + 1 END AS nch
           |      FROM t),
           |c AS (SELECT doc_id, toks, ntok,
           |        unnest(generate_series(0, nch - 1)) AS chunk_id FROM n)
           |SELECT doc_id, chunk_id,
           | least($ChunkW, ntok - chunk_id * $ChunkS) AS n_chunk_tokens,
           | array_to_string(toks[chunk_id * $ChunkS + 1 : chunk_id * $ChunkS + $ChunkW], ' ')
           |  AS chunk_text
           |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
      "q90_split_train_val_test" ->
        s"""SELECT split, count(*) AS n_docs,
           | CAST(sum($tok) AS BIGINT) AS n_tokens
           |FROM (
           | SELECT text,
           |  CASE WHEN u < 0.8 THEN 'train'
           |       WHEN u < 0.9 THEN 'val'
           |       ELSE 'test' END AS split
           | FROM (SELECT text,
           |   ${PortableHash.duckUniformSql("CAST(doc_id AS VARCHAR)", SplitSeed)} AS u
           |  FROM documents))
           |GROUP BY split ORDER BY split""".stripMargin,
      "q91_tfidf_top_terms" ->
        s"""WITH n AS (SELECT count(*) AS n FROM documents),
           |terms AS (SELECT doc_id, unnest(${TextFunctions.tokensSql("lower(text)")}) AS term
           |          FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
           |SELECT term, df, total_score FROM (
           | SELECT tf.term, max(df.df) AS df,
           |  floor((sum(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)))) * 1000000 + 0.5) / 1000000
           |    AS total_score
           | FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
           | GROUP BY tf.term)
           |ORDER BY total_score DESC, term LIMIT 20""".stripMargin,
      "q94_weighted_reservoir" -> {
        val h = PortableHash.duckHashSql("CAST(doc_id AS VARCHAR)", ReservoirSeed)
        val key = graft.functions.Portable.proundSql(
          s"ln(($h + 0.5) / 4294967296.0) / n_chars", 9)
        s"""SELECT lang, rk, doc_id FROM (
           | SELECT lang, doc_id, row_number() OVER (
           |  PARTITION BY lang ORDER BY $key DESC, doc_id) AS rk
           | FROM documents)
           |WHERE rk <= $ReservoirK ORDER BY lang, rk""".stripMargin
      },
      "q95_mixture_quota" -> {
        val h = PortableHash.duckHashSql("CAST(doc_id AS VARCHAR)", QuotaSeed)
        s"""WITH c AS (
           | SELECT source, CAST($tok AS BIGINT) AS tok,
           |  sum(CAST($tok AS BIGINT)) OVER (PARTITION BY source
           |   ORDER BY $h, doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           | FROM documents)
           |SELECT source, count(*) AS n_selected,
           | CAST(sum(tok) AS BIGINT) AS tokens_selected
           |FROM c WHERE cum - tok < $QuotaTokens
           |GROUP BY source ORDER BY source""".stripMargin
      },
      "q9q_stratified_split" -> {
        val h = PortableHash.duckHashSql("CAST(doc_id AS VARCHAR)", SplitSeed)
        s"""WITH r AS (
           | SELECT source, CAST($tok AS BIGINT) AS tok,
           |  row_number() OVER (PARTITION BY source ORDER BY $h, doc_id) AS rk,
           |  count(*) OVER (PARTITION BY source) AS n
           | FROM documents)
           |SELECT source,
           | CASE WHEN rk <= (8 * n) // 10 THEN 'train'
           |      WHEN rk <= (9 * n) // 10 THEN 'val'
           |      ELSE 'test' END AS split,
           | count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
           |FROM r GROUP BY 1, 2 ORDER BY source, split""".stripMargin
      },
      "q9i_mixture_upsample" -> {
        val u = PortableHash.duckUniformSql("CAST(doc_id AS VARCHAR)", UpsampleSeed)
        s"""WITH c AS (
           | SELECT source, CAST($tok AS BIGINT) AS tok,
           |  1.0 + (TRY_CAST(substr(source, 4) AS INT) % 4) * 0.75 AS w,
           |  $u AS u
           | FROM documents),
           |n AS (
           | SELECT source, tok,
           |  CAST(floor(w) AS BIGINT) +
           |   (CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END) AS n_copies
           | FROM c)
           |SELECT source, count(*) AS n_docs,
           | CAST(sum(n_copies) AS BIGINT) AS n_copies_out,
           | CAST(sum(tok * n_copies) AS BIGINT) AS tokens_out
           |FROM n GROUP BY source ORDER BY source""".stripMargin
      },
      "qao_dsir_select" -> {
        val h = PortableHash.duckHashSql("tok", DsirSeed)
        s"""WITH toks AS (SELECT doc_id, lang, source,
           |  unnest(${TextFunctions.tokensSql("lower(text)")}) AS tok
           | FROM documents),
           |db AS (SELECT doc_id, lang, source, $h % $DsirBuckets AS bucket,
           |  CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2, 3, 4),
           |raw AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS rc FROM db GROUP BY 1),
           |tgt AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS tc
           |        FROM db WHERE lang = 'en' GROUP BY 1),
           |w AS (SELECT raw.bucket,
           |  ((coalesce(tc, 0) + 1) * 1000000) // (rc + $DsirBuckets) AS wt
           | FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket),
           |sc AS (SELECT doc_id, lang, source,
           |  CAST(sum(n * wt) AS BIGINT) AS sw, CAST(sum(n) AS BIGINT) AS nt
           | FROM db JOIN w USING (bucket) GROUP BY 1, 2, 3)
           |SELECT doc_id, lang, source, CAST(sw // nt AS BIGINT) AS dsir_score_micro
           |FROM sc ORDER BY dsir_score_micro DESC, doc_id LIMIT $DsirTopK""".stripMargin
      },
      // the bitmap re-renders as a DISTINCT bit set; "all 3 bits set"
      // becomes nb = 3 over the (shingle, h)-row join against it
      "q9k_bloom_decontaminate" -> {
        def bit(e: String) = graft.functions.PortableHash.duckHashSql(
          s"($e || ':bloom:' || CAST(h AS VARCHAR))") + " % 32768"
        s"""WITH sh AS (SELECT doc_id,
           |  ${graft.functions.DedupFunctions.distinctShinglesSql("text", 4)} AS sh
           | FROM documents),
           |hseq AS (SELECT unnest(generate_series(0, 2)) AS h),
           |bits AS (SELECT DISTINCT ${bit("shingle")} AS bit
           | FROM (SELECT unnest(sh) AS shingle FROM sh WHERE doc_id % 50 = 0), hseq),
           |tr AS (SELECT doc_id AS train_id, unnest(sh) AS shingle
           |       FROM sh WHERE doc_id % 50 <> 0),
           |hb AS (SELECT train_id, shingle, ${bit("shingle")} AS bit FROM tr, hseq),
           |m AS (SELECT train_id, shingle, count(*) AS nb
           |      FROM hb JOIN bits USING (bit) GROUP BY train_id, shingle)
           |SELECT train_id, count(*) AS n_hits FROM m WHERE nb = 3
           |GROUP BY train_id HAVING count(*) >= 3 ORDER BY train_id""".stripMargin
      },
      "q93_decontaminate" ->
        s"""WITH sh AS (SELECT doc_id,
           |  ${graft.functions.DedupFunctions.distinctShinglesSql("text", 4)} AS sh
           | FROM documents),
           |ev AS (SELECT doc_id AS eval_id, unnest(sh) AS shingle
           |       FROM sh WHERE doc_id % 50 = 0),
           |tr AS (SELECT doc_id AS train_id, unnest(sh) AS shingle
           |       FROM sh WHERE doc_id % 50 <> 0)
           |SELECT train_id, eval_id, count(*) AS shared
           |FROM tr JOIN ev USING (shingle)
           |GROUP BY train_id, eval_id
           |HAVING count(*) >= 3
           |ORDER BY train_id, eval_id""".stripMargin,
      "q92_pack_sequences" ->
        s"""WITH t AS (SELECT source, doc_id, CAST($tok AS BIGINT) AS tok
           |           FROM documents),
           |c AS (SELECT source, tok,
           |  sum(tok) OVER (PARTITION BY source ORDER BY doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS prior
           | FROM t)
           |SELECT source, CAST(floor(prior / $PackBudget.0) AS BIGINT) AS bin,
           | count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
           |FROM c GROUP BY source, bin
           |ORDER BY source, bin""".stripMargin,
      "qau_exact_split" -> {
        val h = PortableHash.duckHashSql("CAST(id AS VARCHAR)")
        s"""WITH RECURSIVE
           |${Permute.duckPermuteCte("pm", "SELECT doc_id FROM documents", "doc_id", SplitSeed)},
           |lab AS (
           | SELECT id, p,
           |  CASE WHEN p < (n * 8) // 10 THEN 'train'
           |       WHEN p < (n * 9) // 10 THEN 'val'
           |       ELSE 'test' END AS split
           | FROM pm, pm_n)
           |SELECT split, count(*) AS n_docs,
           | CAST(sum(p) AS BIGINT) AS sum_p,
           | CAST(sum(p * ($h % 997)) AS BIGINT) AS pair_sum
           |FROM lab GROUP BY split ORDER BY split""".stripMargin
      },
      // qbp's fit replayed, then the same thresholded confusion counts
      "qbq_distill_apply" -> {
        val tok = TextFunctions.tokenCountSql("text")
        val q = TextFunctions.qualityScoreSql("text")
        s"""WITH f AS (SELECT CAST($tok AS BIGINT) AS x1,
           |  CAST(n_chars AS BIGINT) AS x2,
           |  CAST(floor($q * 1000000 + 0.5) AS BIGINT) AS y FROM documents),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
           |  CAST(sum(x1*x1) AS HUGEINT) AS s11, CAST(sum(x1*x2) AS HUGEINT) AS s12,
           |  CAST(sum(x2*x2) AS HUGEINT) AS s22,
           |  CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x1*y) AS HUGEINT) AS s1y,
           |  CAST(sum(x2*y) AS HUGEINT) AS s2y FROM f),
           |dets AS (SELECT
           |  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
           |  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS d0,
           |  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS d1,
           |  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS d2
           |  FROM m),
           |w AS (SELECT
           |  floor(d0::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w0,
           |  floor(d1::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w1,
           |  floor(d2::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w2
           |  FROM dets),
           |p AS (SELECT y >= 500000 AS heur,
           |  CAST(floor(w0 + w1*x1 + w2*x2 + 0.5) AS BIGINT) >= 500000 AS lin
           |  FROM f, w)
           |SELECT count(*) FILTER (WHERE heur AND lin) AS tp,
           |  count(*) FILTER (WHERE NOT heur AND lin) AS fp,
           |  count(*) FILTER (WHERE heur AND NOT lin) AS fn,
           |  count(*) FILTER (WHERE NOT heur AND NOT lin) AS tn
           |FROM p""".stripMargin
      },

      // the same normal equations in HUGEINT (dets overflow BIGINT by
      // design), the same floor-based 6dp rounding of the Cramer
      // quotients, the same left-assoc prediction arithmetic
      "qbp_distill_linear" -> {
        val tok = TextFunctions.tokenCountSql("text")
        val q = TextFunctions.qualityScoreSql("text")
        s"""WITH f AS (SELECT CAST($tok AS BIGINT) AS x1,
           |  CAST(n_chars AS BIGINT) AS x2,
           |  CAST(floor($q * 1000000 + 0.5) AS BIGINT) AS y FROM documents),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |  CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
           |  CAST(sum(x1*x1) AS HUGEINT) AS s11, CAST(sum(x1*x2) AS HUGEINT) AS s12,
           |  CAST(sum(x2*x2) AS HUGEINT) AS s22,
           |  CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x1*y) AS HUGEINT) AS s1y,
           |  CAST(sum(x2*y) AS HUGEINT) AS s2y FROM f),
           |dets AS (SELECT n,
           |  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
           |  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS d0,
           |  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS d1,
           |  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS d2
           |  FROM m),
           |w AS (SELECT CAST(n AS BIGINT) AS n_docs,
           |  floor(d0::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w0,
           |  floor(d1::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w1,
           |  floor(d2::DOUBLE / det::DOUBLE * 1e6 + 0.5) / 1e6 AS w2
           |  FROM dets)
           |SELECT w0, w1, w2, n_docs,
           |  CAST(sum(r*r) AS BIGINT) AS sse_micro2
           |FROM (SELECT y - CAST(floor(w0 + w1*x1 + w2*x2 + 0.5) AS BIGINT) AS r
           |      FROM f, w), w
           |GROUP BY w0, w1, w2, n_docs""".stripMargin
      },

      // identical boundary arithmetic and substring semantics (char-
      // based, 1-indexed, 2-arg suffix to end) in the DuckDB dialect
      "qbm_fim_transform" ->
        """WITH d AS (SELECT doc_id, text,
          |  CAST(length(text) AS BIGINT) * 4 // 10 AS p1,
          |  CAST(length(text) AS BIGINT) * 7 // 10 AS p2 FROM documents),
          |f AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0
          |  THEN '<PRE>' || substr(text, 1, CAST(p1 AS INT))
          |    || '<SUF>' || substr(text, CAST(p2 + 1 AS INT))
          |    || '<MID>' || substr(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))
          |  ELSE '<SUF>' || substr(text, CAST(p2 + 1 AS INT))
          |    || '<PRE>' || substr(text, 1, CAST(p1 AS INT))
          |    || '<MID>' || substr(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))
          |  END AS fim FROM d)
          |SELECT doc_id, CAST(length(fim) AS BIGINT) AS n_chars_fim,
          |  md5(fim) AS fim_md5
          |FROM f ORDER BY doc_id""".stripMargin,

      "qbn_length_batching" -> {
        val tok = TextFunctions.tokenCountSql("text")
        s"""WITH t AS (SELECT CAST($tok AS BIGINT) AS tok FROM documents),
           |b AS (SELECT ((tok + 31) // 32) * 32 AS bucket,
           |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS sum_tok,
           |  (count(*) + 7) // 8 AS n_batches
           |  FROM t GROUP BY 1)
           |SELECT bucket, n_docs, sum_tok, n_batches,
           |  n_docs * bucket - sum_tok AS pad_tokens,
           |  (n_batches * 8 - n_docs) * bucket AS slot_waste
           |FROM b ORDER BY bucket""".stripMargin
      },

      "qbl_contiguous_index" ->
        """WITH r AS (SELECT doc_id, n_chars,
          |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
          |  FROM documents)
          |SELECT count(*) AS n_rows, max(idx) AS max_idx,
          |  CAST(sum(idx * doc_id) AS BIGINT) AS pair_sum,
          |  CAST(sum(idx * n_chars) AS BIGINT) AS payload_pair_sum
          |FROM r""".stripMargin,

      "qav_epoch_shards" -> {
        val h = PortableHash.duckHashSql("CAST(id AS VARCHAR)")
        s"""WITH RECURSIVE
           |${Permute.duckPermuteCte("e1", "SELECT doc_id FROM documents", "doc_id", EpochSeed + 1)},
           |${Permute.duckPermuteCte("e2", "SELECT doc_id FROM documents", "doc_id", EpochSeed + 2)},
           |st AS (
           | SELECT 1 AS epoch, id, p, n FROM e1, e1_n
           | UNION ALL
           | SELECT 2 AS epoch, id, p, n FROM e2, e2_n)
           |SELECT epoch, (p * $EpochWorkers) // n AS worker,
           | count(*) AS n_docs,
           | CAST(sum(p * ($h % 997)) AS BIGINT) AS pair_sum
           |FROM st GROUP BY epoch, worker ORDER BY epoch, worker""".stripMargin
      }
    )
  }
}
