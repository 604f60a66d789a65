package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * content-hash dedup, MinHash signatures + LSH banding for fuzzy dedup,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-partitioned aggregation on a 16-byte key —
  *    the minimal possible shuffle (only the digest + id move);
  *  - MinHash-LSH turns O(n²) near-dup search into explode(bands) →
  *    shuffle on bucket id → within-bucket pairing; bucket sizes are
  *    bounded by banding parameters, so no quadratic blowup;
  *  - signatures/hashes are all built from [[PortableHash.detHash]]
  *    (codegen'd md5 arithmetic): deterministic under retries and
  *    replicable by an external oracle.
  */
object DedupFunctions {

  /** Content digest for exact dedup. */
  def contentHash(c: Column): Column = md5(c.cast("binary"))

  /** Exact dedup: keep the row with the minimal `idCol` per digest.
    * One shuffle on the digest; survivor choice is total and
    * deterministic.
    */
  def exactDedup(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(contentHash(col(contentCol))).orderBy(col(idCol))
    df.withColumn("__dd_rank__", row_number().over(w))
      .filter(col("__dd_rank__") === 1)
      .drop("__dd_rank__")
  }

  /** Cross-corpus duplicate-block EXCISION — the substring-dedup shape
    * ("Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2021; CCNet's paragraph dedup): segment every document
    * into consecutive non-overlapping blocks of `blockTokens`
    * whitespace tokens, elect each distinct block's FIRST corpus
    * occurrence (minimal (id, block index)), and rewrite every
    * document as the concatenation of its surviving blocks — boilerplate
    * that recurs across pages vanishes everywhere but its first sighting,
    * instead of entire near-dup documents being dropped.
    *
    * Returns one row per input document: `idCol`, `n_blocks`, `n_kept`,
    * `n_tokens_clean`, `text_clean` (empty string when everything was
    * excised or the document had no tokens).
    *
    * Scale (100 TB): segmentation is per-row array arithmetic fused into
    * codegen (no shuffle); the first-occurrence election is ONE
    * aggregation keyed by block content + a join-back — never a
    * row_number window, so a Zipf-heavy boilerplate block (the empty
    * footer that appears a billion times) stays a combiner-friendly
    * min() and not a single-task sort; the rebuild is one groupBy(id)
    * whose per-group state is the document's own kept blocks. At
    * production scale the join key would be a 16-byte digest of the
    * block rather than the block text; the string key keeps the oracle
    * replayable here and changes nothing structural.
    *
    * PRECONDITION: `idCol` must be unique per document. The whole
    * contract assumes it (the rebuild's groupBy(id) merges same-id
    * rows into one garbled document regardless of implementation),
    * and the id-keyed join-back leans on it harder than the old
    * content-keyed join did: with duplicate ids a kept-index array
    * from one document can mark a same-id/same-index block of a
    * DIFFERENT document as kept. Callers with non-unique ids must
    * disambiguate first (e.g. add a uuid/monotonic component).
    */
  /** In-row segmentation into consecutive non-overlapping blocks of
    * `blockTokens` whitespace tokens — ceil(n/bt) blocks as one array
    * column, ANSI-safe on empty docs (sequence(0,-1) throws, so the
    * zero-block case short-circuits to an empty array). Shared by the
    * corpus-wide election ([[exciseDuplicateBlocks]]) and the stateless
    * static-set scrub ([[exciseAgainstBlockSet]]).
    */
  def blockArray(text: Column, blockTokens: Int): Column = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    val bt = blockTokens
    val t = TextFunctions.tokens(text)
    val nb = floor((size(t) + lit(bt - 1)) / lit(bt.toDouble)).cast("int")
    when(nb === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nb - 1),
        i => array_join(slice(t, i * bt + 1, lit(bt)), " ")))
  }

  def exciseDuplicateBlocks(docs: DataFrame, idCol: String,
      textCol: String, blockTokens: Int): DataFrame = {
    val blocks = docs
      .select(col(idCol), posexplode_outer(blockArray(col(textCol), blockTokens)))
      .withColumnRenamed("pos", "__idx").withColumnRenamed("col", "__block")
    val real = blocks.where(col("__block").isNotNull)
    // first-occurrence election: aggregation + join-back (skew-robust).
    // The join-back attaches the election to the heavy rows by DOC ID,
    // not by block content: electing per block then collapsing the
    // winners to one kept-index array per winning document means block
    // TEXT crosses the network once (inside the election's map-side-
    // combined min()) instead of twice — the exploded corpus never
    // shuffles on block content, and the (id, kept-indices) frame that
    // does join it is keys+ints, not payload (guide §2.3/§8: decide on
    // the proxy, move the heavy bytes once). Joining by id also feeds
    // the rebuild's groupBy(id) the partitioning it needs — one
    // exchange serves both.
    val keeper = real.groupBy(col("__block"))
      .agg(min(struct(col(idCol).as("kid"), col("__idx").as("kidx"))).as("__k"))
    val keptIdx = keeper
      .groupBy(col("__k.kid").as(idCol))
      .agg(collect_list(col("__k.kidx")).as("__kidxs"))
    val marked = real.join(keptIdx, Seq(idCol), "left")
      .withColumn("__keep",
        coalesce(array_contains(col("__kidxs"), col("__idx")), lit(false)))
    val rebuilt = marked.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
      // order-preserving rebuild: kept (idx, block) pairs sorted by idx
      array_join(transform(
        array_sort(collect_list(when(col("__keep"),
          struct(col("__idx"), col("__block"))))),
        p => p.getField("__block")), " ").as("text_clean"))
    // total over the input: token-less documents come back with 0 blocks
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .withColumn("n_tokens_clean",
        size(TextFunctions.tokens(col("text_clean"))).cast("long"))
  }

  /** The distinct blocks occurring at least `minCount` times in the
    * corpus — the static banned set a later (or continuously ingested)
    * corpus is scrubbed against with [[exciseAgainstBlockSet]]. One
    * map-side-combined aggregation on block content.
    */
  def electDuplicateBlocks(docs: DataFrame, textCol: String,
      blockTokens: Int, minCount: Long = 2L): DataFrame =
    docs.select(explode(blockArray(col(textCol), blockTokens)).as("block"))
      .groupBy(col("block")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(col("block"))

  /** Excision against a STATIC block set: every occurrence of a banned
    * block is removed from every document — the decontamination flavor
    * of substring dedup (a known-boilerplate / leaked-eval block list
    * applied to fresh data). Unlike [[exciseDuplicateBlocks]] this is a
    * pure per-row projection — segment, filter the array against the
    * set, rebuild — so it runs UNCHANGED on a streaming frame (no
    * state store, no watermark, no shuffle) and is the streaming twin's
    * whole implementation ([[graft.streaming.StreamOps]]).
    *
    * The set rides as ONE broadcast [[BlockDigestSet]] — a Bloom over
    * 128-bit block digests with an exact sorted-digest verify tier — so
    * the plan embeds no per-entry literals (a million-block banned list
    * is a ~100 MB broadcast, not a plan payload), clean blocks cost k
    * bit tests, and a Bloom false positive can never excise a clean
    * block. The probe is a scalar closure over the broadcast (the same
    * staged-set discipline as the q9k Bloom decontamination gate); the
    * rest of the scrub stays codegen array arithmetic.
    */
  def exciseAgainstBlockSet(docs: DataFrame, idCol: String,
      textCol: String, blockTokens: Int, banned: BlockDigestSet): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(banned)
    val keepUdf = udf((blocks: Seq[String]) =>
      if (blocks == null) null else blocks.filterNot(bc.value.contains))
    docs
      .select(col(idCol), blockArray(col(textCol), blockTokens).as("__b"))
      .withColumn("__kept", keepUdf(col("__b")))
      .select(col(idCol),
        size(col("__b")).cast("long").as("n_blocks"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("text_clean"))
      .withColumn("n_tokens_clean",
        size(TextFunctions.tokens(col("text_clean"))).cast("long"))
  }

  /** Convenience overload for in-memory banned lists (hand cases,
    * tests): routes through the same digest-set plumbing — never a plan
    * literal, whatever the size.
    */
  def exciseAgainstBlockSet(docs: DataFrame, idCol: String,
      textCol: String, blockTokens: Int, banned: Seq[String]): DataFrame =
    exciseAgainstBlockSet(docs, idCol, textCol, blockTokens,
      BlockDigestSet.fromStrings(banned))

  /** Connected components of an undirected pair graph, labeling every
    * node with the minimum id reachable from it (the canonical dedup
    * cluster id). Returns (doc_id, label).
    *
    * Hybrid execution — the shape real dedup systems use: the VERIFIED
    * pair graph is orders of magnitude smaller than the corpus (LSH +
    * verification already collapsed it), so below `driverEdgeLimit`
    * edges the exact union-find runs on the driver in one collect
    * (path-compressed, min-root union). Above the limit, a distributed
    * min-label propagation loop with pointer doubling (label <- label's
    * label each round) converges in O(log diameter) rounds, each round
    * one join + aggregate on the edge set — never on the corpus.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      driverEdgeLimit: Long = 5000000L): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edgeCount = pairs.count()
    if (edgeCount <= driverEdgeLimit) {
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.select(col(aCol).cast("long"), col(bCol).cast("long")).collect()
        .foreach { r =>
          val a = r.getLong(0); val b = r.getLong(1)
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            // min-root union: the surviving root is the component min
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
      val rows = parent.keys.toSeq.sorted.map(x => (x, find(x)))
      s.createDataFrame(rows).toDF("doc_id", "label")
    } else {
      // keep per-round shuffles proportional to the graph, not the
      // session default
      val parts = math.max(8, (edgeCount / 500000L).toInt)
      val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .repartition(parts, col("src"))
        .persist()
      var labels = edges.select($"src".as("doc_id")).distinct()
        .withColumn("label", $"doc_id").localCheckpoint(true)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 50) {
        val prop = labels.join(edges, $"doc_id" === $"src")
          .join(labels.select($"doc_id".as("dst"), $"label".as("nb_label")), Seq("dst"))
          .groupBy($"doc_id")
          .agg(least(min($"label"), min($"nb_label")).as("label"))
        // localCheckpoint (eager) truncates the lineage every round:
        // `prop` appears twice in the shortcut self-join, so without the
        // cut the logical plan DOUBLES per round — by round ~15 plan
        // compilation itself OOMs. Checkpointing also replaces the
        // persist/unpersist bookkeeping.
        val next = prop
          .join(prop.select($"doc_id".as("label"), $"label".as("parent")),
            Seq("label"), "left")
          .select($"doc_id", coalesce($"parent", $"label").as("label"))
          .localCheckpoint(true)
        val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("doc_id"))
          .filter($"label" =!= $"old").count()
        labels = next
        converged = changed == 0
        rounds += 1
      }
      require(converged, "component propagation did not converge in 50 rounds")
      edges.unpersist()
      labels
    }
  }

  /** MinHash signature from a *materialized* shingle-array column with
    * `k` independent hash functions: sig[j] = min over shingles of
    * detHash(shingle, j). Stage the shingle array through a projection
    * first (perf contract — see
    * [[TextFunctions.wordShinglesFromTokens]]).
    */
  def minhashFromShingles(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles,
        s => PortableHash.detHash(concat(s, lit(":mh"), j.cast("string"))))))

  /** One-shot MinHash over `n`-token shingles (inline tokenize+shingle;
    * for single-use expressions only).
    */
  def minhashSignature(c: Column, k: Int, n: Int): Column =
    minhashFromShingles(TextFunctions.wordShingles(c, n), k)

  /** LSH band buckets from a MinHash signature: `bands` buckets, each an
    * md5 of `rowsPerBand` consecutive signature entries (prefixed with
    * the band index so buckets never collide across bands).
    */
  def lshBandBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("_",
        concat(b.cast("string"), lit(":")),
        concat_ws(",", transform(
          slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          x => x.cast("string")))).cast("binary")))

  /** Distinct `n`-token shingle set of a text column. Precompute this
    * per document *before* any pair join — recomputing shingles per pair
    * turns a linear scan into a quadratic one.
    */
  def distinctShingles(c: Column, n: Int): Column =
    array_distinct(TextFunctions.wordShingles(c, n))

  /** Jaccard similarity of two precomputed distinct-shingle arrays. */
  def jaccardOnSets(sa: Column, sb: Column): Column =
    Portable.pround(
      size(array_intersect(sa, sb)).cast("double") /
        size(array_distinct(concat(sa, sb))).cast("double"), 6)

  /** Jaccard similarity of the distinct `n`-token shingle sets (for
    * one-off use; prefer [[distinctShingles]] + [[jaccardOnSets]] around
    * joins).
    */
  def shingleJaccard(a: Column, b: Column, n: Int): Column =
    jaccardOnSets(distinctShingles(a, n), distinctShingles(b, n))

  /** Per-token detHash array — stage this through a projection before
    * feeding [[simhashFromHashes]] (perf contract: each bit position
    * folds over the array; an inline hash expression would re-hash every
    * token `bits` times).
    */
  def tokenHashes(c: Column): Column =
    transform(TextFunctions.tokens(c), t => PortableHash.detHash(t))

  /** SimHash from a materialized token-hash array: bit j of the result
    * is set iff the sum over tokens of (bit j of hash ? +1 : -1) is
    * positive.
    */
  def simhashFromHashes(hashes: Column, bits: Int): Column =
    (0 until bits).map { j =>
      val bal = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      when(bal > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One-shot SimHash over whitespace tokens (single-use convenience). */
  def simhash(c: Column, bits: Int): Column =
    simhashFromHashes(tokenHashes(c), bits)

  // ---- DuckDB-dialect renderings (oracle side) -------------------------

  def minhashSignatureSql(e: String, k: Int, n: Int): String = {
    val shingles = TextFunctions.wordShinglesSql(e, n)
    s"list_transform(generate_series(0, ${k - 1}), " +
      s"j -> list_min(list_transform($shingles, " +
      s"s -> ${PortableHash.duckHashSql("(s || ':mh' || j::VARCHAR)")})))"
  }

  def lshBandBucketsSql(sigExpr: String, bands: Int, rowsPerBand: Int): String =
    s"list_transform(generate_series(0, ${bands - 1}), " +
      s"b -> md5(concat_ws('_', b::VARCHAR || ':', " +
      s"array_to_string(($sigExpr)[b*$rowsPerBand+1 : b*$rowsPerBand+$rowsPerBand], ','))))"

  def distinctShinglesSql(e: String, n: Int): String =
    s"list_distinct(${TextFunctions.wordShinglesSql(e, n)})"

  /** Jaccard on precomputed distinct-shingle list expressions. */
  def jaccardOnSetsSql(sa: String, sb: String): String =
    Portable.proundSql(
      s"length(list_intersect($sa, $sb))::DOUBLE / length(list_distinct($sa || $sb))::DOUBLE", 6)

  def shingleJaccardSql(ea: String, eb: String, n: Int): String =
    jaccardOnSetsSql(distinctShinglesSql(ea, n), distinctShinglesSql(eb, n))

  def simhashSql(e: String, bits: Int): String = {
    val hashes = s"list_transform(${TextFunctions.tokensSql(e)}, t -> ${PortableHash.duckHashSql("t")})"
    (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform($hashes, h -> ((h >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }
}
