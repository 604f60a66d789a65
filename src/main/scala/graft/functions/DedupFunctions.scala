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
