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
