package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** The twin contract: every FastText JVM kernel must produce results
  * bit-identical to the declarative Column version (which in turn is the
  * exact twin of the DuckDB oracle SQL). This spec runs both paths over
  * the sf0.001 documents/embeddings tables and diffs them.
  */
class FastTextSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet").limit(200)
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(200)

  private def assertSame(name: String, colExpr: org.apache.spark.sql.Column,
      udfExpr: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    val diff = docs.select($"doc_id", colExpr.as("a"), udfExpr.as("b"))
      .filter(!($"a" <=> $"b"))
    val rows = diff.collect()
    assert(rows.isEmpty, s"$name: ${rows.take(3).mkString(";")}")
  }

  test("tokens/shingles/fingerprint twins") {
    import spark.implicits._
    assertSame("tokenCount",
      TextFunctions.tokenCount($"text").cast("int"),
      FastText.textStatsUdf($"text").getField("n_tokens"))
    assertSame("punctCount",
      TextFunctions.punctCount($"text").cast("int"),
      FastText.textStatsUdf($"text").getField("n_punct"))
    assertSame("fingerprint",
      TextFunctions.fingerprint($"text"),
      FastText.textStatsUdf($"text").getField("fp"))
  }

  test("langId and qualityScore twins") {
    import spark.implicits._
    assertSame("langId", TextFunctions.langId($"text"), FastText.langIdUdf($"text"))
    assertSame("quality", TextFunctions.qualityScore($"text"),
      FastText.qualityScoreUdf($"text"))
  }

  test("minhash buckets + shingle sets twins") {
    import spark.implicits._
    val a = FastText.minhashAnalyze(8, 3, 4, 2)($"text")
    // column version staged to stay sane on 200 rows
    val colSide = docs
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", TextFunctions.wordShinglesFromTokens($"toks", 3).as("shAll"))
      .select($"doc_id",
        array_sort(array_distinct($"shAll")).as("sh"),
        DedupFunctions.lshBandBuckets(
          DedupFunctions.minhashFromShingles($"shAll", 8), 4, 2).as("buckets"))
    val udfSide = docs.select($"doc_id", a.as("a"))
      .select($"doc_id", array_sort($"a.sh").as("sh"), $"a.buckets".as("buckets"))
    val joined = colSide.alias("x").join(udfSide.alias("y"), "doc_id")
      .filter(!(col("x.sh") <=> col("y.sh")) || !(col("x.buckets") <=> col("y.buckets")))
    assert(joined.count() == 0)
  }

  test("simhash twin") {
    import spark.implicits._
    assertSame("simhash",
      DedupFunctions.simhash($"text", 16),
      FastText.simhashUdf(16)($"text"))
  }

  test("cosine + lsh bucket twins") {
    import spark.implicits._
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = emb.crossJoin(probe).select($"vec_id",
      SimilarityFunctions.cosine($"embedding", $"p").as("a"),
      FastText.cosineUdf($"embedding", $"p").as("b"),
      SimilarityFunctions.lshBucket($"embedding", 4, 64).as("ba"),
      FastText.lshBucketUdf(4, 64)($"embedding").as("bb"))
    assert(both.filter(!($"a" <=> $"b") || !($"ba" <=> $"bb")).count() == 0)
  }

  test("jaccard twin") {
    import spark.implicits._
    val d = docs.select($"doc_id", $"lang",
      FastText.shingleAnalyze(2)($"text").getField("sh").as("sh"))
    val pairs = d.select($"lang", $"doc_id".as("a_id"), $"sh".as("a_sh"))
      .join(d.select($"lang", $"doc_id".as("b_id"), $"sh".as("b_sh")), "lang")
      .filter($"a_id" < $"b_id").limit(500)
    val diff = pairs.select(
      DedupFunctions.jaccardOnSets($"a_sh", $"b_sh").as("a"),
      FastText.jaccardUdf($"a_sh", $"b_sh").as("b"))
      .filter(!($"a" <=> $"b"))
    assert(diff.count() == 0)
  }
}
