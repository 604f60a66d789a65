package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FastText
import graft.plans.CosineSim

/** The native expression must be bit-identical to the UDF kernel (and
  * hence the oracle), stay inside WholeStageCodegen, and register for
  * SQL via GraftExtensions.
  */
class CosineSimSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("native expression equals the JVM kernel on real embeddings") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = e.crossJoin(probe).select(
      CosineSim.cosineSim($"embedding", $"p").as("native"),
      FastText.cosineUdf($"embedding", $"p").as("udf"))
    assert(both.filter(!($"native" <=> $"udf")).count() == 0)
  }

  test("expression participates in codegen (no eval fallback errors) and plan shows it") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val df = e.crossJoin(broadcast(probe))
      .select($"vec_id", CosineSim.cosineSim($"embedding", $"p").as("s"))
      .filter($"s" > 0.2)
    // forces the generated path end-to-end
    assert(df.count() >= 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosinesim") || plan.contains("CosineSim"))
  }

  test("twins agree on malformed inputs: mismatched lengths and zero norms are null") {
    import spark.implicits._
    val rows = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f)),      // length mismatch
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),  // zero-norm left
      (Array(1f, 2f, 3f), Array(0f, 0f, 0f)),  // zero-norm right
      (Array(1f, 2f, 3f), Array(3f, 2f, 1f))   // well-formed control
    ).toDF("a", "b")
    val out = rows.select(
      CosineSim.cosineSim($"a", $"b").as("native"),
      FastText.cosineUdf($"a", $"b").as("udf")).collect()
    out.take(3).foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), s"expected null/null, got $r")
    }
    assert(!out(3).isNullAt(0) && out(3).getDouble(0) == out(3).getDouble(1))
  }

  test("SQL registration via GraftExtensions (installed on the session)") {
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb")
    try {
      val r = spark.sql(
        """SELECT cosine_sim(a.embedding, b.embedding) AS c
          |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
        .collect().head.getDouble(0)
      assert(r >= -1.0 && r <= 1.0)
    } finally spark.catalog.dropTempView("emb")
  }
}
