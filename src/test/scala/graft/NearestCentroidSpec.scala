package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimilarityFunctions
import graft.plans.{CosineSim, NearestCentroid}

/** IVF assignment as a per-row scalar expression: must agree with the
  * brute-force crossJoin+argmin formulation it replaced, and its plan
  * must contain no Exchange or Window in the assignment stage.
  */
class NearestCentroidSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("scalar assignment equals crossJoin+window argmin") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val assigned = SimilarityFunctions
      .ivfAssign(emb, "embedding", "vec_id", k = 16, seed = 21)
      .select($"vec_id", $"centroid_id")
    // reference formulation (the one the DuckDB oracle mirrors)
    val cents = emb
      .orderBy(graft.functions.PortableHash.detHash($"vec_id", 21), $"vec_id")
      .limit(16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val w = Window.partitionBy($"vec_id").orderBy($"dist".asc, $"cid".asc)
    val expected = emb.crossJoin(broadcast(cents))
      .withColumn("dist", -CosineSim.cosineSim($"embedding", $"cvec"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"vec_id", $"cid".as("centroid_id"))
    assert(assigned.except(expected).count() == 0)
    assert(expected.except(assigned).count() == 0)
  }

  test("assignment plan is a pure projection: no Exchange, no Window, no Join") {
    val assigned = SimilarityFunctions
      .ivfAssign(emb, "embedding", "vec_id", k = 16, seed = 21)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected Exchange in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
  }

  test("tie-break picks the smallest centroid id") {
    import spark.implicits._
    // two identical centroids → equal scores → smaller id must win
    val c = Seq((7L, Array(1f, 0f)), (3L, Array(1f, 0f)))
    val df = Seq(Tuple1(Array(1f, 0f)), Tuple1(Array(0.5f, 0.5f)))
      .toDF("v")
      .select(NearestCentroid.nearest($"v", c).as("cid"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L, 3L))
  }
}
