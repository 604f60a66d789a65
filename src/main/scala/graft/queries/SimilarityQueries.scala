package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.FastText
import graft.functions.SimilarityFunctions._
import graft.plans.CosineSim.cosineSim

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k, LSH-bucketed ANN, and blocked near-dup
  * pair mining.
  */
object SimilarityQueries extends QueryPack {

  private val Dim = 64
  private val Planes = 4
  private val ProbeId = 0L

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-10 against the vec_id=0 probe vector.
    // The probe row is a 1-row broadcast cross join — no shuffle of the
    // scored side; final top-k is a tree-reduced limit.
    "q40_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"embedding".as("probe_vec"))
      val scored = e.filter($"vec_id" =!= ProbeId)
        .crossJoin(broadcast(probe))
        .select($"vec_id", cosineSim($"embedding", $"probe_vec").as("score"))
      scored.orderBy($"score".desc, $"vec_id").limit(10)
    }),

    // LSH-bucketed ANN: probe only scans its own sign-pattern bucket.
    "q41_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(Planes, Dim)($"embedding"))
      val probe = e.filter($"vec_id" === ProbeId)
        .select($"bucket".as("probe_bucket"), $"embedding".as("probe_vec"))
      e.filter($"vec_id" =!= ProbeId)
        .join(broadcast(probe), $"bucket" === $"probe_bucket")
        .select($"vec_id", $"bucket",
          cosineSim($"embedding", $"probe_vec").as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // Embedding near-dup pairs, blocked by label (cosine >= 0.9).
    "q42_embedding_neardup" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir).select($"label", $"vec_id", $"embedding")
      val a = e.select($"label", $"vec_id".as("a_id"), $"embedding".as("a_vec"))
      val b = e.select($"label", $"vec_id".as("b_id"), $"embedding".as("b_vec"))
      a.join(b, Seq("label"))
        .filter($"a_id" < $"b_id")
        .select($"label", $"a_id", $"b_id", cosineSim($"a_vec", $"b_vec").as("cos"))
        .filter($"cos" >= 0.3)
        .orderBy($"label", $"a_id", $"b_id")
    }),

    // Bucket histogram — LSH partitioning statistics (skew diagnostic).
    "q43_lsh_buckets" -> ((s, dir) => {
      import s.implicits._
      emb(s, dir)
        .withColumn("bucket", FastText.lshBucketUdf(Planes, Dim)($"embedding"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q40_cosine_topk" ->
      s"""WITH probe AS (SELECT embedding AS probe_vec FROM embeddings WHERE vec_id = $ProbeId)
         |SELECT vec_id, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM embeddings, probe WHERE vec_id <> $ProbeId
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "q41_ann_lsh" -> {
      val bucket = lshBucketSql("embedding", Planes, Dim)
      s"""WITH e AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
         |probe AS (SELECT bucket AS probe_bucket, embedding AS probe_vec
         |          FROM e WHERE vec_id = $ProbeId)
         |SELECT vec_id, bucket, ${cosineSql("embedding", "probe_vec")} AS score
         |FROM e, probe WHERE vec_id <> $ProbeId AND bucket = probe_bucket
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    "q42_embedding_neardup" ->
      s"""SELECT label, a_id, b_id, cos FROM (
         | SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${cosineSql("a.embedding", "b.embedding")} AS cos
         | FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.3
         |ORDER BY label, a_id, b_id""".stripMargin,
    "q43_lsh_buckets" -> {
      val bucket = lshBucketSql("embedding", Planes, Dim)
      s"""SELECT $bucket AS bucket, count(*) AS n FROM embeddings
         |GROUP BY 1 ORDER BY bucket""".stripMargin
    }
  )
}
