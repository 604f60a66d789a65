package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{PortableHash, TextFunctions}
import graft.functions.Portable.pround
import graft.operators._
import graft.sources.ShardExpand

/** The reference's own operator surface (SURVEY.md §2), demonstrated
  * through the operator library on the driver's corpus: shard
  * brace-expansion and keying (S2/S3, P13-P15), key/size filters with
  * strict policies (P9/P10), url-exclusion mappers (P1/P2), value
  * rescaling (P3), deterministic square crop (P5), weighted prefix
  * mixture (X3), deterministic shuffle (X1/X2), and finite cycle (X7).
  */
object PipelineQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/S3 + P13: brace expansion and shard keying. Listing is
    // driver-side by design (shard lists are ~1 path per 100s of MB);
    // parallelize only to materialize the result as a DataFrame.
    "q60_shard_expand" -> ((s, dir) => {
      import s.implicits._
      val paths = ShardExpand.expandAll(Seq("shard-{000000..000199}.tar"))
      paths.map(p => (p, ShardExpand.shardKey(p), ShardExpand.sampleKey(p)))
        .toDF("path", "shard_key", "sample_key")
        .orderBy($"path")
    }),

    // P9: SimpleKeyFilter — keep rows where all listed keys are present;
    // nullability synthesized from the JSON props (k % 7 == 0 → null).
    "q61_key_filter" -> ((s, dir) => {
      import s.implicits._
      val withKey = Tables.load(s, dir, "events")
        .withColumn("__k__", get_json_object($"props", "$.k").cast("long"))
        .withColumn("k_val",
          when($"__k__" % 7 === 0, lit(null)).otherwise($"__k__"))
        .drop("__k__")
      SimpleKeyFilter(Seq("k_val"))(withKey)
        .select($"event_id", $"k_val")
        .orderBy($"event_id")
    }),

    // P10: SimpleSizeFilter (min mode) with a strict-policy map keyed by
    // __url__ substring: missing metadata drops by default (strict) but
    // passes for urls matching "src1".
    "q62_size_filter" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
        .withColumn("__url__", $"source")
        .withColumn("height", when($"doc_id" % 11 === 0, lit(null)).otherwise($"n_chars"))
        .withColumn("width", $"n_chars")
      val f = SimpleSizeFilter(height = 200, width = 200,
        mode = SizeFilterMode.Min, strict = true,
        strictPerUrl = Map("src1" -> false))
      f(d).select($"doc_id", $"source", $"n_chars").orderBy($"doc_id")
    }),

    // P1/P2: LambdaMapper with url-exclusion — uppercase the text except
    // for samples whose __url__ contains "src2".
    "q63_url_exclude_map" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).withColumn("__url__", $"source")
      val m = LambdaMapper(Seq("text"), upper, excludeKeys = Seq("src2"))
      m(d).select($"doc_id", substring($"text", 1, 24).as("head"))
        .orderBy($"doc_id")
    }),

    // P3: Rescaler float mode (x*2-1) on the embedding array; emit
    // checkable scalars (first element + mean), not raw arrays.
    "q64_rescaler" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("embedding", $"embedding".cast("array<double>"))
      Rescaler(key = "embedding", isFloat = true)(e)
        .select($"vec_id",
          pround(element_at($"embedding", 1), 6).as("e0"),
          pround(aggregate($"embedding", lit(0.0), (a, v) => a + v) / size($"embedding"), 6).as("mean"))
        .orderBy($"vec_id")
    }),

    // P5: deterministic square crop — original_size_as_tuple and
    // crop_coords_top_left derived from (key, seed), replayable under
    // retry (SURVEY.md §7.4).
    "q65_crop_square" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "events")
        .withColumn("height", ($"value" * 3).cast("long") + 100)
        .withColumn("width", ($"user_id" * 37) % 400 + 100)
      CropToSquare(idKey = "event_id", seed = 42)(d)
        .select($"event_id", $"height", $"width", $"crop_size",
          element_at($"crop_coords_top_left", 1).as("top"),
          element_at($"crop_coords_top_left", 2).as("left"))
        .orderBy($"event_id")
    }),

    // X3: weighted prefix mixture — deterministic stratified draw with
    // normalized probabilities (PrefixResampler semantics, minus the
    // lossy buffers).
    "q66_prefix_mixture" -> ((s, dir) => {
      import s.implicits._
      Sampling.prefixMixture(docs(s, dir), "lang", "doc_id",
        Map("en" -> 1.0, "es" -> 0.6, "de" -> 0.4), total = 200, seed = 7)
        .select($"lang", $"doc_id")
        .orderBy($"lang", $"doc_id")
    }),

    // X1/X2: deterministic hash shuffle — a total pseudo-random order,
    // with the position materialized via a rank over the hash (the
    // 25-row dim makes the single-partition window fine; at scale the
    // position would stay implicit in the sort order).
    "q67_det_shuffle" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(PortableHash.detHash($"n_name", 5))
      Sampling.detShuffle(Tables.load(s, dir, "nation"), Seq("n_name"), seed = 5)
        .withColumn("pos", row_number().over(w) - 1)
        .select($"pos", $"n_nationkey", $"n_name")
        .orderBy($"pos")
    }),

    // X7: finite cycle (repeat=3) with epoch tags.
    "q68_repeat_cycle" -> ((s, dir) => {
      import s.implicits._
      Sampling.repeatCycle(Tables.load(s, dir, "region"), 3)
        .select($"epoch", $"r_regionkey", $"r_name")
        .orderBy($"epoch", $"r_regionkey")
    }),

    // P6: einops-style rearrange — treat the 64-dim embedding as an 8×8
    // grid and transpose it ("h w -> w h") with a pure index-remap
    // expression (stays codegen'd, no UDF). Checked via a
    // permutation-sensitive weighted checksum.
    "q6a_einops_rearrange" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("embedding", $"embedding".cast("array<double>"))
      val t = EinopsRearrange("embedding", "h w -> w h", Map("h" -> 8, "w" -> 8))(e)
      t.select($"vec_id",
        pround(element_at($"embedding", 2), 6).as("e1"),
        pround(aggregate(
          zip_with($"embedding", sequence(lit(1), lit(64)).cast("array<double>"),
            (x, i) => x * i),
          lit(0.0), (a, v) => a + v), 4).as("wsum"))
        .orderBy($"vec_id")
    }),

    // Deterministic Bernoulli sample (hash-threshold, seeded).
    "q69_hash_sample" -> ((s, dir) => {
      import s.implicits._
      Sampling.hashSample(docs(s, dir), "doc_id", 0.25, seed = 13)
        .select($"doc_id")
        .orderBy($"doc_id")
    })
  )

  override def oracles: Map[String, String] = {
    val mixTargets = {
      // same normalization + rounding as Sampling.prefixMixture
      val probs = Map("en" -> 1.0, "es" -> 0.6, "de" -> 0.4)
      val z = probs.values.sum
      probs.view.mapValues(f => math.round(f / z * 200)).toMap
    }
    Map(
      "q60_shard_expand" ->
        """SELECT printf('shard-%06d.tar', g) AS path,
          | printf('shard-%06d', g) AS shard_key,
          | printf('shard-%06d', g) AS sample_key
          |FROM generate_series(0, 199) t(g) ORDER BY path""".stripMargin,
      "q61_key_filter" ->
        """SELECT event_id, (props->>'$.k')::BIGINT AS k_val FROM events
          |WHERE (props->>'$.k')::BIGINT % 7 <> 0
          |ORDER BY event_id""".stripMargin,
      "q62_size_filter" ->
        """SELECT doc_id, source, n_chars FROM (
          | SELECT doc_id, source, n_chars,
          |  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars END AS height,
          |  n_chars AS width
          | FROM documents)
          |WHERE coalesce(height >= 200 AND width >= 200,
          |  CASE WHEN contains(source, 'src1') THEN true ELSE false END)
          |ORDER BY doc_id""".stripMargin,
      "q63_url_exclude_map" ->
        """SELECT doc_id,
          | CASE WHEN contains(source, 'src2') THEN substr(text, 1, 24)
          |      ELSE substr(upper(text), 1, 24) END AS head
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q64_rescaler" ->
        s"""SELECT vec_id,
           | ${graft.functions.Portable.proundSql("emb[1] * 2.0 - 1.0", 6)} AS e0,
           | ${graft.functions.Portable.proundSql(
               "list_sum(list_transform(emb, x -> x * 2.0 - 1.0))::DOUBLE / length(emb)", 6)} AS mean
           |FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
           |ORDER BY vec_id""".stripMargin,
      "q65_crop_square" ->
        s"""SELECT event_id, height, width,
           | least(height, width) AS crop_size,
           | ${PortableHash.duckHashSql("event_id::VARCHAR", 42)} % (height - least(height, width) + 1) AS top,
           | ${PortableHash.duckHashSql("event_id::VARCHAR", 43)} % (width - least(height, width) + 1) AS "left"
           |FROM (SELECT event_id,
           |  floor(value * 3)::BIGINT + 100 AS height,
           |  (user_id * 37) % 400 + 100 AS width FROM events)
           |ORDER BY event_id""".stripMargin,
      "q66_prefix_mixture" -> {
        val targetCase = mixTargets.map { case (l, n) => s"WHEN '$l' THEN $n" }
          .mkString("CASE lang ", " ", " ELSE 0 END")
        s"""SELECT lang, doc_id FROM (
           | SELECT lang, doc_id, row_number() OVER (
           |  PARTITION BY lang
           |  ORDER BY ${PortableHash.duckHashSql("doc_id::VARCHAR", 7)}, doc_id) AS rk
           | FROM documents WHERE lang IN ('en', 'es', 'de'))
           |WHERE rk <= ($targetCase)
           |ORDER BY lang, doc_id""".stripMargin
      },
      "q67_det_shuffle" ->
        s"""SELECT row_number() OVER (
           |  ORDER BY ${PortableHash.duckHashSql("n_name", 5)}) - 1 AS pos,
           | n_nationkey, n_name
           |FROM nation ORDER BY pos""".stripMargin,
      "q68_repeat_cycle" ->
        """SELECT g AS epoch, r_regionkey, r_name
          |FROM region, generate_series(0, 2) t(g)
          |ORDER BY epoch, r_regionkey""".stripMargin,
      "q69_hash_sample" ->
        s"""SELECT doc_id FROM documents
           |WHERE ${PortableHash.duckUniformSql("doc_id::VARCHAR", 13)} < 0.25
           |ORDER BY doc_id""".stripMargin,
      "q6a_einops_rearrange" ->
        s"""SELECT vec_id,
           | ${graft.functions.Portable.proundSql("t[2]", 6)} AS e1,
           | ${graft.functions.Portable.proundSql(
               "list_sum(list_transform(generate_series(1, 64), i -> t[i] * i))::DOUBLE", 4)} AS wsum
           |FROM (SELECT vec_id,
           |  list_transform(generate_series(0, 63),
           |    i -> (embedding::DOUBLE[])[(i % 8) * 8 + (i // 8) + 1]) AS t
           | FROM embeddings)
           |ORDER BY vec_id""".stripMargin
    )
  }
}
