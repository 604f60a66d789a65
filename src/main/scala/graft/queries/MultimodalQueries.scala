package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Multimodal, PortableHash}

/** Multimodal (binary payload + typed metadata) plumbing demonstrated on
  * the corpus: documents' text bytes stand in for media payloads; the
  * decode step is the documented deterministic stub (see
  * [[graft.functions.Multimodal]]).
  */
object MultimodalQueries extends QueryPack {

  private val MaxSide = 64
  private val FrameStep = 7
  // declared aspect-ratio bucket shapes (square, landscape, portrait,
  // wide, tall) — the bucket table is training config, not data
  private val Buckets = Seq((64, 64), (80, 48), (48, 80), (96, 32), (32, 96))
  private val BatchSize = 32

  private def media(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    Multimodal.withMedia(d,
      payloadCol = col("text"),
      width = col("n_chars") % 64 + 16,
      height = (col("n_chars") / 7).cast("long") % 64 + 16,
      channels = lit(3),
      nFrames = col("n_chars") % 50 + 1)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Payload + metadata schema, stub decode, metadata resize.
    "q70_media_decode" -> ((s, dir) => {
      import s.implicits._
      media(s, dir)
        .withColumn("resized", Multimodal.resizeMeta($"media", MaxSide))
        .select($"doc_id",
          length($"payload").as("payload_bytes"),
          $"media.width".as("w"), $"media.height".as("h"),
          $"resized.width".as("rw"), $"resized.height".as("rh"),
          Multimodal.decodeStub($"payload").as("decode_sig"))
        .orderBy($"doc_id")
    }),

    // Aspect-ratio bucketing — the diffusion-training batching op: a
    // batch must share one (w, h) shape, so every image is assigned to
    // the declared bucket whose aspect ratio is nearest (|ar - bucket|
    // argmin, first-bucket tie-break), and batches then form WITHIN a
    // bucket. Emits the per-bucket census + full-batch count at
    // batch=32 — the numbers a bucketed sampler schedules from. Pure
    // per-row arithmetic on metadata (no payload bytes move) + one
    // small agg; the CASE-chain argmin keeps the tie-break identical
    // in both engines.
    "q72_aspect_buckets" -> ((s, dir) => {
      import s.implicits._
      val ar = $"media.width".cast("double") / $"media.height".cast("double")
      val dists = Buckets.map { case (bw, bh) => abs(ar - lit(bw.toDouble / bh)) }
      val minD = least(dists: _*)
      val bucketId = dists.zipWithIndex.tail.foldLeft(
        when(dists.head === minD, lit(0))) { case (acc, (d, i)) =>
        acc.when(d === minD, lit(i))
      }
      media(s, dir)
        .select($"doc_id", $"media.width".as("w"), $"media.height".as("h"),
          bucketId.as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_images"),
          graft.functions.Portable.pround(
            avg($"w".cast("double") / $"h".cast("double")), 5).as("mean_ar"),
          expr(s"count(1) DIV $BatchSize").as("n_full_batches"))
        .orderBy($"bucket")
    }),

    // Frame sampling: explode every 7th frame index, count + bounds per
    // document (generator over metadata — no payload bytes move).
    "q71_frame_sample" -> ((s, dir) => {
      import s.implicits._
      media(s, dir)
        .select($"doc_id",
          explode(Multimodal.sampleFrameIdx($"media", FrameStep)).as("frame_idx"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          min($"frame_idx").as("first_idx"),
          max($"frame_idx").as("last_idx"))
        .orderBy($"doc_id")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q70_media_decode" -> {
      val w = "(n_chars % 64 + 16)"
      val h = "(floor(n_chars / 7)::BIGINT % 64 + 16)"
      s"""SELECT doc_id, length(text) AS payload_bytes,
         | $w::INT AS w, $h::INT AS h,
         | (CASE WHEN greatest($w, $h) > $MaxSide
         |   THEN floor(($w * $MaxSide) / greatest($w, $h)::DOUBLE)
         |   ELSE $w END)::INT AS rw,
         | (CASE WHEN greatest($w, $h) > $MaxSide
         |   THEN floor(($h * $MaxSide) / greatest($w, $h)::DOUBLE)
         |   ELSE $h END)::INT AS rh,
         | ${PortableHash.duckHashSql("md5(text)")} AS decode_sig
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q71_frame_sample" ->
      s"""SELECT doc_id, count(*) AS n_sampled, min(f) AS first_idx, max(f) AS last_idx
         |FROM (SELECT doc_id, unnest(generate_series(0, n_chars % 50, $FrameStep)) AS f
         |      FROM documents)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q72_aspect_buckets" -> {
      val w = "(n_chars % 64 + 16)"
      val h = "(floor(n_chars / 7)::BIGINT % 64 + 16)"
      val ar = s"($w::DOUBLE / $h::DOUBLE)"
      val dists = Buckets.map { case (bw, bh) =>
        s"abs($ar - ($bw.0 / $bh.0))"
      }
      val minD = dists.mkString("least(", ", ", ")")
      val bucketCase = dists.zipWithIndex
        .map { case (d, i) => s"WHEN $d = $minD THEN $i" }
        .mkString("CASE ", " ", " END")
      s"""SELECT bucket, count(*) AS n_images,
         | ${graft.functions.Portable.proundSql("avg(w::DOUBLE / h::DOUBLE)", 5)} AS mean_ar,
         | count(*) // $BatchSize AS n_full_batches
         |FROM (SELECT doc_id, $w::INT AS w, $h::INT AS h,
         |        $bucketCase AS bucket
         |      FROM documents)
         |GROUP BY bucket ORDER BY bucket""".stripMargin
    }
  )
}
