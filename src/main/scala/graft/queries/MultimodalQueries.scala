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
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
