package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke for the text-rewrite family (driver-side tooling, like
  * Bench): derives a replica-scaled corpus from sf0.1 documents — each
  * replica r suffixes every word with "-r", preserving the within-
  * replica duplicate-block structure and Zipf shape exactly while
  * keeping replicas mutually block-disjoint — then times the two new
  * heavy rewrite passes at 10× data:
  *
  *  - duplicate-block excision (qbh's operator): explode-to-blocks,
  *    aggregation+join-back election, groupBy rebuild. The replica
  *    transform makes the expected accounting EXACT: every per-doc
  *    (n_blocks, n_kept) of the base corpus recurs replica-for-replica,
  *    so totals must be exactly replicas × base — asserted before the
  *    artifact writes.
  *  - HTML extraction (qbi's chain) over the same scaled corpus: the
  *    embarrassingly-parallel regex pass, whose per-row cost must stay
  *    flat as rows scale.
  *
  * The point is the SHAPE: excision wall-time should grow sub-linearly
  * past the fixed costs (the block key space grows with the corpus, so
  * no bucket gets hotter), and extraction should scale ~linearly with
  * rows. Artifact: BENCH_text_smoke_<R>x.json.
  */
object TextScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_TEXT_REPLICAS", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): (String, Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      (name, (System.nanoTime() - t0) / 1e9, r)
    }

    val base = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nBase = base.count()
    // replica r: doc_id offset by r*10M, every word suffixed "-r" —
    // block content is disjoint across replicas, identical within one
    val scaled = (0 until replicas).map { r =>
      base.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1-$r").as("text"))
    }.reduce(_ unionByName _)
    val stagedPath = s"target/text-smoke-${replicas}x"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stagedPath))
    scaled.write.parquet(stagedPath) // materialize so reads, not the
    val corpus = spark.read.parquet(stagedPath) // transform, are timed

    // base-corpus excision accounting (once, small)
    val baseAcc = graft.functions.DedupFunctions
      .exciseDuplicateBlocks(base, "doc_id", "text", 8)
      .agg(sum(col("n_blocks")), sum(col("n_kept")),
        sum(col("n_tokens_clean"))).head
    val (exciseName, exciseSec, scaledAcc) = timed("excise_blocks") {
      graft.functions.DedupFunctions
        .exciseDuplicateBlocks(corpus, "doc_id", "text", 8)
        .agg(count(lit(1)).cast("long"), sum(col("n_blocks")),
          sum(col("n_kept")), sum(col("n_tokens_clean"))).head
    }
    require(scaledAcc.getLong(0) == replicas * nBase,
      s"excision lost documents: ${scaledAcc.getLong(0)} != ${replicas * nBase}")
    Seq((1, 0), (2, 1), (3, 2)).foreach { case (si, bi) =>
      require(scaledAcc.getLong(si) == replicas * baseAcc.getLong(bi),
        s"excision accounting not replica-exact at column $si: " +
          s"${scaledAcc.getLong(si)} != $replicas x ${baseAcc.getLong(bi)}")
    }

    val (extractName, extractSec, extracted) = timed("html_extract") {
      corpus.select(graft.functions.TextFunctions.htmlExtract(
          concat(lit("<html><body><nav>a b</nav><p>"), col("text"),
            lit("</p><footer>f</footer></body></html>"))).as("clean"))
        .agg(count(lit(1)).cast("long"), sum(length(col("clean"))).cast("long")).head
    }
    require(extracted.getLong(0) == replicas * nBase, "extraction lost rows")

    // the two scrub passes (qbv/qbx): per-row regex / array chains whose
    // wall-time must scale ~linearly with rows, like extraction
    val (piiName, piiSec, pii) = timed("pii_redact") {
      corpus.select(graft.functions.TextFunctions.redactPii(
          concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
            lit("@x.org at 10.1.2.3"))).as("red"))
        .agg(count(lit(1)).cast("long"), sum(length(col("red"))).cast("long")).head
    }
    require(pii.getLong(0) == replicas * nBase, "redaction lost rows")

    val (dlName, dlSec, dl) = timed("dedup_lines") {
      corpus.select(graft.functions.TextFunctions.dedupLines(
          regexp_replace(col("text"), "\\. ", ".\n")).as("clean"))
        .agg(count(lit(1)).cast("long"), sum(length(col("clean"))).cast("long")).head
    }
    require(dl.getLong(0) == replicas * nBase, "line dedup lost rows")

    val json =
      s"""{"metric":"text_smoke","replicas":$replicas,"n_docs":${replicas * nBase},""" +
        s""""$exciseName":$exciseSec,"$extractName":$extractSec,""" +
        s""""$piiName":$piiSec,"$dlName":$dlSec,""" +
        s""""excised_blocks":${scaledAcc.getLong(1) - scaledAcc.getLong(2)},""" +
        s""""clean_chars":${extracted.getLong(1)}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_text_smoke_${replicas}x.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
