package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CurationQueries

/** Corpus-curation pack: Gopher-style rules, duplicated-span mining,
  * BM25 retrieval, per-source report card. The oracle gate hash-checks
  * values; these specs pin the semantic invariants and the plan shapes
  * that make the operators scale.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("gopher rules emit a non-trivial keep split consistent with its inputs") {
    val out = CurationQueries.queries("q96_gopher_rules")(spark, dir).collect()
    assert(out.nonEmpty)
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length, s"degenerate split: $kept/${out.length}")
    out.foreach { r =>
      val expect = r.getAs[Int]("n_words") >= 25 && r.getAs[Int]("n_words") <= 90 &&
        r.getAs[Double]("mean_word_len") >= 3.0 && r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Int]("stop_hits") >= 2
      assert(r.getAs[Boolean]("keep") == expect, s"keep flag disagrees with rule columns: $r")
    }
  }

  test("dup-span fractions are consistent and detect planted duplicates") {
    val out = CurationQueries.queries("q97_dup_spans")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_spans"))
    }
    // the corpus contains exact duplicate docs (q30 finds them), so some
    // documents must show fully-duplicated span sets
    assert(out.exists(_.getAs[Double]("dup_frac") === 1.0))
  }

  test("bm25 ranks a doc with more query terms above one with fewer") {
    val out = CurationQueries.queries("q98_bm25_topk")(spark, dir).collect()
    assert(out.length > 0 && out.length <= 20)
    val scores = out.map(_.getAs[Double]("bm25")).toSeq
    assert(scores == scores.sorted.reverse, "not sorted desc")
    assert(scores.forall(_ > 0.0))
  }

  test("source report card aggregates align with direct counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = CurationQueries.queries("q99_source_report")(spark, dir).collect()
    assert(out.map(_.getAs[String]("source")).distinct.length == out.length)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == docs.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_docs"))
      val dr = r.getAs[Double]("dup_rate")
      assert(dr >= 0.0 && dr < 1.0)
    }
  }

  test("chunking tiles every document: counts, coverage, and overlap") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split("\\s+").filter(_.nonEmpty))
      .toMap
    val out = graft.queries.TrainPrepQueries.queries("q9g_chunk_documents")(spark, dir).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every document chunks")
    byDoc.foreach { case (id, chunks) =>
      val toks = docs(id)
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_id") == i.toLong, "dense chunk ids")
        val text = c.getAs[String]("chunk_text").split("\\s+").filter(_.nonEmpty)
        assert(text.length == c.getAs[Long]("n_chunk_tokens"), "token count matches text")
        // chunk i reproduces tokens [i*24, i*24+32)
        assert(text.sameElements(toks.slice(i * 24, i * 24 + 32)), s"doc $id chunk $i content")
      }
      // coverage: the last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getAs[Long]("chunk_id") * 24 + last.getAs[Long]("n_chunk_tokens") == toks.length,
        s"doc $id tail covered")
    }
  }

  test("q97 span frequencies are aggregated (map-side combined), never a window") {
    val plan = CurationQueries.queries("q97_dup_spans")(spark, dir)
      .queryExecution.executedPlan.toString
    // span df must be an AGGREGATION joined back — partial combine
    // collapses hot boilerplate spans per task; a count window
    // partitioned by the span would pin each hot span on one reducer
    assert(!plan.contains("Window"), s"span df regressed to a window:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
  }

  test("q98 df and stats join sides are broadcast") {
    val plan = CurationQueries.queries("q98_bm25_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).length >= 2,
      s"df/stats should broadcast:\n$plan")
  }
}
