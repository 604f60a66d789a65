package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE trainer/apply semantics against the hand-computed classic
  * corpus (Sennrich et al. 2016's example shape), plus the overlap
  * case the double-space `replace` encoding exists for.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def wordsDf(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toSeq.toDF("word", "cnt")
  }

  test("trainer reproduces the hand-computed merge sequence") {
    // low×5 lower×2 newest×6 widest×3:
    //   iter1 ties (e,s)/(s,t)/(t,</w>) at 9 → pair-asc picks (e,s)
    //   then (es,t) 9, (est,</w>) 9, (l,o) 7 over (o,w) by pair-asc,
    //   (lo,w) 7
    val (merges, fin) = Bpe.train(
      wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.count)) === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
    val reprs = fin.select(col("word"), col("repr")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reprs("low") === "low  </w>")
    assert(reprs("lower") === "low  e  r  </w>")
    assert(reprs("newest") === "n  e  w  est</w>")
    assert(reprs("widest") === "w  i  d  est</w>")
    fin.unpersist()
  }

  test("applyMerges equals the trainer's final representations") {
    val (merges, fin) = Bpe.train(
      wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    val mismatches = fin
      .withColumn("applied",
        array_join(Bpe.applyMerges(col("word"), merges), Bpe.Sep))
      .where(col("applied") =!= col("repr"))
      .count()
    assert(mismatches === 0L)
    fin.unpersist()
  }

  test("adjacent-repeat merge is left-to-right non-overlapping") {
    // 'aaa' → a a a </w>; best pair (a,a)×2; the standard scan merges
    // the FIRST occurrence and resumes after it: aa a </w>, not aa aa
    val (merges, fin) = Bpe.train(wordsDf("aaa" -> 1L), 1)
    assert(merges.map(m => (m.lhs, m.rhs, m.count)) === Seq(("a", "a", 2L)))
    assert(fin.select(col("repr")).head.getString(0) === "aa  a  </w>")
    fin.unpersist()
  }

  test("training stops when every word is a single symbol") {
    val (merges, fin) = Bpe.train(wordsDf("ab" -> 1L), 10)
    // a b </w> → (a,b) or (b,</w>)? pair-asc: "a  b" < "b  </w>" at
    // count tie 1 — then (ab,</w>), then nothing left
    assert(merges.map(m => (m.lhs, m.rhs)) === Seq(("a", "b"), ("ab", "</w>")))
    assert(fin.select(col("repr")).head.getString(0) === "ab</w>")
    fin.unpersist()
  }

  test("single-char words and empty merge lists are total") {
    import spark.implicits._
    val toks = Seq("x").toDF("word")
      .select(Bpe.applyMerges(col("word"), Nil).as("t"))
      .head.getSeq[String](0)
    assert(toks === Seq("x", "</w>"))
  }

  test("merges round-trip through parquet in rank order") {
    val (merges, fin) = Bpe.train(
      wordsDf("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    fin.unpersist()
    val p = "target/bpe-merges-rt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    Bpe.saveMerges(spark, merges, p)
    val loaded = Bpe.loadMerges(spark, p)
    assert(loaded === merges)
    // applied rules are interchangeable with the originals
    import spark.implicits._
    val toks = Seq("lowest").toDF("word")
      .select(Bpe.applyMerges(col("word"), loaded).as("t"))
      .head.getSeq[String](0)
    assert(toks === Seq("low", "est</w>"))
  }

  test("wordCounts is the deterministic top-k word table") {
    import spark.implicits._
    val docs = Seq("b b a a", "a B1 -x").toDF("text")
    val w = Bpe.wordCounts(docs, "text", 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // b1/-x fail the pattern; tie a=3? no: a×3, b×2 → limit keeps both
    assert(w === Seq(("a", 3L), ("b", 2L)))
  }
}
