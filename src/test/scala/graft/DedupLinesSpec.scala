package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Pins [[TextFunctions.dedupLines]] on hand-computed pages: first
  * occurrence survives, document order is preserved, blank lines drop,
  * and whitespace-only lines count as blank.
  */
class DedupLinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val cases: Seq[(String, String)] = Seq(
    // duplicates drop everywhere but their first sighting, order kept
    "b\na\nb\nc\na" -> "b\na\nc",
    // blank and whitespace-only lines vanish
    "x\n\n  \nx\ny" -> "x\ny",
    // a page that is ONLY a repeated footer collapses to one line
    "(c) footer\n(c) footer\n(c) footer" -> "(c) footer",
    // near-duplicates (differing whitespace inside the line) both stay
    "a b\na  b" -> "a b\na  b",
    // single line, no newline at all
    "solo" -> "solo",
    // empty page
    "" -> "")

  test("line dedup matrix: survivors, order, blanks") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("p")
      .select(TextFunctions.dedupLines($"p")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), out) =>
      assert(out == want, s"dedupLines(${in.replace("\n", "\\n")}) = " +
        s"'${out.replace("\n", "\\n")}', want '${want.replace("\n", "\\n")}'")
    }
  }

  test("JVM twin (graft_dedup_lines SQL surface) is bit-identical") {
    import spark.implicits._
    cases.foreach { case (in, want) =>
      assert(TextFunctions.dedupLinesJvm(in) == want, in)
    }
    graft.sql.GraftSql.registerFunctions(spark)
    val pages = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(concat($"text", lit("\nfooter\nfooter\n \n"), $"text").as("p"))
    pages.createOrReplaceTempView("dl_twin_docs")
    val viaCol = pages.select(TextFunctions.dedupLines($"p"))
      .collect().map(_.getString(0))
    val viaSql = spark.sql("SELECT graft_dedup_lines(p) FROM dl_twin_docs")
      .collect().map(_.getString(0))
    assert(viaCol.sorted.toSeq == viaSql.sorted.toSeq)
  }
}
