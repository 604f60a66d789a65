package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Pins [[TextFunctions.htmlExtract]] on a hand-computed matrix: each
  * rule firing alone (element drop, tag strip, entity decode, whitespace
  * collapse) and the ordering hazards (stray '<' inside script, `&amp;lt;`
  * never double-decoding).
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val cases: Seq[(String, String)] = Seq(
    // plain tags strip to spaces, then collapse
    "<p>hello <b>world</b></p>" -> "hello world",
    // script CONTENT drops whole — including the stray '<' that would
    // derail a naive tag-strip run first
    "<script>if (a < b) { x(); }</script>after" -> "after",
    // style content drops; case-insensitive element match
    "<STYLE>body{color:red}</STYLE>kept" -> "kept",
    // nav/footer/aside boilerplate drops with its text
    "<nav><a href='/'>Home</a></nav>body<footer>c 2024</footer>" -> "body",
    // attributes never leak into text
    "<a href=\"x?a=1&b=2\" title='t'>link</a>" -> "link",
    // entity decode, &amp; last
    "Tom &amp; Jerry &lt;3 &quot;hi&quot; it&#39;s" -> "Tom & Jerry <3 \"hi\" it's",
    // &amp;lt; is the LITERAL string "&lt;" — never double-decoded
    "a &amp;lt; b" -> "a &lt; b",
    // &nbsp; becomes ordinary space and collapses with neighbors
    "a&nbsp;&nbsp;b" -> "a b",
    // multiline element bodies drop ((?s) dot matches newline)
    "<script>\nvar x=1;\n</script>text\n\n  more" -> "text more",
    // unknown entities pass through verbatim
    "&copy; stays" -> "&copy; stays",
    // empty page
    "<html><head></head><body></body></html>" -> "")

  test("extraction matrix: element drop, tag strip, entity decode, collapse") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("h")
      .select(TextFunctions.htmlExtract($"h")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), out) =>
      assert(out == want, s"htmlExtract($in) = '$out', want '$want'")
    }
  }

  test("JVM twin (graft_html_extract SQL surface) is bit-identical") {
    import spark.implicits._
    cases.foreach { case (in, want) =>
      assert(TextFunctions.htmlExtractJvm(in) == want, in)
    }
    graft.sql.GraftSql.registerFunctions(spark)
    val viaSql = cases.map(_._1).toDF("h").createOrReplaceTempView("html_cases")
    val got = spark.sql("SELECT graft_html_extract(h) FROM html_cases")
      .collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
    assert(TextFunctions.htmlExtractJvm(null) == null)
  }
}
