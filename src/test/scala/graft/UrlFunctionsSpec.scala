package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, UrlFunctions}

/** Pins the canonical form on a hand-computed matrix (each rule firing
  * alone and in combination), proves the Column chain ≡ the JVM twin
  * (the SQL-surface `graft_url_canonical` must agree with the engine
  * kernel), and pins the NFC kernel's composition behavior.
  */
class UrlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val cases: Seq[(String, String)] = Seq(
    // rule 1+4+5 combined: case, default port, trailing slash
    "HTTPS://WWW.Site3.COM:443/p/2/" -> "https://www.site3.com/p/2",
    // rule 3: utm-only query disappears entirely (incl. the '?')
    "https://www.site3.com/p/2?utm_source=x&utm_campaign=y" -> "https://www.site3.com/p/2",
    // rule 2: fragment
    "https://www.site3.com/p/2#sec2" -> "https://www.site3.com/p/2",
    // rule 3 mixed: non-utm parameter survives, separators repaired
    "https://www.site3.com:443/p/2?id=3&utm_medium=z" -> "https://www.site3.com/p/2?id=3",
    "https://h.com/a?utm_a=1&id=9&utm_b=2" -> "https://h.com/a?id=9",
    // path/query case is PRESERVED (only scheme+host fold)
    "https://H.com/CaseD?Q=V" -> "https://h.com/CaseD?Q=V",
    // :80 with a path boundary; bare host root slash
    "http://h.com:80/x" -> "http://h.com/x",
    "http://h.com/" -> "http://h.com",
    // port at end of string, no path
    "http://h.com:80" -> "http://h.com",
    // non-default port is KEPT
    "http://h.com:8080/x" -> "http://h.com:8080/x",
    // no scheme: authority rule doesn't fire, later rules still apply
    "notaurl/path/#f" -> "notaurl/path")

  test("canonical form matches the hand-computed matrix (JVM twin)") {
    cases.foreach { case (in, want) =>
      assert(UrlFunctions.canonicalizeUrlJvm(in) == want, s"input: $in")
    }
    assert(UrlFunctions.canonicalizeUrlJvm(null) == null)
  }

  test("Column chain equals the JVM twin on the matrix") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("url")
      .select(UrlFunctions.canonicalizeUrl($"url").as("canon"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map { case (in, _) => UrlFunctions.canonicalizeUrlJvm(in) })
    assert(got == cases.map(_._2))
  }

  test("nfc kernel composes decomposed sequences and is idempotent") {
    val dec = "cafe\u0301"
    val pre = "caf\u00e9"
    assert(TextFunctions.nfcJvm(dec) == pre)
    assert(TextFunctions.nfcJvm(pre) == pre)
    assert(TextFunctions.nfcJvm(null) == null)
    import spark.implicits._
    val out = Seq(dec, pre).toDF("t")
      .select(TextFunctions.nfcNormalize($"t").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(pre, pre))
  }
}
