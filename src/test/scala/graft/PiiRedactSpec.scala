package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Pins [[TextFunctions.redactPii]] on a hand-computed matrix: each
  * family firing alone, several in one row, boundary behavior (\b on
  * IP/phone), and the ordering contract (an email is scrubbed before
  * its numeric domain could fake an IP).
  */
class PiiRedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val cases: Seq[(String, String)] = Seq(
    // one of each
    "mail a.b+c@ex-1.org now" -> "mail <EMAIL> now",
    "host 192.168.0.1 up" -> "host <IP> up",
    "call 555-867-5309 or 555.867.5309" -> "call <PHONE> or <PHONE>",
    // all three in one row, order preserved
    "x@y.com at 10.0.0.7 tel 123-456-7890" ->
      "<EMAIL> at <IP> tel <PHONE>",
    // email eats its numeric host BEFORE the ip pass (ordering contract)
    "u@1.2.3.4mail.net" -> "<EMAIL>",
    // a 5th octet: the first four still match (\b allows the trailing
    // dot — the standard regex-scrub behavior, pinned here)
    "1.2.3.4.5" -> "<IP>.5",
    // phone needs exactly 3-3-4 with uniform separators
    "55-867-5309 and 5555-867-5309" -> "55-867-5309 and 5555-867-5309",
    // no PII passes through untouched
    "plain text, no identifiers." -> "plain text, no identifiers.",
    // adjacent punctuation doesn't block the match
    "(ping 8.8.8.8)" -> "(ping <IP>)")

  test("redaction matrix: families, ordering, boundaries") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.redactPii($"t")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), out) =>
      assert(out == want, s"redactPii($in) = '$out', want '$want'")
    }
  }

  test("JVM twin (graft_pii_redact SQL surface) is bit-identical") {
    import spark.implicits._
    graft.sql.GraftSql.registerFunctions(spark)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(concat($"text", lit(" u"), $"doc_id".cast("string"),
        lit("@x.io 10.0.0.1 call 555-123-4567")).as("t"))
    docs.createOrReplaceTempView("pii_twin_docs")
    val viaCol = docs.select(TextFunctions.redactPii($"t"))
      .collect().map(_.getString(0))
    val viaSql = spark.sql("SELECT graft_pii_redact(t) FROM pii_twin_docs")
      .collect().map(_.getString(0))
    assert(viaCol.sorted.toSeq == viaSql.sorted.toSeq)
  }

  test("family counts match the matrix") {
    import spark.implicits._
    val r = Seq("x@y.com 1.2.3.4 9.9.9.9 555-123-4567 u@v.org").toDF("t")
      .select(TextFunctions.piiCount($"t", "email").as("e"),
        TextFunctions.piiCount($"t", "ip").as("i"),
        TextFunctions.piiCount($"t", "phone").as("p")).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1L)))
    intercept[IllegalArgumentException] {
      TextFunctions.piiCount($"t", "ssn")
    }
  }
}
