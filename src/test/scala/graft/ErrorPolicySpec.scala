package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ErrorPolicy

/** Row-granular skip / dead-letter semantics (reference
  * warn_and_continue, SURVEY.md §2.8).
  */
class ErrorPolicySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def frame = {
    import spark.implicits._
    val parse = ErrorPolicy.safeUdf[String, Int] { s =>
      if (s.forall(_.isDigit) && s.nonEmpty) s.toInt
      else throw new IllegalArgumentException(s"not a number: $s")
    }
    Seq("1", "2", "oops", "4").toDF("raw")
      .withColumn("safe", parse($"raw"))
      .withColumn("value", $"safe.result")
      .withColumn(ErrorPolicy.ErrorCol, $"safe.error")
      .drop("safe")
  }

  test("Skip drops only the offending rows") {
    import spark.implicits._
    val out = ErrorPolicy(frame, ErrorPolicy.Skip)
    assert(out.select("value").as[Int].collect().sorted.toSeq == Seq(1, 2, 4))
    assert(!out.columns.contains(ErrorPolicy.ErrorCol))
  }

  test("Fail raises with the first error message") {
    val e = intercept[IllegalStateException](ErrorPolicy(frame, ErrorPolicy.Fail))
    assert(e.getMessage.contains("not a number: oops"))
  }

  test("DeadLetter routes offenders to a side sink") {
    val path = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dead").toString + "/dl"
    val out = ErrorPolicy(frame, ErrorPolicy.DeadLetter(path))
    assert(out.count() == 3)
    val dead = spark.read.parquet(path)
    assert(dead.count() == 1)
    assert(dead.select("raw").collect().head.getString(0) == "oops")
  }
}
