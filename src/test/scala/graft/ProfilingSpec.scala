package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ErrorPolicy, Profiling}

/** E4 parity: per-stage timings appear when profiling is enabled and
  * are absent — with an untouched plan — when not; the maxExcTime knob
  * arms row-level timeouts inside safeUdf.
  */
class ProfilingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("instrument accumulates per-stage nanos and row counts") {
    import spark.implicits._
    Profiling.reset()
    val df = Profiling.instrument((1 to 100).toDF("n"), "stage-a")
      .filter($"n" % 2 === 0)
    val out = Profiling.instrument(df, "stage-b")
    assert(out.count() == 50)
    val t = Profiling.timings()
    assert(t.map(_.stage) == Seq("stage-a", "stage-b"))
    assert(t.head.rows == 100 && t(1).rows == 50)
    assert(t.forall(_.nanos > 0))
    assert(Profiling.report().contains("stage-a"))
  }

  test("profiling off leaves the pipeline plan untouched; on injects boundaries") {
    import spark.implicits._
    val probe = (d: org.apache.spark.sql.DataFrame) =>
      if (Profiling.enabled(spark)) Profiling.instrument(d, "x") else d
    val base = (1 to 10).toDF("n")
    assert(!Profiling.enabled(spark))
    val off = probe(base)
    assert(off.queryExecution.analyzed eq base.queryExecution.analyzed,
      "disabled profiling must not touch the frame")
    spark.conf.set(Profiling.ProfileConf, "true")
    try {
      Profiling.reset()
      val on = probe(base)
      assert(on.queryExecution.analyzed ne base.queryExecution.analyzed)
      assert(on.count() == 10)
      assert(Profiling.timings().nonEmpty)
    } finally spark.conf.unset(Profiling.ProfileConf)
  }

  test("maxExcTime arms safeUdf: slow rows become row-level errors") {
    import spark.implicits._
    spark.conf.set(Profiling.MaxExcTimeConf, "0.2")
    try {
      val slow = ErrorPolicy.safeUdf[Int, Int] { n =>
        if (n == 3) { Thread.sleep(2000); n } else n
      }
      val df = (1 to 4).toDF("n")
        .withColumn("r", slow($"n"))
        .select($"n", $"r.result".as("v"), $"r.error".as(ErrorPolicy.ErrorCol))
      val survivors = ErrorPolicy(df, ErrorPolicy.Skip).collect().map(_.getInt(0))
      assert(survivors.toSet == Set(1, 2, 4), "the slow row must be skipped")
    } finally spark.conf.unset(Profiling.MaxExcTimeConf)
  }

  test("without maxExcTime the same udf runs unbounded (no timeout error)") {
    import spark.implicits._
    val f = ErrorPolicy.safeUdf[Int, Int](n => n * 2)
    val df = (1 to 3).toDF("n")
      .withColumn("r", f($"n"))
      .select($"n", $"r.result".as("v"), $"r.error".as(ErrorPolicy.ErrorCol))
    assert(ErrorPolicy(df, ErrorPolicy.Fail).count() == 3)
  }
}
