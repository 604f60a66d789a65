package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-wide error policy (SURVEY.md §2.8).
  *
  * The reference threads a `handler` through every fallible stage; the
  * default `warn_and_continue` skips the offending sample and keeps
  * going (reference sdata/datapipeline.py:86-91, plumbed at
  * sdata/custom_datapipes.py:324-336, 400-408 and sdata/dataset.py:74,
  * 154). Spark's native behavior is fail-fast (a throwing expression
  * kills the task), which matches the reference's `reraise_exception`
  * mode.
  *
  * Skip/dead-letter semantics are reproduced relationally: a fallible
  * computation is wrapped to yield null-plus-error-message instead of
  * throwing, then the policy either filters the flagged rows out (Skip)
  * or routes them to a side sink (DeadLetter) — row-granular skip
  * without giving up Spark's retry model.
  */
object ErrorPolicy {

  sealed trait Policy
  /** Fail the job on the first error (Spark default; reference
    * `reraise_exception`). */
  case object Fail extends Policy
  /** Drop offending rows, keep a count via the flag column (reference
    * `warn_and_continue`). */
  case object Skip extends Policy
  /** Like Skip, but the offending rows (with the error message) are
    * written to `path` before being dropped. */
  final case class DeadLetter(path: String) extends Policy

  val ErrorCol = "__error__"

  /** Wrap a fallible scalar function into a UDF that never throws:
    * errors become a struct(result = null, error = message).
    *
    * If `spark.graft.maxExcTime` (seconds — the SDATA_MAX_EXC_TIME
    * dual, reference datapipeline.py:34-46) is set on the active
    * session when the UDF is BUILT, every per-row call is bounded by
    * [[withTimeout]]; a hung computation becomes a row-level error
    * under this same skip/dead-letter policy instead of a hung task.
    */
  def safeUdf[I: scala.reflect.runtime.universe.TypeTag,
      O: scala.reflect.runtime.universe.TypeTag](f: I => O): Column => Column = {
    val bounded = org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(Profiling.maxExcTimeMs) match {
      case Some(ms) => withTimeout(f, ms)
      case None => f
    }
    val u = udf { (in: I) =>
      try SafeResult[O](Option(bounded(in)), None)
      catch { case e: Exception => SafeResult[O](None, Some(s"${e.getClass.getName}: ${e.getMessage}")) }
    }
    c => u(c)
  }

  case class SafeResult[O](result: Option[O], error: Option[String])

  /** Per-call timeout wrapper (reference `timeout_wrapper`,
    * sdata/datapipeline.py:31-83, enabled by SDATA_MAX_EXC_TIME): runs
    * the function on a bounded thread and records a timeout as an
    * error. Costly (a Future per call) and off by default — the
    * cluster-idiomatic alternative is `spark.task.reaper` — but exact
    * row-granular parity when needed.
    */
  def withTimeout[I, O](f: I => O, timeoutMs: Long): I => O = { in =>
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try Await.result(Future(f(in)), timeoutMs.millis)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new RuntimeException(s"operation timed out after ${timeoutMs}ms")
    }
  }

  /** Apply the policy to a frame whose fallible stage has produced a
    * nullable `valueCol` and an error-message column [[ErrorCol]]
    * (null = ok). Returns the surviving rows without the error column.
    */
  def apply(df: DataFrame, policy: Policy): DataFrame = policy match {
    case Fail =>
      // fail-fast: surface the first recorded error eagerly
      val bad = df.filter(col(ErrorCol).isNotNull).select(col(ErrorCol)).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalStateException(s"stage error: ${bad.head.getString(0)}")
      df.drop(ErrorCol)
    case Skip =>
      df.filter(col(ErrorCol).isNull).drop(ErrorCol)
    case DeadLetter(path) =>
      df.filter(col(ErrorCol).isNotNull).write.mode("append").parquet(path)
      df.filter(col(ErrorCol).isNull).drop(ErrorCol)
  }
}
