package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Opt-in per-stage profiling — the engine's dual of the reference's
  * `SDATA_PROFILE` env hook (reference sdata/datapipeline.py:94-120
  * `time_measure`: wraps each stage callable and injects a
  * "<stage>-time" key into samples when profiling is on).
  *
  * A declarative Spark plan fuses stages inside whole-stage codegen, so
  * per-sample wall clock per stage does not exist once compiled; the
  * honest dual is an iterator-boundary instrument: when enabled, each
  * pipeline stage output gets a pass-through `mapPartitions` that
  * accumulates (a) nanoseconds spent PRODUCING rows up to that boundary
  * and (b) row counts, into named Spark accumulators (task-retry
  * double-counts are possible — this is a diagnostic, not a metric of
  * record). When disabled (default), nothing is injected: the plan is
  * byte-identical to the unprofiled one, zero cost.
  *
  * The companion knob is the `SDATA_MAX_EXC_TIME` dual
  * (datapipeline.py:34-81 `timeout_wrapper`): setting
  * `spark.graft.maxExcTime` (seconds) arms [[ErrorPolicy.withTimeout]]
  * inside every [[ErrorPolicy.safeUdf]] so a hung per-row computation
  * becomes a row-level error instead of a hung task.
  */
object Profiling {

  /** Session conf / env duals of SDATA_PROFILE and SDATA_MAX_EXC_TIME. */
  val ProfileConf = "spark.graft.profile"
  val ProfileEnv = "GRAFT_PROFILE"
  val MaxExcTimeConf = "spark.graft.maxExcTime"
  val MaxExcTimeEnv = "GRAFT_MAX_EXC_TIME"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(ProfileConf).exists(_.toBoolean) ||
      sys.env.get(ProfileEnv).exists(_.nonEmpty)

  /** Armed timeout in milliseconds, if any (conf wins over env). */
  def maxExcTimeMs(spark: SparkSession): Option[Long] =
    spark.conf.getOption(MaxExcTimeConf)
      .orElse(sys.env.get(MaxExcTimeEnv).filter(_.nonEmpty))
      .map(s => (s.toDouble * 1000).toLong)

  final case class StageTiming(stage: String, nanos: Long, rows: Long)

  // Stage accumulators in registration order, per JVM (local mode and
  // driver-side of a cluster — accumulator VALUES flow back from
  // executors regardless).
  private val stages =
    new java.util.concurrent.CopyOnWriteArrayList[(String, LongAccumulator, LongAccumulator)]()

  def reset(): Unit = stages.clear()

  /** Pass-through instrument: times `it.hasNext`/`it.next()` — the cost
    * of producing each row from everything upstream of this boundary.
    */
  def instrument(df: DataFrame, stage: String): DataFrame = {
    val spark = df.sparkSession
    val nanos = spark.sparkContext.longAccumulator(s"graft.profile.$stage.nanos")
    val rows = spark.sparkContext.longAccumulator(s"graft.profile.$stage.rows")
    stages.add((stage, nanos, rows))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
    df.mapPartitions { it =>
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val t0 = System.nanoTime()
          val h = it.hasNext
          nanos.add(System.nanoTime() - t0)
          h
        }
        override def next(): Row = {
          val t0 = System.nanoTime()
          val r = it.next()
          nanos.add(System.nanoTime() - t0)
          rows.add(1)
          r
        }
      }
    }(enc)
  }

  /** Accumulated timings (populated after an action has run). */
  def timings(): Seq[StageTiming] = {
    import scala.jdk.CollectionConverters._
    stages.asScala.map { case (s, n, r) => StageTiming(s, n.value, r.value) }.toSeq
  }

  /** Human-readable report, one line per stage boundary. */
  def report(): String =
    timings().map(t =>
      f"${t.stage}%-32s ${t.nanos / 1e6}%10.1f ms  ${t.rows}%10d rows").mkString("\n")
}
