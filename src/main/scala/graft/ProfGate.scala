package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: run one (or a few) SparkEntry queries
  * with a listener that attributes every Spark job to its call site and
  * duration, so a multi-commit DML gate's seconds decompose into "which
  * action at which line". Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.ProfGate qc4_sql_dml [repeat]"
  *
  * Prints one line per job (seq, callsite, ms, tasks) and a callsite
  * rollup, plus wall vs in-job time (the gap is driver-side work:
  * manifest IO, parsing, planning, footer reads).
  */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("qc4_sql_dml").split(",").toSeq
    val repeat = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long, Int)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            // description = the action call site ("head at Foo.scala:12")
            jobs.put(s.executionId, (s.description, s.time, 0))
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            done.put(s.executionId, s.time)
          case _ => ()
        }
    })

    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // warmup
    try run("q01_pricing_summary") catch { case _: Throwable => }
    names.foreach { name =>
      (1 to repeat).foreach { iter =>
        jobs.clear(); done.clear()
        val t0 = System.nanoTime()
        run(name)
        val wallMs = (System.nanoTime() - t0) / 1000000
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.sortBy(_._1).map { case (id, (site, start, tasks)) =>
          val ms = done.asScala.get(id).map(_ - start).getOrElse(-1L)
          (id, site, ms, tasks)
        }
        println(s"== $name iter $iter wall=${wallMs}ms execs=${rows.size} " +
          s"inExec=${rows.map(_._3).filter(_ > 0).sum}ms")
        rows.foreach { case (id, site, ms, tasks) =>
          println(f"  exec#$id%-4d $ms%6d ms  $site")
        }
        val rollup = rows.groupBy(_._2).map { case (site, rs) =>
          (site, rs.map(_._3).filter(_ > 0).sum, rs.size)
        }.toSeq.sortBy(-_._2)
        println(s"-- rollup ($name iter $iter)")
        rollup.foreach { case (site, ms, n) =>
          println(f"  $ms%7d ms  n=$n%-3d $site")
        }
      }
    }
    spark.stop()
  }
}
