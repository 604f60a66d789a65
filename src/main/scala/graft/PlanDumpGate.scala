package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: run one SparkEntry query with a
  * QueryExecutionListener and print EVERY Dataset action's call site +
  * formatted physical plan — how a multi-action DML gate's internals
  * (pins, probes, rewrite writes) are captured for the plans/ artifact
  * dir, where `df.explain` would only show the gate's final SELECT.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanDumpGate <query>"
  *
  * Streaming micro-batch executions don't pass through the listener;
  * for those the offset/commit logs and ProfGate wall splits are the
  * evidence instead.
  */
object PlanDumpGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("qd0_sql_merge_multiclause")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val site = Option(spark.sparkContext.getLocalProperty(
          "callSite.short")).getOrElse(funcName)
        out.add(s"\n===== action: $funcName @ $site " +
          f"(${durationNs / 1e6}%.0f ms) =====\n" +
          qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(3000) // listener bus is async
    println(s"########## $name: ${out.size} Dataset actions ##########")
    out.forEach(println(_))
    spark.stop()
  }
}
