package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted physical plan (and
  * optionally runs) named queries. Usage:
  *   runMain graft.Explain <sfDir> <queryPrefix> [run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = if (args.length > 1) args(1) else ""
    val doRun = args.contains("run")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        val df = fn(spark, sfDir)
        df.explain("formatted")
        if (doRun) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"[run] ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
    spark.stop()
  }
}
