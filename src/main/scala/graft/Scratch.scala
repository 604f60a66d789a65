package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[time] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup like Bench
    SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("v"))
    time("scan count")(li.count())
    time("scan count again")(li.count())
    val bucket = when($"v" > 0, floor(log2($"v") * 4)).otherwise(lit(-1e9))
    time("bucketed groupBy collect")(
      li.withColumn("b", bucket).groupBy($"flag", $"b").agg(count(lit(1))).collect().length)
    val bucketed2 = li.withColumn("b", bucket).repartition($"flag", $"b").persist()
    time("repartition+persist+countpass")(
      bucketed2.groupBy($"flag", $"b").agg(count(lit(1))).collect().length)
    import org.apache.spark.sql.expressions.Window
    val wIn = Window.partitionBy($"flag", $"b").orderBy($"v")
    time("cached window pass")(
      bucketed2.withColumn("rn", row_number().over(wIn)).write.format("noop").mode("overwrite").save())
    time("full q16")(SparkEntry.queries("q16_percentiles")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full q16 again")(SparkEntry.queries("q16_percentiles")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
