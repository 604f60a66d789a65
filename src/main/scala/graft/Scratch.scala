package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.FastText

/** Throwaway probe main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // degenerate inputs through every fast kernel
    val weird = Seq("", "   ", "x", "a b", "a\tb\nc", "one two three four").toDF("text")
    weird.select($"text",
      FastText.textStatsUdf($"text").as("st"),
      FastText.langIdUdf($"text").as("lang"),
      FastText.qualityScoreUdf($"text").as("q"),
      FastText.simhashUdf(16)($"text").as("sh"),
      FastText.minhashAnalyze(8, 3, 4, 2)($"text").as("mh"))
      .show(10, truncate = 60)
    spark.stop()
  }
}
