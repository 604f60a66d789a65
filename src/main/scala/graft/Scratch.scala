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
      println(f"[time] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    time("docs count")(docs.count())
    val d = docs
      .select($"doc_id", graft.functions.FastText.shingleAnalyze(3)($"text").as("a"))
      .select($"doc_id", $"a.sh".as("sh"))
      .persist()
    time("shingle analyze + persist")(d.count())
    val postings = d.select($"doc_id", explode($"sh").as("shingle"))
    time("postings explode count")(postings.count())
    val rare = postings.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= 10)
      .select($"shingle")
    time("rare shingles")(rare.count())
    val elig = postings.join(rare, Seq("shingle"))
    val cand = elig.select($"shingle", $"doc_id".as("a_id"))
      .join(elig.select($"shingle", $"doc_id".as("b_id")), Seq("shingle"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id")
      .distinct()
    time("candidate pairs")(cand.count())
    time("full q33")(SparkEntry.queries("q33_ngram_jaccard")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
