package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val s = spark; val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val analyze = graft.functions.FastText.minhashAnalyze(8, 3, 4, 2)
    val d = graft.core.Tables.load(s, dir, "documents")
      .select($"doc_id", analyze($"text").as("a"))
      .select($"doc_id", $"a.sh".as("sh"), $"a.buckets".as("buckets"))
      .persist()
    val exploded = d.select($"doc_id", explode($"buckets").as("bucket"))
    val okBuckets = exploded.groupBy($"bucket").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2 && $"n" <= 50).select($"bucket")
    val elig = exploded.join(okBuckets, Seq("bucket"))
    val cand = elig.select($"bucket", $"doc_id".as("a_id"))
      .join(elig.select($"bucket", $"doc_id".as("b_id")), Seq("bucket"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
    val pairs = cand
      .join(d.select($"doc_id".as("a_id"), $"sh".as("a_sh")), Seq("a_id"))
      .join(d.select($"doc_id".as("b_id"), $"sh".as("b_sh")), Seq("b_id"))
      .select($"a_id", $"b_id",
        graft.functions.FastText.jaccardUdf($"a_sh", $"b_sh").as("jaccard"))
      .filter($"jaccard" >= 0.4).select($"a_id", $"b_id").persist()
    t("pairs fill")(println("pairs=" + pairs.count()))
    val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .union(pairs.select($"b_id".as("src"), $"a_id".as("dst"))).persist()
    t("edges fill")(println("edges=" + edges.count()))
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("label", $"doc_id").persist()
    var converged = false; var rounds = 0
    while (!converged && rounds < 50) {
      val prop = labels.join(edges, $"doc_id" === $"src")
        .join(labels.select($"doc_id".as("dst"), $"label".as("nb_label")), Seq("dst"))
        .groupBy($"doc_id").agg(least(min($"label"), min($"nb_label")).as("label"))
      val next = prop
        .join(prop.select($"doc_id".as("label"), $"label".as("parent")), Seq("label"), "left")
        .select($"doc_id", coalesce($"parent", $"label").as("label")).persist()
      val changed = t(s"round $rounds")(
        next.join(labels.withColumnRenamed("label", "old"), Seq("doc_id"))
          .filter($"label" =!= $"old").count())
      println(s"  changed=$changed")
      labels.unpersist(); labels = next
      converged = changed == 0; rounds += 1
    }
    println(s"[probe] rounds=$rounds")
    spark.stop()
  }
}
