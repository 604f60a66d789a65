package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe(label: String)(f: => Any): Unit =
      try { f; println(s"[probe] $label: NO ERROR") }
      catch { case e: Throwable => println(s"[probe] $label: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }

    import graft.pipeline._
    probe("empty dir")(GraftPipeline.create(spark,
      PipelineConfig(urls = Seq("/tmp/definitely-missing-dir"), extensions = Seq("txt"))))
    probe("no extensions option")(
      spark.read.format("wds-tar").option("shards", "/tmp/x.tar").load())
    probe("bad brace pattern")(
      graft.sources.ShardExpand.expand("ds-{10..02}.tar"))
    probe("corrupt tar, fail policy")({
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bad.tar"),
        ("garbage" * 200).getBytes)
      spark.read.format("wds-tar").option("shards", "target/bad.tar")
        .option("extensions", "txt").load().count()
    })
    spark.stop()
  }
}
