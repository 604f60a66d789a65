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
      catch { case e: Throwable => println(s"[probe] $label: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(110)}") }

    probe("malformed json config")(graft.pipeline.ConfigJson.parse("{not json"))
    probe("stage with both filter and mapper")(graft.pipeline.ConfigJson.parse(
      """{"urls":["x"],"extensions":["txt"],"preprocessors":[{"filter":"identity","mapper":"rescaler"}]}"""))
    // writer without path option → must name the missing option
    probe("write without path")({
      import spark.implicits._
      Seq(("k1", "v")).toDF("__key__", "txt").write.format("wds-tar").save()
    })
    // tar whose members have no extensions → inference must fail clearly
    val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.FileOutputStream("target/noext.tar"))
    val b = "data".getBytes
    val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("member-without-ext")
    e.setSize(b.length.toLong); out.putArchiveEntry(e); out.write(b); out.closeArchiveEntry(); out.close()
    probe("infer on extension-less tar")(
      spark.read.format("wds-tar").option("shards", "target/noext.tar").load())
    probe("infer with zero shards")(
      spark.read.format("wds-tar").option("shards", "target/missing-{00..01}.tar").load().count())
    spark.stop()
  }
}
