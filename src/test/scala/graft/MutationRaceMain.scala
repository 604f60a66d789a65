package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.snapshot.SnapshotLog

/** Child-JVM body for SnapshotMutationRebaseSpec's cross-process race:
  * run a fixed schedule of DISJOINT mutations against a shared table
  * from a separate JVM, so the OCC rebase is exercised across REAL
  * process boundaries — the two writers share nothing but the table
  * directory, leaving the LogStore hard-link CAS plus the rebase's
  * conflict checks as the only coordination. Writer A owns id < 150,
  * writer B owns id >= 150; both alternate CoW upserts (which rewrite
  * the writer's own seed file lineage) with MOR ops (which touch
  * nothing), so concurrent rounds rebase over each other's commits.
  *
  * args: <table> <A|B> <rounds> <barrierDir>. Round r spin-waits for
  * `go-<r>`, performs the op, and appends the committed version to
  * `result-<id>` at exit. Any conflict or assertion escapes main and
  * fails the JVM loudly.
  */
object MutationRaceMain {
  def main(args: Array[String]): Unit = {
    val table = args(0)
    val id = args(1)
    val rounds = args(2).toInt
    val dir = args(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"mutation-race-$id")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = if (id == "A") 0L else 150L
    def batch(r: Int, tag: String) =
      spark.range(base + r * 10L, base + r * 10L + 5)
        .select($"id", ($"id" % 7).as("k"),
          concat(lit(s"$tag$r"), $"id").as("payload"))
    val out = new StringBuilder
    (0 until rounds).foreach { r =>
      val go = new java.io.File(dir, s"go-$r")
      while (!go.exists()) Thread.sleep(1)
      val v =
        if (r % 2 == 0) // CoW: rewrites this writer's own file lineage
          SnapshotLog.upsert(batch(r, id), table, "id", Seq("id")).version
        else if (id == "A") // MOR upsert: touches nothing, rebases anywhere
          SnapshotLog.upsertMOR(batch(r, id), table, "id", Seq("id"))
        else // MOR key delete on B's own range
          SnapshotLog.deleteKeysMOR(
            spark.range(base + 100 + r, base + 100 + r + 2).toDF("id"),
            table, "id").get
      out.append(s"$r $v\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"result-$id"),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
