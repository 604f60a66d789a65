package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.{SnapshotLog, SnapshotSink}

/** Streaming INTO a snapshot table with the native sink face
  * (`df.writeStream.format("graft-snapshot")`): micro-batches land as
  * manifest commits, a replayed batch id commits once (exactly-once on
  * top of the at-least-once sink contract), the batch write path's
  * contracts (schema alignment, stats, constraints) bind unchanged,
  * and non-append modes refuse at start.
  */
class SnapshotStreamSinkSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def fresh(name: String): String = {
    val p = Paths.get("target", s"snapsink-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  test("writeStream lands micro-batches as commits; restart replays commit once") {
    val src = fresh("e2e-src")
    val dst = fresh("e2e-dst")
    val cp = fresh("e2e-cp")
    SnapshotLog.commit(
      s.range(0, 80).select($"id", ($"id" % 5).as("k")), src, "append",
      Seq("id"))
    def run(): Unit = {
      val q = s.readStream.format("graft-snapshot").option("table", src)
        .load()
        .writeStream.format("graft-snapshot")
        .option("table", dst).option("statsCols", "id")
        .option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first run CREATES the destination table from the batch schema
    assert(SnapshotLog.read(s, dst).count() == 80)
    SnapshotLog.commit(
      s.range(80, 130).select($"id", ($"id" % 5).as("k")), src, "append",
      Seq("id"))
    run() // restart: resumes from the checkpoint, no duplicate rows
    val out = SnapshotLog.read(s, dst)
    assert(out.count() == 130, "restart duplicated or dropped a batch")
    assert(out.agg(sum($"id")).head.getLong(0) == (0L until 130).sum)
    // the sink rode the batch write path: stats landed on statsCols
    val m = SnapshotLog.manifest(s, dst,
      SnapshotLog.latestVersion(s, dst).get)
    assert(m.files.forall(_.stats.contains("id")),
      s"sink commit lost stats: ${m.files.map(_.stats.keySet)}")
  }

  test("a replayed epoch commits once (at-least-once delivery, exactly-once table)") {
    val dst = fresh("replay")
    val sink = new SnapshotSink(dst, Seq("id"))
    def batch(lo: Long, hi: Long) =
      s.range(lo, hi).select($"id", lit("x").as("tag"))
    SnapshotLog.appendStreamBatch(batch(0, 10), dst, 0L, Seq("id"))
    SnapshotLog.appendStreamBatch(batch(10, 20), dst, 1L, Seq("id"))
    // the sink's addBatch with an ALREADY-COMMITTED epoch is a no-op
    sink.addBatch(1L, batch(10, 20))
    assert(SnapshotLog.latestVersion(s, dst).contains(2L),
      "a replayed epoch published a new version")
    assert(SnapshotLog.read(s, dst).count() == 20)
    // a genuinely new epoch commits
    sink.addBatch(2L, batch(20, 25))
    assert(SnapshotLog.latestVersion(s, dst).contains(3L))
    assert(SnapshotLog.read(s, dst).count() == 25)
  }

  test("non-append output modes and partitionBy refuse at start") {
    val src = fresh("refuse-src")
    val dst = fresh("refuse-dst")
    SnapshotLog.commit(s.range(0, 10).toDF("id"), src, "append", Seq("id"))
    // refusals hit createSink (Spark may defer it past start(), so
    // pin the contract at the provider hook directly)
    val provider = new graft.sources.snapshot.SnapshotTableProvider
    val params = Map("table" -> dst)
    val e1 = intercept[IllegalArgumentException] {
      provider.createSink(s.sqlContext, params, Nil,
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    assert(e1.getMessage.contains("append-only"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      provider.createSink(s.sqlContext, params, Seq("id"),
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(e2.getMessage.contains("CLUSTER BY"), e2.getMessage)
    assert(SnapshotLog.latestVersion(s, dst).isEmpty,
      "a refused sink left a committed table behind")
    // reading a never-committed table still refuses loudly — the
    // empty-schema tolerance exists ONLY for the sink face; the read
    // refusal now surfaces from the stream's first planning pass
    val q = s.readStream.format("graft-snapshot")
      .option("table", fresh("refuse-empty")).load()
      .writeStream.format("memory").queryName("sink_refuse_read").start()
    val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e3.getMessage.contains("no committed version"), e3.getMessage)
  }

  test("sink commits bind table contracts: schema alignment and constraints") {
    val dst = fresh("contract")
    SnapshotLog.commit(
      s.range(0, 5).select($"id", ($"id" + 100).as("v")), dst, "append",
      Seq("id"))
    SnapshotLog.addConstraint(s, dst, "v_pos", "v >= 0")
    val sink = new SnapshotSink(dst, Seq("id"))
    // a conforming batch missing the nullable column aligns (NULL fill)
    sink.addBatch(0L, s.range(5, 8).select($"id", lit(null)
      .cast("long").as("v")))
    assert(SnapshotLog.read(s, dst).count() == 8)
    // a constraint-violating batch refuses and publishes nothing
    val v0 = SnapshotLog.latestVersion(s, dst).get
    intercept[Exception] {
      sink.addBatch(1L, s.range(8, 9).select($"id", lit(-5L).as("v")))
    }
    assert(SnapshotLog.latestVersion(s, dst).contains(v0),
      "a refused batch published a version")
  }
}
