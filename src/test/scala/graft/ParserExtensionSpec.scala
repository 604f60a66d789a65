package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSql

/** The injected dialect parser: plain `spark.sql(...)` must run the
  * whole GraftSql surface on registered snapshot views — DML (the
  * ordered multi-clause MERGE included), maintenance, DESCRIBE
  * HISTORY/DETAIL, and the time-travel read dialect — while every
  * statement OUTSIDE the dialect delegates verbatim to stock Spark.
  */
class ParserExtensionSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val snap = graft.sources.snapshot.SnapshotLog

  private def freshTable(prefix: String, rows: Int): String = {
    import spark.implicits._
    val t = java.nio.file.Paths.get("target", prefix).toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    snap.commit(spark.range(0, rows).select($"id", lit(0L).as("v")), t,
      "append", Seq("id"))
    t
  }

  test("spark.sql runs ordered multi-clause MERGE on a registered view") {
    import spark.implicits._
    val t = freshTable("parser-merge", 10)
    GraftSql.registerSnapshot(spark, "pext_v", t, None, Seq("id"))
    spark.range(0, 14).select($"id", ($"id" % 3).as("m"), $"id".as("v"))
      .createOrReplaceTempView("pext_src")
    // the qd0 shape: ordered WHEN chains, conditional DELETE, explicit
    // bodies — through PLAIN spark.sql, no GraftSql.dml call
    val out = spark.sql(
      """MERGE INTO pext_v USING pext_src ON pext_v.id = pext_src.id
        |WHEN MATCHED AND pext_src.m = 0 THEN DELETE
        |WHEN MATCHED AND pext_src.m = 1 THEN UPDATE SET v = 100
        |WHEN MATCHED THEN UPDATE SET v = 200
        |WHEN NOT MATCHED AND pext_src.m = 2 THEN INSERT (id, v)
        |  VALUES (pext_src.id, 0 - pext_src.id)
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // DML returns the committed version as one row (Delta's SQL shape)
    assert(out.length == 1 && out.head.getLong(0) == 2L, out.toSeq.toString)
    val got = spark.sql("SELECT id, v FROM pext_v ORDER BY id, v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = ((0L until 10L).flatMap { i =>
      if (i % 3 == 0) Nil
      else if (i % 3 == 1) Seq((i, 100L))
      else Seq((i, 200L))
    } ++ Seq((10L, 10L), (11L, -11L), (12L, 12L), (13L, 13L)))
      .sortBy(x => (x._1, x._2))
    assert(got == expected, s"got $got")
  }

  test("spark.sql runs UPDATE / DELETE / DESCRIBE / time travel on registered views") {
    import spark.implicits._
    val t = freshTable("parser-dml", 8)
    GraftSql.registerSnapshot(spark, "pdml_v", t, None, Seq("id"))
    spark.sql("UPDATE pdml_v SET v = 7 WHERE id >= 6")
    assert(spark.sql("SELECT sum(v) FROM pdml_v").head.getLong(0) == 14L)
    spark.sql("DELETE FROM pdml_v WHERE id = 0")
    assert(spark.sql("SELECT count(*) FROM pdml_v").head.getLong(0) == 7L)
    // maintenance + metadata statements route too
    spark.sql("OPTIMIZE pdml_v")
    val hist = spark.sql("DESCRIBE HISTORY pdml_v")
    assert(hist.count() >= 3L)
    val detail = spark.sql("DESCRIBE DETAIL pdml_v").collect().head
    assert(detail.getAs[String]("format") == "graft-snapshot")
    // the read dialect rewrites for the stock parser: VERSION AS OF
    // sees the pre-UPDATE state
    assert(spark.sql("SELECT sum(v) FROM pdml_v VERSION AS OF 1")
      .head.getLong(0) == 0L)
    // the feed range is (from, to]: (1, 2] = exactly the UPDATE commit
    assert(spark.sql(
      "SELECT count(*) FROM table_changes('pdml_v', 1, 2)")
      .head.getLong(0) > 0L)
  }

  test("statements outside the dialect delegate verbatim") {
    // a stock SELECT is untouched
    assert(spark.sql("SELECT 1 + 1 AS x").head.getInt(0) == 2)
    // DML naming an UNREGISTERED view is not ours — stock Spark owns
    // it and refuses it its own way (not a graft refusal)
    import spark.implicits._
    spark.range(0, 3).toDF("id").createOrReplaceTempView("pext_plain")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM pext_plain WHERE id = 1").collect()
    }
    assert(!e.getMessage.contains("registered snapshot view"),
      s"graft intercepted a non-registered target: ${e.getMessage}")
  }
}
