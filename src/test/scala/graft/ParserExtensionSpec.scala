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

  test("parsing is side-effect free; the mutation runs at plan EXECUTION") {
    import spark.implicits._
    val t = freshTable("parser-lazy", 6)
    GraftSql.registerSnapshot(spark, "plazy_v", t, None, Seq("id"))
    val stmt = "UPDATE plazy_v SET v = 5 WHERE id >= 3"
    // parse twice through the session parser: no commit happens — the
    // statement parses to a lazy GraftDmlCommand, not an executed one
    val p1 = spark.sessionState.sqlParser.parsePlan(stmt)
    spark.sessionState.sqlParser.parsePlan(stmt)
    assert(p1.isInstanceOf[graft.plans.GraftDmlCommand], p1.getClass)
    assert(snap.latestVersion(spark, t).contains(1L),
      "parsePlan must not mutate")
    // spark.sql executes the command eagerly — exactly one commit
    val out = spark.sql(stmt).collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L, out.toSeq.toString)
    assert(snap.latestVersion(spark, t).contains(2L))
    assert(spark.sql("SELECT sum(v) FROM plazy_v").head.getLong(0) == 15L)
  }

  test("EXPLAIN renders an owned DML plan without mutating") {
    import spark.implicits._
    val t = freshTable("parser-explain", 6)
    GraftSql.registerSnapshot(spark, "pexp_v", t, None, Seq("id"))
    spark.range(0, 3).select($"id", ($"id" * 2).as("v"))
      .createOrReplaceTempView("pexp_src")
    val planText = spark.sql(
      """EXPLAIN MERGE INTO pexp_v USING pexp_src ON pexp_v.id = pexp_src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .head.getString(0)
    assert(planText.contains("GraftDmlCommand"), planText)
    assert(planText.contains("MERGE INTO pexp_v"), planText)
    // nothing committed, nothing changed
    assert(snap.latestVersion(spark, t).contains(1L), "EXPLAIN mutated!")
    assert(spark.sql("SELECT sum(v) FROM pexp_v").head.getLong(0) == 0L)
    // EXTENDED mode renders too
    val ext = spark.sql("EXPLAIN EXTENDED DELETE FROM pexp_v WHERE id = 0")
      .head.getString(0)
    assert(ext.contains("GraftDmlCommand") && ext.contains("Physical Plan"),
      ext)
    assert(snap.latestVersion(spark, t).contains(1L))
  }

  test("owned statements refuse bind parameters loudly") {
    import org.apache.spark.sql.catalyst.parser.{
      NamedParameterContext, PositionalParameterContext}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import spark.implicits._
    val t = freshTable("parser-params", 4)
    GraftSql.registerSnapshot(spark, "ppar_v", t, None, Seq("id"))
    val stmt = "UPDATE ppar_v SET v = 9 WHERE id = 1"
    val e = intercept[IllegalArgumentException] {
      spark.sessionState.sqlParser.parsePlanWithParameters(stmt,
        NamedParameterContext(Map("x" -> Literal(1))))
    }
    assert(e.getMessage.contains("no bind parameters"), e.getMessage)
    intercept[IllegalArgumentException] {
      spark.sessionState.sqlParser.parsePlanWithParameters(stmt,
        PositionalParameterContext(Seq(Literal(1))))
    }
    // empty parameter contexts parse fine (the spark.sql(sql) path)
    val p = spark.sessionState.sqlParser.parsePlanWithParameters(stmt,
      NamedParameterContext(Map.empty))
    assert(p.isInstanceOf[graft.plans.GraftDmlCommand])
    assert(snap.latestVersion(spark, t).contains(1L))
    // parameterized statements OUTSIDE the dialect still bind normally
    assert(spark.sql("SELECT :a + 1 AS x", Map("a" -> 41))
      .head.getInt(0) == 42)
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
