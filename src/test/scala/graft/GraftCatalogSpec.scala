package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql
import graft.sources.snapshot.SnapshotLog

/** The DSv2 TableCatalog face of the snapshot format: `graft.ns.t`
  * names work through STOCK Spark surfaces — CREATE/CTAS/INSERT/
  * SELECT/SHOW/DROP/time travel — with no registerSnapshot step, and
  * the graft DML dialect accepts catalog-qualified targets. The
  * filesystem is the catalog state, so a second session pointing at
  * the same root sees the same tables.
  */
class GraftCatalogSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val cat = "gcat"

  private lazy val root: String = {
    val p = java.nio.file.Paths.get("target", "catalog-spec").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    java.nio.file.Files.createDirectories(p)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.plans.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", p.toString)
    p.toString
  }

  test("CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT / SHOW TABLES, no registration") {
    root
    spark.sql(s"CREATE NAMESPACE $cat.ns1")
    spark.sql(s"CREATE TABLE $cat.ns1.t1 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats.cols' = 'id')")
    // the empty table is immediately selectable
    assert(spark.sql(s"SELECT * FROM $cat.ns1.t1").count() == 0L)
    // INSERT INTO rides the V1Write fallback into SnapshotLog.commit
    spark.sql(s"INSERT INTO $cat.ns1.t1 SELECT id, id * 10 AS v FROM range(0, 8)")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns1.t1").head.getLong(0) == 280L)
    // stats.cols persisted: the commit carried per-file id stats
    val t1 = s"$root/ns1/t1"
    val m = SnapshotLog.manifest(spark, t1, 2L)
    assert(m.files.forall(_.stats.contains("id")), m.files.map(_.stats))
    // SHOW TABLES / SHOW NAMESPACES answer from the filesystem
    val shown = spark.sql(s"SHOW TABLES IN $cat.ns1").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(shown == Set("t1"), shown)
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("ns1"))
    // INSERT OVERWRITE replaces in one commit
    spark.sql(s"INSERT OVERWRITE $cat.ns1.t1 SELECT id, id AS v FROM range(0, 3)")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $cat.ns1.t1").head
      .toSeq == Seq(3L, 3L))
  }

  test("CTAS, DROP TABLE, and ALTER TABLE RENAME through stock SQL") {
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns2")
    spark.sql(s"CREATE TABLE $cat.ns2.c AS " +
      "SELECT id, CAST(id % 3 AS BIGINT) AS grp FROM range(0, 30)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns2.c").head.getLong(0) == 30L)
    // rename is one directory move (manifest paths are table-relative);
    // the stock RENAME TO target is catalog-less (same catalog)
    spark.sql(s"ALTER TABLE $cat.ns2.c RENAME TO ns2.d")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns2.d").head.getLong(0) == 30L)
    assert(!spark.catalog.tableExists(s"$cat.ns2.c"))
    spark.sql(s"DROP TABLE $cat.ns2.d")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns2").count() == 0L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.ns2.d").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
  }

  test("graft DML dialect on catalog-qualified names: UPDATE/DELETE/MERGE/OPTIMIZE") {
    import spark.implicits._
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns3")
    spark.sql(s"CREATE TABLE $cat.ns3.m (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns3.m SELECT id, 0 AS v FROM range(0, 10)")
    // plain spark.sql — the parser intercept resolves the catalog name
    spark.sql(s"UPDATE $cat.ns3.m SET v = 7 WHERE id >= 8")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns3.m").head.getLong(0) == 14L)
    spark.sql(s"DELETE FROM $cat.ns3.m WHERE id = 0")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns3.m").head.getLong(0) == 9L)
    spark.range(5, 12).select($"id", lit(100L).as("v"))
      .createOrReplaceTempView("gcat_src")
    val out = spark.sql(
      s"""MERGE INTO $cat.ns3.m AS t USING gcat_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(out.length == 1, out.toSeq.toString)
    val got = spark.sql(s"SELECT count(*), sum(v) FROM $cat.ns3.m").head
    // ids 1..11: 1..4 keep v (ids 8,9 -> 7 each = 14 for 8,9... ids
    // 8,9 were 7 but MERGE set 100), so v: 1..4=0, 5..11=100
    assert(got.toSeq == Seq(11L, 700L), got.toSeq)
    spark.sql(s"OPTIMIZE $cat.ns3.m")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns3.m").head.getLong(0) == 11L)
    // DESCRIBE HISTORY resolves catalog names too
    assert(spark.sql(s"DESCRIBE HISTORY $cat.ns3.m").count() >= 5L)
    // EXPLAIN of catalog-name DML renders without mutating
    val v0 = SnapshotLog.latestVersion(spark, s"$root/ns3/m").get
    val plan = spark.sql(s"EXPLAIN DELETE FROM $cat.ns3.m WHERE id = 1")
      .head.getString(0)
    assert(plan.contains("GraftDmlCommand"), plan)
    assert(SnapshotLog.latestVersion(spark, s"$root/ns3/m").contains(v0))
  }

  test("time travel through stock syntax: VERSION AS OF n | 'tag', TIMESTAMP AS OF") {
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns4")
    spark.sql(s"CREATE TABLE $cat.ns4.tt (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns4.tt SELECT id FROM range(0, 5)")
    SnapshotLog.createTag(spark, s"$root/ns4/tt", "five")
    spark.sql(s"INSERT INTO $cat.ns4.tt SELECT id FROM range(5, 20)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns4.tt").head.getLong(0) == 20L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns4.tt VERSION AS OF 2")
      .head.getLong(0) == 5L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns4.tt VERSION AS OF 'five'")
      .head.getLong(0) == 5L)
    // a far-future timestamp resolves to the latest version
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns4.tt TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0) == 20L)
  }

  test("reads are catalog-fresh and pushdown reaches the parquet scan") {
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns5")
    spark.sql(s"CREATE TABLE $cat.ns5.p (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('stats.cols' = 'id')")
    spark.sql(s"INSERT INTO $cat.ns5.p SELECT id, id AS v FROM range(0, 100)")
    // a DataFrame captured BEFORE a mutation reads its own analysis-
    // time snapshot; a NEW query sees the new head — no stale view
    val before = spark.sql(s"SELECT count(*) AS n FROM $cat.ns5.p")
    spark.sql(s"INSERT INTO $cat.ns5.p SELECT id, id FROM range(100, 150)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns5.p").head.getLong(0) == 150L)
    assert(before.head.getLong(0) == 100L)
    // filter pushdown: the substituted read bottoms out in parquet
    // scans, so the predicate lands in PushedFilters
    val q = spark.sql(s"SELECT id FROM $cat.ns5.p WHERE id >= 120")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(id,120)"), physical)
    assert(q.count() == 30L)
  }

  test("a second session sees the same catalog (filesystem is the state)") {
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns6")
    spark.sql(s"CREATE TABLE $cat.ns6.x AS SELECT id FROM range(0, 7)")
    val s2 = spark.newSession()
    try {
      s2.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      s2.conf.set(s"spark.sql.catalog.$cat.root", root)
      assert(s2.sql(s"SELECT count(*) FROM $cat.ns6.x").head.getLong(0) == 7L)
      // DML from the second session is visible to the first
      s2.sql(s"INSERT INTO $cat.ns6.x SELECT id FROM range(7, 10)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns6.x")
        .head.getLong(0) == 10L)
    } finally {
      // restore the active session for the suites that follow
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("registerSnapshot remains sugar: a view and a catalog name serve the same table") {
    root
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns7")
    spark.sql(s"CREATE TABLE $cat.ns7.s AS SELECT id FROM range(0, 9)")
    GraftSql.registerSnapshot(spark, "gcat_view", s"$root/ns7/s")
    assert(spark.sql("SELECT count(*) FROM gcat_view").head.getLong(0) == 9L)
    spark.sql(s"DELETE FROM $cat.ns7.s WHERE id < 3")
    // the view was registered before the delete — unpinned views
    // repoint only on their own DML, the catalog name is always fresh
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns7.s").head.getLong(0) == 6L)
  }

  test("refusals: writes to pinned loads, missing tables, bad namespaces") {
    root
    // DML on a nonexistent table under the catalog refuses loudly
    val e1 = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.nope.missing WHERE 1 = 1")
    }
    assert(e1.getMessage.contains("no snapshot table"), e1.getMessage)
    // CREATE TABLE into a missing namespace refuses
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.nope.t2 (id BIGINT)")
    }
    assert(e2.getMessage.toLowerCase.contains("nope"), e2.getMessage)
    // PARTITIONED BY refuses with the CLUSTER BY pointer
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns8")
    val e3 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ns8.t3 (id BIGINT) PARTITIONED BY (id)")
    }
    assert(e3.getMessage.contains("CLUSTER BY"), e3.getMessage)
  }
}
