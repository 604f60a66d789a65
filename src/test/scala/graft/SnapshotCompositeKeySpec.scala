package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog

/** Composite-key mutations: upsert / applyChanges / MOR upsert /
  * deleteKeysMOR / readSemiJoin keyed on SEVERAL columns at once.
  * Candidacy is the tuple-interval conjunction — a file rewrites only
  * when some key tuple lands inside its [min,max] window on EVERY key
  * column, so the conjunction only ever SHRINKS the touched set vs any
  * single column alone. Equality is full-tuple, one eq-delete sidecar
  * carries the whole tuple (comma-joined physical names in the
  * manifest), and renames/drops/compaction/change-feed all compose.
  *
  * Reference: MERGE/upsert semantics per `sdata/datapipeline.py`'s
  * meta-join contract generalize to composite sample keys; the file
  * format mechanics follow the Iceberg v2 equality-delete design.
  */
class SnapshotCompositeKeySpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def freshTable(name: String): String = {
    val p = Paths.get("target", s"snapck-$name").toAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    p.toString
  }

  /** 2×2 grid of files: one file per (k1 decade, k2 decade) quadrant —
    * k1 ∈ [a,a+9] × k2 ∈ [b,b+9], 100 rows each — so single-column
    * candidacy keeps 2 files where the tuple test keeps 1.
    */
  private def grid(t: String): Unit =
    for (a <- Seq(0L, 10L); b <- Seq(0L, 10L))
      SnapshotLog.commit(
        s.range(0, 10).select(($"id" + a).as("k1"))
          .crossJoin(s.range(0, 10).select(($"id" + b).as("k2")))
          .select($"k1", $"k2",
            concat(lit("p"), $"k1", lit("-"), $"k2").as("payload"))
          .repartition(1),
        t, "append", Seq("k1", "k2"))

  private def payloadAt(t: String, k1: Long, k2: Long): String =
    SnapshotLog.read(s, t).where($"k1" === k1 && $"k2" === k2)
      .select($"payload").head.getString(0)

  test("CoW upsert: tuple-interval candidacy rewrites one quadrant only") {
    val t = freshTable("cow")
    grid(t)
    val up = Seq((5L, 5L, "upd"), (205L, 205L, "new"))
      .toDF("k1", "k2", "payload")
    val st = SnapshotLog.upsert(up, t, Seq("k1", "k2"), Nil)
    // (5,5) lands in ONE quadrant; k1=5 alone would also flag the
    // (k1 0-9, k2 10-19) file — the conjunction excludes it
    assert(st.filesRewritten == 1 && st.filesKept == 3)
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 401)
    assert(payloadAt(t, 5, 5) == "upd")
    assert(payloadAt(t, 205, 205) == "new")
    // rows sharing only ONE key component are untouched
    assert(payloadAt(t, 5, 6) == "p5-6")
    assert(payloadAt(t, 6, 5) == "p6-5")
  }

  test("CoW upsert: a partial key overlap inserts instead of replacing") {
    val t = freshTable("cowpart")
    grid(t)
    // k1=5 exists everywhere, k2=999 exists nowhere: no file is a
    // tuple candidate, the row appends
    val st = SnapshotLog.upsert(
      Seq((5L, 999L, "ins")).toDF("k1", "k2", "payload"),
      t, Seq("k1", "k2"), Nil)
    assert(st.filesRewritten == 0)
    assert(SnapshotLog.read(s, t).count() == 401)
    assert(payloadAt(t, 5, 999) == "ins")
    (0L until 20L).foreach(k2o => assert(payloadAt(t, 5, k2o % 20) ==
      s"p5-${k2o % 20}"))
  }

  test("MOR upsert: one composite eq-delete sidecar, full-tuple masking, compact clears") {
    val t = freshTable("mor")
    grid(t)
    val v = SnapshotLog.upsertMOR(
      Seq((5L, 5L, "upd"), (15L, 3L, "u2")).toDF("k1", "k2", "payload"),
      t, Seq("k1", "k2"), Nil)
    val m = SnapshotLog.manifest(s, t, v)
    assert(m.eqDeletes.size == 1)
    assert(m.eqDeletes.head.keyCol == "k1,k2")
    assert(m.eqDeletes.head.rows == 2)
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 400) // replaced, not duplicated
    assert(payloadAt(t, 5, 5) == "upd")
    assert(payloadAt(t, 15, 3) == "u2")
    // tuple-sharing neighbours survive the mask
    assert(payloadAt(t, 5, 6) == "p5-6")
    assert(payloadAt(t, 15, 5) == "p15-5")
    // compaction materializes the tuple mask and clears the debt
    SnapshotLog.compact(s, t, 1L << 30, Seq("k1", "k2"))
    val m2 = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get)
    assert(m2.eqDeletes.isEmpty)
    assert(SnapshotLog.read(s, t).count() == 400)
    assert(payloadAt(t, 5, 5) == "upd")
    assert(payloadAt(t, 5, 6) == "p5-6")
  }

  test("composite eq-delete survives a key-column rename; drop of either key refuses") {
    val t = freshTable("rename")
    grid(t)
    SnapshotLog.upsertMOR(
      Seq((5L, 5L, "upd")).toDF("k1", "k2", "payload"),
      t, Seq("k1", "k2"), Nil)
    SnapshotLog.renameColumn(s, t, "k1", "key_a")
    // the sidecar is keyed by PHYSICAL names — the mask still applies
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 400)
    assert(got.where($"key_a" === 5 && $"k2" === 5)
      .select($"payload").head.getString(0) == "upd")
    // a second MOR upsert keys the RENAMED logical columns
    SnapshotLog.upsertMOR(
      Seq((5L, 6L, "upd2")).toDF("key_a", "k2", "payload"),
      t, Seq("key_a", "k2"), Nil)
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    assert(m.eqDeletes.map(_.keyCol).toSet == Set("k1,k2"))
    assert(SnapshotLog.read(s, t).count() == 400)
    // dropping EITHER key column of an outstanding composite delete
    // refuses — the read-side anti-join needs the full tuple
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "key_a") }
    assert(e1.getMessage.contains("equality deletes"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(s, t, "k2") }
    assert(e2.getMessage.contains("equality deletes"))
  }

  test("deleteKeysMOR erases exactly the recorded tuples") {
    val t = freshTable("delkeys")
    grid(t)
    val v = SnapshotLog.deleteKeysMOR(
      Seq((5L, 5L), (6L, 15L)).toDF("k1", "k2"), t, Seq("k1", "k2"))
    assert(v.contains(5L))
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 398)
    assert(got.where($"k1" === 5 && $"k2" === 5).isEmpty)
    assert(got.where($"k1" === 6 && $"k2" === 15).isEmpty)
    assert(payloadAt(t, 5, 6) == "p5-6")   // shares k1 with a deleted tuple
    assert(payloadAt(t, 6, 5) == "p6-5")   // shares k1
    assert(payloadAt(t, 5, 15) == "p5-15") // shares k2
  }

  test("applyChanges: U replaces by tuple, D deletes by tuple, candidacy stays tuple-interval") {
    val t = freshTable("cdc")
    grid(t)
    val changes = Seq(
      (5L, 5L, "x", "U"),     // in-place update, quadrant (0,0)
      (6L, 5L, "", "D"),      // delete, same quadrant
      (205L, 205L, "ins", "U")) // pure insert — lands in no file
      .toDF("k1", "k2", "payload", "op")
    val st = SnapshotLog.applyChanges(changes, t, Seq("k1", "k2"),
      "op", Nil, -1L)
    assert(st.filesRewritten == 1 && st.filesKept == 3)
    val got = SnapshotLog.read(s, t)
    assert(got.count() == 400) // +1 insert, -1 delete
    assert(payloadAt(t, 5, 5) == "x")
    assert(got.where($"k1" === 6 && $"k2" === 5).isEmpty)
    assert(payloadAt(t, 205, 205) == "ins")
    assert(payloadAt(t, 6, 6) == "p6-6")
  }

  test("readSemiJoin: tuple candidacy opens one quadrant, matches the full tuple") {
    val t = freshTable("semi")
    grid(t)
    val keys = Seq((5L, 5L), (5L, 6L)).toDF("k1", "k2")
    val (df, opened, cand, total) = SnapshotLog.readSemiJoin(
      s, t, Seq("k1", "k2"), keys, Seq("k1", "k2"), None, 10000)
    assert(total == 4)
    assert(cand == 1 && opened <= 1) // both tuples live in quadrant (0,0)
    assert(df.count() == 2)
    assert(df.select($"payload").as[String].collect().toSet ==
      Set("p5-5", "p5-6"))
    // a tuple whose components never co-occur opens nothing
    val (df2, opened2, cand2, _) = SnapshotLog.readSemiJoin(
      s, t, Seq("k1", "k2"), Seq((5L, 999L)).toDF("k1", "k2"),
      Seq("k1", "k2"), None, 10000)
    assert(cand2 == 0 && opened2 == 0 && df2.isEmpty)
  }

  test("change feed across a composite MOR upsert; restore re-surfaces the masked tuples") {
    val t = freshTable("feed")
    grid(t) // versions 1..4
    SnapshotLog.upsertMOR(
      Seq((5L, 5L, "upd"), (15L, 15L, "u2")).toDF("k1", "k2", "payload"),
      t, Seq("k1", "k2"), Nil) // version 5
    val feed = SnapshotLog.readChangeFeed(s, t, 4L, Some(5L))
    val ins = feed.where($"_change_type" === "insert")
    val del = feed.where($"_change_type" === "delete")
    assert(ins.count() == 2)
    assert(del.count() == 2) // exactly the replaced tuples, not their neighbours
    assert(del.select($"k1", $"k2").as[(Long, Long)].collect().toSet ==
      Set((5L, 5L), (15L, 15L)))
    // restore to the pre-MOR state: the dropped composite delete
    // un-masks its tuples (they re-surface as inserts) and the MOR
    // file's rows leave
    SnapshotLog.restore(s, t, 4L) // version 6
    val back = SnapshotLog.readChangeFeed(s, t, 5L, Some(6L))
    val rIns = back.where($"_change_type" === "insert")
    assert(rIns.count() == 2)
    assert(rIns.select($"payload").as[String].collect().toSet ==
      Set("p5-5", "p15-15"))
    assert(back.where($"_change_type" === "delete").count() == 2)
    assert(SnapshotLog.read(s, t).count() == 400)
    assert(payloadAt(t, 5, 5) == "p5-5")
  }

  test("SQL MERGE with a composite ON key: CoW, MOR, explicit bodies, refusals") {
    val t = freshTable("sqlmerge")
    grid(t)
    graft.sql.GraftSql.registerSnapshot(s, "ck_v", t, None, Seq("k1", "k2"))
    Seq((5L, 5L, "m1"), (300L, 300L, "n1")).toDF("k1", "k2", "payload")
      .createOrReplaceTempView("ck_src")
    graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_src
        |ON ck_v.k1 = ck_src.k1 AND ck_v.k2 = ck_src.k2
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.sql("SELECT count(*) FROM ck_v").head.getLong(0) == 401L)
    assert(s.sql("SELECT payload FROM ck_v WHERE k1=5 AND k2=5")
      .head.getString(0) == "m1")
    assert(s.sql("SELECT payload FROM ck_v WHERE k1=5 AND k2=6")
      .head.getString(0) == "p5-6")
    // explicit bodies reference both sides; keys stay unassignable
    Seq((5L, 6L, 9L), (301L, 301L, 0L)).toDF("k1", "k2", "tag")
      .createOrReplaceTempView("ck_src2")
    graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_src2
        |ON ck_v.k1 = ck_src2.k1 AND ck_v.k2 = ck_src2.k2
        |WHEN MATCHED THEN UPDATE SET
        |  payload = concat(ck_v.payload, '+', ck_src2.tag)
        |WHEN NOT MATCHED THEN INSERT (k1, k2, payload)
        |  VALUES (ck_src2.k1, ck_src2.k2, 'new')""".stripMargin)
    assert(s.sql("SELECT payload FROM ck_v WHERE k1=5 AND k2=6")
      .head.getString(0) == "p5-6+9")
    assert(s.sql("SELECT payload FROM ck_v WHERE k1=301 AND k2=301")
      .head.getString(0) == "new")
    // refusals: reassigning a key; INSERT list missing a key; non-equi ON
    intercept[IllegalArgumentException] { graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_src2
        |ON ck_v.k1 = ck_src2.k1 AND ck_v.k2 = ck_src2.k2
        |WHEN MATCHED THEN UPDATE SET k2 = 0
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
    intercept[IllegalArgumentException] { graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_src2
        |ON ck_v.k1 = ck_src2.k1 AND ck_v.k2 = ck_src2.k2
        |WHEN MATCHED THEN UPDATE SET tag = 1
        |WHEN NOT MATCHED THEN INSERT (k1, payload)
        |  VALUES (ck_src2.k1, 'x')""".stripMargin) }
    intercept[IllegalArgumentException] { graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_src2
        |ON ck_v.k1 = ck_src2.k1 AND ck_v.k2 < ck_src2.k2
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
    // MOR registration takes the same composite ON
    val t2 = freshTable("sqlmor")
    grid(t2)
    graft.sql.GraftSql.registerSnapshot(s, "ck_mor", t2, None,
      Seq("k1", "k2"), merge = "mor")
    graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_mor USING ck_src
        |ON ck_mor.k1 = ck_src.k1 AND ck_mor.k2 = ck_src.k2
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val m = SnapshotLog.manifest(s, t2, SnapshotLog.latestVersion(s, t2).get)
    assert(m.eqDeletes.size == 1 && m.eqDeletes.head.keyCol == "k1,k2")
    assert(s.sql("SELECT count(*) FROM ck_mor").head.getLong(0) == 401L)
    assert(s.sql("SELECT payload FROM ck_mor WHERE k1=5 AND k2=5")
      .head.getString(0) == "m1")
    // CDC-delete clause form under a composite key
    Seq((5L, 6L, "", "D"), (400L, 400L, "c1", "U"))
      .toDF("k1", "k2", "payload", "op").createOrReplaceTempView("ck_cdc")
    graft.sql.GraftSql.dml(s,
      """MERGE INTO ck_v USING ck_cdc
        |ON ck_v.k1 = ck_cdc.k1 AND ck_v.k2 = ck_cdc.k2
        |WHEN MATCHED AND ck_cdc.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s.sql("SELECT count(*) FROM ck_v WHERE k1=5 AND k2=6")
      .head.getLong(0) == 0L)
    assert(s.sql("SELECT payload FROM ck_v WHERE k1=400 AND k2=400")
      .head.getString(0) == "c1")
  }

  test("updateKeys retains key stats even when registration stats omit the key") {
    val t = freshTable("updstats")
    SnapshotLog.commit(
      s.range(0, 40).select($"id".as("k1"), ($"id" * 2).as("payload"))
        .coalesce(1), t, "append", Nil) // NO statsCols at all
    // first keys-frame update: with no stats every file is a candidate
    SnapshotLog.updateKeys(s, t, Seq("k1"),
      s.range(0, 3).toDF("k1"),
      Map("payload" -> (col("payload") + 1000L)), Nil)
    // the rewritten file must carry k1 min/max (the upsert/applyChanges
    // convention): losing them would make every later keys-frame
    // mutation treat the file as an always-candidate
    val m = SnapshotLog.manifest(s, t, 2L)
    assert(m.files.nonEmpty && m.files.forall(_.stats.contains("k1")),
      s"key stats missing on rewritten files: ${m.files.map(_.stats.keySet)}")
    // and a second, disjoint-key update proves pruning works: keys far
    // outside [0,39] touch nothing (None = no commit at all)
    assert(SnapshotLog.updateKeys(s, t, Seq("k1"),
      s.range(5000, 5003).toDF("k1"),
      Map("payload" -> lit(0L)), Nil).isEmpty)
  }

  test("updateKeys and deleteKeysMOR evaluate the keys frame exactly once") {
    val t = freshTable("onceeval")
    SnapshotLog.commit(
      s.range(0, 30).select($"id".as("k1"), lit(1L).as("payload"))
        .coalesce(1), t, "append", Seq("k1"))
    // an instrumented key frame: the accumulator counts how many times
    // a key row is actually produced. A lazy frame re-evaluated by the
    // rewrite join after the candidacy probe would double the count —
    // and under a non-deterministic subquery would silently change the
    // key set between candidacy and rewrite.
    val acc = s.sparkContext.longAccumulator("keyEvals")
    val bump = udf { (k: Long) => acc.add(1L); k }
    val keys = s.range(0, 5).select(bump($"id").as("k1"))
    SnapshotLog.updateKeys(s, t, Seq("k1"), keys,
      Map("payload" -> lit(7L)), Seq("k1"))
    assert(acc.value == 5L, s"keys frame evaluated ${acc.value / 5.0} times")
    val acc2 = s.sparkContext.longAccumulator("keyEvals2")
    val bump2 = udf { (k: Long) => acc2.add(1L); k }
    SnapshotLog.deleteKeysMOR(
      s.range(10, 14).select(bump2($"id").as("k1")), t, "k1")
    assert(acc2.value == 4L, s"keys frame evaluated ${acc2.value / 4.0} times")
  }
}
