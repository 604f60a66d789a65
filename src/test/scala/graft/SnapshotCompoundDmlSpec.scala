package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.snapshot.SnapshotLog
import graft.sources.snapshot.SnapshotLog.ColumnRange

/** Compound-predicate copy-on-write DML: AND-conjunctions of per-column
  * ranges classify files per conjunct (ANY exclusion keeps a file
  * unread; ALL coverage drops it metadata-only), open-ended bounds
  * express inequalities, and the null/ordering edge cases that make
  * stats classification silently wrong are pinned here.
  */
class SnapshotCompoundDmlSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private def fresh(name: String): String = {
    val t = Paths.get("target", name).toAbsolutePath.toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    t
  }

  test("compound delete classifies per conjunct: keep/drop/rewrite") {
    val t = fresh("cdml-del")
    // four single-file buckets over (id, k): k = id / 100 so the two
    // dimensions correlate per file and stats windows are tight
    (0 until 4).foreach { b =>
      SnapshotLog.commit(
        s.range(b * 100L, b * 100L + 100)
          .select($"id", lit(b.toLong).as("k"),
            concat(lit("row"), $"id").as("payload")).coalesce(1),
        t, "append", Seq("id", "k"))
    }
    val before = SnapshotLog.manifest(s, t, 4L).files.map(_.path).toSet
    // id BETWEEN 100 AND 299 AND k = 1: bucket 1 fully covered (drop),
    // bucket 2 excluded by the k conjunct despite the id overlap
    // (keep), buckets 0/3 excluded by id (keep)
    val st = SnapshotLog.deleteWhere(s, t,
      Seq(ColumnRange.between("id", 100L, 299L), ColumnRange.eq("k", 1L)),
      Seq("id", "k")).get
    assert(st.filesKept == 3 && st.filesDropped == 1 && st.filesRewritten == 0,
      st)
    val after = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).files.map(_.path).toSet
    assert((before intersect after).size == 3,
      "a conjunct-excluded file was touched")
    val got = SnapshotLog.read(s, t).select($"id").as[Long].collect().toSet
    assert(got == ((0L until 100) ++ (200L until 400)).toSet)

    // partial overlap on id + matching k: boundary file rewrites
    val st2 = SnapshotLog.deleteWhere(s, t,
      Seq(ColumnRange.between("id", 250L, 260L), ColumnRange.eq("k", 2L)),
      Seq("id", "k")).get
    assert(st2.filesDropped == 0 && st2.filesRewritten == 1, st2)
    assert(SnapshotLog.read(s, t).count() == 300 - 11)

    // every conjunct must name a real column
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.deleteWhere(s, t,
        Seq(ColumnRange.eq("id", 1L), ColumnRange.eq("nope", 1L)), Nil)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("compound update rewrites only files no conjunct excludes") {
    val t = fresh("cdml-upd")
    (0 until 4).foreach { b =>
      SnapshotLog.commit(
        s.range(b * 100L, b * 100L + 100)
          .select($"id", lit(b.toLong).as("k"),
            concat(lit("row"), $"id").as("payload")).coalesce(1),
        t, "append", Seq("id", "k"))
    }
    val before = SnapshotLog.manifest(s, t, 4L).files.map(_.path).toSet
    val st = SnapshotLog.updateWhere(s, t,
      Seq(ColumnRange.between("id", 150L, 349L), ColumnRange.eq("k", 2L)),
      Map("payload" -> concat(lit("u-"), col("payload"))),
      Seq("id", "k")).get
    // id window touches buckets 1..3; the k conjunct excludes 1 and 3
    assert(st.filesKept == 3 && st.filesRewritten == 1, st)
    val after = SnapshotLog.manifest(s, t,
      SnapshotLog.latestVersion(s, t).get).files.map(_.path).toSet
    assert((before intersect after).size == 3)
    val updated = SnapshotLog.read(s, t)
      .where($"payload".startsWith("u-")).select($"id").as[Long]
      .collect().toSet
    assert(updated == (200L until 300).toSet, "rows updated != rows matched")

    // open-ended bound: id >= 350 (hi = None) over one file
    val st2 = SnapshotLog.updateWhere(s, t,
      Seq(ColumnRange("id", Some(350L), None)),
      Map("payload" -> lit("tail")), Seq("id", "k")).get
    assert(st2.filesRewritten == 1, st2)
    assert(SnapshotLog.read(s, t).where($"payload" === "tail").count() == 50)

    // reassigning any predicate column refuses
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.updateWhere(s, t,
        Seq(ColumnRange.eq("id", 1L), ColumnRange.eq("k", 1L)),
        Map("k" -> lit(9L)), Nil)
    }
    assert(e.getMessage.contains("upsert"))
  }

  test("compound merge-on-read delete: keep/drop/mask per conjunct, zero rewrites") {
    val t = fresh("cdml-dv")
    (0 until 4).foreach { b =>
      SnapshotLog.commit(
        s.range(b * 100L, b * 100L + 100)
          .select($"id", lit(b.toLong).as("k"),
            concat(lit("row"), $"id").as("payload")).coalesce(1),
        t, "append", Seq("id", "k"))
    }
    val before = SnapshotLog.manifest(s, t, 4L).files.map(_.path).toSet
    // bucket 1 fully covered by both conjuncts (drop metadata-only);
    // bucket 2 overlaps the id window but is masked only where k=2
    // matches (the id conjunct bounds the positions)
    val st = SnapshotLog.deleteWhereDV(s, t,
      Seq(SnapshotLog.ColumnRange.between("id", 100L, 250L),
        SnapshotLog.ColumnRange("k", Some(1L), None))).get
    assert(st.filesDropped == 1 && st.filesMasked == 1, st)
    val m = SnapshotLog.manifest(s, t, SnapshotLog.latestVersion(s, t).get)
    // merge-on-read: the masked file's BYTES are untouched (same path)
    assert(m.files.map(_.path).toSet.subsetOf(before))
    val got = SnapshotLog.read(s, t).select($"id").as[Long].collect().toSet
    assert(got == ((0L until 100) ++ (251L until 400)).toSet)

    // a null-bearing fully-covered file masks, never drops whole
    val t2 = fresh("cdml-dvnull")
    SnapshotLog.commit(
      s.range(0, 100).select(
        when($"id" % 10 === 0, lit(null)).otherwise($"id")
          .cast("long").as("id"), lit(0L).as("k")).coalesce(1),
      t2, "append", Seq("id"))
    val st2 = SnapshotLog.deleteWhereDV(s, t2, "id", 0L, 99L).get
    assert(st2.filesDropped == 0 && st2.filesMasked == 1,
      s"null-bearing file must mask, not drop: $st2")
    assert(SnapshotLog.read(s, t2).count() == 10,
      "NULL rows must survive a DV range delete")
  }

  test("a fully-covered file with NULLs in the column is not dropped whole") {
    val t = fresh("cdml-null")
    // one file whose non-null ids all sit inside [0, 99] but which also
    // carries NULL ids — stats min/max describe only the non-null rows,
    // so a metadata-only drop would delete the NULL rows that can never
    // match a range predicate
    val withNulls = s.range(0, 100)
      .select(when($"id" % 10 === 0, lit(null)).otherwise($"id")
        .cast("long").as("id"), concat(lit("p"), $"id").as("payload"))
      .coalesce(1)
    SnapshotLog.commit(withNulls, t, "append", Seq("id"))
    val st = SnapshotLog.deleteWhere(s, t, "id", 0L, 99L, Seq("id")).get
    assert(st.filesDropped == 0 && st.filesRewritten == 1,
      s"null-bearing file must rewrite, not drop: $st")
    val left = SnapshotLog.read(s, t)
    assert(left.count() == 10, "NULL rows must survive a range delete")
    assert(left.where($"id".isNotNull).count() == 0)
  }

  test("string stats compare in UTF-8 byte order (supplementary plane)") {
    val t = fresh("cdml-utf8")
    // one file holding a supplementary-plane value: U+1F600 encodes
    // F0 9F 98 80 in UTF-8 (ABOVE the private-use U+E000 = EE 80 80)
    // but D83D DE00 in UTF-16 (BELOW it). Spark's string min/max are
    // UTF-8-ordered, so classification must be too: the range
    // [U+E000, U+1F64F] contains the row, and a UTF-16 comparison
    // would classify the file as disjoint and silently keep the row.
    SnapshotLog.commit(Seq(("😀", 1L)).toDF("tag", "n").coalesce(1),
      t, "append", Seq("tag"))
    val st = SnapshotLog.deleteWhere(s, t, "tag",
      "\uE000", "🙏", Seq("tag"))
    assert(st.isDefined, "UTF-16 ordering misclassified the file as disjoint")
    assert(SnapshotLog.read(s, t).count() == 0, "the matching row survived")
  }
}
