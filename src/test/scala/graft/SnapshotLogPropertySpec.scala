package graft

import java.nio.file.Paths

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sources.snapshot.{LocalLinkLogStore, LogStore, SnapshotLog}

/** Model-based check of the snapshot-table format: random operation
  * sequences (append / overwrite / range delete / upsert / compact /
  * stream-append with replays / deletion-vector delete / CDC
  * applyChanges / metadata-only column RENAME / merge-on-read
  * equality-delete upsert / MOR key delete / CoW range UPDATE /
  * compound-conjunction CoW DELETE and UPDATE / keys-frame CoW UPDATE /
  * composite-TUPLE MOR delete and CoW update / residual-bounded
  * mergeMatched / per-row replacement sets (upsertRows) / multi-row
  * changelog sets (applyChangesRows)) run against BOTH the real
  * table and an in-memory model. After every op the table must equal
  * the model; after the sequence, every committed version must equal
  * the model's history snapshot (time travel), metadata stats must
  * equal model aggregates, and vacuum must not change any readable
  * version. This pins the interaction space the single-op specs can't
  * enumerate — e.g. delete-after-compact, a DV mask over
  * stream-appended files, an eq-delete over a renamed key column,
  * compact materializing BOTH mask kinds mid-sequence, CoW upsert over
  * eq-hidden rows.
  */
class SnapshotLogPropertySpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.get
  import s.implicits._

  private type Row3 = (Long, Long, String)

  private def mkDf(rows: Seq[Row3]) =
    rows.toDF("id", "k", "payload")

  private def rows(lo: Long, hi: Long, tag: String): Seq[Row3] =
    (lo until hi).map(i => (i, i % 7, s"$tag$i"))

  /** Positional read: rename ops change the key column's NAME but
    * never its position, so the model compares by position.
    */
  private def tableRows(t: String, version: Option[Long] = None): Seq[Row3] = {
    val df = SnapshotLog.read(s, t, version)
    df.select(df.columns.toIndexedSeq.map(col): _*)
      .as[Row3].collect().toSeq.sorted
  }

  /** Run `body` with a LogStore that fires `inject` exactly once, in
    * the check-to-act window of the first manifest publish — the
    * random-racer analogue of SnapshotMutationRebaseSpec's seam.
    */
  private var injN = 0
  private def withInjection(inject: => Unit)(body: => Unit): Unit = {
    injN += 1
    val name = s"snapprop-inject-$injN"
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    LogStore.register(name, new LocalLinkLogStore {
      override protected def beforePublish(fs: FileSystem,
          dest: Path): Unit =
        if (dest.getName.matches("v\\d+\\.json") &&
          fired.compareAndSet(false, true)) inject
    })
    s.conf.set(LogStore.ConfKey, name)
    try body finally s.conf.unset(LogStore.ConfKey)
  }

  test("random op sequences match the in-memory model at every version") {
    for (seed <- 0 until 5) {
      val rnd = new Random(seed)
      // odd seeds run the adaptive checkpoint cadence: the manifest
      // ENCODING policy must be invisible to every content, version,
      // and expiry check below
      if (seed % 2 == 1) s.conf.set(SnapshotLog.CheckpointPolicyConf, "adaptive")
      else s.conf.unset(SnapshotLog.CheckpointPolicyConf)
      val t = Paths.get("target", s"snapprop-$seed").toAbsolutePath.toString
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))

      var model = Vector.empty[Row3]
      // committed version -> expected content at that version
      var history = Map.empty[Long, Vector[Row3]]
      var nextEpoch = 0L
      var nextId = 0L
      // current logical name of the key column (rename ops flip it)
      var keyName = "id"
      def keyed(df: DataFrame): DataFrame =
        if (keyName == "id") df else df.withColumnRenamed("id", keyName)

      // first op is always an append so every later op has a table
      def freshSlice(tag: String): Seq[Row3] = {
        val n = 10 + rnd.nextInt(30)
        val r = rows(nextId, nextId + n, tag)
        nextId += n
        r
      }

      val opCount = 12
      for (op <- 0 until opCount) {
        val choice = if (op == 0) 0 else rnd.nextInt(21)
        // ~1/3 of the mutation/DDL ops race a CONCURRENT APPEND of a
        // fresh slice, committed deterministically inside the op's
        // check-to-act window. A fresh-id append is logically disjoint
        // from every eligible op, so the OCC rebase must land BOTH in
        // racer-first serial order: the op's effect applies to the
        // PRE-racer state (its actual read point) and the racer's rows
        // ride through untouched — exactly what the model asserts
        // below. Plain appends/overwrite/stream (0/1/5) are excluded:
        // they are version-pinned CAS surfaces by contract.
        val racer: Option[Seq[Row3]] =
          if (Set(2, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
            19, 20)(choice) &&
            rnd.nextInt(3) == 0)
            Some(freshSlice("r"))
          else None
        val preModel = model
        val vBefore = SnapshotLog.latestVersion(s, t).getOrElse(0L)
        def inBody(body: => Unit): Unit = racer match {
          case None => body
          case Some(rs) => withInjection {
            SnapshotLog.commit(keyed(mkDf(rs)), t, "append", Seq(keyName)); ()
          }(body)
        }
        inBody { choice match {
          case 0 => // append
            val r = freshSlice("a")
            val v = SnapshotLog.commit(
              keyed(mkDf(r)).repartition(1 + rnd.nextInt(2)),
              t, "append", Seq(keyName))
            model = model ++ r
            history += v -> model
          case 1 => // overwrite (resets schema, mapping, and eq state);
            // occasionally EMPTY — the TRUNCATE TABLE shape (zero rows
            // committed, zero files read)
            val r = if (rnd.nextInt(4) == 0) Seq.empty[Row3]
              else freshSlice("o")
            val v = SnapshotLog.commit(mkDf(r), t, "overwrite", Seq("id"))
            keyName = "id"
            model = r.toVector
            history += v -> model
          case 2 => // range delete over a random window of the id space
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(20) + 1
            SnapshotLog.deleteWhere(s, t, keyName, lo, hi, Seq(keyName)).foreach { st =>
              model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
              history += st.version -> model
            }
          case 3 => // upsert: mutate a few existing ids + insert new ones
            val existing = rnd.shuffle(model.map(_._1)).take(rnd.nextInt(5))
              .map(i => (i, i % 7, s"u$i"))
            val inserted = freshSlice("n")
            val ups = existing ++ inserted
            if (ups.nonEmpty) {
              val st = SnapshotLog.upsert(keyed(mkDf(ups)), t, keyName, Seq(keyName))
              val keys = ups.map(_._1).toSet
              model = model.filterNot(r => keys(r._1)) ++ ups
              history += st.version -> model
            }
          case 4 => // compact (content must not move; masks materialize)
            SnapshotLog.compact(s, t, 1L << 20, Seq(keyName)).foreach { v =>
              history += v -> model
            }
          case 5 => // stream append; half the time replay an old epoch
            val replay = nextEpoch > 0 && rnd.nextBoolean()
            val epoch = if (replay) rnd.nextLong(nextEpoch) else nextEpoch
            val r = freshSlice("s")
            val res = SnapshotLog.appendStreamBatch(keyed(mkDf(r)), t, epoch, Seq(keyName))
            if (replay) assert(res.isEmpty, s"replayed epoch $epoch committed")
            else {
              nextEpoch = epoch + 1
              model = model ++ r
              history += res.get -> model
            }
          case 6 => // deletion-vector delete over a random id window
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(20) + 1
            SnapshotLog.deleteWhereDV(s, t, keyName, lo, hi).foreach { st =>
              model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
              history += st.version -> model
            }
          case 7 => // CDC batch: random upserts + deletes + inserts
            // (distinct: composite twins can duplicate an id in the
            // model, and applyChanges requires batch key-uniqueness)
            val ids = rnd.shuffle(model.map(_._1).distinct)
            val ups = ids.take(rnd.nextInt(4))
              .map(i => (i, i % 7, s"c$i", "U"))
            val dels = ids.drop(ups.size).take(rnd.nextInt(3))
              .map(i => (i, i % 7, s"x$i", "D"))
            val ins = freshSlice("m").map(r => (r._1, r._2, r._3, "U"))
            val batch = ups ++ dels ++ ins
            if (batch.nonEmpty) {
              val st = SnapshotLog.applyChanges(
                keyed(batch.toDF("id", "k", "payload", "op")), t, keyName)
              if (st.version > (history.keySet + 0L).max) {
                val delKeys = dels.map(_._1).toSet
                val upMap = (ups ++ ins).map(r => r._1 -> (r._1, r._2, r._3)).toMap
                model = model.filterNot(r => delKeys(r._1) || upMap.contains(r._1)) ++
                  upMap.values.toVector.sortBy(_._1)
                history += st.version -> model
              }
            }
          case 8 => // metadata-only rename of the key column (flip-flop)
            val newName = if (keyName == "id") "doc_id" else "id"
            val v = SnapshotLog.renameColumn(s, t, keyName, newName)
            keyName = newName
            history += v -> model
          case 9 => // merge-on-read upsert: zero rewrites, eq-delete debt
            val existing = rnd.shuffle(model.map(_._1)).take(rnd.nextInt(5))
              .map(i => (i, i % 7, s"z$i"))
            val inserted = freshSlice("q")
            val ups = existing ++ inserted
            val v = SnapshotLog.upsertMOR(keyed(mkDf(ups)), t, keyName, Seq(keyName))
            val keys = ups.map(_._1).toSet
            model = model.filterNot(r => keys(r._1)) ++ ups
            history += v -> model
          case 10 => // merge-on-read key delete (incl. a guaranteed-absent key)
            val ks = rnd.shuffle(model.map(_._1)).take(rnd.nextInt(4)) :+
              (nextId + 5000 + op)
            SnapshotLog.deleteKeysMOR(ks.toDF(keyName), t, keyName).foreach { v =>
              val kset = ks.toSet
              model = model.filterNot(r => kset(r._1))
              history += v -> model
            }
          case 11 => // CoW range update over a random id window
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(20) + 1
            SnapshotLog.updateWhere(s, t, keyName, lo, hi,
              Map("payload" -> concat(col("payload"), lit("*"))),
              Seq(keyName)).foreach { st =>
              model = model.map(r =>
                if (r._1 >= lo && r._1 <= hi) (r._1, r._2, r._3 + "*") else r)
              history += st.version -> model
            }
          case 12 => // compound CoW delete: id window AND k = const
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(30) + 1
            val kv = rnd.nextLong(7)
            SnapshotLog.deleteWhere(s, t,
              Seq(SnapshotLog.ColumnRange.between(keyName, lo, hi),
                SnapshotLog.ColumnRange.eq("k", kv)),
              Seq(keyName)).foreach { st =>
              model = model.filterNot(r =>
                r._1 >= lo && r._1 <= hi && r._2 == kv)
              history += st.version -> model
            }
          case 13 => // compound CoW update: id window AND k = const
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(30) + 1
            val kv = rnd.nextLong(7)
            SnapshotLog.updateWhere(s, t,
              Seq(SnapshotLog.ColumnRange.between(keyName, lo, hi),
                SnapshotLog.ColumnRange.eq("k", kv)),
              Map("payload" -> concat(col("payload"), lit("+"))),
              Seq(keyName)).foreach { st =>
              model = model.map(r =>
                if (r._1 >= lo && r._1 <= hi && r._2 == kv)
                  (r._1, r._2, r._3 + "+")
                else r)
              history += st.version -> model
            }
          case 14 => // arbitrary-predicate CoW update (locate-then-rewrite)
            val lo = rnd.nextLong(nextId.max(1))
            val hi = lo + rnd.nextLong(30) + 1
            val kv = rnd.nextLong(7)
            SnapshotLog.updateMatching(s, t,
              (col(keyName) >= lo && col(keyName) <= hi) || col("k") === kv,
              Map("payload" -> concat(col("payload"), lit("~"))),
              Seq(keyName)).foreach { st =>
              model = model.map(r =>
                if ((r._1 >= lo && r._1 <= hi) || r._2 == kv)
                  (r._1, r._2, r._3 + "~")
                else r)
              history += st.version -> model
            }
          case 15 => // composite MOR upsert keyed on (id, k): a
            // full-tuple match replaces; a mismatched-k twin of an
            // existing id INSERTS alongside it (the composite-key
            // semantics a single-column upsert cannot express)
            val existing = rnd.shuffle(model).take(rnd.nextInt(4))
              .map(r => (r._1, r._2, s"ck${r._1}"))
            val twins = rnd.shuffle(model.map(_._1)).take(rnd.nextInt(2))
              .map(i => (i, (i % 7) + 7, s"tw$i")) // k outside the 0..6 band
            val inserted = freshSlice("ci")
            val ups = existing ++ twins ++ inserted
            val v = SnapshotLog.upsertMOR(keyed(mkDf(ups)), t,
              Seq(keyName, "k"), Seq(keyName))
            val tuples = ups.map(r => (r._1, r._2)).toSet
            model = model.filterNot(r => tuples((r._1, r._2))) ++ ups
            history += v -> model
          case 16 => // keys-frame CoW update (the UPDATE .. IN (SELECT)
            // shape): sampled ids + a guaranteed-absent id
            val ids = rnd.shuffle(model.map(_._1).distinct)
              .take(rnd.nextInt(5)) :+ (nextId + 9000 + op)
            SnapshotLog.updateKeys(s, t, Seq(keyName), keyed(
                ids.toDF("id")),
              Map("payload" -> concat(col("payload"), lit("^"))),
              Seq(keyName)).foreach { st =>
              val kset = ids.toSet
              model = model.map(r =>
                if (kset(r._1)) (r._1, r._2, r._3 + "^") else r)
              history += st.version -> model
            }
          case 17 => // TUPLE keys-frame ops (the `(a, b) IN (SELECT)`
            // shape): composite MOR delete or composite CoW update —
            // full-tuple equality, incl. a guaranteed-absent tuple
            val tuples = rnd.shuffle(model).take(rnd.nextInt(4))
              .map(r => (r._1, r._2)) :+ ((nextId + 7000 + op, 3L))
            val ts = tuples.toSet
            if (rnd.nextBoolean())
              SnapshotLog.deleteKeysMOR(
                keyed(tuples.toDF("id", "k")), t, Seq(keyName, "k"))
                .foreach { v =>
                  model = model.filterNot(r => ts((r._1, r._2)))
                  history += v -> model
                }
            else
              SnapshotLog.updateKeys(s, t, Seq(keyName, "k"),
                keyed(tuples.toDF("id", "k")),
                Map("payload" -> concat(col("payload"), lit("&"))),
                Seq(keyName)).foreach { st =>
                model = model.map(r =>
                  if (ts((r._1, r._2))) (r._1, r._2, r._3 + "&") else r)
                history += st.version -> model
              }
          case 18 => // residual-bounded merge (mergeMatched): source
            // ids span the table, but only rows whose k falls in the
            // residual band replace — same-id rows OUTSIDE the band
            // (composite twins included) must ride through untouched
            val ids = rnd.shuffle(model.map(_._1).distinct)
              .take(rnd.nextInt(6))
            val lo = rnd.nextLong(7)
            val hi = lo + rnd.nextLong(3)
            val idSet = ids.toSet
            val hit = (r: Row3) =>
              idSet(r._1) && r._2 >= lo && r._2 <= hi
            val updates = model.filter(hit)
              .map(r => (r._1, r._2, r._3 + "%"))
            if (updates.nonEmpty) {
              val st = SnapshotLog.mergeMatched(s, t, Seq(keyName),
                Some(keyed(mkDf(updates))), None,
                Seq(SnapshotLog.ColumnRange.between("k", lo, hi)),
                Seq(keyName))
              if (st.version > (history.keySet + 0L).max) {
                model = model.map(r =>
                  if (hit(r)) (r._1, r._2, r._3 + "%") else r)
                history += st.version -> model
              }
            }
          case 19 => // per-row replacement sets (upsertRows): a
            // duplicate-key batch REPLACES each key's rows with the
            // batch's row SET — the MERGE clause machinery's primitive
            // (per-row updates and carried riders both land as
            // multi-row sets); fresh-id rows are pure inserts
            val ids = rnd.shuffle(model.map(_._1).distinct)
              .take(rnd.nextInt(4))
            val reps = ids.flatMap { i =>
              (0 until (1 + rnd.nextInt(3)))
                .map(j => (i, rnd.nextLong(7), s"p$i-$j"))
            }
            val ups = reps ++ freshSlice("pi")
            val st = SnapshotLog.upsertRows(keyed(mkDf(ups)), t,
              Seq(keyName), Seq(keyName))
            if (st.version > (history.keySet + 0L).max) {
              val keys = ups.map(_._1).toSet
              model = model.filterNot(r => keys(r._1)) ++ ups
              history += st.version -> model
            }
          case 20 => // multi-row changelog sets (applyChangesRows):
            // a key's U rows land as its replacement SET while D keys
            // drop whole — U and D keys disjoint, the invariant the
            // MERGE machinery constructs (a key deletes only when it
            // has no survivor)
            val ids = rnd.shuffle(model.map(_._1).distinct)
            val uIds = ids.take(rnd.nextInt(3))
            val dIds = ids.drop(uIds.size).take(rnd.nextInt(3))
            val uRows = uIds.flatMap { i =>
              (0 until (1 + rnd.nextInt(2)))
                .map(j => (i, rnd.nextLong(7), s"w$i-$j", "U"))
            }
            val dRows = dIds.map(i => (i, 0L, "", "D"))
            val batch = uRows ++ dRows
            if (batch.nonEmpty) {
              val st = SnapshotLog.applyChangesRows(
                keyed(batch.toDF("id", "k", "payload", "op")), t,
                Seq(keyName), "op", Seq(keyName), -1L)
              if (st.version > (history.keySet + 0L).max) {
                val dSet = dIds.toSet
                val uSet = uIds.toSet
                model = model.filterNot(r => dSet(r._1) || uSet(r._1)) ++
                  uRows.map(r => (r._1, r._2, r._3))
                history += st.version -> model
              }
            }
        } }
        // racer accounting: if the op committed (exactly one publish
        // attempt hit the seam), the raced history is racer at
        // vBefore+1 then the rebased op at vBefore+2; if the op was a
        // no-op (nothing to publish), the seam never fired and the
        // racer never ran
        racer.foreach { rs =>
          val vAfter = SnapshotLog.latestVersion(s, t).getOrElse(0L)
          if (vAfter == vBefore + 2) {
            history += (vBefore + 1) -> (preModel ++ rs)
            model = model ++ rs
            history += vAfter -> model
          } else assert(vAfter == vBefore,
            s"seed=$seed op=$op choice=$choice racer landed without the op " +
              s"($vBefore -> $vAfter)")
        }
        assert(tableRows(t) == model.sorted,
          s"seed=$seed op=$op choice=$choice diverged")
        // point lookups agree with the model: one present key (if any)
        // and one guaranteed-absent key — opened ⊆ range candidates
        val presentK = model.headOption.map(_._1)
        val absentK = nextId + 1000 + op
        (presentK.toSeq :+ absentK).foreach { k =>
          val (df, opened, range, _) = SnapshotLog.readPoint(s, t, keyName, k)
          assert(opened <= range, s"seed=$seed op=$op k=$k opened>range")
          val got = df.select(df.columns.toIndexedSeq.map(col): _*)
            .as[Row3].collect().toSeq.sorted
          assert(got == model.filter(_._1 == k).sorted,
            s"seed=$seed op=$op point lookup k=$k diverged")
        }
        // join-driven skipping agrees with the model on a mixed batch
        // of present and absent keys
        val semiKeys = model.take(3).map(_._1) ++ Seq(absentK, absentK + 1)
        val (sj, sjOpened, sjCand, _) =
          SnapshotLog.readSemiJoin(s, t, keyName, semiKeys.toDF("k"), "k")
        assert(sjOpened <= sjCand, s"seed=$seed op=$op semi opened>cand")
        val sjGot = sj.select(sj.columns.toIndexedSeq.map(col): _*)
          .as[Row3].collect().toSeq.sorted
        assert(sjGot == model.filter(r => semiKeys.contains(r._1)).sorted,
          s"seed=$seed op=$op semi-join diverged")
      }

      // time travel: every committed version equals its model snapshot
      history.foreach { case (v, expect) =>
        assert(tableRows(t, Some(v)) == expect.sorted, s"seed=$seed version $v")
      }
      // metadata stats equal model aggregates (rows are net of DV masks
      // but an UPPER bound under outstanding equality deletes; ranges
      // are exact for mask-free tables and conservative BOUNDS —
      // containing the true range — under either mask kind)
      val st = SnapshotLog.tableStats(s, t)
      val latestM = SnapshotLog.manifest(s, t,
        SnapshotLog.latestVersion(s, t).get)
      val masked = latestM.files.exists(_.dv.isDefined) ||
        latestM.eqDeletes.nonEmpty
      if (latestM.eqDeletes.isEmpty) assert(st.rows == model.size.toLong)
      else assert(st.rows >= model.size.toLong)
      if (model.nonEmpty) {
        val (mn, mx) = st.colRanges(keyName)
        if (masked) {
          assert(mn.asInstanceOf[Long] <= model.map(_._1).min)
          assert(mx.asInstanceOf[Long] >= model.map(_._1).max)
        } else {
          assert((mn, mx) == (model.map(_._1).min, model.map(_._1).max))
        }
      }
      // vacuum is invisible to every readable version
      SnapshotLog.vacuum(s, t)
      history.foreach { case (v, expect) =>
        assert(tableRows(t, Some(v)) == expect.sorted, s"seed=$seed post-vacuum $v")
      }
      // expiry: whatever it retires respects retention and is gone
      // loudly; every survivor still equals its model snapshot
      val (expired, _) = SnapshotLog.expireVersions(s, t, keepLast = 3)
      val latestV = SnapshotLog.latestVersion(s, t).get
      assert(expired.forall(_ < latestV - 1), s"seed=$seed expired $expired")
      expired.foreach { v =>
        intercept[java.io.FileNotFoundException] { tableRows(t, Some(v)) }
      }
      (history.keySet -- expired).foreach { v =>
        assert(tableRows(t, Some(v)) == history(v).sorted,
          s"seed=$seed post-expire $v")
      }
    }
    s.conf.unset(SnapshotLog.CheckpointPolicyConf)
  }
}
