package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Property coverage for the event-time operators' exact semantics on
  * ANY input — duplicate timestamps, ties, single-event users, empty
  * tables:
  *  - gap sessionization (the q50 operator) must equal the sequential
  *    per-user fold "new session iff first event or gap > G", with the
  *    (ts, tie) sort order pinning determinism under duplicate ts;
  *  - the q56 interval-pair join shape (same user, r_ts in
  *    [l_ts - W, l_ts), distinct ids) must equal the naive quadratic
  *    scan it replaces.
  */
class SessionizePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  // (user, tsSec, eventId) — tsSec small so duplicate timestamps and
  // boundary-exact gaps actually occur
  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    us <- Gen.listOfN(n, Gen.choose(0L, 3L))
    ts <- Gen.listOfN(n, Gen.choose(0L, 400L))
  } yield us.zip(ts).zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }

  private val GapSec = 60L

  test("gap sessionization equals the sequential per-user fold") {
    import spark.implicits._
    val prop = Prop.forAll(eventsGen) { events =>
      val df = events.toDF("user_id", "sec", "event_id")
        .withColumn("ts", org.apache.spark.sql.functions
          .timestamp_seconds(org.apache.spark.sql.functions.col("sec")))
      val got = Sessionize.assignSessions(df, "user_id", "ts", "event_id", GapSec)
        .select("user_id", "event_id", "session_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = events.groupBy(_._1).flatMap { case (_, evs) =>
        val ordered = evs.sortBy(e => (e._2, e._3)) // (ts, tie) order
        var sid = 0L
        var prevTs = Long.MinValue
        ordered.map { case (u, t, id) =>
          if (prevTs == Long.MinValue || t - prevTs > GapSec) sid += 1
          prevTs = t
          (u, id) -> sid
        }
      }.toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("interval-pair join equals the naive quadratic scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val WindowSec = 60L
    val prop = Prop.forAll(eventsGen) { events =>
      val e = events.toDF("user_id", "sec", "event_id")
      val l = e.select($"user_id", $"sec".as("l_sec"), $"event_id".as("l_id"))
      val r = e.select($"user_id".as("r_user"), $"sec".as("r_sec"),
        $"event_id".as("r_id"))
      // the q56 shape: same user, r in [l - W, l), distinct events
      val got = l.join(r, $"user_id" === $"r_user" && $"l_id" =!= $"r_id" &&
          $"r_sec" >= $"l_sec" - WindowSec && $"r_sec" < $"l_sec")
        .select($"l_id", $"r_id")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = (for {
        (ul, tl, il) <- events
        (ur, tr, ir) <- events
        if ul == ur && il != ir && tr >= tl - WindowSec && tr < tl
      } yield (il, ir)).toSet
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
