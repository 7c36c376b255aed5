package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sessions

class SessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(id: Long, user: Long, sec: Long, v: Double) =
    (id, user, new java.sql.Timestamp(sec * 1000L), v)

  // user 1: events at 0s, 10s, 2000s (gap 1990 >= 1800 -> new session), 2100s
  // user 2: single event
  private def events = Seq(
    ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0),
    ev(3, 1, 2000, 3.0), ev(4, 1, 2100, 4.5),
    ev(5, 2, 50, 7.25)
  ).toDF("event_id", "user_id", "ts", "value")

  test("sessionize: gap >= threshold opens a new session") {
    val got = Sessions.sessionize(events, "user_id", "ts", 1800L, "event_id")
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: gap exactly at threshold starts a new session") {
    val df = Seq(ev(1, 9, 0, 0.0), ev(2, 9, 1800, 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Sessions.sessionize(df, "user_id", "ts", 1800L, "event_id")
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("sessionStats: bounds, counts, cents sums per session") {
    val got = Sessions.sessionStats(events, "user_id", "ts", 1800L,
        "event_id", "value")
      .orderBy("user_id", "session_seq")
      .select($"user_id", $"session_seq", $"n_events", $"start_us",
        $"end_us", $"value_cents", $"duration_us")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 0L, 10000000L, 300L, 10000000L),
      (1L, 2L, 2L, 2000000000L, 2100000000L, 750L, 100000000L),
      (2L, 1L, 1L, 50000000L, 50000000L, 725L, 0L)))
  }

  test("resampleFfill: holes forward-fill, grid spans per key only") {
    // user 1 observed in buckets 0,0,2 (step 1000s): bucket 1 must be
    // filled with bucket 0's LAST value; user 2 has a single-bucket grid.
    val got = Sessions.resampleFfill(events, "user_id", "ts", "value",
        1000L, "event_id")
      .orderBy("user_id", "bucket_us")
      .select($"user_id", $"bucket_us", $"value_cents", $"filled")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 200L, false),             // last obs in bucket 0 is event 2
      (1L, 1000000000L, 200L, true),     // hole -> forward-filled
      (1L, 2000000000L, 450L, false),    // last obs in bucket 2 is event 4
      (2L, 0L, 725L, false)))
  }

  test("rollingMean: trailing frame, partial head windows, per key only") {
    val grid = Seq(
      (1L, 0L, 100L, false), (1L, 1000L, 200L, true),
      (1L, 2000L, 300L, false), (1L, 3000L, 400L, false),
      (2L, 0L, 50L, false)
    ).toDF("user_id", "bucket_us", "value_cents", "filled")
    val got = Sessions.rollingMean(grid, "user_id", 2)
      .orderBy("user_id", "bucket_us")
      .select($"user_id", $"roll_sum_cents", $"roll_n", $"roll_mean6")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 100L, 1L, 1.0),  // head window is partial
      (1L, 300L, 2L, 1.5),
      (1L, 500L, 2L, 2.5),
      (1L, 700L, 2L, 3.5),
      (2L, 50L, 1L, 0.5))) // other keys never leak into the frame
  }

  test("resampleFfill: within-bucket election takes the last (ts, tie)") {
    val df = Seq(ev(1, 3, 100, 1.0), ev(2, 3, 100, 9.0), ev(3, 3, 50, 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Sessions.resampleFfill(df, "user_id", "ts", "value",
        1000L, "event_id")
      .select($"value_cents").as[Long].collect()
    assert(got.toSeq == Seq(900L)) // ts ties break by event_id desc
  }

  private def fev(id: Long, user: Long, sec: Long, et: String) =
    (id, user, new java.sql.Timestamp(sec * 1000L), et)

  test("funnel: strict ordering, stalls, out-of-order steps, full chain") {
    val df = Seq(
      // user 1: full chain in order
      fev(1, 1, 10, "view"), fev(2, 1, 20, "click"), fev(3, 1, 30, "buy"),
      // user 2: its only click is BEFORE the first view -> stalls at step 0
      fev(4, 2, 10, "click"), fev(5, 2, 20, "view"),
      // user 3: view then buy but never click -> stalls at step 1
      fev(6, 3, 10, "view"), fev(7, 3, 30, "buy"),
      // user 4: never views -> absent from output
      fev(8, 4, 10, "click"), fev(9, 4, 20, "buy"),
      // user 5: click at the SAME second as view (not strictly after),
      // a later click completes step 1
      fev(10, 5, 10, "view"), fev(11, 5, 10, "click"),
      fev(12, 5, 40, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessions.funnel(df, Seq("view", "click", "buy"))
      .orderBy("user_id").collect().map { r =>
        (r.getLong(0), r.getInt(4),
          Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      }
    assert(out.map(o => (o._1, o._2)).toSeq ==
      Seq((1L, 3), (2L, 1), (3L, 1), (5L, 2)), out.mkString(", "))
    // user 1 times: 10s, 20s, 30s in micros
    assert(out(0)._3 == Some(10000000L) && out(0)._4 == Some(20000000L) &&
      out(0)._5 == Some(30000000L))
    // user 5: the tied click is rejected, the 40s click counts
    assert(out(3)._4 == Some(40000000L))
  }

  test("funnel: earliest chain, not any chain — t1 is the FIRST click " +
    "after the FIRST view") {
    val df = Seq(
      fev(1, 7, 10, "view"), fev(2, 7, 50, "view"),
      fev(3, 7, 20, "click"), fev(4, 7, 60, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessions.funnel(df, Seq("view", "click"))
      .collect().head
    assert(out.getLong(1) == 10000000L && out.getLong(2) == 20000000L)
  }
}
