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

  test("anomalyZScore: preceding-only baseline, min-obs and zero-variance nulls") {
    // user 1: nine 10.00s then one 50.00 — the spike's baseline is the
    // nine 10s (zero variance → null z!), so plant variance: alternate
    // 10.00/12.00; user 2: only 3 events (under minBaseline → null)
    val rows =
      (0 until 9).map(i =>
        ev(i.toLong, 1L, i * 60L, if (i % 2 == 0) 10.0 else 12.0)) ++
      Seq(ev(9L, 1L, 540L, 50.0)) ++
      (0 until 3).map(i => ev(100L + i, 2L, i * 60L, 10.0 + i))
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val out = Sessions.anomalyZScore(df, "user_id", "ts", "value",
      baselineRows = 24, minBaseline = 8, zThreshold = 3.0)
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("baseline_n"), Option(r.getAs[Any]("z6")),
        Option(r.getAs[Any]("is_anomaly"))))
    // first 8 events of user 1: baseline < 8 → null
    assert(out.take(8).forall(o => o._4.isEmpty && o._5.isEmpty))
    // 9th event (id 8): baseline n=8, alternating 10/12 → variance > 0,
    // value 10 is in-band
    val ninth = out(8)
    assert(ninth._3 == 8L && ninth._4.nonEmpty &&
      ninth._5 == Some(false), ninth.toString)
    // the spike: baseline the 9 alternating values, z far above 3
    val spike = out(9)
    assert(spike._3 == 9L &&
      spike._4.exists(_.asInstanceOf[Double] > 3.0) &&
      spike._5 == Some(true), spike.toString)
    // user 2: 3 events, all under minBaseline
    assert(out.drop(10).forall(o => o._4.isEmpty))
  }

  test("anomalyZScore: zero-variance baseline yields null, not infinity") {
    val rows = (0 until 10).map(i => ev(i.toLong, 1L, i * 60L, 10.0)) :+
      ev(10L, 1L, 600L, 99.0)
    val out = Sessions.anomalyZScore(rows.toDF("event_id", "user_id",
      "ts", "value"), "user_id", "ts", "value")
      .orderBy("event_id").collect()
    // the spike's baseline is ten constant 10s → variance 0 → null z
    assert(out.last.isNullAt(out.last.fieldIndex("z6")))
  }

  test("intervalIslands: overlap merges, touch merges, gap splits") {
    val iv = Seq(
      // user 1: [0,10] [5,20] [20,30] one island; [40,50] another
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      // user 2: containment — [0,100] swallows [10,20] and [30,40]
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L),
      // user 3: single interval
      (3L, 7L, 9L)
    ).toDF("user_id", "s_us", "e_us")
    val out = Sessions.intervalIslands(iv, "user_id", "s_us", "e_us")
      .orderBy("user_id", "island_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L),
      (2L, 0L, 100L, 3L),
      (3L, 7L, 9L, 1L)))
  }

  test("cohortRetention: hand-checked matrix; offset 0 is the cohort size") {
    def e(id: Long, user: Long, week: Long) =
      (id, user, new java.sql.Timestamp(week * 604800000L), 1.0)
    // users 1,2 cohort week 0 (1 returns at w1 and w2, 2 only at w2);
    // user 3 cohort week 1, never returns; duplicate events collapse
    val df = Seq(e(1, 1, 0), e(2, 2, 0), e(3, 1, 1), e(4, 1, 2),
      e(5, 2, 2), e(6, 3, 1), e(7, 3, 1))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Sessions.cohortRetention(df)
      .orderBy("cohort_b", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 1L)), out.toSeq.toString)
    // plan: no window, no nested loop; the join is keyed on the user
    val p = Sessions.cohortRetention(df)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("BroadcastNestedLoopJoin"),
      s"cohort plan:\n$p")
  }

  test("intervalIslands matches a brute-force union on seeded random intervals") {
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { trial =>
      val iv = (1 to 60).map { _ =>
        val k = rnd.nextInt(3).toLong
        val s = rnd.nextInt(100).toLong
        (k, s, s + rnd.nextInt(12).toLong)
      }
      // reference: per key, sort and sweep
      val expected = iv.groupBy(_._1).flatMap { case (k, xs) =>
        val sorted = xs.map(x => (x._2, x._3)).sortBy(identity)
        val islands = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)] // (start, end, n)
        sorted.foreach { case (s, e) =>
          if (islands.nonEmpty && s <= islands.last._2) {
            val (ps, pe, pn) = islands.last
            islands(islands.size - 1) = (ps, math.max(pe, e), pn + 1)
          } else islands += ((s, e, 1L))
        }
        islands.map(i => (k, i._1, i._2, i._3))
      }.toSet
      val got = Sessions.intervalIslands(
          iv.toDF("k", "s", "e"), "k", "s", "e")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"trial $trial:\n${
        (expected -- got).toSeq.sorted} missing\n${
        (got -- expected).toSeq.sorted} extra")
    }
  }

  test("intervalIslands: an early long interval isn't escaped by a short successor") {
    // [0,100] then [10,20] then [90,110]: the running MAX end keeps the
    // island open past the short interval's end — naive lag(e) splits it
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 90L, 110L))
      .toDF("k", "s", "e")
    val out = Sessions.intervalIslands(iv, "k", "s", "e").collect()
    assert(out.length == 1 && out.head.getLong(1) == 0L &&
      out.head.getLong(2) == 110L)
  }
}
