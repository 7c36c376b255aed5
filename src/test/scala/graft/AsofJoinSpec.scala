package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // trades (left) and quotes (right): the canonical as-of fixture
  private def trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 50L),
    (4L, "B", 100L), (5L, "C", 10L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    (10L, "A", 90L, 1.0), (11L, "A", 100L, 2.0), (12L, "A", 200L, 3.0),
    (13L, "B", 100L, 4.0), (14L, "B", 100L, 5.0), (15L, "B", 300L, 6.0)
  ).toDF("quote_id", "sym", "qt", "px")

  private def run(direction: String = "backward", tol: Option[Long] = None) =
    AsofJoin.asofJoin(trades, quotes, on = Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("quote_id", "px"),
        tiebreak = Some("quote_id"), direction = direction, tolerance = tol)
      .select("trade_id", "asof_qt", "quote_id", "px")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap

  test("backward: latest right ≤ left time, inclusive, deterministic tiebreak") {
    val m = run()
    assert(m(1L) == (Some(100L), Some(11L), Some(2.0)), s"equal time matches: ${m(1L)}")
    assert(m(2L) == (Some(200L), Some(12L), Some(3.0)))
    assert(m(3L) == (None, None, None), "no quote before t=50")
    // two quotes at B/100: tiebreak picks the larger quote_id
    assert(m(4L) == (Some(100L), Some(14L), Some(5.0)), s"tiebreak: ${m(4L)}")
    assert(m(5L) == (None, None, None), "no quotes for sym C at all")
  }

  test("forward: earliest right ≥ left time") {
    val m = run(direction = "forward")
    assert(m(1L) == (Some(100L), Some(11L), Some(2.0)), "inclusive at equal time")
    assert(m(2L) == (None, None, None), "no quote after t=205")
    assert(m(3L) == (Some(90L), Some(10L), Some(1.0)))
    // forward tiebreak picks the SMALLER quote_id at equal time
    assert(m(4L) == (Some(100L), Some(13L), Some(4.0)), s"tiebreak: ${m(4L)}")
  }

  test("tolerance nulls out matches farther than the bound") {
    val m = run(tol = Some(5L))
    assert(m(1L) == (Some(100L), Some(11L), Some(2.0)), "dist 0 kept")
    assert(m(2L) == (Some(200L), Some(12L), Some(3.0)), "dist 5 kept")
    val m2 = run(tol = Some(4L))
    assert(m2(2L) == (None, None, None), "dist 5 > 4 nulled")
  }

  test("null payload fields stay row-coherent (struct carry)") {
    // the latest quote has a NULL px: a per-column last(ignoreNulls) would
    // steal px from the OLDER quote; the struct carry must keep the null
    val q = Seq((20L, "A", 90L, Some(9.0)), (21L, "A", 95L, None))
      .toDF("quote_id", "sym", "qt", "px")
    val out = AsofJoin.asofJoin(trades.filter($"trade_id" === 1), q,
        on = Seq("sym"), leftTime = "t", rightTime = "qt",
        payload = Seq("quote_id", "px"), tiebreak = Some("quote_id"))
      .select("quote_id", "px").collect().head
    assert(out.getLong(0) == 21L && out.isNullAt(1),
      s"must carry quote 21 with its null px, not quote 20's 9.0: $out")
  }

  test("plan is one shuffle + window — no join operator at all") {
    val p = AsofJoin.asofJoin(trades, quotes, on = Seq("sym"),
      leftTime = "t", rightTime = "qt", payload = Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), s"expected a window plan:\n$p")
  }

  test("allowExactMatches = false excludes equal-time rows (both directions)") {
    val strictBack = AsofJoin.asofJoin(trades, quotes, on = Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("quote_id"),
        tiebreak = Some("quote_id"), allowExactMatches = false)
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(strictBack(1L) == 10L, s"t=100 must skip qt=100, take qt=90: $strictBack")
    assert(strictBack(4L) == -1L, "B@100: only equal-time quotes exist → no match")
    val strictFwd = AsofJoin.asofJoin(trades, quotes, on = Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("quote_id"),
        tiebreak = Some("quote_id"), direction = "forward", allowExactMatches = false)
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(strictFwd(1L) == 12L, s"t=100 forward must skip qt=100, take qt=200: $strictFwd")
    assert(strictFwd(4L) == 15L, "B@100 forward: qt=300 is the first strict match")
  }

  test("randomized equivalence with an in-memory reference (seeded)") {
    // 400 trades / 600 quotes over 8 symbols with heavy time collisions
    // (times drawn from 0..50) — boundary and tie behavior under load
    val rnd = new scala.util.Random(20260812L)
    val syms = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val lt = (1 to 400).map(i => (i.toLong, syms(rnd.nextInt(8)), rnd.nextInt(50).toLong))
    val rt = (1 to 600).map(i => (i.toLong, syms(rnd.nextInt(8)), rnd.nextInt(50).toLong))
    val lDf = lt.toDF("trade_id", "sym", "t")
    val rDf = rt.toDF("quote_id", "sym", "qt")
    val got = AsofJoin.asofJoin(lDf, rDf, on = Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("quote_id"),
        tiebreak = Some("quote_id"))
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    lt.foreach { case (tid, sym, t) =>
      val cands = rt.filter(q => q._2 == sym && q._3 <= t)
      val want = if (cands.isEmpty) -1L
        else cands.maxBy(q => (q._3, q._1))._1 // latest time, then max id
      assert(got(tid) == want, s"trade $tid ($sym@$t): got ${got(tid)}, want $want")
    }
  }

  test("null timestamps: null-time left rows get no match; null-time right rows ignored") {
    val lt = Seq((1L, "A", Some(100L)), (2L, "A", Option.empty[Long]))
      .toDF("trade_id", "sym", "t")
    val rt = Seq((10L, "A", Some(90L), 1.0), (11L, "A", Option.empty[Long], 99.0),
      (12L, "A", Some(110L), 2.0)).toDF("quote_id", "sym", "qt", "px")
    for ((dir, want1) <- Seq("backward" -> 10L, "forward" -> 12L)) {
      val m = AsofJoin.asofJoin(lt, rt, on = Seq("sym"),
          leftTime = "t", rightTime = "qt", payload = Seq("quote_id", "px"),
          tiebreak = Some("quote_id"), direction = dir)
        .select("trade_id", "quote_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(m(2L) == -1L, s"$dir: null-time left row must not inherit a match: $m")
      assert(m(1L) == want1, s"$dir: null-time RIGHT row (quote 11) must be ignored: $m")
    }
  }

  test("rejects clashing payload names and bad direction") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("px", "sym2")
        .withColumnRenamed("sym2", "t"), // right now has a 't' column
        on = Seq("sym"), leftTime = "t", rightTime = "qt", payload = Seq("t"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes, on = Seq("sym"),
        leftTime = "t", rightTime = "qt", payload = Seq("px"), direction = "nearest")
    }
  }
}
