package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "u", 1000L), (2L, "u", 2000L), (3L, "v", 500L)
  ).toDF("lid", "k", "lt")

  private def right = Seq(
    (10L, "u", 900L), (11L, "u", 1000L), (12L, "u", 1100L),
    (13L, "u", 1999L), (14L, "v", 5000L)
  ).toDF("rid", "k", "rt")

  test("interval join matches brute force on window boundaries") {
    val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
        lower = -100L, upper = 0L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: r.rt in [l.lt-100, l.lt]
    val brute = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.rt" >= $"l.lt" - 100 && $"r.rt" <= $"l.lt")
      .select($"l.lid", $"r.rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"got=$got brute=$brute")
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)), s"expected boundary set: $got")
  }

  test("asymmetric and negative-time windows stay exact") {
    val l2 = Seq((1L, "u", -50L)).toDF("lid", "k", "lt")
    val r2 = Seq((10L, "u", -120L), (11L, "u", -49L), (12L, "u", 200L))
      .toDF("rid", "k", "rt")
    for ((lo, hi) <- Seq((-100L, 300L), (-71L, 249L), (0L, 251L))) {
      val got = RangeJoin.intervalJoin(l2, r2, Seq("k"), "lt", "rt", lo, hi)
        .select("rid").collect().map(_.getLong(0)).toSet
      val brute = r2.filter($"rt" >= -50L + lo && $"rt" <= -50L + hi)
        .select("rid").collect().map(_.getLong(0)).toSet
      assert(got == brute, s"window [$lo,$hi]: got=$got brute=$brute")
    }
  }

  test("plans an equality join — no nested-loop, no cartesian") {
    val p = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", -100L, 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"must not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not cross join:\n$p")
  }

  test("randomized equivalence with an in-memory reference (seeded)") {
    val rnd = new scala.util.Random(424242L)
    val lt = (1 to 300).map(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong - 500))
    val rt = (1 to 500).map(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong - 500))
    val lDf = lt.toDF("lid", "k", "lt")
    val rDf = rt.toDF("rid", "k", "rt")
    for ((lo, hi) <- Seq((-37L, 53L), (0L, 101L), (-250L, -3L))) {
      val got = RangeJoin.intervalJoin(lDf, rDf, Seq("k"), "lt", "rt", lo, hi)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (lid, lk, t) <- lt
        (rid, rk, u) <- rt
        if lk == rk && u >= t + lo && u <= t + hi
      } yield (lid, rid)).toSet
      assert(got == want,
        s"window [$lo,$hi]: missing=${want -- got}, extra=${got -- want}")
    }
  }

  test("nanosecond-scale epochs (beyond 2^53) bucket exactly — integral division") {
    // ~2026 in epoch NANOS is ~1.78e18 ≈ 2^60.6: double division would be
    // off by up to hundreds of buckets here and silently drop matches
    val base = 1786000000000000000L
    val l3 = Seq((1L, "u", base), (2L, "u", base + 3600L * 1000000000L))
      .toDF("lid", "k", "lt")
    val r3 = Seq((10L, "u", base - 1L), (11L, "u", base + 60L * 1000000000L),
      (12L, "u", base + 3601L * 1000000000L)).toDF("rid", "k", "rt")
    val w = 120L * 1000000000L // ±1-minute window in nanos
    val got = RangeJoin.intervalJoin(l3, r3, Seq("k"), "lt", "rt", -w / 2, w / 2)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 12L)), s"nano-epoch set: $got")
  }

  private def lIv = Seq(
    // (id, key, start, end) — boundary-touch, containment, disjoint cases
    (1L, "u", 100L, 200L), (2L, "u", 250L, 250L), (3L, "u", 900L, 1800L),
    (4L, "v", 0L, 50L)
  ).toDF("lid", "k", "ls", "le")

  private def rIv = Seq(
    (10L, "u", 200L, 300L),  // touches 1 at 200 exactly, overlaps 2
    (11L, "u", 50L, 99L),    // ends 1 short of 1 — must NOT match
    (12L, "u", 120L, 130L),  // contained in 1
    (13L, "u", 1000L, 1001L), // inside 3 (multi-bucket left interval)
    (14L, "v", 51L, 60L),    // 1 past 4's end — must NOT match
    (15L, "w", 0L, 10000L)   // key with no left rows
  ).toDF("rid", "k", "rs", "re")

  private def bruteOverlap = lIv.as("l").join(rIv.as("r"),
      $"l.k" === $"r.k" && $"r.rs" <= $"l.le" && $"l.ls" <= $"r.re")
    .select($"l.lid", $"r.rid").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapJoin matches brute force, exactly one copy per pair") {
    for (width <- Seq(10L, 100L, 1000L)) {
      val rows = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
          "ls", "le", "rs", "re", bucketWidth = width)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size,
        s"width=$width: first-shared-bucket dedup must emit each pair once: ${rows.toSeq}")
      assert(rows.toSet == bruteOverlap, s"width=$width: ${rows.toSet} vs $bruteOverlap")
    }
    assert(bruteOverlap == Set((1L, 10L), (2L, 10L), (1L, 12L), (3L, 13L)),
      s"fixture sanity: $bruteOverlap")
  }

  test("overlapJoin oversized intervals take the broadcast branch, same result") {
    // width 10 + maxBucketsPerRow 4 ⇒ any span ≥ 40 is oversized: lid=3
    // (span 900) and rid=15 (span 10000) must route through broadcast and
    // still produce exactly the brute-force pair set
    val got = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 10L, maxBucketsPerRow = 4)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, s"no duplicate pairs: ${got.toSeq}")
    assert(got.toSet == bruteOverlap, s"${got.toSet} vs $bruteOverlap")
  }

  test("overlapJoin drops null and inverted intervals") {
    val lBad = Seq((1L, "u", 100L, 200L)).toDF("lid", "k", "ls", "le")
      .unionByName(Seq(("x", 2L)).toDF("k", "lid")
        .select($"lid", $"k", lit(null).cast("long").as("ls"), lit(50L).as("le")))
      .unionByName(Seq((3L, "u", 300L, 250L)).toDF("lid", "k", "ls", "le"))
    val got = RangeJoin.overlapJoin(lBad, rIv, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 100L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 12L)), s"only the valid interval matches: $got")
  }

  test("overlapJoin plans equality joins — no nested-loop, no cartesian") {
    val p = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"must not nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not cross join:\n$p")
  }

  test("rejects empty keys, bad windows, clashing columns") {
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(left, right, Seq.empty, "lt", "rt", -1L, 1L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(left, right.withColumnRenamed("rt", "lt"),
        Seq("k"), "lt", "lt", -1L, 1L)
    }
  }
}
