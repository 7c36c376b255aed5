package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** Count-min sketch: over-count invariant, exactness when buckets are
  * uncontended, bounded table size, absent-key behavior. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("estimates over-count, never under; skewed keys are near-exact") {
    // zipf-ish stream: key k appears 2^(10-k) times, k in 1..10
    val rows = (1 to 10).flatMap(k => Seq.fill(1 << (10 - k))(s"key$k"))
    val df = rows.toDF("k")
    val tab = Sketch.countMinTable(df, "k", d = 4, hexChars = 3)
    val trueCnt = rows.groupBy(identity).map { case (k, v) => k -> v.size }
    val est = Sketch.countMinEstimate(tab,
      trueCnt.keys.toSeq.toDF("k"), "k", d = 4, hexChars = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trueCnt.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k under-counted: ${est(k)} < $t")
      // 4096 buckets for 10 keys: collisions essentially impossible on
      // all 4 rows at once — estimates are exact here
      assert(est(k) == t, s"$k over-counted in an uncontended sketch")
    }
  }

  test("table size is bounded by d*w regardless of key cardinality") {
    val df = (0 until 20000).map(i => s"k$i").toDF("k")
    val tab = Sketch.countMinTable(df, "k", d = 2, hexChars = 2)
    assert(tab.count() <= 2 * 256)
    // 20k keys in 256 buckets: totals conserved across each row i
    val sums = tab.groupBy("i").agg(sum("cnt").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ == 20000L))
  }

  test("absent keys estimate from collision mass only (possibly zero)") {
    val tab = Sketch.countMinTable(Seq("a", "a", "b").toDF("k"), "k")
    val est = Sketch.countMinEstimate(tab, Seq("zzz-never-seen").toDF("k"), "k")
      .collect().head.getLong(1)
    assert(est >= 0L && est <= 3L)
  }

  test("hll: estimate within 10% on 10k distinct keys, multiset-invariant") {
    val keys = (0 until 10000).map(i => s"key-$i")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(keys.toDF("k"), "k"))
      .collect().head.getDouble(2)
    assert(math.abs(est - 10000) / 10000 < 0.10, s"est=$est")
    // duplicates never move a register (MAX absorbs them)
    val est2 = Sketch.hllEstimate(
      Sketch.hllRegisters((keys ++ keys ++ keys.take(100)).toDF("k"), "k"))
      .collect().head.getDouble(2)
    assert(est2 == est)
  }

  test("hll: register tables merge by union+MAX to the union sketch") {
    val a = (0 until 3000).map(i => s"a-$i")
    val b = (1500 until 4500).map(i => s"a-$i") // overlaps a
    val whole = Sketch.hllRegisters((a ++ b).toDF("k"), "k")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = Sketch.hllRegisters(a.toDF("k"), "k")
      .unionByName(Sketch.hllRegisters(b.toDF("k"), "k"))
      .groupBy("reg").agg(max("mx").as("mx"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == whole)
  }

  test("hll grouped: per-group estimates match per-group solo sketches") {
    val rows = (0 until 2000).map(i => (s"g${i % 3}", s"k-${i % 700}"))
    val byG = Sketch.hllEstimateBy(
      Sketch.hllRegistersBy(rows.toDF("g", "k"), "g", "k"), "g")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byG.keySet == Set("g0", "g1", "g2"))
    // each group alone must estimate identically to the grouped path
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketch.hllEstimate(Sketch.hllRegisters(
        rows.filter(_._1 == g).map(_._2).toDF("k"), "k"))
        .collect().head.getDouble(2)
      assert(byG(g) == solo, s"group $g: ${byG(g)} vs solo $solo")
    }
    // small groups take the linear-counting branch and stay accurate
    val tiny = Sketch.hllEstimateBy(Sketch.hllRegistersBy(
      Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "k"), "g", "k"), "g")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(tiny("a") - 2.0) < 0.1 && math.abs(tiny("b") - 1.0) < 0.1)
  }

  test("hll: small-range correction — tiny and empty sets stay sane") {
    val est3 = Sketch.hllEstimate(
      Sketch.hllRegisters(Seq("x", "y", "z", "x").toDF("k"), "k"))
      .collect().head
    assert(est3.getLong(0) == 3) // 3 touched registers
    assert(math.abs(est3.getDouble(2) - 3.0) < 0.1) // linear counting regime
    val empty = Sketch.hllEstimate(
      Sketch.hllRegisters(Seq.empty[String].toDF("k"), "k"))
      .collect().head
    assert(empty.getLong(0) == 0 && empty.getDouble(2) == 0.0)
  }

  test("theta: non-full sketch is the exact distinct set; full sketch " +
      "estimates within 15% of 20k distinct") {
    val small = (0 until 100).map(i => s"s$i").toDF("k")
    val skS = Sketch.thetaSketch(small.union(small), "k", k = 256)
    assert(skS.count() == 100) // duplicates collapse, set not truncated
    val eS = Sketch.thetaEstimate(skS, 256).collect().head
    assert(eS.getLong(0) == 100 && eS.getDouble(2) == 100.0)
    // full regime: 20k distinct through a k=1024 sketch
    val big = (0 until 20000).map(i => s"key-$i").toDF("k")
      .repartition(8) // sketch must not depend on partitioning
    val sk = Sketch.thetaSketch(big, "k", k = 1024)
    assert(sk.count() == 1024)
    val e = Sketch.thetaEstimate(sk, 1024).collect().head.getDouble(2)
    assert(math.abs(e - 20000) / 20000 < 0.15, s"theta est off: $e")
  }

  test("theta: sketch is partitioning-invariant and union-mergeable") {
    val rows = (0 until 5000).map(i => s"u$i")
    val a1 = Sketch.thetaSketch(rows.toDF("k").repartition(2), "k", 512)
      .collect().map(_.getLong(0)).toSeq
    val a2 = Sketch.thetaSketch(rows.toDF("k").repartition(13), "k", 512)
      .collect().map(_.getLong(0)).toSeq
    assert(a1 == a2, "sketch must be independent of partitioning")
    // union(sketch(A), sketch(B)) == sketch(A ∪ B)
    val xs = (0 until 3000).map(i => s"u$i").toDF("k")
    val ys = (1500 until 5000).map(i => s"u$i").toDF("k")
    val merged = Sketch.thetaUnion(
      Sketch.thetaSketch(xs, "k", 512), Sketch.thetaSketch(ys, "k", 512), 512)
      .collect().map(_.getLong(0)).toSeq
    assert(merged == a1, "merged sketch must equal the whole-set sketch")
  }

  test("theta: intersection estimate recovers a planted overlap") {
    // |A| = 6000, |B| = 6000, |A ∩ B| = 3000
    val a = (0 until 6000).map(i => s"d$i").toDF("k")
    val b = (3000 until 9000).map(i => s"d$i").toDF("k")
    val skA = Sketch.thetaSketch(a, "k", 1024)
    val skB = Sketch.thetaSketch(b, "k", 1024)
    val est = Sketch.thetaIntersectEstimate(skA, skB, 1024)
      .collect().head.getDouble(2)
    assert(math.abs(est - 3000) / 3000 < 0.25, s"intersect est off: $est")
    // disjoint sets estimate (near) zero
    val skC = Sketch.thetaSketch(
      (0 until 6000).map(i => s"z$i").toDF("k"), "k", 1024)
    val zero = Sketch.thetaIntersectEstimate(skA, skC, 1024)
      .collect().head.getDouble(2)
    assert(zero < 150.0, s"disjoint estimate should be ~0: $zero")
  }

  test("bloom: no false negatives; false-positive rate near theory; " +
      "bitmap probe agrees with the table") {
    val present = (0 until 2000).map(i => s"in$i")
    val tab = Sketch.bloomTable(present.toDF("k"), "k", d = 3, hexChars = 4)
    assert(tab.count() <= 3 * 65536)
    val bitmaps = Sketch.bloomBitmaps(tab, d = 3, hexChars = 4)
    assert(bitmaps.length == 3 && bitmaps.forall(_.length == 16384))
    val probe = (present ++ (0 until 2000).map(i => s"out$i")).toDF("k")
      .withColumn("hit", Sketch.bloomMightContain("k", bitmaps, 4))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    present.foreach(k => assert(probe(k), s"false negative on $k"))
    val fp = (0 until 2000).map(i => s"out$i").count(probe)
    // (1 - e^(-3*2000/65536))^3 ≈ 6.3e-4 → expect ~1.3 fps in 2000
    assert(fp <= 20, s"false-positive rate too high: $fp / 2000")
  }

  test("heavy hitters: exact set and counts on a zipf stream where " +
    "cardinality crushes the counter budget") {
    // 20k distinct tail keys (one occurrence each) + 12 planted heavies:
    // heavy h appears 300 + 20*h times. k = 64 counters << 20k distinct,
    // so the Misra-Gries decrement path is exercised hard; N ≈ 23.9k,
    // N/(k+1) ≈ 368 — threshold 400 honours the bound.
    val heavies = (0 until 12).flatMap(h =>
      Seq.fill(300 + 20 * h)(s"hot$h"))
    val tail = (0 until 20000).map(i => s"tail$i")
    // interleave deterministically so heavies aren't clumped in one split
    val rows = new scala.util.Random(7).shuffle(heavies ++ tail)
    val df = rows.toDF("k").repartition(8)
    val got = Sketch.heavyHitters(df, "k", threshold = 400L, k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = (0 until 12).map(h => s"hot$h" -> (300L + 20 * h))
      .filter(_._2 >= 400L).toMap
    assert(got == expect, s"got $got expected $expect")
  }

  test("heavy hitters: threshold below the N/(k+1) bound fails loudly") {
    val df = (0 until 5000).map(i => s"k${i % 50}").toDF("k")
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(df, "k", threshold = 10L, k = 16)
    }
  }

  test("heavy hitters: null keys are ignored, not counted or crashed on") {
    val df = (0 until 600).map(i =>
      if (i % 3 == 0) null else "hot").toDF("k")
    val got = Sketch.heavyHitters(df, "k", threshold = 100L, k = 8)
      .collect()
    assert(got.length == 1 && got(0).getString(0) == "hot" &&
      got(0).getLong(1) == 400L)
  }
}
