package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KnnJoin

/** Exact-KNN contract: a probe resolves only once ≥ k true-distance
  * candidates are in hand (or the whole right side is), ranks break ties
  * by (distance, rid), and radius doubling never changes the answer —
  * only how many rounds it takes. */
class KnnJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Double, Double)],
      right: Seq[(Long, Double, Double)], k: Int, r0: Double)
      : Map[(Long, Int), (Long, Double)] =
    KnnJoin.knnJoin(left.toDF("id", "x", "y"),
        right.toDF("id", "x", "y"), k, r0)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def brute(left: Seq[(Long, Double, Double)],
      right: Seq[(Long, Double, Double)], k: Int)
      : Map[(Long, Int), (Long, Double)] =
    left.flatMap { case (lid, x, y) =>
      right.map { case (rid, rx, ry) =>
        (rid, math.sqrt((x - rx) * (x - rx) + (y - ry) * (y - ry)))
      }.sortBy { case (rid, d) => (d, rid) }
        .take(k).zipWithIndex
        .map { case ((rid, d), i) => (lid, i + 1) -> (rid, d) }
    }.toMap

  test("line of probes against line of sites, self included, k=2") {
    val pts = Seq((0L, 0.0, 0.0), (1L, 1.0, 0.0), (2L, 3.0, 0.0))
    val out = run(pts, pts, k = 2, r0 = 1.5)
    assert(out == brute(pts, pts, 2), out.toString)
    assert(out((0L, 1)) == ((0L, 0.0)))
    assert(out((2L, 2)) == ((1L, 2.0)))
  }

  test("equidistant sites: smaller rid wins the rank") {
    val probes = Seq((0L, 0.0, 0.0))
    val sites = Seq((7L, 1.0, 0.0), (3L, -1.0, 0.0), (9L, 0.0, 1.0))
    val out = run(probes, sites, k = 2, r0 = 2.0)
    assert(out((0L, 1)) == ((3L, 1.0)), out.toString)
    assert(out((0L, 2)) == ((7L, 1.0)), out.toString)
  }

  test("k larger than the right side returns every site, loop terminates") {
    val probes = Seq((0L, 0.0, 0.0), (1L, 100.0, 100.0))
    val sites = Seq((5L, 1.0, 0.0), (6L, 2.0, 0.0))
    val out = run(probes, sites, k = 10, r0 = 0.5)
    assert(out == brute(probes, sites, 10), out.toString)
    assert(out.count { case ((lid, _), _) => lid == 1L } == 2)
  }

  test("straggler doubles alone: dense cluster resolves round 1, far probe later") {
    val sites = (0L until 20L).map(i => (i, (i % 5) * 0.1, (i / 5) * 0.1))
    val probes = Seq((100L, 0.2, 0.2), (101L, 500.0, 500.0))
    val out = run(probes, sites, k = 3, r0 = 0.3)
    assert(out == brute(probes, sites, 3), out.toString)
  }

  test("tiny r0 (many doublings) matches a generous r0 and brute force") {
    val pts = (0L until 30L).map(i =>
      (i, (i * 7 % 13).toDouble, (i * 5 % 11).toDouble))
    val a = run(pts, pts, k = 4, r0 = 0.001)
    val b = run(pts, pts, k = 4, r0 = 50.0)
    assert(a == b)
    assert(a == brute(pts, pts, 4))
  }

  test("empty right side yields empty result, not a hang") {
    val out = KnnJoin.knnJoin(
      Seq((0L, 0.0, 0.0)).toDF("id", "x", "y"),
      spark.emptyDataset[(Long, Double, Double)].toDF("id", "x", "y"),
      k = 3, r0 = 1.0)
    assert(out.count() == 0)
  }
}
