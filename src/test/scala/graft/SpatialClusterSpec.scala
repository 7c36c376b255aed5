package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpatialCluster

/** DBSCAN semantics (PostGIS ST_ClusterDBSCAN contract): core = ≥minPts
  * inputs within eps INCLUDING itself; border joins the smallest-label
  * core neighbor; labels are the minimum core id; noise is null. */
class SpatialClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (Option[Long], Boolean)] =
    SpatialCluster.dbscan(pts.toDF("id", "x", "y"), eps, minPts)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2)))
      .toMap

  test("chain: middle point core, ends are border; noise isolated") {
    // 0 --0.4-- 1 --0.4-- 2, plus a far point 9. Only the middle point
    // has 3 neighbors (incl itself) → the cluster label is ITS id (the
    // minimum CORE id), not the minimum member id.
    val out = run(Seq((0L, 0.0, 0.0), (1L, 0.4, 0.0), (2L, 0.8, 0.0),
      (9L, 50.0, 50.0)), eps = 0.5, minPts = 3)
    assert(out(1L) == (Some(1L), true), out.toString)
    assert(out(0L) == (Some(1L), false), out.toString)
    assert(out(2L) == (Some(1L), false), out.toString)
    assert(out(9L) == (None, false), out.toString)
  }

  test("labels are the minimum CORE id; border takes the smallest " +
    "core-neighbor label; boundary-exact eps distances count") {
    // two cores 10 and 20 exactly 1.0 apart; border 15 sits EXACTLY eps
    // (0.5) from both — within per the <= contract — and must take the
    // smaller cluster label
    val pts = Seq(
      (10L, 0.0, 0.0), (11L, 0.0, 0.3), (12L, 0.0, -0.3),
      (20L, 1.0, 0.0), (21L, 1.3, 0.0), (22L, 1.0, 0.3),
      (15L, 0.5, 0.0)
    )
    val out = run(pts, eps = 0.5, minPts = 4)
    // counts incl self: 10 → {10,11,12,15}=4 core; 20 → {20,21,22,15}=4
    // core; 15 → {15,10,20}=3 border of both; satellites ≤3 border
    assert(out(10L) == (Some(10L), true))
    assert(out(20L) == (Some(20L), true))
    assert(out(11L)._1 == Some(10L) && !out(11L)._2)
    assert(out(12L)._1 == Some(10L) && !out(12L)._2)
    assert(out(21L)._1 == Some(20L) && !out(21L)._2)
    assert(out(22L)._1 == Some(20L) && !out(22L)._2)
    assert(out(15L)._1 == Some(10L) && !out(15L)._2,
      s"shared border must take the smaller label: ${out(15L)}")
  }

  test("minPts=1: every point is core; clusters are eps-components") {
    val out = run(Seq((1L, 0.0, 0.0), (2L, 0.4, 0.0), (3L, 10.0, 0.0)),
      eps = 0.5, minPts = 1)
    assert(out(1L) == (Some(1L), true))
    assert(out(2L) == (Some(1L), true))
    assert(out(3L) == (Some(3L), true), "isolated core forms a singleton")
  }

  test("duplicate coordinates count as neighbors (GPS-pile collapse)") {
    val pts = (0L until 5L).map(i => (i, 1.0, 2.0)) :+ (99L, 30.0, 30.0)
    val out = run(pts, eps = 0.1, minPts = 5)
    (0L until 5L).foreach(i => assert(out(i) == (Some(0L), true)))
    assert(out(99L) == (None, false), "lone point is noise")
  }

  private def runKm(pts: Seq[(Long, Double, Double)], k: Int,
      iters: Int): Map[Long, Long] =
    SpatialCluster.kmeans(pts.toDF("id", "x", "y"), k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kmeans: two blobs, seeds are the two smallest ids, labels stable") {
    val blobA = Seq((0L, 0.0, 0.0), (2L, 1.0, 0.0), (4L, 0.0, 1.0))
    val blobB = Seq((1L, 100.0, 100.0), (3L, 101.0, 100.0), (5L, 100.0, 101.0))
    val out = runKm(blobA ++ blobB, k = 2, iters = 2)
    blobA.foreach { case (id, _, _) => assert(out(id) == 0L, out.toString) }
    blobB.foreach { case (id, _, _) => assert(out(id) == 1L, out.toString) }
  }

  test("kmeans: equidistant point joins the smaller centroid id") {
    // seeds 0@(0,0) and 1@(2,0); point 7@(1,0) is exactly between and
    // must join cluster 0 every run
    val out = runKm(Seq((0L, 0.0, 0.0), (1L, 2.0, 0.0), (7L, 1.0, 0.0)),
      k = 2, iters = 0)
    assert(out(7L) == 0L, out.toString)
  }

  test("kmeans: empty cluster keeps its previous centroid") {
    // coincident seeds: every point ties to cid 0 in round 1, cluster 1
    // goes empty and must KEEP (0,0); after c0 moves to the mean (1/3,0),
    // point 0 at (0,0) flips to the parked centroid 1
    val out = runKm(Seq((0L, 0.0, 0.0), (1L, 0.0, 0.0), (2L, 1.0, 0.0)),
      k = 2, iters = 1)
    assert(out(0L) == 1L, out.toString)
    assert(out(1L) == 1L, out.toString)
    assert(out(2L) == 0L, out.toString)
  }

  test("kmeans: iters=0 labels directly against the seeds") {
    val out = runKm(Seq((5L, 0.0, 0.0), (6L, 10.0, 0.0), (9L, 9.0, 0.0)),
      k = 2, iters = 0)
    assert(out == Map(5L -> 5L, 6L -> 6L, 9L -> 6L), out.toString)
  }

  test("dbscan: null/NaN coordinates are noise, never dropped, never co-clustered") {
    val pts = Seq(
      (1L, Some(0.0), Some(0.0)), (2L, Some(0.1), Some(0.0)),
      (3L, Some(0.2), Some(0.0)), (4L, Some(0.3), Some(0.0)),
      // four null-coordinate rows — enough to fake a core if they
      // wrongly co-clustered through the groupBy null bucket
      (5L, None, Some(1.0)), (6L, None, Some(1.0)),
      (7L, Some(1.0), None), (8L, None, None)
    )
    val df = pts.map { case (id, x, y) =>
      (id, x.map(Double.box).orNull, y.map(Double.box).orNull)
    }.toDF("id", "x", "y")
      .selectExpr("id", "CAST(x AS DOUBLE) x", "CAST(y AS DOUBLE) y")
    val out = SpatialCluster.dbscan(df, eps = 0.5, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2)))
      .toMap
    assert(out.size == 8, s"every input row must come back: $out")
    assert((5L to 8L).forall(i => out(i) == (None, false)),
      s"null-coordinate rows must be noise: $out")
    assert((1L to 4L).forall(i => out(i)._1 == Some(1L)), out.toString)
    // NaN coordinates likewise
    val nan = SpatialCluster.dbscan(
      Seq((1L, 0.0, 0.0), (2L, Double.NaN, 0.0)).toDF("id", "x", "y"),
      eps = 0.5, minPts = 1).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(nan(2L).isEmpty && nan(1L).nonEmpty, nan.toString)
  }

  test("kmeans: null/NaN coordinates get a null cluster and never move centroids") {
    val df = Seq((1L, "0.0", "0.0"), (2L, "4.0", "0.0"),
      (3L, null, "0.0"), (4L, "NaN", "1.0"))
      .toDF("id", "xs", "ys")
      .selectExpr("id", "CAST(xs AS DOUBLE) x", "CAST(ys AS DOUBLE) y")
    val out = SpatialCluster.kmeans(df, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out.size == 4)
    assert(out(3L).isEmpty && out(4L).isEmpty, out.toString)
    assert(out(1L) == Some(1L) && out(2L) == Some(2L), out.toString)
  }

  test("eps-chained cores merge transitively into one cluster") {
    // cores at 0, 0.4, 0.8, 1.2 — consecutive within eps, ends not
    val pts = (0 until 4).flatMap { i =>
      val x = i * 0.4
      // each core gets 3 coincident satellites so everyone is core
      (0 until 4).map(j => (i * 10L + j, x, 0.0))
    }
    val out = run(pts, eps = 0.5, minPts = 4)
    assert(out.values.forall(_._2), "all points must be core")
    assert(out.values.map(_._1).toSet == Set(Some(0L)),
      s"one transitive cluster expected: $out")
  }
}
