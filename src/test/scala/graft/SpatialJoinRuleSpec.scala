package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.functions.GeoSimplify

/** SpatialJoinRewrite: the naive `JOIN ON st_contains(...)` (a cartesian
  * in Catalyst's hands) must rewrite to the grid-bucketed equi-join +
  * JTS refine, produce identical results, and leave equi-joins and
  * hinted joins alone. */
class SpatialJoinRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtures() = {
    GeoSimplify.install(spark)
    // 400 points on a deterministic lattice; 20 small squares + (one test
    // adds an oversized continent square separately)
    val pts = (0 until 400).map { i =>
      (i.toLong, -170.0 + (i % 40) * 8.5 + 0.25, -75.0 + (i / 40) * 15.5 + 0.5)
    }.toDF("pid", "x", "y").select(col("pid"), st_point(col("x"), col("y")).as("pgeom"))
    val polys = (0 until 20).map { k =>
      (k.toLong, -170.0 + (k % 10) * 30.0, -70.0 + (k / 10) * 60.0)
    }.toDF("polyid", "cx", "cy")
      .select(col("polyid"), st_make_square(col("cx"), col("cy"), lit(12.0)).as("ggeom"))
    (pts, polys)
  }

  private def naive(pts: org.apache.spark.sql.DataFrame,
      polys: org.apache.spark.sql.DataFrame) =
    pts.join(polys, st_contains(col("ggeom"), col("pgeom")))
      .select(col("pid"), col("polyid"))

  test("rewrites the contains join to an equi-join, results identical") {
    val (pts, polys) = fixtures()
    val expected = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      naive(pts, polys).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    val got = naive(pts, polys)
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"still cartesian:\n$p")
    assert(p.contains("__graft_cell"), s"no cell equi-join:\n$p")
    // the coarse fallback exists but broadcasts an (empty-here) filtered side
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(expected.nonEmpty, "fixture must produce containment pairs")
  }

  test("oversized polygons survive via the broadcast coarse branch") {
    val (pts, _) = fixtures()
    // a 160-degree square covers far more than 4096 res-10 cells → its
    // covering is empty and only the coarse branch can produce its pairs
    val continent = Seq((99L, 0.0, 0.0)).toDF("polyid", "cx", "cy")
      .select(col("polyid"), st_make_square(col("cx"), col("cy"), lit(160.0)).as("ggeom"))
    val got = naive(pts, continent)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      naive(pts, continent).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    assert(got == expected, "oversized branch must not lose pairs")
    assert(got.nonEmpty, "the continent square should contain many points")
  }

  test("contains works with the polygon side on the left too") {
    val (pts, polys) = fixtures()
    val swapped = polys.join(pts, st_contains(col("ggeom"), col("pgeom")))
      .select(col("pid"), col("polyid"))
    val p = swapped.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"still cartesian:\n$p")
    val expected = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      naive(pts, polys).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    assert(swapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("joins with an equality conjunct are left alone") {
    val (pts, polys) = fixtures()
    val withKey = pts.withColumn("k", col("pid") % 20)
    val polyKey = polys.withColumn("k2", col("polyid"))
    val j = withKey.join(polyKey,
      col("k") === col("k2") && st_contains(col("ggeom"), col("pgeom")))
    val p = j.queryExecution.optimizedPlan.toString
    assert(!p.contains("__graft_cell"), s"equi-join was rewritten:\n$p")
    // and it still evaluates correctly
    assert(j.count() >= 0)
  }

  test("residual predicates ride along the rewrite") {
    val (pts, polys) = fixtures()
    val j = pts.join(polys,
      st_contains(col("ggeom"), col("pgeom")) && col("pid") > col("polyid"))
      .select(col("pid"), col("polyid"))
    val expected = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      pts.join(polys,
          st_contains(col("ggeom"), col("pgeom")) && col("pid") > col("polyid"))
        .select(col("pid"), col("polyid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    assert(j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("disable flag restores the naive plan") {
    val (pts, polys) = fixtures()
    try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      val p = naive(pts, polys).queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_cell"))
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
  }
}
