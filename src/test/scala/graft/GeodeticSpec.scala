package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomLib
import graft.operators.{KnnJoin, SpatialJoin}

/** Geodetic distance contract: the lat-band grid join must equal the
  * brute-force haversine inequality join at every latitude — high-lat
  * bands (stretched lon cells), polar whole-ring bands, and
  * anti-meridian wrap pairs included — and the geodetic KNN must rank by
  * true great-circle meters. */
class GeodeticSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deliberately hostile lattice: equator, mid-lats, the 85° ring
  // cutover, polar caps, and lons hugging the anti-meridian
  private val lats = Seq(-89.9, -88.0, -85.5, -84.0, -80.0, -46.0, -20.0,
    0.0, 21.0, 33.0, 46.0, 60.0, 76.0, 84.0, 85.5, 88.0)
  private val lons = Seq(-179.75, -170.0, -90.0, -1.0, 0.0, 1.0, 90.0,
    170.0, 179.75)
  private val pts: Seq[(Long, Double, Double)] =
    for ((la, i) <- lats.zipWithIndex; (lo, j) <- lons.zipWithIndex)
      yield ((i * 100 + j).toLong, lo, la)

  private def brutePairs(radius: Double): Set[(Long, Long)] =
    (for {
      (lid, lx, ly) <- pts
      (rid, rx, ry) <- pts
      if GeomLib.haversine(ly, lx, ry, rx) <= radius
    } yield (lid, rid)).toSet

  private def gridPairs(radius: Double): Seq[(Long, Long)] = {
    val l = pts.toDF("lid", "x", "y")
    val r = pts.toDF("rid", "rx", "ry")
    SpatialJoin.distanceJoinGeodetic(l, r, radius)
      .select("lid", "rid")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
  }

  test("grid join equals brute-force haversine at 250 km — no pair " +
    "lost, none duplicated (anti-meridian and polar rows included)") {
    val got = gridPairs(250000.0)
    val expected = brutePairs(250000.0)
    assert(got.size == got.distinct.size, "a pair was produced twice")
    assert(got.toSet == expected,
      s"missing=${(expected -- got.toSet).take(5)} " +
        s"spurious=${(got.toSet -- expected).take(5)}")
    // the fixture must actually exercise the hard branches
    val wrap = expected.exists { case (a, b) =>
      val (_, lo1, _) = pts(pts.indexWhere(_._1 == a))
      val (_, lo2, _) = pts(pts.indexWhere(_._1 == b))
      lo1 > 170 && lo2 < -170
    }
    assert(wrap, "no anti-meridian pair in the expected set")
    assert(expected.exists { case (a, _) => a >= 1400 },
      "no polar-band probe matched")
  }

  test("grid join equals brute force at 1000 km (multi-band reach)") {
    val got = gridPairs(1000000.0)
    assert(got.size == got.distinct.size)
    assert(got.toSet == brutePairs(1000000.0))
  }

  test("grid join equals brute force on seeded random points — global " +
    "scatter plus dense clusters at band edges and the seam") {
    val rnd = new scala.util.Random(20260815L)
    val centers = Seq((179.9, 84.9), (-179.95, -84.9), (0.0, 0.0),
      (139.7, 35.7), (5.0, 60.0))
    val rpts: Seq[(Long, Double, Double)] = (0 until 300).map { i =>
      if (i % 2 == 0) {
        val (cx, cy) = centers(i % centers.length)
        val lon0 = cx + (rnd.nextDouble() - 0.5) * 4.0
        val lon = if (lon0 > 180) lon0 - 360
                  else if (lon0 < -180) lon0 + 360 else lon0
        val lat = math.max(-89.95, math.min(89.95,
          cy + (rnd.nextDouble() - 0.5) * 4.0))
        (i.toLong, lon, lat)
      } else (i.toLong, rnd.nextDouble() * 360.0 - 180.0,
        rnd.nextDouble() * 179.8 - 89.9)
    }
    val l = rpts.toDF("lid", "x", "y")
    val r = rpts.toDF("rid", "rx", "ry")
    Seq(200000.0, 800000.0).foreach { radius =>
      val got = SpatialJoin.distanceJoinGeodetic(l, r, radius)
        .select("lid", "rid").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"dup pair at $radius")
      val expected = (for {
        (a, ax, ay) <- rpts; (b, bx, by) <- rpts
        if GeomLib.haversine(ay, ax, by, bx) <= radius
      } yield (a, b)).toSet
      assert(got.toSet == expected,
        s"radius $radius: missing=${(expected -- got.toSet).take(5)} " +
          s"spurious=${(got.toSet -- expected).take(5)}")
    }
  }

  test("geodetic KNN ranks by great-circle meters, ties by rid") {
    val sample = pts.filter(_._1 % 3 == 0)
    val df = sample.map { case (id, lo, la) => (id, lo, la) }
      .toDF("id", "x", "y")
    val got = KnnJoin.knnJoin(df, df, k = 3, r0 = 100000.0,
        geodetic = true)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val expected = sample.flatMap { case (lid, lx, ly) =>
      sample.map { case (rid, rx, ry) =>
        (rid, GeomLib.haversine(ly, lx, ry, rx))
      }.sortBy { case (rid, d) => (d, rid) }
        .take(3).zipWithIndex
        .map { case ((rid, d), i) => (lid, i + 1) -> (rid, d) }
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (key, (rid, d)) =>
      val (gotRid, gotD) = got(key)
      assert(gotRid == rid, s"$key: rid $gotRid != $rid")
      assert(math.abs(gotD - d) < 1e-6, s"$key: dist $gotD != $d")
    }
  }

  test("declarative st_dwithin_sphere join rewrites to the lat-band " +
    "equi-join; results equal the naive plan (anti-meridian included)") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    graft.functions.GeoSimplify.install(spark)
    val l = pts.toDF("lid", "lx", "ly")
      .select(col("lid"), st_point(col("lx"), col("ly")).as("lg"))
    val r = pts.filter(_._1 % 4 == 0).toDF("rid", "rx", "ry")
      .select(col("rid"), st_point(col("rx"), col("ry")).as("rg"))
    def q = l.join(r, st_dwithin_sphere(col("lg"), col("rg"),
      lit(250000.0))).select("lid", "rid")
    val expected = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      q.collect().map(row => (row.getLong(0), row.getLong(1))).toSeq.sorted
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    val got = q
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"still nested loop:\n$p")
    assert(got.collect().map(row => (row.getLong(0), row.getLong(1)))
      .toSeq.sorted == expected)
    assert(expected.nonEmpty)
    // semi/anti ride the value-based membership path
    def qs = l.join(r, st_dwithin_sphere(col("lg"), col("rg"),
      lit(250000.0)), "left_semi")
    val expSemi = try {
      spark.conf.set("spark.graft.spatialjoin.rewrite", "false")
      qs.collect().map(_.getLong(0)).toSeq.sorted
    } finally spark.conf.set("spark.graft.spatialjoin.rewrite", "true")
    assert(qs.collect().map(_.getLong(0)).toSeq.sorted == expSemi)
    // a continent-scale radius keeps the naive plan (band contract)
    val big = l.join(r, st_dwithin_sphere(col("lg"), col("rg"),
      lit(5000000.0)))
    assert(!big.queryExecution.optimizedPlan.toString.contains("__glat_l"),
      "over-wide radius must not rewrite")
    assert(big.count() > 0)
  }

  test("spherical measures: meridian length, equator-square area, holes " +
    "subtract from area and add to perimeter, areal length is 0") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    val oneDegM = GeomLib.EarthRadiusM * math.Pi / 180.0
    def wkt(s: String) = st_geomfromtext(lit(s))
    val row = spark.range(1).select(
      st_length_sphere(wkt("LINESTRING (10 20, 10 21)")).as("meridian"),
      st_area_sphere(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
        .as("eq_sq"),
      st_area_sphere(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), " +
        "(1 1, 2 1, 2 2, 1 2, 1 1))")).as("holed"),
      st_area_sphere(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
        .as("shell"),
      st_area_sphere(wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"))
        .as("hole"),
      st_perimeter_sphere(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), " +
        "(1 1, 2 1, 2 2, 1 2, 1 1))")).as("perimHoled"),
      st_perimeter_sphere(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
        .as("perimShell"),
      st_length_sphere(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
        .as("arealLen")).head()
    assert(math.abs(row.getDouble(0) - oneDegM) < 1e-4, s"meridian ${row.getDouble(0)}")
    // a 1°x1° equator square is ~oneDeg² to first order (< 0.01% off)
    assert(math.abs(row.getDouble(1) / (oneDegM * oneDegM) - 1.0) < 1e-4,
      s"equator square ${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - (row.getDouble(3) - row.getDouble(4)))
      < 1e-3, "hole must subtract exactly")
    assert(row.getDouble(5) > row.getDouble(6), "holes add to perimeter")
    assert(row.getDouble(7) == 0.0, "areal geometry has zero length")
  }

  test("st_distance_sphere: one degree of latitude is R*pi/180 meters; " +
    "nulls and broken WKB stay null") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    val df = Seq((0.0, 0.0, 0.0, 1.0)).toDF("ax", "ay", "bx", "by")
      .select(st_distance_sphere(
        st_point(col("ax"), col("ay")),
        st_point(col("bx"), col("by"))).as("d"))
    val d = df.head().getDouble(0)
    val oneDeg = GeomLib.EarthRadiusM * math.Pi / 180.0
    assert(math.abs(d - oneDeg) < 1e-4, s"$d != $oneDeg")
    // SQL-registered name too
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      """SELECT st_distance_sphere(st_point(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
                                   st_point(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS d""")
      .head().getDouble(0)
    assert(math.abs(viaSql - oneDeg) < 1e-4)
    val nul = Seq((Array.emptyByteArray, Array[Byte](1, 2, 3)))
      .toDF("a", "b")
      .select(st_distance_sphere(col("a"), col("b")).as("d"))
    assert(nul.head().isNullAt(0), "broken WKB must yield null")
  }
}
