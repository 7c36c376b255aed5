package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.GeomLib

class GeomLibSpec extends AnyFunSuite {

  test("wkbShapeType reads the low type byte (LE and 3D ISO types)") {
    assert(GeomLib.wkbShapeType(GeomLib.pointWkb(1, 2)) == 1)
    assert(GeomLib.wkbShapeType(GeomLib.multiPointWkb(1, 2)) == 4)
    // ISO POINT Z = 1001 -> low byte 0xE9 = 233 (>= 8 like the reference's
    // 235 for POLYGON Z, east_asia.py:37-42)
    assert(GeomLib.wkbShapeType(GeomLib.pointZWkb(1, 2, 3)) == 233)
    assert(GeomLib.wkbShapeType(Array[Byte](9)) == -1) // truncated
    assert(GeomLib.wkbShapeType(null) == -1)
  }

  test("square polygon: exact envelope and centroid") {
    val w = GeomLib.squareWkb(10.5, -20.25, 0.5)
    assert(GeomLib.wkbShapeType(w) == 3)
    assert(GeomLib.xMin(w) == 10.0)
    assert(GeomLib.xMax(w) == 11.0)
    assert(GeomLib.yMin(w) == -20.75)
    assert(GeomLib.yMax(w) == -19.75)
    val c = GeomLib.centroid(w)
    assert(math.abs(GeomLib.stX(c) - 10.5) < 1e-9)
    assert(math.abs(GeomLib.stY(c) + 20.25) < 1e-9)
  }

  test("flip is an involution and swaps envelope axes") {
    val w = GeomLib.squareWkb(30.0, 60.0, 1.0)
    val f = GeomLib.flip(w)
    assert(GeomLib.xMin(f) == 59.0 && GeomLib.yMin(f) == 29.0)
    assert(GeomLib.flip(f).toSeq == GeomLib.force2D(w).toSeq)
  }

  test("force2D drops Z and yields core-7 type") {
    val z = GeomLib.pointZWkb(5, 6, 7)
    val flat = GeomLib.force2D(z)
    assert(GeomLib.wkbShapeType(flat) == 1)
    assert(GeomLib.stX(flat) == 5.0 && GeomLib.stY(flat) == 6.0)
  }

  test("WKT round-trip") {
    val w = GeomLib.fromText("POINT (1.5 -2.5)")
    assert(GeomLib.asText(w) == "POINT (1.5 -2.5)")
    assert(GeomLib.fromText("NOT A WKT") == null)
  }

  test("broken WKB returns null/sentinel, never throws") {
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    assert(GeomLib.centroid(junk) == null)
    assert(GeomLib.stX(junk) == null)
    assert(GeomLib.xMin(junk) == null)
    assert(GeomLib.flip(junk) == null)
  }

  test("hilbert: d2xy and xy2d are inverse on random grid points") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextLong() & ((1L << GeomLib.HilbertOrder) - 1)
      val y = rnd.nextLong() & ((1L << GeomLib.HilbertOrder) - 1)
      val d = GeomLib.hilbertXY2D(x, y)
      assert(d >= 0, "index must stay in positive Long range")
      val (x2, y2) = GeomLib.hilbertD2XY(d)
      assert(x2 == x && y2 == y)
    }
  }

  test("hilbert: consecutive indices are grid neighbors (locality)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val d = math.abs(rnd.nextLong()) % ((1L << 62) - 2)
      val (x1, y1) = GeomLib.hilbertD2XY(d)
      val (x2, y2) = GeomLib.hilbertD2XY(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("hilbertEncode clamps world bounds and is monotone-safe") {
    assert(GeomLib.hilbertEncode(-95.0, 0.0) == GeomLib.hilbertEncode(-90.0, 0.0))
    assert(GeomLib.hilbertEncode(0.0, 200.0) == GeomLib.hilbertEncode(0.0, 180.0))
    assert(GeomLib.hilbertEncode(Double.NaN, 0.0) >= 0)
  }

  test("spatial predicates: contains, intersects, distance") {
    val sq = GeomLib.squareWkb(0.0, 0.0, 1.0)
    val inPt = GeomLib.pointWkb(0.5, 0.5)
    val outPt = GeomLib.pointWkb(3.0, 0.0)
    val edgePt = GeomLib.pointWkb(1.0, 0.0)
    assert(GeomLib.contains(sq, inPt))
    assert(!GeomLib.contains(sq, outPt))
    assert(!GeomLib.contains(sq, edgePt)) // boundary excluded by contains
    assert(GeomLib.intersects(sq, edgePt)) // ...but intersects
    assert(GeomLib.distance(sq, outPt) == 2.0)
    assert(GeomLib.distance(sq, inPt) == 0.0)
    assert(GeomLib.distance(Array[Byte](1, 2), inPt) == null)
  }

  test("grid cells: hierarchy and boundary containment") {
    val lon = 116.4074; val lat = 39.9042
    val c12 = GeomLib.cellEncode(lon, lat, 12)
    val c11 = GeomLib.cellEncode(lon, lat, 11)
    // parent cell indices are child indices >> 1
    val ix12 = (c12 >> 12) & 0xfff
    val iy12 = c12 & 0xfff
    val ix11 = (c11 >> 11) & 0x7ff
    val iy11 = c11 & 0x7ff
    assert(ix12 >> 1 == ix11 && iy12 >> 1 == iy11)
    val wkt = GeomLib.cellBoundaryWkt(c12)
    val poly = GeomLib.fromText(wkt)
    assert(GeomLib.xMin(poly) <= lon && lon <= GeomLib.xMax(poly))
    assert(GeomLib.yMin(poly) <= lat && lat <= GeomLib.yMax(poly))
    assert(GeomLib.cellCenterLon(c12) > GeomLib.xMin(poly))
    assert(GeomLib.cellCenterLon(c12) < GeomLib.xMax(poly))
  }

  test("length vs perimeter: lineal and polygonal parts measured separately") {
    val line = GeomLib.fromText("LINESTRING (0 0, 3 4)")
    assert(GeomLib.length(line) == 5.0)
    assert(GeomLib.perimeter(line) == 0.0)
    val sq = GeomLib.squareWkb(0.0, 0.0, 1.0) // 2x2 square
    assert(GeomLib.perimeter(sq) == 8.0)
    assert(GeomLib.length(sq) == 0.0)
    val coll = GeomLib.fromText(
      "GEOMETRYCOLLECTION (LINESTRING (0 0, 0 2), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    assert(GeomLib.length(coll) == 2.0)
    assert(GeomLib.perimeter(coll) == 4.0)
    assert(GeomLib.length(GeomLib.pointWkb(1, 2)) == 0.0)
    assert(GeomLib.length(Array[Byte](9)) == null)
  }

  test("envelope and convex hull") {
    val diamond = GeomLib.fromText("POLYGON ((0 -1, 1 0, 0 1, -1 0, 0 -1))")
    val env = GeomLib.envelopeGeom(diamond)
    assert(GeomLib.area(env) == 4.0) // 2x2 bbox of the unit diamond
    assert(GeomLib.area(diamond) == 2.0)
    val zigzag = GeomLib.fromText("LINESTRING (0 0, 1 3, 2 0, 3 3, 4 0)")
    val hull = GeomLib.convexHull(zigzag)
    assert(GeomLib.wkbShapeType(hull) == 3)
    assert(GeomLib.area(hull) == 9.0) // trapezoid (0,0)(4,0)(3,3)(1,3)
    assert(GeomLib.envelopeGeom(GeomLib.pointWkb(2, 3)) != null)
  }

  test("buffer: point buffer is a regular 4q-gon of exact circumradius") {
    val q = 8
    val b = GeomLib.buffer(GeomLib.pointWkb(10.0, 20.0), 2.0, q)
    val n = 4 * q
    // JTS closes the ring: n distinct vertices, all at distance 2 from center
    assert(GeomLib.nPoints(b) == n + 1)
    val expected = 0.5 * n * 4.0 * math.sin(2 * math.Pi / n)
    assert(math.abs(GeomLib.area(b) - expected) < 1e-9)
    // negative buffer shrinks a polygon: 4x4 square shrunk by 1 -> 2x2
    val sq = GeomLib.squareWkb(0.0, 0.0, 2.0)
    assert(math.abs(GeomLib.area(GeomLib.buffer(sq, -1.0, q)) - 4.0) < 1e-9)
  }

  test("simplify drops collinear and sub-tolerance vertices") {
    val wiggly = GeomLib.fromText(
      "LINESTRING (0 0, 1 0.001, 2 -0.001, 3 0.002, 4 0)")
    val simple = GeomLib.simplify(wiggly, 0.01)
    assert(GeomLib.nPoints(simple) == 2)
    assert(GeomLib.length(simple) == 4.0)
    // tolerance below the wiggle keeps every vertex
    assert(GeomLib.nPoints(GeomLib.simplify(wiggly, 0.0001)) == 5)
  }

  test("isValid / makeValid on a bowtie") {
    val sq = GeomLib.squareWkb(0.0, 0.0, 1.0)
    assert(GeomLib.isValid(sq) == java.lang.Boolean.TRUE)
    // figure-eight: ring crosses itself at the origin
    val bowtie = GeomLib.fromText(
      "POLYGON ((-2 -1, 2 1, 2 -1, -2 1, -2 -1))")
    assert(GeomLib.isValid(bowtie) == java.lang.Boolean.FALSE)
    val fixed = GeomLib.makeValid(bowtie)
    assert(GeomLib.isValid(fixed) == java.lang.Boolean.TRUE)
    // two lobes, each a triangle of base 2 and height 2: area 2 + 2
    assert(math.abs(GeomLib.area(fixed) - 4.0) < 1e-9)
    assert(GeomLib.isValid(Array[Byte](7)) == null)
  }

  test("overlays: union / intersection / difference / symDifference exact") {
    val a = GeomLib.squareWkb(0.0, 0.0, 2.0) // 4x4 at origin, area 16
    val b = GeomLib.squareWkb(2.0, 0.0, 2.0) // overlaps right half, area 16
    val inter = GeomLib.intersection(a, b)   // 2x4 strip
    assert(GeomLib.area(inter) == 8.0)
    assert(GeomLib.area(GeomLib.union(a, b)) == 24.0)
    assert(GeomLib.area(GeomLib.difference(a, b)) == 8.0)
    assert(GeomLib.area(GeomLib.symDifference(a, b)) == 16.0)
    // disjoint: intersection is empty, union keeps both parts
    val far = GeomLib.squareWkb(100.0, 0.0, 1.0)
    assert(GeomLib.area(GeomLib.intersection(a, far)) == 0.0)
    assert(GeomLib.area(GeomLib.union(a, far)) == 20.0)
    assert(GeomLib.union(Array[Byte](9), a) == null)
  }

  test("within and dwithin") {
    val sq = GeomLib.squareWkb(0.0, 0.0, 1.0)
    val pt = GeomLib.pointWkb(0.25, 0.25)
    val out = GeomLib.pointWkb(4.0, 0.0)
    assert(GeomLib.within(pt, sq))
    assert(!GeomLib.within(sq, pt))
    assert(GeomLib.dwithin(sq, out, 3.0))
    assert(!GeomLib.dwithin(sq, out, 2.9))
    assert(!GeomLib.dwithin(Array[Byte](9), out, 100.0))
  }

  test("geohash: published reference cells") {
    // the two canonical worked examples of Niemeyer's spec
    assert(GeomLib.geohashEncode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(GeomLib.geohashEncode(42.605, -5.603, 5) == "ezs42")
  }

  test("geohash: prefix hierarchy and precision clamp") {
    val p8 = GeomLib.geohashEncode(48.8584, 2.2945, 8)
    (1 to 8).foreach { p =>
      assert(GeomLib.geohashEncode(48.8584, 2.2945, p) == p8.take(p))
    }
    assert(GeomLib.geohashEncode(1, 1, 0) ==
      GeomLib.geohashEncode(1, 1, 1), "precision clamps up to 1")
    assert(GeomLib.geohashEncode(1, 1, 99) ==
      GeomLib.geohashEncode(1, 1, 12), "precision clamps down to 12")
  }

  test("geohash: decode returns the cell center, within half a cell") {
    for ((lat, lon) <- Seq((57.64911, 10.40744), (-33.8688, 151.2093),
        (0.0, 0.0), (89.9, -179.9))) {
      val h = GeomLib.geohashEncode(lat, lon, 7)
      // precision 7: lon 18 bits, lat 17 bits
      assert(math.abs(GeomLib.geohashLat(h) - lat) <= 180.0 / (1 << 17) / 2)
      assert(math.abs(GeomLib.geohashLon(h) - lon) <= 360.0 / (1 << 18) / 2)
      assert(GeomLib.geohashEncode(GeomLib.geohashLat(h),
        GeomLib.geohashLon(h), 7) == h, "center re-encodes to its cell")
    }
  }

  test("geohash: edges clamp, NaN stays total, bad chars decode to null") {
    assert(GeomLib.geohashEncode(90.0, 180.0, 6) ==
      GeomLib.geohashEncode(89.9999999, 179.9999999, 6))
    assert(GeomLib.geohashEncode(-90.0, -180.0, 6) == "000000")
    assert(GeomLib.geohashEncode(Double.NaN, Double.NaN, 6).length == 6)
    assert(GeomLib.geohashLat("abc") == null, "'a' is not base-32-gh")
    assert(GeomLib.geohashLon("") == null)
    assert(GeomLib.geohashLat("EZS42") != null, "case-insensitive decode")
  }
}
