package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{CrsTransform, GeomLib}

class CrsTransformSpec extends AnyFunSuite {

  test("UTM anchors: equator on the central meridian") {
    val (e, n) = CrsTransform.wgs84ToUtm(0.0, 117.0, 50, north = true)
    assert(math.abs(e - 500000.0) < 1e-6)
    assert(math.abs(n) < 1e-6)
  }

  test("UTM anchor: meridian arc scale at 45N") {
    // quarter meridian is 10001965.73 m; arc to 45N is 4984944.38 m
    // (published WGS84 values); northing = k0 * arc on the central meridian
    val (e, n) = CrsTransform.wgs84ToUtm(45.0, 117.0, 50, north = true)
    assert(math.abs(e - 500000.0) < 1e-6)
    assert(math.abs(n - 0.9996 * 4984944.38) < 5.0)
  }

  test("UTM southern hemisphere false northing") {
    val (_, n) = CrsTransform.wgs84ToUtm(-33.0, 151.0, 56, north = false)
    assert(n > 0 && n < 10000000.0)
  }

  test("UTM round-trip ≈ identity across the zone") {
    for (i <- 0 to 21; j <- 0 to 8) {
      val lat = -80.0 + i * 7.3
      val lon = 117.0 + (-3.0 + j * 0.7)
      val (e, n) = CrsTransform.wgs84ToUtm(lat, lon, 50, north = lat >= 0)
      val (lon2, lat2) = CrsTransform.utmToWgs84(e, n, 50, north = lat >= 0)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon at ($lat,$lon)")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat at ($lat,$lon)")
    }
  }

  test("web mercator anchors and round-trip") {
    val (x0, y0) = CrsTransform.wgs84ToWebMerc(0.0, 0.0)
    assert(x0 == 0.0 && y0 == 0.0)
    val (x180, _) = CrsTransform.wgs84ToWebMerc(180.0, 0.0)
    assert(math.abs(x180 - 20037508.342789244) < 1e-6) // pi * R
    val (lon, lat) = CrsTransform.webMercToWgs84(11131949.079, 5311972.0)
    assert(math.abs(lon - 100.0) < 1e-6) // 11131949.079 m = 100 deg lon
    for (i <- 0 to 18) {
      val l = -85.0 + i * 9.1
      val (x, y) = CrsTransform.wgs84ToWebMerc(l * 2, l)
      val (lo2, la2) = CrsTransform.webMercToWgs84(x, y)
      assert(math.abs(lo2 - l * 2) < 1e-9 && math.abs(la2 - l) < 1e-9)
    }
  }

  test("transformWkb: 4326→32650→4326 point round-trip, unsupported EPSG → null") {
    val p = GeomLib.pointWkb(116.4, 39.9)
    val utm = CrsTransform.transformWkb(p, 4326, 32650)
    val back = CrsTransform.transformWkb(utm, 32650, 4326)
    assert(math.abs(GeomLib.stX(back) - 116.4) < 1e-8)
    assert(math.abs(GeomLib.stY(back) - 39.9) < 1e-8)
    assert(CrsTransform.transformWkb(p, 4326, 99999) == null)
    assert(CrsTransform.transformWkb(p, 4326, 4326) eq p) // identity shortcut
  }
}
