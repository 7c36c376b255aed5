package graft.geom

import org.locationtech.jts.geom.{Coordinate, CoordinateFilter}

/** Coordinate reference system transforms, hand-implemented (no proj4j on the
  * classpath — SURVEY.md §7.4.1). Covers the CRS families the reference's
  * data actually uses (east_asia.py:204-208,244-246: per-file UTM zones and
  * national grids → always EPSG:4326; ogr2ogr -t_srs EPSG:4326 at
  * east_asia.py:121-122):
  *
  *   - EPSG:4326 (identity)
  *   - EPSG:326xx / 327xx — WGS84 UTM zone xx north / south
  *   - EPSG:3857 — Web Mercator
  *
  * Transverse Mercator uses the Krüger flattening series to n^3 (published
  * form, e.g. Karney 2011 "Transverse Mercator with an accuracy of a few
  * nanometers" / Wikipedia "Transverse Mercator projection"); error within a
  * UTM zone is far below 1e-7 degrees, which the anchored tests verify.
  */
object CrsTransform {

  // WGS84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val N = F / (2.0 - F)
  private val K0 = 0.9996
  private val E0 = 500000.0

  // Rectifying radius A_maj = a/(1+n) (1 + n^2/4 + n^4/64 + ...)
  private val AMaj = A / (1.0 + N) * (1.0 + N * N / 4.0 + N * N * N * N / 64.0)

  // Krüger series coefficients (to n^3)
  private val a1 = N / 2.0 - 2.0 * N * N / 3.0 + 5.0 * N * N * N / 16.0
  private val a2 = 13.0 * N * N / 48.0 - 3.0 * N * N * N / 5.0
  private val a3 = 61.0 * N * N * N / 240.0
  private val b1 = N / 2.0 - 2.0 * N * N / 3.0 + 37.0 * N * N * N / 96.0
  private val b2 = N * N / 48.0 + N * N * N / 15.0
  private val b3 = 17.0 * N * N * N / 480.0
  private val d1 = 2.0 * N - 2.0 * N * N / 3.0 - 2.0 * N * N * N
  private val d2 = 7.0 * N * N / 3.0 - 8.0 * N * N * N / 5.0
  private val d3 = 56.0 * N * N * N / 15.0

  private val E2Sqrt = 2.0 * math.sqrt(N) / (1.0 + N)

  private val WebMercR = 6378137.0

  /** UTM zone central meridian in degrees. */
  def zoneCentralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  /** (lat, lon) degrees → (easting, northing) for UTM `zone`, hemisphere by
    * `north`. */
  def wgs84ToUtm(lat: Double, lon: Double, zone: Int, north: Boolean): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon - zoneCentralMeridian(zone))
    val sinPhi = math.sin(phi)
    // conformal latitude
    val t = math.sinh(atanh(sinPhi) - E2Sqrt * atanh(E2Sqrt * sinPhi))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    val xi = xiP +
      a1 * math.sin(2 * xiP) * math.cosh(2 * etaP) +
      a2 * math.sin(4 * xiP) * math.cosh(4 * etaP) +
      a3 * math.sin(6 * xiP) * math.cosh(6 * etaP)
    val eta = etaP +
      a1 * math.cos(2 * xiP) * math.sinh(2 * etaP) +
      a2 * math.cos(4 * xiP) * math.sinh(4 * etaP) +
      a3 * math.cos(6 * xiP) * math.sinh(6 * etaP)
    val e = E0 + K0 * AMaj * eta
    val n0 = if (north) 0.0 else 10000000.0
    val n = n0 + K0 * AMaj * xi
    (e, n)
  }

  /** (easting, northing) of UTM `zone`/`north` → (lon, lat) degrees. */
  def utmToWgs84(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) = {
    val n0 = if (north) 0.0 else 10000000.0
    val xi = (northing - n0) / (K0 * AMaj)
    val eta = (easting - E0) / (K0 * AMaj)
    val xiP = xi -
      (b1 * math.sin(2 * xi) * math.cosh(2 * eta) +
        b2 * math.sin(4 * xi) * math.cosh(4 * eta) +
        b3 * math.sin(6 * xi) * math.cosh(6 * eta))
    val etaP = eta -
      (b1 * math.cos(2 * xi) * math.sinh(2 * eta) +
        b2 * math.cos(4 * xi) * math.sinh(4 * eta) +
        b3 * math.cos(6 * xi) * math.sinh(6 * eta))
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    val phi = chi +
      d1 * math.sin(2 * chi) +
      d2 * math.sin(4 * chi) +
      d3 * math.sin(6 * chi)
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (zoneCentralMeridian(zone) + math.toDegrees(lam), math.toDegrees(phi))
  }

  def webMercToWgs84(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / WebMercR)
    val lat = math.toDegrees(math.atan(math.sinh(y / WebMercR)))
    (lon, lat)
  }

  def wgs84ToWebMerc(lon: Double, lat: Double): (Double, Double) = {
    val x = WebMercR * math.toRadians(lon)
    val y = WebMercR * atanh(math.sin(math.toRadians(lat)))
    (x, y)
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))

  /** Is `epsg` a CRS this engine can transform to/from 4326? */
  def supported(epsg: Int): Boolean =
    epsg == 4326 || epsg == 3857 ||
      (epsg >= 32601 && epsg <= 32660) || (epsg >= 32701 && epsg <= 32760)

  /** Transform a single (x, y) from `srcEpsg` to `dstEpsg`; only paths
    * through WGS84 among the supported family. Throws on unsupported codes
    * (callers surface this as a null / per-file error, reference F10). */
  def transformXY(x: Double, y: Double, srcEpsg: Int, dstEpsg: Int): (Double, Double) = {
    val (lon, lat) = srcEpsg match {
      case 4326                           => (x, y)
      case 3857                           => webMercToWgs84(x, y)
      case z if z >= 32601 && z <= 32660  => utmToWgs84(x, y, z - 32600, north = true)
      case z if z >= 32701 && z <= 32760  => utmToWgs84(x, y, z - 32700, north = false)
      case other => throw new IllegalArgumentException(s"unsupported source EPSG:$other")
    }
    dstEpsg match {
      case 4326                          => (lon, lat)
      case 3857                          => wgs84ToWebMerc(lon, lat)
      case z if z >= 32601 && z <= 32660 => { val (e, n) = wgs84ToUtm(lat, lon, z - 32600, north = true); (e, n) }
      case z if z >= 32701 && z <= 32760 => { val (e, n) = wgs84ToUtm(lat, lon, z - 32700, north = false); (e, n) }
      case other => throw new IllegalArgumentException(s"unsupported target EPSG:$other")
    }
  }

  /** ST_Transform over WKB: applies [[transformXY]] to every coordinate via
    * a JTS CoordinateFilter (SURVEY.md G4). Returns null on undecodable
    * input or unsupported EPSG. */
  def transformWkb(wkb: Array[Byte], srcEpsg: Int, dstEpsg: Int): Array[Byte] = {
    if (srcEpsg == dstEpsg) return wkb
    val g = GeomLib.readOrNull(wkb)
    if (g == null) return null
    try {
      g.apply(new CoordinateFilter {
        override def filter(c: Coordinate): Unit = {
          val (nx, ny) = transformXY(c.x, c.y, srcEpsg, dstEpsg)
          c.x = nx
          c.y = ny
        }
      })
      g.geometryChanged()
      GeomLib.write(g)
    } catch { case _: IllegalArgumentException => null }
  }
}
