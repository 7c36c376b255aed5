package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, PrecisionModel}

/** GeoJSON (RFC 7946) geometry codec + feature source. Two file shapes:
  * a whole-file `FeatureCollection` and the newline-delimited feature
  * sequence (GeoJSONSeq / `.geojsonl`, the shape GDAL and tippecanoe
  * stream). Geometry covers the seven RFC types; coordinates beyond XY are
  * dropped on read (the engine's 2D carrier contract, see GeomLib), and
  * emit is plain XY with shortest round-trip double formatting.
  *
  * Parsing rides Jackson (already on Spark's classpath — Spark's own JSON
  * datasource is Jackson-based), not a hand-rolled tokenizer: the from-spec
  * discipline here is the GEOMETRY mapping, not JSON lexing.
  */
object GeoJson {

  private val factory = new GeometryFactory(new PrecisionModel(), 4326)
  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- geometry
  /** GeoJSON geometry object → JTS; null for malformed input. */
  def toGeometry(json: String): Geometry =
    try {
      val n = mapper.readTree(json)
      if (n == null || !n.isObject) null else nodeToGeometry(n)
    } catch { case _: Exception => null }

  private def coord(n: JsonNode): Coordinate =
    if (!n.isArray || n.size < 2) null
    else new Coordinate(n.get(0).asDouble, n.get(1).asDouble)

  private def coords(n: JsonNode): Array[Coordinate] = {
    if (!n.isArray) return null
    val out = new Array[Coordinate](n.size)
    var i = 0
    while (i < n.size) {
      out(i) = coord(n.get(i))
      if (out(i) == null) return null
      i += 1
    }
    out
  }

  private def ring(n: JsonNode): org.locationtech.jts.geom.LinearRing = {
    val c = coords(n)
    if (c == null || c.length < 4) null else factory.createLinearRing(c)
  }

  private def polygon(n: JsonNode): org.locationtech.jts.geom.Polygon = {
    if (!n.isArray || n.size < 1) return null
    val shell = ring(n.get(0))
    if (shell == null) return null
    val holes = (1 until n.size).map(i => ring(n.get(i)))
    if (holes.exists(_ == null)) return null
    factory.createPolygon(shell, holes.toArray)
  }

  private def nodeToGeometry(n: JsonNode): Geometry = {
    val typ = Option(n.get("type")).map(_.asText).orNull
    if (typ == null) return null
    if (typ == "GeometryCollection") {
      val gs = n.get("geometries")
      if (gs == null || !gs.isArray) return null
      val parts = (0 until gs.size).map(i => nodeToGeometry(gs.get(i)))
      if (parts.exists(_ == null)) return null
      return factory.createGeometryCollection(parts.toArray)
    }
    val cs = n.get("coordinates")
    if (cs == null) return null
    typ match {
      case "Point" =>
        val c = coord(cs)
        if (c == null) null else factory.createPoint(c)
      case "MultiPoint" =>
        val c = coords(cs)
        if (c == null) null else factory.createMultiPointFromCoords(c)
      case "LineString" =>
        val c = coords(cs)
        if (c == null || c.length < 2) null else factory.createLineString(c)
      case "MultiLineString" =>
        if (!cs.isArray) return null
        val ls = (0 until cs.size).map { i =>
          val c = coords(cs.get(i))
          if (c == null || c.length < 2) null else factory.createLineString(c)
        }
        if (ls.exists(_ == null)) null
        else factory.createMultiLineString(ls.toArray)
      case "Polygon" => polygon(cs)
      case "MultiPolygon" =>
        if (!cs.isArray) return null
        val ps = (0 until cs.size).map(i => polygon(cs.get(i)))
        if (ps.exists(_ == null)) null
        else factory.createMultiPolygon(ps.toArray)
      case _ => null
    }
  }

  /** JTS → GeoJSON geometry object (XY only); null for null/unsupported. */
  def fromGeometry(g: Geometry): String = {
    if (g == null) return null
    val sb = new java.lang.StringBuilder(64)
    if (!appendGeometry(g, sb)) return null
    sb.toString
  }

  private def num(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def appendCoord(c: Coordinate, sb: java.lang.StringBuilder): Unit = {
    sb.append('[').append(num(c.x)).append(',').append(num(c.y)).append(']')
  }

  private def appendCoords(cs: Array[Coordinate], sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      appendCoord(cs(i), sb)
      i += 1
    }
    sb.append(']')
  }

  private def appendPolygonCoords(p: org.locationtech.jts.geom.Polygon,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    appendCoords(p.getExteriorRing.getCoordinates, sb)
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(',')
      appendCoords(p.getInteriorRingN(i).getCoordinates, sb)
      i += 1
    }
    sb.append(']')
  }

  private def appendGeometry(g: Geometry, sb: java.lang.StringBuilder): Boolean = {
    g.getGeometryType match {
      case "Point" =>
        sb.append("{\"type\":\"Point\",\"coordinates\":")
        appendCoord(g.getCoordinate, sb)
      case "MultiPoint" =>
        sb.append("{\"type\":\"MultiPoint\",\"coordinates\":")
        appendCoords(g.getCoordinates, sb)
      case "LineString" =>
        sb.append("{\"type\":\"LineString\",\"coordinates\":")
        appendCoords(g.getCoordinates, sb)
      case "MultiLineString" =>
        sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
        var i = 0
        while (i < g.getNumGeometries) {
          if (i > 0) sb.append(',')
          appendCoords(g.getGeometryN(i).getCoordinates, sb)
          i += 1
        }
        sb.append(']')
      case "Polygon" =>
        sb.append("{\"type\":\"Polygon\",\"coordinates\":")
        appendPolygonCoords(g.asInstanceOf[org.locationtech.jts.geom.Polygon], sb)
      case "MultiPolygon" =>
        sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
        var i = 0
        while (i < g.getNumGeometries) {
          if (i > 0) sb.append(',')
          appendPolygonCoords(
            g.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.Polygon], sb)
          i += 1
        }
        sb.append(']')
      case "GeometryCollection" =>
        sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
        var i = 0
        while (i < g.getNumGeometries) {
          if (i > 0) sb.append(',')
          if (!appendGeometry(g.getGeometryN(i), sb)) return false
          i += 1
        }
        sb.append(']')
        sb.append('}')
        return true
      case _ => return false
    }
    sb.append('}')
    true
  }

  // -------------------------------------------------------------- features
  /** One parsed feature: WKB geometry + stringified properties. Property
    * values keep their JSON rendering (numbers/bools verbatim, strings
    * unquoted) — the same flattening the engine's .dbf and FileGDB
    * attribute surfaces use. */
  private def featureRow(n: JsonNode): (Array[Byte], Map[String, String]) = {
    if (n == null || !n.isObject) return null
    val g = n.get("geometry")
    if (g == null || g.isNull) return null
    val geom = nodeToGeometry(g)
    if (geom == null) return null
    val props = Option(n.get("properties")).filter(_.isObject).map { p =>
      p.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isTextual) v.asText else v.toString)
      }.toMap
    }.getOrElse(Map.empty[String, String])
    (graft.geom.GeomLib.write(geom), props)
  }

  /** Read GeoJSON file(s) into (path, geom WKB, props map). Accepts a
    * whole-file FeatureCollection, a bare geometry/Feature per file, or
    * newline-delimited features (GeoJSONSeq). Whole-file parses run one
    * task per file (`wholetext` — the FeatureCollection envelope is not
    * line-splittable); `.geojsonl` corpora get per-line parallelism via
    * the plain text reader. Broken features drop, like the shapefile
    * reader's null-geometry posture. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
    files.flatMap { case (p, body) =>
      parseBody(body).map { case (wkb, props) => (p, wkb, props) }
    }.toDF("path", "geom", "props")
  }

  /** Parse one file body into feature rows (exposed for tests). Mode
    * detection must not lean on parse errors: Jackson's readTree reads the
    * FIRST value of a concatenated stream without complaining, so a
    * GeoJSONSeq body would silently yield one feature. Instead: multiple
    * non-blank lines whose first line is itself a complete JSON object ⇒
    * line-delimited; anything else (including pretty-printed
    * FeatureCollections, whose first line is a bare `{`) ⇒ whole-file. */
  def parseBody(body: String): Seq[(Array[Byte], Map[String, String])] = {
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (lines.isEmpty) return Seq.empty
    val lineMode = lines.length > 1 && (
      try { val n = mapper.readTree(lines.head); n != null && n.isObject }
      catch { case _: Exception => false })
    if (lineMode)
      lines.flatMap { t =>
        try Option(featureRow(mapper.readTree(t)))
        catch { case _: Exception => None }
      }
    else {
      try {
        val root = mapper.readTree(body.trim)
        if (root == null || !root.isObject) return Seq.empty
        Option(root.get("type")).map(_.asText).getOrElse("") match {
          case "FeatureCollection" =>
            val fs = root.get("features")
            if (fs == null || !fs.isArray) Seq.empty
            else (0 until fs.size).flatMap(i => Option(featureRow(fs.get(i))))
          case "Feature" => Option(featureRow(root)).toSeq
          case _ =>
            val g = nodeToGeometry(root)
            if (g == null) Seq.empty
            else Seq((graft.geom.GeomLib.write(g), Map.empty[String, String]))
        }
      } catch { case _: Exception => Seq.empty }
    }
  }
}
