package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.geom.GeomLib
import graft.sources.GeoJson

class GeoJsonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rt(wkt: String): String = {
    val g = GeomLib.fromText(wkt)
    val json = GeoJson.fromGeometry(GeomLib.read(g))
    GeomLib.asText(GeomLib.write(GeoJson.toGeometry(json)))
  }

  test("geometry round-trips through GeoJSON for all seven RFC types") {
    val wkts = Seq(
      "POINT (139.69 35.68)",
      "MULTIPOINT ((1 2), (3 4))",
      "LINESTRING (0 0, 1 1, 2 0)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { w => assert(rt(w) == GeomLib.asText(GeomLib.fromText(w)), w) }
  }

  test("z coordinates drop on read; malformed inputs null out") {
    val g = GeoJson.toGeometry("""{"type":"Point","coordinates":[1.5,2.5,99.0]}""")
    assert(g != null && g.getCoordinate.x == 1.5 && g.getCoordinate.y == 2.5)
    assert(GeoJson.toGeometry("""{"type":"Point"}""") == null)
    assert(GeoJson.toGeometry("""{"type":"Nope","coordinates":[1,2]}""") == null)
    assert(GeoJson.toGeometry("""{"type":"LineString","coordinates":[[0,0]]}""") == null)
    assert(GeoJson.toGeometry("not json") == null)
    assert(GeoJson.toGeometry("""{"type":"Polygon","coordinates":[[[0,0],[1,0]]]}""") == null)
  }

  test("parseBody: FeatureCollection, bare feature, GeoJSONSeq, junk lines") {
    val fc =
      """{
        |  "type": "FeatureCollection",
        |  "features": [
        |    {"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},
        |     "properties":{"name":"a","pop":42}},
        |    {"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},
        |     "properties":{"name":"b","flag":true}},
        |    {"type":"Feature","geometry":null,"properties":{"name":"dropped"}}
        |  ]
        |}""".stripMargin
    val rows = GeoJson.parseBody(fc)
    assert(rows.length == 2)
    assert(rows(0)._2 == Map("name" -> "a", "pop" -> "42"))
    assert(rows(1)._2 == Map("name" -> "b", "flag" -> "true"))
    val seq = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},"properties":{"k":"x"}}""",
      "this line is junk",
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[2,2]},"properties":{}}""")
      .mkString("\n")
    val seqRows = GeoJson.parseBody(seq)
    assert(seqRows.length == 2)
    val single = """{"type":"Feature","geometry":{"type":"Point","coordinates":[9,9]},"properties":{"z":"1"}}"""
    assert(GeoJson.parseBody(single).length == 1)
    assert(GeoJson.parseBody("""{"type":"Point","coordinates":[5,6]}""").length == 1)
    assert(GeoJson.parseBody("").isEmpty)
  }

  test("file source: FeatureCollection and .geojsonl through spark.read") {
    val dir = java.nio.file.Files.createTempDirectory("geojson").toString
    val fc = """{"type":"FeatureCollection","features":[
        {"type":"Feature","geometry":{"type":"Point","coordinates":[10,20]},"properties":{"n":"p1"}},
        {"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]},"properties":{"n":"p2"}}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.geojson"),
      fc.getBytes("UTF-8"))
    val lines = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[30,40]},"properties":{"n":"l1"}}""",
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[50,60]},"properties":{"n":"l2"}}""")
      .mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.geojsonl"),
      lines.getBytes("UTF-8"))
    val df = GeoJson.read(spark, dir)
    val got = df.select(col("props")("n").as("n"),
        st_x(st_centroid(col("geom"))).as("x"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("p1" -> 10.0, "p2" -> 0.5, "l1" -> 30.0, "l2" -> 50.0))
  }

  test("SQL expressions: st_geomfromgeojson / st_asgeojson round the trip") {
    graft.functions.GraftFunctions.registerAll(spark)
    val rows = spark.sql(
      """SELECT st_astext(st_geomfromgeojson(st_asgeojson(
           st_geomfromtext('POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))')))) AS wkt,
           st_asgeojson(st_geomfromtext('POINT (1.5 -2)')) AS pj,
           st_geomfromgeojson('garbage') AS bad""").collect()
    assert(rows(0).getString(0) == "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))")
    assert(rows(0).getString(1) == """{"type":"Point","coordinates":[1.5,-2]}""")
    assert(rows(0).isNullAt(2))
  }
}
