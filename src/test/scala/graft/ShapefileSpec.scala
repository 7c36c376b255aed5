package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomLib
import graft.sources.{Shapefile, ShapefileCodec}

/** Builds minimal .shp byte images by hand (per the public ESRI spec) and
  * checks the decoder; then the distributed read path. */
object ShpFixture {

  private def header(shapeType: Int, totalWords: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)
    b.putInt(24, totalWords)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)
    b.putInt(32, shapeType)
    b.array()
  }

  /** One Point record + one Polygon record (single CW ring). */
  def pointAndPolygon(): Array[Byte] = {
    // point record: header 8 + content (4 + 16) = 28 bytes
    val pt = ByteBuffer.allocate(28)
    pt.order(ByteOrder.BIG_ENDIAN).putInt(1).putInt(10) // rec 1, 10 words
    pt.order(ByteOrder.LITTLE_ENDIAN).putInt(1).putDouble(116.4).putDouble(39.9)
    // polygon: bbox(32) + numParts(4) + numPoints(4) + parts(4) + 5 pts (80)
    val content = 4 + 32 + 4 + 4 + 4 + 80
    val pg = ByteBuffer.allocate(8 + content)
    pg.order(ByteOrder.BIG_ENDIAN).putInt(2).putInt(content / 2)
    pg.order(ByteOrder.LITTLE_ENDIAN)
    pg.putInt(5) // polygon
    pg.putDouble(0).putDouble(0).putDouble(1).putDouble(1) // bbox
    pg.putInt(1).putInt(5).putInt(0)
    // clockwise ring (ESRI shell orientation): (0,0) (0,1) (1,1) (1,0) (0,0)
    Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)).foreach {
      case (x, y) => pg.putDouble(x).putDouble(y)
    }
    val total = 100 + 28 + 8 + content
    val out = ByteBuffer.allocate(total)
    out.put(header(1, total / 2)).put(pt.array()).put(pg.array())
    out.array()
  }
}

class ShapefileSpec extends AnyFunSuite {

  test("decode point + polygon records to WKB") {
    val rows = ShapefileCodec.decode(ShpFixture.pointAndPolygon())
    assert(rows.map(_._1) == Seq(1, 2))
    assert(rows.map(_._2) == Seq(1, 5))
    val pt = rows.head._3
    assert(GeomLib.wkbShapeType(pt) == 1)
    assert(math.abs(GeomLib.stX(pt) - 116.4) < 1e-12)
    val poly = rows(1)._3
    assert(GeomLib.wkbShapeType(poly) == 3) // WKB polygon
    assert(GeomLib.xMin(poly) == 0.0 && GeomLib.xMax(poly) == 1.0)
  }

  test("garbage and truncated input decode to empty, never throw") {
    assert(ShapefileCodec.decode(Array.fill(50)(7.toByte)).isEmpty)
    assert(ShapefileCodec.decode(ShpFixture.pointAndPolygon().take(110)).nonEmpty == false ||
      ShapefileCodec.decode(ShpFixture.pointAndPolygon().take(110)).size <= 1)
  }

  test("epsg inference from .prj WKT") {
    assert(ShapefileCodec.epsgFromPrj(
      """PROJCS["x",GEOGCS["GCS_WGS_1984"],AUTHORITY["EPSG","32650"]]""") == Some(32650))
    assert(ShapefileCodec.epsgFromPrj(
      """PROJCS["WGS 84 / UTM zone 50N",GEOGCS["WGS 84"]]""") == Some(32650))
    assert(ShapefileCodec.epsgFromPrj("""GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984"]]""") == Some(4326))
    assert(ShapefileCodec.epsgFromPrj("""PROJCS["Weird Local Grid"]""") == None)
    assert(ShapefileCodec.epsgFromPrj(null) == None)
  }

  test("distributed read via binaryFile source") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("shp").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "demo.shp"),
      ShpFixture.pointAndPolygon())
    val df = Shapefile.read(spark, dir)
    assert(df.columns.toSeq == Seq("source", "record_no", "shape_type", "geom"))
    assert(df.count() == 2)
    assert(df.filter(df("source") === "demo.shp").count() == 2)
  }
}
