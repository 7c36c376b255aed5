package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.operators.ZonalStats
import graft.sources.GeoTiff

class ZonalStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("zonal: pixel-center membership, exact stats, multi-raster merge") {
    import spark.implicits._
    // 4x4 raster at origin (0, 4), scale 1: pixel centers (0.5..3.5, 3.5..0.5),
    // values row-major 0..15
    val r1 = GeoTiff.write(4, 4, 1, 16, 1, Array.tabulate(16)(_.toDouble),
      pixelScale = (1.0, 1.0), origin = (0.0, 4.0), epsg = 4326)
    // second raster shifted east by 10, values 100..115
    val r2 = GeoTiff.write(4, 4, 1, 16, 1, Array.tabulate(16)(i => 100.0 + i),
      pixelScale = (1.0, 1.0), origin = (10.0, 4.0), epsg = 4326)
    val rasters = Seq((1L, r1), (2L, r2)).toDF("id", "payload")
    // zone A: square [0,4]x[0,4] — catches all 16 pixels of r1;
    // zone B: [10,12]x[2,4] — upper-left 2x2 of r2 = values 100,101,104,105;
    // zone C: far away — no pixels, absent from output
    val zones = Seq(
      ("A", st2(2.0, 2.0, 2.0)), ("B", st2(11.0, 3.0, 1.0)),
      ("C", st2(-50.0, -50.0, 1.0))).toDF("zone", "wkt")
      .select(col("zone"), st_geomfromtext(col("wkt")).as("geom"))
    val out = ZonalStats.zonal(rasters, zones, "zone", band = 0, res = 8)
      .orderBy("zone").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 16 &&
      a.getDouble(2) == (0 to 15).sum.toDouble &&
      a.getDouble(3) == 0.0 && a.getDouble(4) == 15.0 &&
      a.getDouble(5) == 7.5)
    val bR = out(1)
    assert(bR.getString(0) == "B" && bR.getLong(1) == 4 &&
      bR.getDouble(2) == 410.0 && bR.getDouble(3) == 100.0 &&
      bR.getDouble(4) == 105.0 && bR.getDouble(5) == 102.5)
  }

  private def st2(cx: Double, cy: Double, half: Double): String =
    s"POLYGON ((${cx - half} ${cy - half}, ${cx + half} ${cy - half}, " +
      s"${cx + half} ${cy + half}, ${cx - half} ${cy + half}, " +
      s"${cx - half} ${cy - half}))"
}
