package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Zonal statistics — per-polygon aggregates of raster samples, the classic
  * raster × vector analytics operation (GDAL's `gdal_zonal_stats` /
  * rasterio's `zonal_stats` shape, re-expressed as a Spark plan).
  *
  * The raster side explodes each GeoTIFF into pixel-center points via the
  * `geotiff_pixels` geotransform bridge — a map-only amplification exactly
  * like the dup-span explode (`TrainingData.scala`), so it parallelizes per
  * raster file and shuffles only the grid-cell join key, never the payload.
  * The polygon side rides [[SpatialJoin.pointInPolygon]]'s grid-equi-join
  * prefilter + exact refine; the final groupBy is a plain hash aggregate on
  * the zone key. No driver-side pixel loops, no cartesian product — the
  * same candidate-pair discipline as every other join surface here.
  */
object ZonalStats {

  /** Per-zone stats of band-`band` pixels whose CENTER falls inside the
    * zone polygon (the rasterio `zonal_stats` default). `rasters` carries
    * a binary GeoTIFF `payload` column (plus any lineage columns);
    * `polygons` carries `zoneKey` and a WKB `geom`. Returns one row per
    * zone with n / sum / min / max / mean over all rasters. Zones with no
    * covered pixel are absent (inner-join semantics, as in rasterio). */
  def zonal(rasters: DataFrame, polygons: DataFrame, zoneKey: String,
      band: Int = 0, res: Int = 10, payloadCol: String = "payload",
      polyGeom: String = "geom"): DataFrame = {
    val pts = rasters
      .select(explode(geotiff_pixels(col(payloadCol), lit(band))).as("px"))
      .select(st_point(col("px.lon"), col("px.lat")).as("geom"),
        col("px.value").as("value"))
    SpatialJoin.pointInPolygon(pts, polygons.select(col(zoneKey), col(polyGeom)),
        res = res, pointGeom = "geom", polyGeom = polyGeom)
      .groupBy(col(zoneKey))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        avg(col("value")).as("mean"))
  }
}
