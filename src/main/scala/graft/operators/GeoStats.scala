package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Profiling + heatmap capabilities:
  *  - `ewkbStats`: the reference's `ewkb-stats` command (east_asia.py:358-372)
  *    — shape-type histogram per source, NDJSON output shape
  *    {shape_type, num_recs, filename}.
  *  - `cellHeatmap`: the H3 heatmap pipeline
  *    (East-Asia-Building-Footprints.md:243-274) — one groupBy instead of the
  *    reference's per-file INSERT loop (Spark's partial/final aggregation
  *    does the two-level split automatically, SURVEY.md A7).
  */
object GeoStats {

  /** Shape-type histogram per source file over a WKB `geom` column. */
  def ewkbStats(df: DataFrame, geomCol: String = "geom"): DataFrame =
    df.withColumn("filename", substring_index(input_file_name(), "/", -1))
      .groupBy(wkb_shape_type(col(geomCol)).as("shape_type"), col("filename"))
      .agg(count(lit(1)).as("num_recs"))
      .orderBy("filename", "shape_type")

  def writeNdjson(df: DataFrame, outPath: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(outPath)

  /** Heatmap over grid cells (H3-capability substitute, SURVEY.md §7.5):
    * count per cell at `res`, excluding cells whose center longitude falls in
    * the anti-meridian band (East-Asia-Building-Footprints.md:267-268).
    * Returns (cell, num_recs, boundary_wkt). */
  def cellHeatmap(df: DataFrame, res: Int = 12, geomCol: String = "geom"): DataFrame =
    df.withColumn("cell",
        grid_cell(centroid_x(col(geomCol)), centroid_y(col(geomCol)), lit(res)))
      .groupBy(col("cell")).agg(count(lit(1)).as("num_recs"))
      .withColumn("clon", grid_cell_center_lon(col("cell")))
      .filter(col("clon") < 175.0 && col("clon") > -175.0)
      .select(col("cell"), col("num_recs"),
        grid_cell_boundary_wkt(col("cell")).as("boundary_wkt"))

  /** Global bbox aggregate — the query that segfaults the reference at 281M
    * rows (East-Asia-Building-Footprints.md:231-238); here a plain partial/
    * final min-max aggregation that spills if it must. */
  def bbox(df: DataFrame, geomCol: String = "geom"): DataFrame =
    df.agg(
      min(st_xmin(col(geomCol))).as("min_x"), max(st_xmax(col(geomCol))).as("max_x"),
      min(st_ymin(col(geomCol))).as("min_y"), max(st_ymax(col(geomCol))).as("max_y"))
}
