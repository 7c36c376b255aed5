package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Spatial join (point-in-polygon) — the extension SURVEY.md §2.4 sketches:
  * a grid-cell equi-join prefilter followed by an exact JTS refine. No
  * custom SparkStrategy needed: the prefilter is a plain shuffled equi-join
  * on cell ids (Catalyst picks broadcast vs sort-merge; AQE handles skewed
  * cells), and the refine only touches candidate pairs.
  *
  * A point lives in exactly one res-`res` cell; a polygon is replicated to
  * the cells covering its envelope — so every true containment pair shares
  * exactly one cell and no pair is ever produced twice. Resolution trades
  * polygon replication (finer → more copies) against candidate precision
  * (coarser → more false candidates to refine); res 10–12 suits
  * building/city-scale polygons.
  */
object SpatialJoin {

  /** Join `points` (WKB `geom`) with `polygons` (WKB `geom`): one output row
    * per (point, containing polygon). Both inputs keep their non-geometry
    * columns; the polygon's come suffixed to avoid collisions.
    *
    * Polygons whose envelope covers more res-`res` cells than the covering
    * cap (country/continent scale — `cells_covering` returns an empty array
    * past its cap) cannot ride the grid prefilter; instead of silently
    * dropping them, they take a broadcast-refine branch: such polygons are by
    * nature few (a corpus has bounded area ÷ huge polygons), so broadcasting
    * them against the streamed point side is the scalable fallback. */
  def pointInPolygon(points: DataFrame, polygons: DataFrame, res: Int = 10,
      pointGeom: String = "geom", polyGeom: String = "geom"): DataFrame = {
    // The join key is wrapped in coalesce(cell, -1): a bare expression key
    // makes Catalyst infer IsNotNull(key) and push it into the point-side
    // scan, where the pushed filter plus the project each evaluate the
    // full WKB-decode + cell-encode chain — doubling the dominant per-row
    // cost of the whole join. coalesce folds the inferred filter away
    // (the key is never null), the encode runs once per row, and the -1
    // sentinel matches no polygon cell, so null/broken geometries still
    // drop at the join exactly as before.
    // NO Scatter here (unlike the H3 variant): the rect-grid encode is
    // ~100ns/row, so repartitioning the WKB payloads costs more than the
    // single-task encode saves (measured j3 0.7 -> 1.9s with it at sf0.1)
    val pts = points.withColumn("__cell", coalesce(
      grid_cell(centroid_x(col(pointGeom)), centroid_y(col(pointGeom)), lit(res)),
      lit(-1L)))
    val tagged = polygons
      .withColumnRenamed(polyGeom, "__poly_geom")
      .withColumn("__cells", cells_covering(col("__poly_geom"), lit(res)))
    // explode() emits no rows for an empty array, so the oversized filter is
    // NOT repeated here — a size(...)>0 pre-filter would make Catalyst
    // evaluate the covering expression a second (and via the inferred
    // not-null constraint, a third) time per polygon.
    val gridable = tagged
      .withColumn("__cell", explode(col("__cells"))).drop("__cells")
    // covering came back empty on a non-null geometry ⇒ envelope overflowed
    // the cell cap (null/broken geometry stays dropped — contains() is false)
    val oversized = tagged
      .filter(size(col("__cells")) === 0 && col("__poly_geom").isNotNull)
      .drop("__cells")
    val fine = pts.join(gridable, Seq("__cell"))
      .filter(st_contains(col("__poly_geom"), col(pointGeom)))
      .drop("__cell")
    // The coarse branch re-scans the ENTIRE point side — at corpus scale the
    // dominant table — so it must only exist when an oversized polygon does.
    // Probing costs one polygon-side-only job (polygons are the small input
    // by construction of a point-in-polygon join); paying it once beats
    // paying a second full point scan on every run. In the common case
    // (every polygon fits the covering cap) the returned plan reads points
    // exactly once.
    if (oversized.isEmpty) fine
    else fine.unionByName(points.join(broadcast(oversized),
      st_contains(col("__poly_geom"), col(pointGeom))))
  }

  /** Distance join (ST_DWithin): pairs of points within `radius` in the
    * coordinate plane. Grid width = radius, so a true pair's cells differ
    * by at most one step per axis: the left side keys on its own cell, the
    * right side replicates to its 3×3 cell neighborhood, the join is a
    * plain equality join on the cell id, and an exact distance filter
    * refines. Replication is a constant 9× on ONE side (the smaller —
    * callers pass it as `right`), never data-dependent; per-cell collision
    * cost is density-bounded the same way the polygon prefilter is. The
    * distance test is squared-comparison (no sqrt): `dx² + dy² ≤ r²` is
    * exact IEEE arithmetic an oracle can replay bit-for-bit. */
  def distanceJoin(left: DataFrame, right: DataFrame, radius: Double,
      leftX: String = "x", leftY: String = "y",
      rightX: String = "rx", rightY: String = "ry"): DataFrame = {
    require(radius > 0, s"radius must be positive: $radius")
    val l = left
      .withColumn("__cx", floor(col(leftX) / radius).cast("long"))
      .withColumn("__cy", floor(col(leftY) / radius).cast("long"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))
      .toSeq: _*)
    val r = right
      .withColumn("__o", explode(offsets))
      .withColumn("__cx", floor(col(rightX) / radius).cast("long") + col("__o.dx"))
      .withColumn("__cy", floor(col(rightY) / radius).cast("long") + col("__o.dy"))
      .drop("__o")
    l.join(r, Seq("__cx", "__cy"))
      .filter((col(leftX) - col(rightX)) * (col(leftX) - col(rightX)) +
        (col(leftY) - col(rightY)) * (col(leftY) - col(rightY)) <= lit(radius * radius))
      .drop("__cx", "__cy")
  }

  /** [[pointInPolygon]] on the TRUE H3 lattice instead of the rect grid —
    * the same lattice as the reference's heatmap
    * (East-Asia-Building-Footprints.md:250-252), so a pipeline can bucket
    * its join and aggregate its heatmap on one cell id. Identical plan
    * shape: points map to their res-`res` H3 cell (exactly one cell per
    * point — no pair produced twice), polygons replicate to a grid-disk
    * covering of their envelope, the prefilter is a shuffled equi-join on
    * the cell id, and JTS refines candidates. Polygons whose covering
    * overflows the disk cap take the same broadcast-refine branch. */
  def pointInPolygonH3(points: DataFrame, polygons: DataFrame, res: Int = 9,
      pointGeom: String = "geom", polyGeom: String = "geom"): DataFrame = {
    // coalesce key wrapper: same single-evaluation rationale as
    // pointInPolygon. h3_of_geom is the fused kernel — one WKB decode + one
    // H3 encode per row (the separate centroid_y/centroid_x form decodes
    // the geometry twice, the dominant point-side cost).
    val pts = Scatter(points).withColumn("__cell", coalesce(
      h3_of_geom(col(pointGeom), lit(res)), lit(-1L)))
    val tagged = Scatter(polygons)
      .withColumnRenamed(polyGeom, "__poly_geom")
      .withColumn("__cells", h3_cells_covering(col("__poly_geom"), lit(res)))
    // explode_OUTER on purpose: plain explode makes the optimizer infer
    // `isnotnull(covering) AND size(covering) > 0` filters that INLINE
    // the covering expression and re-evaluate it per polygon in the same
    // stage (InferFiltersFromGenerate + project collapse — measured 3
    // extra coverings/row on the j3h gate). The outer form infers no
    // generate filters; the attribute-level isNotNull after it drops the
    // same empty-covering rows for free.
    val gridable = tagged
      .withColumn("__cell", explode_outer(col("__cells"))).drop("__cells")
      .filter(col("__cell").isNotNull)
    val oversized = tagged
      .filter(size(col("__cells")) === 0 && col("__poly_geom").isNotNull)
      .drop("__cells")
    val fine = pts.join(gridable, Seq("__cell"))
      .filter(st_contains(col("__poly_geom"), col(pointGeom)))
      .drop("__cell")
    if (oversized.isEmpty) fine
    else fine.unionByName(points.join(broadcast(oversized),
      st_contains(col("__poly_geom"), col(pointGeom))))
  }
}
