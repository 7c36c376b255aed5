package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Great-circle distance in METERS between two EPSG:4326 (lat, lon)
    * coordinate pairs — haversine on the mean-Earth sphere (R =
    * 6371008.8, the PostGIS ST_DistanceSphere radius). EXACTLY this
    * formula is the oracle-replay contract; keep it in lockstep with
    * [[graft.geom.GeomLib.haversine]] and the gate SQL. */
  def haversineMeters(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    lit(2.0 * graft.geom.GeomLib.EarthRadiusM) * asin(sqrt(
      sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon))
  }

  /** GEODETIC distance join (ST_DWithin over meters on EPSG:4326
    * lon/lat): pairs within `radiusMeters` great-circle distance. The
    * planar [[distanceJoin]] is the wrong ruler on 4326 data — the
    * reference's own contract (east_asia.py:55,245-246) spans lat
    * 18–46°, where a longitude degree is 0.70–0.95× a latitude degree
    * and "within 2.5 km" in degrees is off by up to 40%.
    *
    * Grid shape: latitude bands of height `radius` (one degree of
    * latitude is a constant 111.19 km, so a true pair differs by at most
    * one band); within each band, longitude cells are stretched by
    * 1/cos(band's poleward edge, one band of slack, ×1.02 for the
    * asin-vs-linear excess), so a true pair also differs by at most one
    * lon cell IN THE MATCHED BAND'S QUANTIZATION — the right side
    * replicates to the 3×3 neighborhood computing the lon cell with each
    * TARGET band's own width. Bands whose edge reaches past 85° collapse
    * to one whole-ring cell (the polar caps hold negligible data; an
    * all-pairs refine inside a cap is bounded by the cap). Longitude
    * cells wrap modulo the ring, so anti-meridian pairs meet; the dx
    * offsets shrink when the ring has <3 cells so no pair is produced
    * twice. Replication stays a constant ≤9× on ONE side (pass the
    * smaller input as `right`) at every latitude — the same 100 TB shape
    * as the planar join. The refine (and any oracle) is
    * [[haversineMeters]]. */
  def distanceJoinGeodetic(left: DataFrame, right: DataFrame,
      radiusMeters: Double,
      leftLon: String = "x", leftLat: String = "y",
      rightLon: String = "rx", rightLat: String = "ry"): DataFrame =
    distanceJoinGeodeticCols(left, right, radiusMeters,
      col(leftLon), col(leftLat), col(rightLon), col(rightLat))

  /** [[distanceJoinGeodetic]] over arbitrary lon/lat COLUMN EXPRESSIONS
    * (e.g. `centroid_x(geom)`): each side's coordinates are projected
    * ONCE per input row before the band explode, so an expensive
    * coordinate expression (a WKB decode) is never re-evaluated per
    * candidate pair. This is the entry [[graft.functions
    * .SpatialJoinRewrite]] uses to decompose declarative
    * `st_dwithin_sphere` joins. */
  def distanceJoinGeodeticCols(left: DataFrame, right: DataFrame,
      radiusMeters: Double,
      leftLonC: Column, leftLatC: Column,
      rightLonC: Column, rightLatC: Column): DataFrame = {
    require(radiusMeters > 0, s"radius must be positive: $radiusMeters")
    val mPerDeg = graft.geom.GeomLib.EarthRadiusM * math.Pi / 180.0
    val h = radiusMeters / mPerDeg // band height in degrees
    require(h <= 10.0,
      s"radius $radiusMeters m spans ${h}° of latitude — beyond 10° the " +
        "band grid degenerates; use a coarser operator")
    // lon cell width for band b: one band of slack poleward (the pair's
    // other point may sit one band beyond), clamped at 85°, stretched by
    // 1.02 for the asin excess; past 85° the band is one whole-ring cell
    def bandW(cy: Column): Column = {
      val edge = (greatest(abs(cy), abs(cy + 1)) + lit(1L)).cast("double") * h
      when(edge >= 85.0, lit(360.0))
        .otherwise(lit(1.02 * h) / cos(radians(edge)))
    }
    // ring = FLOOR(360/w): the last cell widens to absorb the remainder
    // (a ceil ring leaves an EMPTY trailing cell, putting the two seam
    // cells 2 apart — anti-meridian pairs would be lost); the index is
    // clamped into that last cell so the seam neighbors are exactly
    // ring−1 and 0
    def ringOf(w: Column): Column =
      greatest(floor(lit(360.0) / w).cast("long"), lit(1L))
    def cellOf(lon: Column, w: Column, ring: Column): Column =
      least(floor((lon + 180.0) / w).cast("long"), ring - 1)
    val l = left
      .withColumn("__glon_l", leftLonC)
      .withColumn("__glat_l", leftLatC)
      .withColumn("__cy", floor(col("__glat_l") / h).cast("long"))
      .withColumn("__w", bandW(col("__cy")))
      .withColumn("__ring", ringOf(col("__w")))
      .withColumn("__cx",
        cellOf(col("__glon_l"), col("__w"), col("__ring")))
      .drop("__w", "__ring")
    val r = right
      .withColumn("__glon_r", rightLonC)
      .withColumn("__glat_r", rightLatC)
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__cy",
        floor(col("__glat_r") / h).cast("long") + col("__dy"))
      .drop("__dy")
      .withColumn("__w", bandW(col("__cy")))
      .withColumn("__ring", ringOf(col("__w")))
      // dx offsets shrink with the ring so a wrap never double-produces
      // a pair: ring 1 → {0}, ring 2 → {0,1}, else {-1,0,1}
      .withColumn("__dx", explode(
        when(col("__ring") >= 3, array(lit(-1L), lit(0L), lit(1L)))
          .when(col("__ring") === 2, array(lit(0L), lit(1L)))
          .otherwise(array(lit(0L)))))
      .withColumn("__cx", pmod(
        cellOf(col("__glon_r"), col("__w"), col("__ring")) + col("__dx"),
        col("__ring")))
      .drop("__dx", "__w", "__ring")
    l.join(r, Seq("__cy", "__cx"))
      .filter(haversineMeters(col("__glat_l"), col("__glon_l"),
        col("__glat_r"), col("__glon_r")) <= lit(radiusMeters))
      .drop("__cy", "__cx", "__glon_l", "__glat_l", "__glon_r", "__glat_r")
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
