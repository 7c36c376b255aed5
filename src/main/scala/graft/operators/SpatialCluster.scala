package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based spatial clustering — PostGIS `ST_ClusterDBSCAN` semantics
  * (itself DBSCAN, Ester et al. KDD'96), distributed: a core point has at
  * least `minPts` inputs within `eps` (itself included); core points
  * within `eps` of each other share a cluster; a border point (non-core
  * within `eps` of some core) joins a core neighbor's cluster; everything
  * else is noise (null cluster). The reference engine exposes the same
  * surface through DuckDB/PostGIS-style spatial SQL; a curation pipeline
  * uses it to collapse GPS-jittered duplicates and to find venue/POI
  * groupings.
  *
  * Determinism contract (PostGIS leaves both unspecified): cluster labels
  * are the MINIMUM member id of the cluster's core set, and a border
  * point with several core neighbors joins the one with the smallest
  * label — so output is a pure function of the input, replayable by an
  * oracle.
  *
  * Scale shape: the eps-neighborhood pairs come from the radius-width
  * grid equality join ([[SpatialJoin.distanceJoin]] — constant 9×
  * replication on one side, never data-dependent, per-cell cost bounded
  * by density); the core graph collapses through the bounded
  * label-propagation of [[Dedup.clusters]] (lineage-checkpointed, see its
  * scaladoc for the reliable-checkpoint opt-in); border assignment is one
  * more aggregate over the pair set. No step is quadratic in the corpus —
  * only in per-cell density, which `eps` controls. */
object SpatialCluster {

  /** Lloyd's k-means (PostGIS `ST_ClusterKMeans` surface) with every
    * source of nondeterminism pinned so a fixed-iteration run is a pure
    * function of the input: seeds are the k points with the SMALLEST ids
    * (not a random sample), a point joins the centroid minimizing
    * `(dist², centroid id)` lexicographically (ties can't flip), an
    * empty cluster keeps its previous centroid, and centroid updates are
    * `sum/count` (so inputs with exactly-representable coordinates —
    * integer-valued lattices, fixed-point grids — update bitwise
    * reproducibly regardless of partition order; see the j12 gate).
    *
    * Scale shape per iteration (the MLlib discipline: centroids live on
    * the driver, k rows, bounded): assignment is a PURE PROJECTION — the
    * k distances evaluate ONCE into an array column and the argmin is
    * `array_position(d, array_min(d))` over the ascending-cid centroid
    * order (first match = the lexicographic (d², cid) tie contract),
    * with ZERO shuffle; the update is one k-group map-side-combinable
    * aggregate collected back to the driver (k rows). No per-point
    * candidate table ever materializes and plan depth stays O(1)
    * without checkpoints — each round's frame derives from `base` plus
    * literal centroids. Each distance appears exactly once in the plan
    * (stress-measured: a least+when-chain form that evaluated each
    * twice fell out of codegen method limits at k=64 and ran 9x
    * slower at 10M rows). `k` is capped at 4096 to bound the driver
    * state and the per-row array.
    *
    * Runs `iters` assign/update rounds, then labels against the final
    * centroids. Returns one row per input: (id, cluster). */
  def kmeans(points: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "id", xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(k >= 1 && k <= 4096, s"k must be in 1..4096: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    val base = points.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    // null/NaN coordinates have no defined distance: such rows get a
    // null cluster, never seed, and never move a centroid
    val valid = col("x").isNotNull && col("y").isNotNull &&
      !isnan(col("x")) && !isnan(col("y"))
    // seeds: the k smallest valid ids (TakeOrdered — never a full sort)
    var cents: Array[(Any, Double, Double)] = base.filter(valid)
      .orderBy(col("id")).limit(k).collect()
      .map(r => (r.get(0), r.getDouble(1), r.getDouble(2)))
    if (cents.isEmpty)
      return base.select(col("id"),
        when(lit(false), col("id")).as("cluster"))
    // assignment rides the NearestCentroid2 codegen kernel (a tight
    // primitive loop over reference-object centroid arrays, ties to the
    // lowest index = the lexicographic (d², cid) contract with centroids
    // in ascending-cid order). Column-expression forms measured at
    // 10M×k=64: flat least/when chain ~12 s/scan (fell out of codegen),
    // array-column argmin ~38 s/scan (boxed per-row arrays); the kernel
    // scans in well under a second. The cid lookup is one element_at on
    // a constant-folded literal array.
    def assigned: DataFrame = {
      val idx = org.apache.spark.sql.graft.SparkInternals.column(
        graft.functions.NearestCentroid2(
          org.apache.spark.sql.graft.SparkInternals.expression(col("x")),
          org.apache.spark.sql.graft.SparkInternals.expression(col("y")),
          cents.map(_._2), cents.map(_._3)))
      val cidArr = array(cents.map(c => lit(c._1)).toIndexedSeq: _*)
      base.withColumn("cluster",
        when(valid, element_at(cidArr, idx + 1)))
    }
    var it = 0
    while (it < iters) {
      val upd = assigned.filter(col("cluster").isNotNull)
        .groupBy(col("cluster"))
        .agg(sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => r.get(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toMap
      // empty clusters keep their previous centroid; map preserves the
      // ascending-cid order the coalesce scan relies on
      cents = cents.map { case (cid, cx, cy) =>
        upd.get(cid) match {
          case Some((sx, sy, n)) => (cid, sx / n, sy / n)
          case None => (cid, cx, cy)
        }
      }
      it += 1
    }
    assigned.select(col("id"), col("cluster"))
  }

  /** DBSCAN over planar points `(idCol, xCol, yCol)`. Returns one row per
    * input: (id, cluster, is_core) with `cluster` null for noise.
    * `maxIter`/`checkpointDir` pass through to the component collapse. */
  /** `geodetic = true` reads (x, y) as EPSG:4326 (lon, lat) and `eps` in
    * great-circle METERS: the eps-join swaps to the lat-band grid
    * ([[SpatialJoin.distanceJoinGeodetic]]); everything downstream —
    * weighted core counts, component collapse, border labeling — is
    * metric-agnostic and unchanged. */
  def dbscan(points: DataFrame, eps: Double, minPts: Int,
      idCol: String = "id", xCol: String = "x", yCol: String = "y",
      maxIter: Int = 10,
      checkpointDir: Option[String] = None,
      geodetic: Boolean = false): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val all = points.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    // null/NaN coordinates have no defined eps-neighborhood: noise by
    // contract (cluster null, is_core false) — they must not co-cluster
    // through the coordinate groupBy's null/NaN bucket, and the null-
    // unsafe fan-out join below would silently drop them otherwise
    val validCoords = col("x").isNotNull && col("y").isNotNull &&
      !isnan(col("x")) && !isnan(col("y"))
    val noise = all.filter(!validCoords)
      .select(col("id"), when(lit(false), col("id")).as("cluster"),
        lit(false).as("is_core"))
    val base = all.filter(validCoords)
    // EXACT coordinate dedup first: co-located points have IDENTICAL
    // eps-neighborhoods, so the whole algorithm runs on coordinate
    // representatives (rep id = min point id of the group, carrying the
    // group weight) and fans back out at the end. Real spatial data
    // snaps to grids/centroids heavily — on the j10 lattice this cuts
    // the pair join and the component collapse ~10x each, and it is
    // semantics-preserving: neighbor counts weight by group size, a
    // rep's is_core is every member's is_core, and the min-core-id label
    // contract survives because the global-min core id is its own
    // group's rep id. Non-repeating data pays one groupBy + one
    // join-back — noise against the O(pairs) core.
    val reps = base.groupBy(col("x"), col("y"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("w"))
    val l = reps.select(col("rid").as("lid"), col("x"), col("y"))
    val r = reps.select(col("rid").as("rid2"),
      col("x").as("rx"), col("y").as("ry"), col("w").as("rw"))
    // both directions present; drop the self-pair the join produces.
    // Materialized ONCE: the eps-join feeds three consumers (core
    // counts, the core graph, border labeling) — without the checkpoint
    // each would replay the grid join. Reliable checkpoints when
    // checkpointDir is set (cluster posture), executor-local otherwise —
    // the Dedup.clusters discipline.
    checkpointDir.foreach(points.sparkSession.sparkContext.setCheckpointDir)
    val epsJoin =
      if (geodetic) SpatialJoin.distanceJoinGeodetic(l, r, eps,
        leftLon = "x", leftLat = "y", rightLon = "rx", rightLat = "ry")
      else SpatialJoin.distanceJoin(l, r, eps,
        leftX = "x", leftY = "y", rightX = "rx", rightY = "ry")
    // the pair count rides the checkpoint's own job: it sizes the
    // component-collapse loop's shuffle layout below (coreEdges ≤ pairs
    // + one self-edge per core rep, so it is the right magnitude)
    val pairs0 = epsJoin
      .filter(col("lid") =!= col("rid2"))
      .select(col("lid"), col("rid2").as("rid"), col("rw"))
      .observe("__graft_dbscan_pairs", count(lit(1)).as("n"))
    // stock checkpoint (NOT checkpointKeepLayout): the pair frame's grid
    // layout is never reused downstream — its three consumers key on
    // lid/rid — so AQE's partition coalescing is pure win here
    val pairs =
      if (checkpointDir.isDefined) pairs0.checkpoint(true)
      else pairs0.localCheckpoint(true)
    val nPairs = pairs0.queryExecution
      .observedMetrics("__graft_dbscan_pairs").getLong(0)
    // neighbor count INCLUDES the point itself (the PostGIS contract):
    // own group's weight covers self + co-located others
    val nbrW = pairs.groupBy(col("lid")).agg(sum(col("rw")).as("_nw"))
    val repFlagged = reps
      .join(nbrW, reps("rid") === nbrW("lid"), "left")
      .select(col("x"), col("y"), col("rid"),
        (col("w") + coalesce(col("_nw"), lit(0L)) >= minPts).as("is_core"))
    val coreReps = repFlagged.filter(col("is_core")).select(col("rid"))
    // core graph: core–core eps-edges plus self-edges (so an isolated
    // core group still forms its singleton cluster)
    val coreEdges = pairs
      .join(coreReps.withColumnRenamed("rid", "lid"), Seq("lid"))
      .join(coreReps, Seq("rid"))
      .select(col("lid").as("id_a"), col("rid").as("id_b"))
      .union(coreReps.select(col("rid").as("id_a"), col("rid").as("id_b")))
    // coreEdges already carries BOTH directions (the eps-join emits every
    // pair twice) plus self-edges: symmetric = true skips clusters()'s
    // reverse-union, halving the edge frame it checkpoints and joins
    val coreLabels = Dedup.clusters(coreEdges, maxIter = maxIter,
        checkpointDir = checkpointDir, symmetric = true,
        partitionsHint =
          Some(LoopLayout.partitionsFor(points.sparkSession, nPairs)))
      .select(col("id").as("_cid"), col("label").as("_clabel"))
    // border groups: smallest core-neighbor label wins (deterministic)
    val borderLabels = pairs
      .join(coreLabels, pairs("rid") === coreLabels("_cid"))
      .groupBy(col("lid")).agg(min(col("_clabel")).as("_blabel"))
    val repOut = repFlagged
      .join(coreLabels, repFlagged("rid") === coreLabels("_cid"), "left")
      .join(borderLabels, repFlagged("rid") === borderLabels("lid"), "left")
      .select(col("x"), col("y"),
        when(col("is_core"), col("_clabel"))
          .otherwise(col("_blabel")).as("cluster"),
        col("is_core"))
    // fan back out to every valid point (exact double equality — the
    // same keys the groupBy built the groups with), then append the
    // noise-by-contract rows so the output stays one row per input
    base.join(repOut, Seq("x", "y"))
      .select(col("id"), col("cluster"), col("is_core"))
      .unionByName(noise)
  }
}
