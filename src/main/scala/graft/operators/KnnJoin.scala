package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor join — PostGIS `<->`-operator KNN semantics
  * (`ORDER BY geom <-> target LIMIT k` per probe row), distributed. The
  * reference's engine family exposes this through its spatial SQL; a
  * curation pipeline uses it to attach each point of interest to its k
  * closest reference sites (reverse geocoding, venue conflation, sensor
  * gap-fill).
  *
  * Exact, not approximate: a probe is RESOLVED at radius r once it has
  * at least k candidates within true distance ≤ r — every unexamined
  * point is then strictly farther than its current k-th neighbor, so the
  * top-k within r is the global top-k. Unresolved probes retry at 2r
  * (grid-cell side tracks the radius, so the 3×3 neighborhood replication
  * stays constant-factor at every scale); a probe whose candidate set
  * already spans the whole right side resolves regardless of k, which
  * bounds the loop even when k exceeds the right-side row count.
  *
  * Scale shape: each round is one [[SpatialJoin.distanceJoin]] (shuffled
  * grid equi-join, never quadratic) over ONLY the still-unresolved
  * probes + one per-probe window top-k; doubling means geometric
  * progress, and dense regions resolve in the first round while sparse
  * stragglers retry alone. Lineage is truncated per round
  * ([[Graph.pageRank]]'s discipline).
  *
  * Determinism contract (PostGIS leaves tie order unspecified): neighbors
  * rank by `(distance, right id)`, so output is a pure function of the
  * input and an oracle can replay it.
  *
  * Returns one row per (probe, neighbor): `(lid, rid, dist, rn)` with
  * `rn` in 1..k — fewer than k rows for a probe only when the right side
  * itself has fewer than k rows. Rows with null/NaN coordinates or a
  * null id are excluded on both sides (the inner-join contract: no
  * defined neighborhood, no output). */
object KnnJoin {

  /** `geodetic = true` switches the metric to great-circle METERS over
    * EPSG:4326 lon/lat columns (x = lon, y = lat): candidates come from
    * [[SpatialJoin.distanceJoinGeodetic]]'s lat-band grid (lon cells
    * stretched by 1/cos(band) — a constant 9× replication at every
    * latitude) and `dist`/`r0` are meters via the haversine contract.
    * The radius-doubling exactness argument is metric-agnostic, so the
    * loop is unchanged. */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int, r0: Double,
      leftId: String = "id", leftX: String = "x", leftY: String = "y",
      rightId: String = "id", rightX: String = "x", rightY: String = "y",
      maxIter: Int = 40,
      checkpointDir: Option[String] = None,
      geodetic: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(r0 > 0, s"r0 must be positive: $r0")
    checkpointDir.foreach(left.sparkSession.sparkContext.setCheckpointDir)
    // layout-preserving checkpoints (see SparkInternals): sites keep their
    // grid-join layout across rounds instead of re-exchanging per round
    def truncate(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.SparkInternals
        .checkpointKeepLayout(df, reliable = checkpointDir.isDefined)

    // null/NaN coordinates (or a null id — the probe-retirement anti-join
    // is null-unsafe) have no defined neighborhood: dropped up front on
    // BOTH sides, the inner-join contract — one dirty row must not burn
    // all maxIter rounds and then abort the job as "not converged"
    def valid(idc: String, xc: String, yc: String) =
      col(idc).isNotNull && col(xc).isNotNull && col(yc).isNotNull &&
        !isnan(col(xc)) && !isnan(col(yc))
    val probes0 = left.select(col(leftId).as("lid"),
      col(leftX).cast("double").as("x"), col(leftY).cast("double").as("y"))
      .filter(valid("lid", "x", "y"))
    // the site count comes from the sites checkpoint's own materializing
    // count() action, not a standalone count() — the Dedup.clusters
    // discipline: every driver round-trip the loop serializes on is
    // scheduler latency at cluster scale. The action's return value (not
    // an observe metric) because `need` is correctness-critical and must
    // stay exact even if part of the plan re-executes.
    val (sites, nSites) = org.apache.spark.sql.graft.SparkInternals
      .checkpointKeepLayoutCounted(
        right.select(col(rightId).as("rid"),
          col(rightX).cast("double").as("rx"),
          col(rightY).cast("double").as("ry"))
          .filter(valid("rid", "rx", "ry")),
        reliable = checkpointDir.isDefined)
    // a probe with every site in hand is done no matter what k asked for
    val need = math.min(k.toLong, nSites)

    // empty seed built from the ACTUAL id schemas (limit(0) cross of the
    // two inputs), not from Long-typed literals cast over — id columns
    // whose type is not castable from BIGINT (binary, struct) would fail
    // analysis up front even though the algorithm is id-type-agnostic
    var resolved: DataFrame = probes0.select(col("lid")).limit(0)
      .crossJoin(sites.select(col("rid")).limit(0))
      .withColumn("dist", lit(0.0)).withColumn("rn", lit(0))
    if (nSites == 0) return resolved
    // the unresolved-probe count rides each probe frame's checkpoint job:
    // the loop condition costs ZERO extra actions where the old
    // per-round isEmpty was one scheduler round-trip each. (Loop uses of
    // nUnresolved are sign-safe — only compared against zero.)
    val (probesInit, nProbes0) = org.apache.spark.sql.graft.SparkInternals
      .checkpointKeepLayoutCounted(probes0,
        reliable = checkpointDir.isDefined)
    var probes = probesInit
    var nUnresolved = nProbes0
    var r = r0
    var it = 0
    // the observed counts also size the loop's shuffle layout
    // (LoopLayout): a few thousand probes don't need conf-N-task rounds
    LoopLayout.withShufflePartitions(left.sparkSession,
        LoopLayout.partitionsFor(left.sparkSession,
          math.max(nSites, nUnresolved))) {
    while (it < maxIter && nUnresolved > 0) {
      require(r.isFinite, s"radius overflow after $it doublings from $r0")
      // once the doubled radius outgrows the lat-band grid (10° of
      // latitude ≈ 1112 km), the still-unresolved probes are the sparse
      // stragglers — a direct refine of (stragglers × sites) is the
      // bounded correct fallback, and at r ≥ half the circumference it
      // resolves every probe unconditionally
      val geodeticBandMax = 10.0 * graft.geom.GeomLib.EarthRadiusM *
        math.Pi / 180.0
      val cand =
        if (geodetic && r >= geodeticBandMax)
          probes.crossJoin(sites)
            .withColumn("dist", SpatialJoin.haversineMeters(
              col("y"), col("x"), col("ry"), col("rx")))
            .filter(col("dist") <= lit(math.min(r, 2.1e7)))
        else if (geodetic)
          SpatialJoin.distanceJoinGeodetic(probes, sites, r,
              leftLon = "x", leftLat = "y",
              rightLon = "rx", rightLat = "ry")
            .withColumn("dist", SpatialJoin.haversineMeters(
              col("y"), col("x"), col("ry"), col("rx")))
        else
          SpatialJoin.distanceJoin(probes, sites, r,
              leftX = "x", leftY = "y", rightX = "rx", rightY = "ry")
            .withColumn("dist", sqrt(
              (col("x") - col("rx")) * (col("x") - col("rx")) +
              (col("y") - col("ry")) * (col("y") - col("ry"))))
      val w = Window.partitionBy(col("lid"))
      val ranked = cand
        .withColumn("rn", row_number().over(
          w.orderBy(col("dist"), col("rid"))))
        .withColumn("_cnt", count(lit(1)).over(w))
      val doneRows = truncate(ranked
        .filter(col("_cnt") >= need && col("rn") <= k)
        .select(col("lid"), col("rid"), col("dist"), col("rn")))
      resolved = resolved.union(doneRows)
      val nextObs = probes.join(
        doneRows.select(col("lid")).distinct(), Seq("lid"), "left_anti")
        .observe(s"__graft_knn_p$it", count(lit(1)).as("n"))
      probes = truncate(nextObs)
      nUnresolved = nextObs.queryExecution
        .observedMetrics(s"__graft_knn_p$it").getLong(0)
      r *= 2
      it += 1
    }
    } // withShufflePartitions
    require(nUnresolved == 0L,
      s"knnJoin did not converge in $maxIter doublings from r0=$r0")
    resolved
  }
}
