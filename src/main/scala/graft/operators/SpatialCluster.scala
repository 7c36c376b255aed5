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
    * Scale shape per iteration: the candidate set is a broadcast
    * crossJoin against the k-row centroid table, collapsed by a
    * map-side-combinable `min(struct)` — one shuffle of (id → cluster)
    * per iteration, never a quadratic pair set; the update is a k-group
    * combinable aggregate. Labels are seed ids, stable across runs.
    * Runs `iters` assign/update rounds, then labels against the final
    * centroids. Returns one row per input: (id, cluster). */
  def kmeans(points: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "id", xCol: String = "x", yCol: String = "y",
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    checkpointDir.foreach(points.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val base = points.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    def assign(cents: DataFrame): DataFrame = base
      .crossJoin(broadcast(cents))
      .withColumn("_d2",
        (col("x") - col("cx")) * (col("x") - col("cx")) +
        (col("y") - col("cy")) * (col("y") - col("cy")))
      .groupBy(col("id"), col("x"), col("y"))
      .agg(min(struct(col("_d2"), col("cid"))).as("_m"))
      .select(col("id"), col("x"), col("y"), col("_m.cid").as("cluster"))
    var cents = truncate(base.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("x").as("cx"), col("y").as("cy")))
    var it = 0
    while (it < iters) {
      val upd = assign(cents)
        .groupBy(col("cluster").as("cid"))
        .agg((sum(col("x")) / count(lit(1))).as("ux"),
          (sum(col("y")) / count(lit(1))).as("uy"))
      cents = truncate(cents.join(upd, Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("ux"), col("cx")).as("cx"),
          coalesce(col("uy"), col("cy")).as("cy")))
      it += 1
    }
    assign(cents).select(col("id"), col("cluster"))
  }

  /** DBSCAN over planar points `(idCol, xCol, yCol)`. Returns one row per
    * input: (id, cluster, is_core) with `cluster` null for noise.
    * `maxIter`/`checkpointDir` pass through to the component collapse. */
  def dbscan(points: DataFrame, eps: Double, minPts: Int,
      idCol: String = "id", xCol: String = "x", yCol: String = "y",
      maxIter: Int = 10,
      checkpointDir: Option[String] = None): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val base = points.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val l = base.select(col("id").as("lid"), col("x"), col("y"))
    val r = base.select(col("id").as("rid"),
      col("x").as("rx"), col("y").as("ry"))
    // both directions present; drop the self-pair the join produces
    val pairs = SpatialJoin.distanceJoin(l, r, eps,
        leftX = "x", leftY = "y", rightX = "rx", rightY = "ry")
      .filter(col("lid") =!= col("rid"))
      .select(col("lid"), col("rid"))
    // neighbor count INCLUDES the point itself (the PostGIS contract)
    val counts = pairs.groupBy(col("lid")).agg(count(lit(1)).as("_n"))
    val flagged = base.join(counts, base("id") === counts("lid"), "left")
      .select(col("id"),
        (coalesce(col("_n"), lit(0L)) + 1L >= minPts).as("is_core"))
    val coreIds = flagged.filter(col("is_core")).select(col("id"))
    // core graph: core–core eps-edges plus self-edges (so an isolated
    // core still forms its singleton cluster)
    val coreEdges = pairs
      .join(coreIds.withColumnRenamed("id", "lid"), Seq("lid"))
      .join(coreIds.withColumnRenamed("id", "rid"), Seq("rid"))
      .select(col("lid").as("id_a"), col("rid").as("id_b"))
      .union(coreIds.select(col("id").as("id_a"), col("id").as("id_b")))
    val coreLabels = Dedup.clusters(coreEdges, maxIter = maxIter,
        checkpointDir = checkpointDir)
      .select(col("id").as("_cid"), col("label").as("_clabel"))
    // border points: smallest core-neighbor label wins (deterministic)
    val borderLabels = pairs
      .join(coreLabels, pairs("rid") === coreLabels("_cid"))
      .groupBy(col("lid")).agg(min(col("_clabel")).as("_blabel"))
    flagged
      .join(coreLabels, flagged("id") === coreLabels("_cid"), "left")
      .join(borderLabels, flagged("id") === borderLabels("lid"), "left")
      .select(col("id"),
        when(col("is_core"), col("_clabel"))
          .otherwise(col("_blabel")).as("cluster"),
        col("is_core"))
  }
}
