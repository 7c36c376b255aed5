package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL-callable TABLE functions for the spatial-ML operators — parity
  * with the reference's everything-is-SQL stance (its engine runs every
  * step as declarative DuckDB SQL, east_asia.py:176-178): a SQL-only user
  * gets the clustering operators as
  *
  * {{{
  *   SELECT * FROM graft_dbscan('pts_view', 'id', 'x', 'y', 0.5, 4)
  *   SELECT * FROM graft_kmeans('pts_view', 'id', 'x', 'y', 8, 2)
  * }}}
  *
  * The builder resolves the named table/view against the ACTIVE session
  * and runs the operator's iterative driver-side planning EAGERLY (both
  * operators train/collapse with bounded driver state and truncate
  * lineage via checkpoints — they cannot be a static plan), then hands
  * the result's analyzed plan back to the analyzer: the table-function
  * call site behaves like a UDTF over a materialized computation.
  * Arguments parameterize PLANNING, not per-row evaluation, so they must
  * be literals. Scale posture is the operators' own (see
  * `docs/SCALING.md` on SpatialCluster): nothing extra is collected for
  * the SQL surface. */
object SqlTableFunctions {

  private def scalarOf(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    e.eval()
  }

  private def str(e: Expression, what: String): String =
    String.valueOf(scalarOf(e, what))

  private def num(e: Expression, what: String): Double =
    scalarOf(e, what) match {
      case n: Number => n.doubleValue
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got: $other")
    }

  private def dbscanBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6,
      "usage: graft_dbscan(table, idCol, xCol, yCol, eps, minPts)")
    val spark = SparkSession.active
    val df = spark.table(str(args(0), "table"))
    graft.operators.SpatialCluster.dbscan(df,
        eps = num(args(4), "eps"),
        minPts = num(args(5), "minPts").toInt,
        idCol = str(args(1), "idCol"), xCol = str(args(2), "xCol"),
        yCol = str(args(3), "yCol"))
      .queryExecution.analyzed
  }

  private def kmeansBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6,
      "usage: graft_kmeans(table, idCol, xCol, yCol, k, iters)")
    val spark = SparkSession.active
    val df = spark.table(str(args(0), "table"))
    graft.operators.SpatialCluster.kmeans(df,
        k = num(args(4), "k").toInt,
        iters = num(args(5), "iters").toInt,
        idCol = str(args(1), "idCol"), xCol = str(args(2), "xCol"),
        yCol = str(args(3), "yCol"))
      .queryExecution.analyzed
  }

  /** `graft_geodesic_join(left, right, radiusMeters, lon, lat, rlon,
    * rlat)` — the lat-band great-circle distance join from SQL. Pure
    * plan construction (no eager work): the builder returns the join's
    * analyzed plan directly. */
  private def geodesicJoinBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7,
      "usage: graft_geodesic_join(leftTable, rightTable, radiusMeters, " +
        "lonCol, latCol, rightLonCol, rightLatCol)")
    val spark = SparkSession.active
    graft.operators.SpatialJoin.distanceJoinGeodetic(
        spark.table(str(args(0), "leftTable")),
        spark.table(str(args(1), "rightTable")),
        radiusMeters = num(args(2), "radiusMeters"),
        leftLon = str(args(3), "lonCol"), leftLat = str(args(4), "latCol"),
        rightLon = str(args(5), "rightLonCol"),
        rightLat = str(args(6), "rightLatCol"))
      .queryExecution.analyzed
  }

  /** `graft_knn(left, right, k, r0[, geodetic])` over (id, x, y) tables
    * — the exact KNN join from SQL (iterative: runs eagerly, like
    * dbscan/kmeans). With `geodetic` true, x/y are 4326 lon/lat and
    * r0/dist are great-circle meters. */
  private def knnBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4 || args.length == 5,
      "usage: graft_knn(leftTable, rightTable, k, r0[, geodetic]) " +
        "over (id, x, y)")
    val spark = SparkSession.active
    // a non-boolean flag must fail LOUDLY: silently coercing '1' or
    // 'true' (string) to false would run the planar metric and return
    // wrong neighbors for a meters radius
    val geo = args.length == 5 && (scalarOf(args(4), "geodetic") match {
      case b: java.lang.Boolean => b.booleanValue
      case other => throw new IllegalArgumentException(
        s"graft_knn geodetic flag must be a BOOLEAN literal, got: $other")
    })
    graft.operators.KnnJoin.knnJoin(
        spark.table(str(args(0), "leftTable")),
        spark.table(str(args(1), "rightTable")),
        k = num(args(2), "k").toInt, r0 = num(args(3), "r0"),
        geodetic = geo)
      .queryExecution.analyzed
  }

  /** `graft_table_history('dir')` — DESCRIBE HISTORY of a [[graft
    * .operators.TableLog]] table from SQL (version, op, n_files, ts). */
  private def historyBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "usage: graft_table_history(dir)")
    graft.operators.TableLog
      .history(SparkSession.active, str(args(0), "dir"))
      .queryExecution.analyzed
  }

  /** `graft_table_changes('dir', fromV, toV)` — the row-level change
    * feed (CDF) between two committed versions, from SQL. */
  private def changesBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      "usage: graft_table_changes(dir, fromVersion, toVersion)")
    graft.operators.TableLog.changes(SparkSession.active,
        str(args(0), "dir"),
        num(args(1), "fromVersion").toInt, num(args(2), "toVersion").toInt)
      .queryExecution.analyzed
  }

  /** SQL-callable table-function names (for collision audits). */
  val names: Seq[String] =
    Seq("graft_dbscan", "graft_kmeans", "graft_geodesic_join", "graft_knn",
      "graft_table_history", "graft_table_changes")

  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.SparkInternals
      .tableFunctionRegistry(spark)
    reg.createOrReplaceTempFunction("graft_dbscan", dbscanBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("graft_kmeans", kmeansBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("graft_geodesic_join",
      geodesicJoinBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_knn", knnBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_table_history", historyBuilder,
      "built-in")
    reg.createOrReplaceTempFunction("graft_table_changes", changesBuilder,
      "built-in")
  }
}
