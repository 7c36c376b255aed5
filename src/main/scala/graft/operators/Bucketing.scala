package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — Spark's native answer to "don't shuffle the
  * fact table on every join" at warehouse scale.
  *
  * Writing a table with `bucketBy(n, key).sortBy(key)` hash-partitions rows
  * into `n` files per partition AND records the bucketing spec in the
  * catalog. A later equi-join between two tables bucketed on their join
  * keys with the same bucket count satisfies both children's required
  * distribution outright: the SortMergeJoin plans with ZERO Exchange and
  * ZERO per-task Sort — each task zips bucket i of both sides. At 100 TB
  * that converts every recurring fact⋈dim or fact⋈fact join from a full
  *-corpus shuffle (the single most expensive operation a Spark cluster
  * performs) into an embarrassingly parallel merge; the shuffle is paid
  * ONCE at ingest, amortized over every downstream query.
  *
  * The tables register in the session catalog as EXTERNAL parquet tables
  * (explicit `path`), so data lands under the caller's directory — nothing
  * writes to the global warehouse location.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table, replacing any
    * prior registration of `name`. Returns the re-read table (bucketed scan).
    *
    * CATALOG SIDE EFFECT: drops any existing table registered under `name`
    * and leaves the new registration behind after the run (the bucketing
    * spec lives in the catalog — that persistence is what amortizes the
    * ingest shuffle across later queries). Names are therefore confined to
    * a `graft_` namespace so a collision can never drop an unrelated
    * user table; call [[dropTables]] when the registration is no longer
    * wanted. */
  def writeBucketed(s: SparkSession, df: DataFrame, name: String, key: String,
      buckets: Int, path: String): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(name.matches("[A-Za-z0-9_]+"), s"table name must be an identifier: $name")
    require(name.startsWith("graft_"),
      s"bucketed tables are namespaced: name must start with 'graft_': $name")
    s.sql(s"DROP TABLE IF EXISTS $name")
    // repartition on the key into exactly `buckets` tasks first: each bucket
    // then receives rows from ONE task, i.e. one file per bucket — the
    // precondition for Spark to trust the sortBy metadata and elide the
    // join-side Sort (multi-file buckets must re-sort at read time).
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
    s.table(name)
  }

  /** Bucket both inputs on their join keys (same bucket count) and return
    * the co-located inner join. The `merge` hint pins SortMergeJoin so the
    * zero-Exchange property is observable regardless of the small side's
    * size (a broadcast join would also avoid shuffling the big side, but
    * the point here is the bucket-aligned plan a recurring fact⋈fact join
    * needs when NEITHER side broadcasts). */
  def colocatedJoin(s: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int, baseDir: String,
      leftName: String = "graft_bkt_left",
      rightName: String = "graft_bkt_right"): DataFrame = {
    val lt = writeBucketed(s, left, leftName, leftKey, buckets, s"$baseDir/$leftName")
    val rt = writeBucketed(s, right, rightName, rightKey, buckets, s"$baseDir/$rightName")
    lt.hint("merge").join(rt, col(leftKey) === col(rightKey))
  }

  /** Drop bucketed-table registrations created by [[writeBucketed]] (data
    * files under the external `path` are left in place — EXTERNAL tables
    * drop metadata only). Call after the joined result is consumed; the
    * returned DataFrames read through the catalog, so dropping earlier
    * breaks them. */
  def dropTables(s: SparkSession, names: String*): Unit = names.foreach { n =>
    require(n.startsWith("graft_"), s"refusing to drop non-graft table: $n")
    s.sql(s"DROP TABLE IF EXISTS $n")
  }
}
