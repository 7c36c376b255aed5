package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[TableLog]]
  * table — the "keep a 100 TB-derived rollup fresh without rescanning
  * the snapshot" pattern, driven end-to-end by the log itself:
  *
  *   - the VIEW is a TableLog table of (group, n, total) holding
  *     `count(*)` and `sum(valueCol)` per group;
  *   - each refresh reads the SOURCE's row-level change feed
  *     ([[TableLog.changes]] — file diffs + deletion-vector diffs)
  *     between the last-applied version and the head, collapses it to
  *     per-group deltas, and joins them onto the view ONCE
  *     ([[Changelog.incrementalAgg]]) — cost proportional to the
  *     CHANGE, never the table;
  *   - the last-applied source version rides the view's `txn` map
  *     (exactly-once marker `mv:<srcDir>`), so refresh is idempotent
  *     and crash-safe: a re-run after a failed commit re-derives from
  *     the recorded version, a replay commits nothing.
  *
  * Count/sum are abelian, so every log op nets correctly through the
  * feed: an OPTIMIZE rewrite surfaces its rows as delete+insert pairs
  * that cancel; a copy-on-write UPDATE contributes (new − old); a
  * vectored delete arrives via the DV diff; a RESTORE un-deletes. If
  * the incremental window is gone (source vacuumed past the applied
  * version) refresh falls back to one full rebuild and re-anchors.
  *
  * Cite: reference materializes per-state aggregates as new DuckDB
  * tables per run (`ORNL-FEMA-Buildings.md:66-95`); this keeps one
  * always-fresh table instead. */
object MaterializedView {

  private def txnId(srcDir: String) = s"mv:$srcDir"

  private def fullAgg(spark: SparkSession, srcDir: String,
      groupCol: String, valueCol: String): DataFrame =
    TableLog.read(spark, srcDir).groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("total"))

  /** Bring the view at `viewDir` up to the source head. Returns
    * (viewVersion, appliedFromVersion, sourceHeadVersion, mode) where
    * mode is "noop" | "full" | "incremental". */
  def refresh(spark: SparkSession, viewDir: String, srcDir: String,
      groupCol: String, valueCol: String): (Int, Long, Int, String) = {
    val srcV = TableLog.currentVersion(srcDir)
    require(srcV >= 1, s"source $srcDir has no committed version")
    val applied =
      if (TableLog.currentVersion(viewDir) >= 1)
        TableLog.snapshot(viewDir).txn.getOrElse(txnId(srcDir), 0L)
      else 0L
    if (applied >= srcV)
      return (TableLog.currentVersion(viewDir), applied, srcV, "noop")
    val feed: Option[DataFrame] =
      if (applied == 0L) None
      else
        try Some(TableLog.changes(spark, srcDir, applied.toInt, srcV))
        catch { // applied version vacuumed away: re-anchor with a rebuild
          case _: IllegalArgumentException => None
        }
    val (next, mode) = feed match {
      case None => (fullAgg(spark, srcDir, groupCol, valueCol), "full")
      case Some(f) =>
        // change feed → the Debezium-envelope shape incrementalAgg takes
        val changes = f.select(col(groupCol),
          when(col("_change_type") === "insert", lit("I"))
            .otherwise(lit("D")).as("op"),
          when(col("_change_type") === "delete",
            col(valueCol).cast("long")).otherwise(lit(0L)).as("before"),
          when(col("_change_type") === "insert",
            col(valueCol).cast("long")).otherwise(lit(0L)).as("after"))
        (Changelog.incrementalAgg(
          TableLog.read(spark, viewDir).select(col(groupCol),
            col("n"), col("total")),
          changes, groupCol, "op", "before", "after"), "incremental")
    }
    val v = TableLog.overwriteExactlyOnce(next, viewDir,
      txnId(srcDir), srcV.toLong)
      .getOrElse(TableLog.currentVersion(viewDir)) // racer already applied
    (v, applied, srcV, mode)
  }
}
