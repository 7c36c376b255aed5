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

  // ===== general rollups: multi-aggregate, multi-group-column ==========

  /** One aggregate of a [[refreshMulti]] view: `func` in
    * count | sum | avg | min | max over `valueCol`, surfaced as `alias`.
    * count/sum/avg are abelian (always incremental); min/max are not
    * invertible — they maintain incrementally through inserts and fall
    * back to a rebuild when a delete invalidates an extreme. */
  final case class AggSpec(func: String, valueCol: String, alias: String) {
    require(Set("count", "sum", "avg", "min", "max")(func),
      s"unsupported aggregate: $func")
  }

  // physical column names (the view table stores PRIMITIVES; avg is
  // derived at read so its sum/count stay exactly maintainable)
  private def physCols(a: AggSpec): Seq[String] = a.func match {
    case "avg" => Seq(s"${a.alias}__sum", s"${a.alias}__cnt")
    case _ => Seq(a.alias)
  }

  private def fullAggMulti(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val exprs = aggs.flatMap { a =>
      val v = col(a.valueCol)
      a.func match {
        case "count" => Seq(count(v).as(a.alias))
        case "sum" => Seq(sum(v.cast("long")).as(a.alias))
        case "avg" => Seq(sum(v.cast("long")).as(s"${a.alias}__sum"),
          count(v).as(s"${a.alias}__cnt"))
        case "min" => Seq(min(v).as(a.alias))
        case "max" => Seq(max(v).as(a.alias))
      }
    }
    src.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), exprs: _*)
  }

  /** User-facing read of a [[refreshMulti]] view: group columns, `n`
    * (count(*)), then each aggregate under its alias — avg derived from
    * its exactly-maintained (sum, count) pair, null when the group holds
    * no non-null values (the SQL AVG contract). */
  def readView(spark: SparkSession, viewDir: String, groupCols: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val out = groupCols.map(col) ++ Seq(col("n")) ++ aggs.map { a =>
      a.func match {
        case "avg" => when(col(s"${a.alias}__cnt") > 0,
          col(s"${a.alias}__sum").cast("double") /
            col(s"${a.alias}__cnt")).as(a.alias)
        case _ => col(a.alias)
      }
    }
    TableLog.read(spark, viewDir).select(out: _*)
  }

  /** [[refresh]] generalized to MULTIPLE aggregates over MULTIPLE group
    * columns. count/sum/avg maintain incrementally through every change;
    * min/max maintain incrementally through inserts and trigger a
    * rebuild when the window deletes a value at or beyond a stored
    * extreme (non-invertible aggregates — the Delta/Materialize rule).
    * The invalidation probe joins the SMALL per-group deltas against the
    * view once, only when the window contains deletes AND min/max specs
    * exist; insert-only windows (the streaming-ingest common case) stay
    * one-pass. Returns (viewVersion, appliedFrom, srcHead, mode) with
    * mode "noop" | "full" | "incremental" | "rebuild". */
  def refreshMulti(spark: SparkSession, viewDir: String, srcDir: String,
      groupCols: Seq[String], aggs: Seq[AggSpec])
      : (Int, Long, Int, String) = {
    require(groupCols.nonEmpty, "need at least one group column")
    val aliases = aggs.flatMap(physCols) :+ "n"
    require(aliases.distinct.size == aliases.size,
      s"aggregate aliases collide: $aliases")
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
    val minmax = aggs.filter(a => a.func == "min" || a.func == "max")
    // ordered storage + exactly-once overwrite; runs INSIDE the deltas
    // persist scope so the incremental plan reuses the cached feed
    def commitView(next: DataFrame, mode: String): (Int, Long, Int, String) = {
      val stored = next.select((groupCols.map(col) :+ col("n")) ++
        aggs.flatMap(physCols).map(col): _*)
      val v = TableLog.overwriteExactlyOnce(stored, viewDir,
        txnId(srcDir), srcV.toLong)
        .getOrElse(TableLog.currentVersion(viewDir))
      (v, applied, srcV, mode)
    }
    feed match {
      case None =>
        commitView(fullAggMulti(TableLog.read(spark, srcDir), groupCols,
          aggs), "full")
      case Some(f) =>
        val ins = col("_change_type") === "insert"
        val sgn = when(ins, 1L).otherwise(-1L)
        val dExprs = aggs.flatMap { a =>
          val v = col(a.valueCol)
          val dSum = sum(when(v.isNotNull, sgn).otherwise(0L) *
            coalesce(v.cast("long"), lit(0L)))
          val dCnt = sum(when(v.isNotNull, sgn).otherwise(0L))
          a.func match {
            case "count" => Seq(dCnt.as(s"_d_${a.alias}"))
            case "sum" => Seq(dSum.as(s"_d_${a.alias}"))
            case "avg" => Seq(dSum.as(s"_d_${a.alias}__sum"),
              dCnt.as(s"_d_${a.alias}__cnt"))
            case "min" => Seq(min(when(ins, v)).as(s"_ins_${a.alias}"),
              min(when(!ins, v)).as(s"_del_${a.alias}"))
            case "max" => Seq(max(when(ins, v)).as(s"_ins_${a.alias}"),
              max(when(!ins, v)).as(s"_del_${a.alias}"))
          }
        } :+ sum(when(ins, 0L).otherwise(1L)).as("_ndel")
        val deltas = f.groupBy(groupCols.map(col): _*)
          .agg(sum(sgn).as("_dn"), dExprs: _*)
          .persist() // probed for invalidation, then applied — one feed scan
        try {
          val view = TableLog.read(spark, viewDir)
          val joinCond = groupCols.map(g =>
            view(g) <=> deltas(g)).reduce(_ && _)
          // a delete at/beyond a stored extreme may have REMOVED the
          // extreme — least/greatest can't undo, rebuild. UNLESS the
          // window also INSERTS a value at/beyond that extreme: then
          // least(old, ins) is provably the true new extreme, so the
          // delete is harmless. That exception is what keeps file-
          // rewrite CDF noise (a copy-on-write/OPTIMIZE commit re-lists
          // every surviving row as delete+insert) incremental: the
          // surviving extreme re-inserts itself.
          val invalidated = minmax.nonEmpty &&
            deltas.filter(col("_ndel") > 0).join(view, joinCond, "inner")
              .filter(minmax.map { a =>
                val del = deltas(s"_del_${a.alias}")
                val ins = deltas(s"_ins_${a.alias}")
                if (a.func == "min")
                  del <= view(a.alias) &&
                    !coalesce(ins <= view(a.alias), lit(false))
                else del >= view(a.alias) &&
                  !coalesce(ins >= view(a.alias), lit(false))
              }.reduce(_ || _)).limit(1).count() > 0
          if (invalidated)
            commitView(fullAggMulti(TableLog.read(spark, srcDir),
              groupCols, aggs), "rebuild")
          else {
            val joined = view.join(deltas, joinCond, "full_outer")
            val keys = groupCols.map(g =>
              coalesce(view(g), deltas(g)).as(g))
            val outs = aggs.flatMap { a =>
              def upd(phys: String) =
                (coalesce(view(phys), lit(0L)) +
                  coalesce(deltas(s"_d_$phys"), lit(0L))).as(phys)
              a.func match {
                case "count" | "sum" => Seq(upd(a.alias))
                case "avg" => Seq(upd(s"${a.alias}__sum"),
                  upd(s"${a.alias}__cnt"))
                case "min" =>
                  Seq(least(view(a.alias), deltas(s"_ins_${a.alias}"))
                    .as(a.alias)) // least/greatest skip nulls
                case "max" =>
                  Seq(greatest(view(a.alias), deltas(s"_ins_${a.alias}"))
                    .as(a.alias))
              }
            }
            val nOut = (coalesce(view("n"), lit(0L)) +
              coalesce(deltas("_dn"), lit(0L))).as("n")
            commitView(joined.select((keys :+ nOut) ++ outs: _*)
              .filter(col("n") > 0), "incremental")
          }
        } finally deltas.unpersist()
    }
  }
}
