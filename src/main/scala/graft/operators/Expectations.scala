package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * constraint-suite shape): a set of named checks evaluated over a table
  * in ONE aggregation pass, returning a verdict row per check. The
  * reference validates its outputs with ad-hoc probe queries — shape-type
  * mixes, null centroids, row-count manifests (`east_asia.py:318-372`);
  * this is that practice made a first-class, reusable operator, the gate
  * a 100 TB ingest runs before data is allowed downstream.
  *
  * Two check families:
  *
  *   - row checks: (name, boolean SQL expression over the table's
  *     columns). A row violates the check when the expression is false
  *     OR null (the CHECK-constraint contract: null is not proof of
  *     conformance).
  *   - uniqueness checks: (name, key column list). Violations = rows
  *     beyond the first per distinct key tuple; key columns must be
  *     non-null (enforced at runtime — null keys would silently shrink
  *     the distinct count).
  *
  * Scale shape: every row check compiles to a `sum(when(...))` inside a
  * SINGLE combinable aggregate over one scan — adding a check adds an
  * expression, not a pass. Uniqueness checks ride the same aggregate as
  * `count(distinct …)` columns (Catalyst plans multiple distincts via
  * one Expand — still one scan, map-side partials throughout). The
  * 1-row aggregate is collected and pivoted to verdicts on the driver:
  * the distributed work is exactly one job over one scan, whatever the
  * number of checks. */
object Expectations {

  /** Evaluate the checks; returns one row per check:
    * (check STRING, violations BIGINT, total BIGINT, passed BOOLEAN),
    * where `total` is the table row count and `passed` = no violations.
    * Check names must be unique across both families. */
  def check(df: DataFrame, rowChecks: Seq[(String, String)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    val names = rowChecks.map(_._1) ++ uniqueKeys.map(_._1)
    require(names.nonEmpty, "no checks given")
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct}")
    uniqueKeys.foreach { case (n, ks) =>
      require(ks.nonEmpty, s"uniqueness check $n has no key columns")
      ks.foreach(k => require(df.columns.contains(k),
        s"uniqueness check $n names missing column $k"))
    }
    val rowAggs: Seq[Column] = rowChecks.zipWithIndex.map {
      case ((_, sqlExpr), i) =>
        coalesce(sum(when(coalesce(expr(sqlExpr), lit(false)), 0L)
          .otherwise(1L)), lit(0L)).as(s"_v$i")
    }
    val uniqAggs: Seq[Column] = uniqueKeys.zipWithIndex.map {
      case ((_, ks), i) =>
        countDistinct(ks.head, ks.tail: _*).as(s"_u$i")
    }
    val nullKeyGuards: Seq[Column] = uniqueKeys.zipWithIndex.map {
      case ((_, ks), i) =>
        coalesce(sum(when(ks.map(col(_).isNull).reduce(_ || _), 1L)
          .otherwise(0L)), lit(0L)).as(s"_n$i")
    }
    val aggs = count(lit(1)).as("_total") +:
      (rowAggs ++ uniqAggs ++ nullKeyGuards)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getLong(0)
    uniqueKeys.zipWithIndex.foreach { case ((n, ks), i) =>
      val nulls = row.getLong(1 + rowChecks.size + uniqueKeys.size + i)
      require(nulls == 0L,
        s"uniqueness check $n: $nulls rows have null in key $ks")
    }
    val verdicts =
      rowChecks.zipWithIndex.map { case ((n, _), i) =>
        n -> row.getLong(1 + i)
      } ++ uniqueKeys.zipWithIndex.map { case ((n, _), i) =>
        n -> (total - row.getLong(1 + rowChecks.size + i))
      }
    import df.sparkSession.implicits._
    verdicts.map { case (n, v) => (n, v, total, v == 0L) }
      .toDF("check", "violations", "total", "passed")
  }

  /** Referential-containment check (the FK constraint): every NON-NULL
    * value of `df.column` must appear in `dim.dimCol`; null references
    * pass (the SQL foreign-key contract). The one check family that
    * cannot ride [[check]]'s single aggregate — it needs the dimension —
    * so it costs one left-anti equality join plus the row count (two
    * jobs, honestly). Same verdict schema as [[check]].
    *
    * Scale shape: the anti-join broadcasts when the dimension is small
    * (the typical FK target), hash-joins on the key otherwise; duplicates
    * in the dimension are fine (anti-join semantics need no distinct). */
  def referential(df: DataFrame, column: String, dim: DataFrame,
      dimCol: String, name: String = ""): DataFrame = {
    require(df.columns.contains(column), s"missing column $column")
    require(dim.columns.contains(dimCol), s"dimension lacks $dimCol")
    val nm = if (name.nonEmpty) name else s"ref_${column}_in_$dimCol"
    val total = df.count()
    val violations = df.select(col(column))
      .filter(col(column).isNotNull)
      .join(dim.select(col(dimCol).as(column)), Seq(column), "left_anti")
      .count()
    import df.sparkSession.implicits._
    Seq((nm, violations, total, violations == 0L))
      .toDF("check", "violations", "total", "passed")
  }
}
