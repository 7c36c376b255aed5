package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent right
  * row with rightTime <= leftTime (direction "backward"; the earliest with
  * rightTime >= leftTime for "forward"), matching on equality keys — the
  * pandas `merge_asof` primitive Spark has no native operator for.
  *
  * Plan shape (the 100 TB consideration): an inequality join plans a per-key
  * cross product (quadratic in rows per key) and a per-key collect
  * serializes a key onto one executor. Instead both sides are UNIONED,
  * hash-partitioned by key, and sorted once by (time, side, tiebreak); a
  * running `last(ignoreNulls)` window over the growing frame then carries
  * the latest right payload into each left row — one shuffle + one sort,
  * linear in |left| + |right| (Spark evaluates unbounded-preceding frames
  * incrementally), the same shape streaming temporal joins use. Right rows
  * sort before left rows at equal timestamps, so equality matches
  * (inclusive); `tiebreak` makes equal-time right rows deterministic (the
  * largest wins backward, the smallest forward).
  *
  * The right payload rides in ONE struct column: `last(..., ignoreNulls)`
  * on separate columns would mix fields from different right rows when a
  * payload field is legitimately NULL; a struct is non-null per right row,
  * so the carried match is always a coherent single row.
  *
  * Skew note: a pathologically hot key serializes into one task's sort. The
  * remedy at scale is range-bucketing time within the hot key ((key,
  * time_bucket) partitions with per-bucket boundary carry-in) — not salting,
  * which breaks the running order. Not needed at gate scale; documented for
  * cluster deployments.
  */
object AsofJoin {

  /** @param on       equality key columns (present in both sides)
    * @param leftTime left timestamp-ish column (any orderable type)
    * @param rightTime right timestamp-ish column
    * @param payload  right columns to carry into matched left rows; emitted
    *                 with their own names (must not clash with left columns).
    *                 The matched right time is emitted as `asof_<rightTime>`.
    * @param tiebreak optional right column ordering equal-time right rows
    * @param tolerance max |leftTime - rightTime| (in the time column's
    *                  numeric domain after cast to long) — farther matches
    *                  are nulled out, pandas merge_asof-style
    * @param allowExactMatches pandas knob: when false, an equal-time right
    *                  row does NOT match (strict < / >). Implemented purely
    *                  in the sort: exclusive mode orders equal-time right
    *                  rows AFTER the left row, outside its running frame.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tiebreak: Option[String] = None, direction: String = "backward",
      tolerance: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    payload.foreach(p => require(!left.columns.contains(p),
      s"right payload column '$p' clashes with a left column"))
    val leftCols = left.columns.toSeq
    // Null-time semantics (pandas merge_asof raises; here they are handled
    // deterministically instead): null-rightTime rows can match nothing and
    // are dropped; null-leftTime rows emit a null match. The orderings below
    // put nulls FIRST in both directions, so a null-time left row's running
    // frame contains only other null-__t left rows (whose __r is null) —
    // never a spurious trailing match from the whole partition.
    val rightNn = right.filter(col(rightTime).isNotNull)

    // unified relation: key cols, __t, __side (right=0 sorts first at equal
    // time), __tb, left row struct, right payload struct (incl. match time)
    val rPayload = struct((col(rightTime).as("__rt") +: payload.map(col)): _*)
    val tbType = tiebreak.map(c => right.schema(c).dataType)
    val lRel = left.select(on.map(col) ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__side"),
      tbType.map(t => lit(null).cast(t)).getOrElse(lit(0L)).as("__tb"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rPayloadType(right, rightTime, payload)).as("__r")): _*)
    val rightSide = if (allowExactMatches) 0 else 2 // after left ⇒ out of frame
    val rRel = rightNn.select(on.map(col) ++ Seq(
      col(rightTime).as("__t"), lit(rightSide).as("__side"),
      tiebreak.map(col).getOrElse(lit(0L)).as("__tb"),
      lit(null).cast(lStructType(left)).as("__l"),
      rPayload.as("__r")): _*)

    val all = lRel.unionByName(rRel)
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col("__t").asc_nulls_first, col("__side").asc, col("__tb").asc)
      else // desc defaults to NULLS LAST — force first so null-time left rows see an empty frame
        Seq(col("__t").desc_nulls_first, col("__side").asc, col("__tb").desc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = all
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        val dist = abs(col("__t").cast("long") - col("__m.__rt").cast("long"))
        matched.withColumn("__m", when(dist <= tol, col("__m")))
      case None => matched
    }
    withTol.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        Seq(col("__m.__rt").as(s"asof_$rightTime")) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  private def lStructType(left: DataFrame) =
    org.apache.spark.sql.types.StructType(left.schema.fields)

  private def rPayloadType(right: DataFrame, rightTime: String, payload: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      right.schema(rightTime).copy(name = "__rt") +: payload.map(right.schema(_)))
}
