package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs where `r.time ∈ [l.time + lower, l.time +
  * upper]` and the equality keys match — the time-windowed join Spark plans
  * as a nested-loop unless the range is turned into an equality key.
  *
  * Plan shape (the 100 TB consideration): Spark's optimizer turns a pure
  * inequality condition into BroadcastNestedLoopJoin — quadratic work and a
  * broadcast of a whole side. Instead time is quantized into buckets of
  * width = (upper - lower): a right row lands in exactly one bucket; a left
  * row's window then overlaps AT MOST TWO consecutive buckets, so the left
  * side explodes to ≤ 2 bucket keys and the join is a plain equality join
  * on (keys…, bucket) with a final exact range filter. Work is linear in
  * matches + bucket collisions, shuffles hash-partition by (key, bucket)
  * (time-locality also tames hot keys: one key's rows spread across its
  * time range), and AQE/skew handling applies as with any equi-join.
  */
object RangeJoin {

  /** @param on      equality key columns (same names both sides)
    * @param leftTs  left time column (integral — epoch micros/seconds/etc.)
    * @param rightTs right time column (same unit)
    * @param lower   window start offset relative to left time (inclusive)
    * @param upper   window end offset relative to left time (inclusive);
    *                must exceed `lower`
    * @return inner-join of left and right rows (all columns from both;
    *         non-key column names must not clash)
    */
  def intervalJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, lower: Long, upper: Long): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one equality key")
    require(upper > lower, s"need upper > lower, got [$lower, $upper]")
    val clashes = (left.columns.toSet -- on)
      .intersect(right.columns.toSet -- on)
    require(clashes.isEmpty, s"non-key columns clash across sides: $clashes")
    val w = upper - lower // bucket width == window span ⇒ ≤ 2 buckets/left row
    // exact floor division for any sign and ANY long magnitude: subtract the
    // non-negative pmod first, then divide the exact multiple with INTEGRAL
    // division (Catalyst IntegralDivide — long/long → long). Double division
    // would be exact only below 2^53; nanosecond-scale epochs (~2^61) would
    // silently land in wrong buckets and drop matches.
    def fdiv(c: org.apache.spark.sql.Column) = {
      val shifted = (c - pmod(c, lit(w))).cast("long")
      org.apache.spark.sql.graft.SparkInternals.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graft.SparkInternals.expression(shifted),
          org.apache.spark.sql.graft.SparkInternals.expression(lit(w)),
          org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
    }
    val lB = left.withColumn("__bkt", explode(sequence(
      fdiv(col(leftTs) + lower), fdiv(col(leftTs) + upper))))
    val rB = right.withColumn("__bkt", fdiv(col(rightTs)))
    lB.join(rB, on :+ "__bkt")
      .filter(col(rightTs) >= col(leftTs) + lower &&
        col(rightTs) <= col(leftTs) + upper)
      .drop("__bkt")
  }
}
