package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-order sampling (bottom-k / reservoir-by-group;
  * Cohen & Kaplan, "Summarizing data using bottom-k sketches", PODC
  * 2007): a uniform k-sample WITHOUT replacement is "the k rows with the
  * smallest hash of (seed ∥ id)". Unlike `TABLESAMPLE`/`rand()` this is
  * reproducible across runs, partitionings and ENGINES — the repo's
  * md5-hex arithmetic again — so samples, and every statistic computed
  * from them, are SQL-replayable exactly. Mergeable by construction:
  * the bottom-k of a union is the bottom-k of the merged bottom-k's —
  * the property that lets per-shard samples combine at 100 TB without
  * a global shuffle of the raw data.
  *
  * Scale shape: the hash is a map-only projection; bottom-k plans as
  * TakeOrderedAndProject (per-partition top-k + driver merge — never a
  * full sort); per-group reservoirs are one hash-partitioned window. */
object Sampling {

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** 48-bit sampling key: first 12 md5 hex chars of (seed ∥ id) as
    * BIGINT — [[graft.operators.Sketch]]'s portable hash family. */
  def sampleHash(seed: String, idExpr: String): Column = {
    val tok = s"concat(${sqlLit(seed)}, $idExpr)"
    val hexVal = (c: Int) =>
      s"(instr('0123456789abcdef', substr(md5(cast($tok AS binary)), $c, 1)) - 1)"
    expr((2 to 12).map(hexVal).foldLeft(s"CAST(${hexVal(1)} AS BIGINT)")(
      (acc, h) => s"($acc * 16 + $h)"))
  }

  /** Uniform k-sample without replacement: the k rows with the smallest
    * `sampleHash` (ties broken by id). Adds the hash as `samp_h`. */
  def bottomK(df: DataFrame, k: Int, seed: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.withColumn("samp_h", sampleHash(seed, idCol))
      .orderBy(col("samp_h"), col(idCol)).limit(k)
  }

  /** Deterministic reservoir of k rows PER GROUP: row_number over the
    * hash order inside each group — one window over a hash partition by
    * group, no per-group state beyond the frame. Adds `samp_rk` (1-based
    * rank within the group's sample). */
  def reservoirByGroup(df: DataFrame, grpCol: String, k: Int, seed: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(col(grpCol))
      .orderBy(sampleHash(seed, idCol), col(idCol))
    df.withColumn("samp_rk", row_number().over(w))
      .filter(col("samp_rk") <= k)
  }

  /** Quantile estimates from a deterministic bottom-k sample: for each
    * requested q, the sample value at rank `max(1, ceil(q·n))` (the
    * lower empirical quantile — index arithmetic both engines replay
    * digit-for-digit, unlike interpolation variants). Returns `(q,
    * value)` rows. DKW bounds the estimate: P(|F̂−F| > ε) ≤ 2e^(−2kε²),
    * so k = 2000 puts every quantile within ~3% of exact w.h.p. —
    * a fixed-size answer to a 100 TB ORDER BY. */
  def sampleQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      k: Int, seed: String, idCol: String = "doc_id"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles in (0, 1]: $qs")
    val sp = df.sparkSession
    import sp.implicits._
    // rank and sample size ride ONE window pass over the k-row sample —
    // a separate count() aggregate would re-execute the bottom-k scan of
    // the raw data (the sample is tiny; the scan it comes from is not)
    val ranked = bottomK(df, k, seed, idCol)
      .select(col(valueCol).as("v"), col("samp_h"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("samp_h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
    qs.toDF("q").join(ranked,
        col("rk") === greatest(lit(1), ceil(col("q") * col("n")).cast("int")))
      .select(col("q"), col("v").as("value"))
  }
}
