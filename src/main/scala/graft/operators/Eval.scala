package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation and drift monitoring for the curation pipeline itself: a
  * quality classifier is only as good as its measured ranking power (AUC),
  * and a continuously-ingesting corpus needs a cheap alarm when the score
  * distribution moves (PSI). Both reduce to small aggregates with exact
  * SQL-replayable arithmetic — no sampling, no sklearn.
  */
object Eval {

  /** ROC AUC by the Mann-Whitney rank formula with the standard 0.5 tie
    * credit: P(random positive scores above a random negative, ties count
    * half).
    *
    * Scale shape: one combinable aggregate to a histogram over DISTINCT
    * score values (one row per distinct score — quantize scores upstream
    * if their cardinality is unbounded), then a running sum over that
    * bounded histogram. The window is a single ordered pass over distinct
    * scores, NOT over rows — 100 TB of scored docs with 6-dp scores is at
    * most 2M histogram rows. Returns one row:
    * `(n_pos, n_neg, auc)`; AUC is null when either class is empty. */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val h = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("np"),
        sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("nn"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = h
      .withColumn("cum_nn", sum(col("nn")).over(w) - col("nn"))
      .withColumn("win", col("np").cast("double") *
        (col("cum_nn") + lit(0.5) * col("nn")))
    stepped.agg(
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("win")).as("wins"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("wins") / (col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Population Stability Index between a baseline and a current score
    * distribution over `nBuckets` fixed-width buckets on [lo, hi):
    * `PSI = Σ (p_cur - p_base) · ln(p_cur / p_base)` with `eps` floor on
    * both shares (the standard guard for empty buckets). Scores outside
    * [lo, hi) clamp into the edge buckets. < 0.1 stable, 0.1–0.25 drift
    * warning, > 0.25 alarm (the conventional reading).
    *
    * Scale shape: two combinable bucket histograms (nBuckets rows each)
    * joined on bucket id — nothing else shuffles. Returns one row
    * `(n_base, n_cur, psi)`. */
  def psi(base: DataFrame, current: DataFrame, scoreCol: String,
      lo: Double, hi: Double, nBuckets: Int = 10,
      eps: Double = 1e-4): DataFrame = {
    require(nBuckets >= 2, s"nBuckets >= 2: $nBuckets")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    def bucket(c: Column): Column =
      least(lit(nBuckets - 1), greatest(lit(0),
        floor((c - lo) / ((hi - lo) / nBuckets)).cast("int")))
    def hist(df: DataFrame): DataFrame =
      df.groupBy(bucket(col(scoreCol)).as("b")).agg(count(lit(1)).as("n"))
    val hb = hist(base).withColumnRenamed("n", "nb")
    val hc = hist(current).withColumnRenamed("n", "nc")
    val tb = hb.agg(sum("nb").as("tb"))
    val tc = hc.agg(sum("nc").as("tc"))
    hb.join(hc, Seq("b"), "full")
      .na.fill(0L, Seq("nb", "nc"))
      .crossJoin(tb).crossJoin(tc)
      .withColumn("pb", greatest(lit(eps), col("nb").cast("double") / col("tb")))
      .withColumn("pc", greatest(lit(eps), col("nc").cast("double") / col("tc")))
      .agg(max(col("tb")).as("n_base"), max(col("tc")).as("n_cur"),
        sum((col("pc") - col("pb")) * log(col("pc") / col("pb"))).as("psi"))
  }
}
