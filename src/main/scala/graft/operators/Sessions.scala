package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization and time-series regularization over event tables.
  *
  * The streaming side of this surface lives in `streaming/EventStreams`
  * (watermarked `session_window`); these are the BATCH twins a backfill or
  * historical-analysis job runs over the same parquet events — the classic
  * gaps-and-islands formulation (reference analogue: ad-hoc SQL over event
  * exports, east_asia.py's DuckDB-session idiom).
  *
  * Scale shape: every operator here shuffles ONCE on the key column and
  * then stays inside per-key windows (`Window.partitionBy(key)`) — no
  * global window, no cross-key traffic. `resampleFfill`'s grid explode is
  * bounded per key by that key's own observed time span divided by the
  * step, so a 100 TB events lake resamples with map-side grid generation
  * plus the one keyed exchange it already paid for sessionization.
  */
object Sessions {

  /** Assign gaps-and-islands session sequence numbers per key: a new
    * session starts at the first event of the key or whenever the gap from
    * the previous event is >= `gapSeconds`. Adds `session_seq` (1-based,
    * per key, in (ts, tie) order). One shuffle on `keyCol`. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(ord)
    val newS = when(prev.isNull || us - prev >= gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(newS).over(ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** One row per (key, session): start/end in epoch micros, event count and
    * an integer-exact cents sum of `valueCol` (IEEE-safe across engines).
    * Built on `sessionize`, so the plan is one keyed exchange + window +
    * partial-aggregated groupBy on the same key (no second shuffle under
    * AQE: the groupBy keys extend the window's partitioning). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long, tieCol: String,
                   valueCol: String): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds, tieCol)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Resample each key's series onto a regular `stepSeconds` grid spanning
    * that key's observed range, forward-filling buckets with no
    * observation from the last observed value (cents-encoded so the fill
    * is bit-exact). Per (key, bucket) the elected observation is the LAST
    * in (ts, tie) order. Emits (key, bucket_us, value_cents, filled).
    *
    * The grid is generated per key from a 2-column span aggregate — the
    * explode multiplies rows by span/step for that key only, never by the
    * global range, so sparse long-lived keys and dense short-lived keys
    * both stay proportional to their own data. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepSeconds: Long,
                    tieCol: String): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    // floor-aligned bucket start in micros, integer-exact (us - us mod step)
    def bucketStart(us: Column): Column = us - pmod(us, lit(stepUs))
    def bucketIdx(us: Column): Column =
      (bucketStart(us) / stepUs).cast("long") // exactly divisible -> exact
    val bucket = bucketStart(unix_micros(col(tsCol))).as("bucket_us")
    // elect the last observation of each (key, bucket)
    val perBucket = Window.partitionBy(col(keyCol), col("bucket_us"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val obs = df.select(col(keyCol), bucket,
        round(col(valueCol) * 100).cast("long").as("obs_cents"),
        col(tsCol), col(tieCol))
      .withColumn("rn", row_number().over(perBucket))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("bucket_us"), col("obs_cents"))
    // per-key grid: one row per step between the key's first and last bucket
    val grid = df.groupBy(col(keyCol))
      .agg(min(bucketIdx(unix_micros(col(tsCol)))).as("b0"),
        max(bucketIdx(unix_micros(col(tsCol)))).as("b1"))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bi"))
      .select(col(keyCol), (col("bi") * stepUs).as("bucket_us"))
    val ffill = Window.partitionBy(keyCol).orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket_us"), "left")
      .withColumn("value_cents",
        last(col("obs_cents"), ignoreNulls = true).over(ffill))
      .withColumn("filled", col("obs_cents").isNull)
      .drop("obs_cents")
  }

  /** Trailing rolling mean over a REGULAR series (a [[resampleFfill]]
    * output): per (key, bucket), the mean of `value_cents` over the last
    * `windowBuckets` buckets including the current one. Because the grid
    * is regular, a ROWS frame IS a time frame — no RANGE window needed.
    * Emits the integer-exact `roll_sum_cents`/`roll_n` legs plus the one
    * derived division (`roll_mean6`), so replays stay bit-stable.
    * Same scale posture as everything here: per-key window only. */
  def rollingMean(resampled: DataFrame, keyCol: String,
      windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1: $windowBuckets")
    val w = Window.partitionBy(keyCol).orderBy("bucket_us")
      .rowsBetween(-(windowBuckets - 1L), Window.currentRow)
    resampled
      .withColumn("roll_sum_cents", sum(col("value_cents")).over(w))
      .withColumn("roll_n", count(col("value_cents")).over(w))
      .withColumn("roll_mean6", round(
        col("roll_sum_cents").cast("double") / col("roll_n") / 100.0, 6))
  }

  /** Trailing-baseline z-score anomaly flags over an irregular series:
    * per (key, ts-ordered row), the z-score of `valueCol` (in exact
    * integer cents) against the mean/stddev of the PRECEDING
    * `baselineRows` observations — the current value never contaminates
    * its own baseline, the standard monitoring contract. Rows whose
    * baseline has fewer than `minBaseline` observations or zero variance
    * emit a null z (not a 0 — insufficient evidence is not normality).
    *
    * Determinism: the window carries only integer legs (sum, sum of
    * squares, count); mean/variance/z derive from them in one fixed
    * closed form, and `z6` is the 6-dp-rounded score — bit-stable
    * replays, same contract as [[rollingMean]]. Caller contract (not
    * range-checked): |value| ≲ 6e6, so cents² sums fit a long at any
    * sane window size.
    *
    * Scale shape: ONE keyed window (partitionBy key, orderBy ts) — no
    * self-join, no global sort; skewed keys are bounded by their own
    * event counts, the same posture as [[sessionize]]. */
  def anomalyZScore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, baselineRows: Int = 24, minBaseline: Int = 8,
      zThreshold: Double = 3.0, tieCol: String = "event_id"): DataFrame = {
    require(baselineRows >= 2, s"baselineRows must be >= 2: $baselineRows")
    require(minBaseline >= 2 && minBaseline <= baselineRows,
      s"minBaseline must be in 2..$baselineRows: $minBaseline")
    val cents = round(col(valueCol) * 100).cast("long")
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-baselineRows.toLong, -1L)
    val base = df
      .withColumn("_c", cents)
      .withColumn("_bn", count(col("_c")).over(w))
      .withColumn("_bs", sum(col("_c")).over(w))
      .withColumn("_bq", sum(col("_c") * col("_c")).over(w))
    zFromLegs(base, minBaseline, zThreshold)
  }

  /** The leg→score step of [[anomalyZScore]], shared with the streaming
    * twin ([[graft.streaming.EventStreams.anomalyLegsState]]): given
    * integer baseline legs `_c` (the value in cents), `_bn`/`_bs`/`_bq`
    * (count/sum/sum-of-squares of the baseline observations), append
    * `baseline_n`, `z6`, `is_anomaly` in the one fixed closed form —
    * mean = bs/bn ; var = (bq − bs·mean)/(bn−1) ; z = (c − mean)/√var —
    * so batch and streaming scores are bit-identical from equal legs. */
  private[graft] def zFromLegs(df: DataFrame, minBaseline: Int,
      zThreshold: Double): DataFrame = {
    val mean = col("_bs").cast("double") / col("_bn").cast("double")
    val variance = (col("_bq").cast("double") -
      col("_bs").cast("double") * mean) /
      (col("_bn").cast("double") - 1.0)
    val z = (col("_c").cast("double") - mean) / sqrt(variance)
    df
      .withColumn("baseline_n", col("_bn"))
      .withColumn("z6",
        when(col("_bn") >= minBaseline && variance > 0.0, round(z, 6)))
      .withColumn("is_anomaly",
        when(col("z6").isNotNull, abs(col("z6")) >= zThreshold))
      .drop("_c", "_bn", "_bs", "_bq")
  }

  /** Gaps-and-islands: coalesce overlapping-or-touching intervals per
    * key into maximal merged spans (the classic warehouse interval-merge:
    * sessions → coverage windows, maintenance spans, validity ranges).
    * Intervals are `[startCol, endCol]` in epoch micros (longs); two
    * intervals belong to one island when the later one starts at or
    * before the running max end of everything before it.
    *
    * Output: one row per island — (key, island_start_us, island_end_us,
    * n_intervals). Deterministic for any input: ties on start order by
    * end then start (the running max makes the island partition itself
    * order-insensitive).
    *
    * Scale shape: ONE keyed window (running max + running island count)
    * plus one combinable groupBy — no self-join, no global sort; the
    * inequality-join formulation this replaces is quadratic per key. */
  def intervalIslands(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val wOrd = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1L)
    df
      .withColumn("_pmax", max(col(endCol)).over(wPrev))
      .withColumn("_new",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L)
          .otherwise(0L))
      .withColumn("_island",
        sum(col("_new")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(startCol)).as("island_start_us"),
        max(col(endCol)).as("island_end_us"),
        count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** Cohort retention matrix (the product-analytics staple): users are
    * cohorted by the time bucket of their FIRST event; each cell
    * (cohort_bucket, bucket_offset) counts the distinct users of that
    * cohort active `offset` buckets later. Buckets are integral
    * `bucketSeconds` divisions of epoch time (weeks by default) —
    * offset 0 is the cohort itself, so `n_active` at offset 0 is the
    * cohort size.
    *
    * Scale shape: one user-keyed min aggregate (the cohort table), one
    * equality join back on the user key — same key, same hash
    * partitioning, AQE/bucketing reuses the exchange — and one
    * combinable distinct-count aggregate. No window, no self-join. */
  def cohortRetention(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1: $bucketSeconds")
    val div = 1000000L * bucketSeconds
    val base = events.select(col(keyCol).as("k"),
      expr(s"unix_micros($tsCol) div $div").as("b"))
    val cohorts = base.groupBy(col("k")).agg(min(col("b")).as("cohort_b"))
    base.join(cohorts, Seq("k"))
      .groupBy(col("cohort_b"), (col("b") - col("cohort_b")).as("offset"))
      .agg(countDistinct(col("k")).as("n_active"))
  }

  /** Ordered funnel analysis: per key, the earliest strictly-ordered
    * completion chain of `steps` — `t0` = first occurrence of step 0,
    * `t1` = first step-1 event strictly after `t0`, and so on (the
    * product-analytics conversion query). Returns one row per key that
    * reached step 0: epoch-micro times `t0..t{m-1}` (null once the chain
    * stalls) plus `steps_completed`.
    *
    * Scale shape: NO per-key event collection and no window — each stage
    * filters the events to ONE step type (a vanishing fraction, filter
    * pushed to the scan), aggregates min-after-previous per key, and
    * joins keyed on `keyCol`; all m−1 joins and aggregates hash on the
    * same key, so AQE/bucketing reuses one partitioning end to end. */
  def funnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(keyCol).as("k"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("us"))
    var acc = base.filter(col("et") === steps.head)
      .groupBy("k").agg(min("us").as("t0"))
    for (i <- 1 until steps.length) {
      val prev = s"t${i - 1}"
      val st = base.filter(col("et") === steps(i))
        .join(acc.select(col("k"), col(prev)), Seq("k"))
        .filter(col("us") > col(prev))
        .groupBy("k").agg(min("us").as(s"t$i"))
      acc = acc.join(st, Seq("k"), "left")
    }
    val completed = steps.indices.drop(1).map(i =>
      when(col(s"t$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.withColumn("steps_completed", completed.cast("int"))
      .withColumnRenamed("k", keyCol)
  }
}
