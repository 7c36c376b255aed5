package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over event-shaped data (ts, user_id,
  * event_type, value). The reference is batch-only (SURVEY.md §2.13); this is
  * the engine's incremental-processing extension, built entirely on Spark's
  * built-in event-time machinery so the same code runs on a `readStream`
  * source with checkpointing (Trigger.AvailableNow reproduces the
  * reference's idempotent re-run semantics, F4) or on a batch frame in tests.
  *
  * Every transform takes and returns a DataFrame so it composes with both
  * `spark.readStream` and `spark.read`.
  */
object EventStreams {

  /** Tumbling/sliding event-time windows with a watermark for late data. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      slide: Option[String] = None, watermark: String = "2 hours"): DataFrame = {
    val w = slide.map(s => window(col("ts"), window_, s))
      .getOrElse(window(col("ts"), window_))
    events
      .withWatermark("ts", watermark)
      .groupBy(w, col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Gap-based sessionization per user (session_window built-in). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming dedup: first event per (user_id, event_type) within the
    * watermark horizon — state is bounded by the watermark, which is what
    * makes this safe on an unbounded stream. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream correlation join: for each left event, the right events
    * of the SAME user landing strictly after it and within `within` —
    * the click→purchase attribution shape. Emits
    * `(user_id, l_id, r_id, gap_seconds)`.
    *
    * Streaming semantics: both sides carry watermarks and the join
    * condition carries the time bound, which is exactly what Spark needs to
    * age out per-key state — without the bound, a stream-stream join
    * buffers forever. State is further minimized by projecting each side to
    * its three join-relevant columns BEFORE the join: the state store holds
    * (key, ts, id) tuples, not whole events. On batch frames the same code
    * runs as an ordinary equi-join on user_id with a residual time filter —
    * a hash join, never a broadcast-nested-loop. */
  def correlate(left: DataFrame, right: DataFrame, within: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts"))).as("gap_seconds"))
  }

  /** Streaming spatial heatmap — the reference's signature H3 heatmap (A7,
    * East-Asia-Building-Footprints.md:243-256) lifted onto an unbounded
    * stream: watermarked event-time windows × true-H3 cell of each event's
    * location. Takes lon/lat column names so any geocoded stream (device
    * pings, geotagged documents) drops in; the aggregate partial-combines
    * map-side like any Spark agg, and state is bounded by the watermark. */
  def cellHeatmap(events: DataFrame, res: Int = 7, window_ : String = "1 hour",
      watermark: String = "2 hours", lonCol: String = "lon",
      latCol: String = "lat"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_),
        graft.functions.GraftFunctions.h3_latlng_to_cell(
          col(latCol), col(lonCol), lit(res)).as("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("cell"), col("n"))

  /** Streaming geofence enrichment — every event matched to the fences
    * within `radiusMeters` GREAT-CIRCLE distance (the canonical
    * streaming spatial shape: device pings against store/zone centers).
    * STATELESS stream-static join: the event side only gains its
    * lat-band grid keys (scalar projections), the small static fence
    * side carries the ≤9× replication, and the equi-join + haversine
    * refine run per micro-batch with no state store — so the batch form
    * is bit-equal by construction. Adds `dist_m` (the shared haversine
    * contract). */
  def geofenceIntake(events: DataFrame, fences: DataFrame,
      radiusMeters: Double,
      lonCol: String = "lon", latCol: String = "lat",
      fenceLon: String = "flon", fenceLat: String = "flat"): DataFrame =
    graft.operators.SpatialJoin.distanceJoinGeodetic(events, fences,
        radiusMeters, lonCol, latCol, fenceLon, fenceLat)
      .withColumn("dist_m", graft.operators.SpatialJoin.haversineMeters(
        col(latCol), col(lonCol), col(fenceLat), col(fenceLon)))

  /** Windowed approximate-distinct registers — HyperLogLog as STREAMING
    * state: the register MAX is monotone, so the sketch folds into one
    * ordinary watermarked window aggregation (no custom state store), and
    * each window's state is bounded at 256 rows no matter how many
    * distinct keys flow through it. Downstream,
    * [[graft.operators.Sketch.hllEstimateBy]] turns a window's registers
    * into the distinct estimate — the streaming answer to "distinct
    * users/urls per window" that never materializes a distinct set.
    * Works identically on a batch frame (the gate's batch twin). */
  def hllWindowRegisters(events: DataFrame, keyCol: String,
      window_ : String = "1 day",
      watermark: String = "2 hours"): DataFrame = {
    val (reg, rho) = graft.operators.Sketch.hllRegRho("__k")
    events
      .withColumn("__k", col(keyCol).cast("string"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), reg.as("reg"))
      .agg(max(rho).as("mx"))
      .select(col("window.start").as("window_start"), col("reg"), col("mx"))
  }

  /** Windowed count-min sketch as STREAMING state — the heavy-hitters /
    * frequency primitive over an unbounded key stream: counts are
    * SUM-mergeable, so the d×w table folds into one ordinary watermarked
    * window aggregation whose per-window state is bounded at d·16^hexChars
    * rows no matter how many distinct keys flow through. Downstream,
    * [[graft.operators.Sketch.countMinEstimate]] answers "how often did
    * key k appear in window W" from a closed window's table — without
    * ever holding per-key state. Works identically on a batch frame (the
    * gate's batch twin); same portable md5 hashing as the batch sketch,
    * so the table is SQL-replayable bucket-for-bucket. */
  def countMinWindowTable(events: DataFrame, keyCol: String,
      d: Int = 4, hexChars: Int = 3, window_ : String = "1 day",
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("__k", col(keyCol).cast("string"))
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.operators.Sketch.cmEntries("__k", d, hexChars)).as("e"))
      .groupBy(window(col("ts"), window_),
        col("e.i").as("i"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("i"),
        col("bucket"), col("cnt"))

  /** Windowed PSI drift monitor: per event-time window, the Population
    * Stability Index of a score column against a FIXED baseline share
    * vector ([[graft.operators.Eval.psi]]'s formula, streaming form) —
    * the ingest-pipeline alarm that fires when the incoming score
    * distribution walks away from the distribution the filters were tuned
    * on.
    *
    * Streaming-safe by construction: ONE stateful aggregation. The bucket
    * histogram folds into per-bucket conditional sums inside a single
    * windowed groupBy (nBuckets = |baselineShares| bounded columns), and
    * the PSI is a stateless projection over them with the baseline shares
    * baked in as literals. Works identically on a batch frame — the gate's
    * batch twin IS this function. */
  def driftMonitor(events: DataFrame, baselineShares: Array[Double],
      lo: Double, hi: Double, scoreCol: String = "value",
      window_ : String = "1 hour", watermark: String = "2 hours",
      eps: Double = 1e-4): DataFrame = {
    val nBuckets = baselineShares.length
    require(nBuckets >= 2, s"need >= 2 baseline buckets: $nBuckets")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    val bucket = least(lit(nBuckets - 1), greatest(lit(0),
      floor((col(scoreCol) - lo) / ((hi - lo) / nBuckets)).cast("int")))
    val cnts = (0 until nBuckets).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"c$i"))
    val agged = events
      .withWatermark("ts", watermark)
      .withColumn("b", bucket)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("n"), cnts: _*)
    val psiExpr = (0 until nBuckets).map { i =>
      val pb = math.max(eps, baselineShares(i))
      val pc = greatest(lit(eps), col(s"c$i").cast("double") / col("n"))
      (pc - pb) * log(pc / lit(pb))
    }.reduce(_ + _)
    agged.select(col("window.start").as("window_start"), col("n"),
      psiExpr.as("psi"))
  }

  /** Driver-side baseline histogram shares for [[driftMonitor]]: one
    * bounded nBuckets-row aggregate collect. */
  def baselineShares(df: DataFrame, scoreCol: String, lo: Double, hi: Double,
      nBuckets: Int = 10): Array[Double] = {
    val bucket = least(lit(nBuckets - 1), greatest(lit(0),
      floor((col(scoreCol) - lo) / ((hi - lo) / nBuckets)).cast("int")))
    val rows = df.groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = rows.values.sum.toDouble
    Array.tabulate(nBuckets)(i => rows.getOrElse(i, 0L) / total)
  }

  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: a per-user running
    * (count, sum) that survives across micro-batches — the escape hatch for
    * aggregations Spark's built-in windows can't express. Update mode; state
    * is one small case class per user. */
  def statefulUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { case (_, v) => n += 1; s += v }
          val next = UserRunning(user, n, s)
          state.update(next)
          Iterator(next)
      }
  }

  case class AnomalyLegs(user_id: Long, event_id: Long,
      _c: Long, _bn: Long, _bs: Long, _bq: Long)
  case class BaselineState(n: Long, s: Long, q: Long)

  /** Streaming twin of [[graft.operators.Sessions.anomalyZScore]] with an
    * EXPANDING baseline: per user, each event emits the integer baseline
    * legs (count/sum/sum-of-squares of every PRIOR event's cents) and
    * then folds itself into the state — feed the output through
    * `Sessions.zFromLegs` for scores bit-identical to the batch formula.
    * Within one invocation (a micro-batch's group, or the whole group in
    * batch form) events process in (ts, event_id) order; across
    * micro-batches the state carries, so a batch-2 event is scored
    * against everything batch 1 folded in. Late events score against the
    * state as of their ARRIVAL (the honest online contract — an online
    * scorer cannot rewrite history).
    *
    * Scale: state is 3 longs per user; the per-invocation sort buffers
    * one user's micro-batch slice. For offline scoring of a full history
    * prefer [[graft.operators.Sessions.anomalyZScore]]'s window (this
    * batch form sorts each user's entire history in one task). Append
    * mode. */
  def anomalyLegsState(events: DataFrame): org.apache.spark.sql.Dataset[AnomalyLegs] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
        col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[BaselineState, AnomalyLegs](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[BaselineState]) =>
          var st = state.getOption.getOrElse(BaselineState(0L, 0L, 0L))
          val out = rows.toIndexedSeq.sortBy(r => (r._3, r._2)).map {
            case (_, eid, _, c) =>
              val legs = AnomalyLegs(uid, eid, c, st.n, st.s, st.q)
              st = BaselineState(st.n + 1L, st.s + c, st.q + c * c)
              legs
          }
          state.update(st)
          out.iterator
      }
  }

  case class ChangeRow(id: Long, seq: Long, op: String, value: Long)

  /** Streaming CDC upsert state (the streaming twin of
    * `operators/Changelog.applyChangelog`): per key, keep the
    * highest-sequence change across micro-batches via
    * flatMapGroupsWithState — late, lower-seq arrivals can NOT overwrite
    * newer state (the out-of-order guard CDC intake needs), a winning 'D'
    * is retained as a tombstone (so a straggler update older than the
    * delete stays dead) and consumers filter `op != 'D'` for the live
    * view. Tie on seq breaks toward the later op letter, matching the
    * batch operator. Update mode; state is one 4-field case class per
    * key. Works identically on a batch frame (each group's full iterator
    * in one call) — the shared-code contract the e-gates verify. */
  def cdcLatestState(changes: DataFrame): org.apache.spark.sql.Dataset[ChangeRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = changes.sparkSession
    import spark.implicits._
    val typed = changes.select(col("id").cast("long"),
        col("seq").cast("long"), col("op").cast("string"),
        col("value").cast("long"))
      .as[(Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[ChangeRow, ChangeRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Long, String, Long)],
         state: GroupState[ChangeRow]) =>
          var cur = state.getOption.orNull
          rows.foreach { case (_, seq, op, v) =>
            if (cur == null || seq > cur.seq ||
              (seq == cur.seq && op > cur.op)) cur = ChangeRow(id, seq, op, v)
          }
          state.update(cur)
          Iterator(cur)
      }
  }
}
