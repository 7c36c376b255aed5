package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.GraftFunctions._

/** Structured Streaming surface over document-shaped data (ingest_ts,
  * doc_id, text): the training-data pipeline's incremental ingestion path.
  * A 100 TB corpus is not re-scanned per crawl drop — new documents arrive
  * continuously and flow through the same quality / dedup / token-budget
  * stages the batch operators implement, with state bounded by the
  * watermark so the stream never accumulates unbounded dedup history.
  *
  * Every transform takes and returns a DataFrame, so the same code runs on
  * `spark.readStream` (checkpointed, Trigger.AvailableNow for idempotent
  * re-runs) and on a batch frame in tests — the EventStreams contract.
  */
object DocStreams {

  /** Map-only enrichment: per-document token count, quality score and
    * language id (the codegen'd kernels) — stateless, so it attaches to a
    * stream with zero state store cost. */
  def enrich(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tok", bpeish_token_count(col(textCol)))
      .withColumn("quality", quality_score(col(textCol)))
      .withColumn("lang", detect_lang(col(textCol)))

  /** Streaming corpus intake: quality floor + exact-dup suppression within
    * the watermark horizon. Dedup keys on the 128-bit content hash, not the
    * text, so the state store holds 16 bytes per doc rather than documents;
    * the watermark bounds how long a hash is remembered — the standard
    * trade for dedup on an unbounded stream (a re-crawl after the horizon
    * re-admits the doc; batch `Dedup.exact` is the exhaustive pass). */
  def intake(docs: DataFrame, minQuality: Double = 0.5,
      watermark: String = "2 hours", tsCol: String = "ingest_ts",
      textCol: String = "text"): DataFrame =
    enrich(docs, textCol)
      .filter(col("quality") >= minQuality)
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Admitted document: what [[quotaIntake]] emits per accepted row. */
  case class AdmittedDoc(domain: String, doc_id: Long, rank_in_domain: Long)

  /** Per-domain admission quota via `transformWithState` — the arbitrary-
    * state API v2 (Spark 4), which [[EventStreams]]'s
    * flatMapGroupsWithState predates: typed per-key [[ValueState]] in the
    * RocksDB state store with NATIVE TTL, so a domain's counter expires
    * `ttl` after its last update without timer bookkeeping — the rolling-
    * window form of the batch `TrainingData.domainCap`. A crawl front that
    * hammers one domain admits only the first `cap` docs per TTL horizon;
    * per-key state is one long, the 100 TB-stream shape.
    *
    * SESSION SIDE EFFECT: `transformWithState` only loads on the RocksDB
    * state store provider, so this method sets the session-wide
    * `spark.sql.streaming.stateStore.providerClass` to RocksDB and does
    * NOT restore the prior value — the setting must still be in force when
    * the returned stream actually starts, which happens after this method
    * returns, so restoring here would break the query. Every later
    * stateful query in the session inherits RocksDB (the production-grade
    * provider, so the switch is safe — but it is a visible change; set the
    * conf back explicitly if a later query must use another provider). */
  def quotaIntake(docs: DataFrame, cap: Long, ttl: java.time.Duration = null,
      domainCol: String = "source", idCol: String = "doc_id"): Dataset[AdmittedDoc] = {
    require(cap > 0, s"cap must be positive: $cap")
    val ttlConf = Option(ttl).map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    // pin the provider (see scaladoc: deliberate, unrestored session-wide
    // side effect) so callers can't hit CANNOT_LOAD_STATE_STORE
    docs.sparkSession.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // batch execution of the operator has no StateStoreCoordinator RPC
    // endpoint (only streaming queries register one) and RocksDB's
    // maintenance path fails the task looking it up — register it
    // idempotently before planning
    org.apache.spark.sql.graft.SparkInternals.ensureStateStoreCoordinator()
    implicit val outEnc = Encoders.product[AdmittedDoc]
    docs.select(col(domainCol).cast("string"), col(idCol).cast("long"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new DomainQuotaProcessor(cap, ttlConf),
        TimeMode.None(), OutputMode.Append())
  }

  /** The [[quotaIntake]] processor: admit while the TTL'd counter < cap. */
  private class DomainQuotaProcessor(cap: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, (String, Long), AdmittedDoc] {
    @transient private var admitted: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, ttl)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[AdmittedDoc] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer[AdmittedDoc]()
      while (rows.hasNext && n < cap) {
        val (_, id) = rows.next()
        n += 1
        out += AdmittedDoc(key, id, n)
      }
      admitted.update(n)
      out.iterator
    }
  }

  /** Windowed corpus telemetry: per-window doc/token counts and mean
    * quality by language — the monitoring aggregate a streaming ingest
    * pipeline emits alongside the data. */
  def windowedStats(docs: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", tsCol: String = "ingest_ts",
      textCol: String = "text"): DataFrame =
    enrich(docs, textCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("sum_tokens"),
        avg(col("quality")).as("avg_quality"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("sum_tokens"), col("avg_quality"))
}
