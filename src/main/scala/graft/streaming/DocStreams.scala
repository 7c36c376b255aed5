package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
