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

  /** Classifier-scored intake: the TRAINED fastText-shape quality model
    * ([[graft.text.TextClassifier]]) rides inside the expression
    * (broadcast-model codegen), so scoring an unbounded stream is
    * STATELESS — no state store, no shuffle, no per-batch retrain; the
    * streaming twin of the curate quality stage with a LEARNED score
    * instead of the heuristic. Emits `clf_score` (raw logit) and keeps
    * rows at or above `minScore`. */
  def classifierIntake(docs: DataFrame,
      model: graft.text.TextClassifier.ClfModel, minScore: Double,
      textCol: String = "text"): DataFrame =
    docs.withColumn("clf_score", classifier_score(col(textCol), model))
      .filter(col("clf_score") >= minScore)

  /** Bloom-blocklist streaming intake: drop documents whose key hits a
    * baked [[graft.operators.Sketch.bloomBitmaps]] set (seen-before ids,
    * known-bad URLs) — the a14 join-prune shape lifted onto an unbounded
    * stream. The bitmaps ride the plan as literals, so the gate is a
    * STATELESS map-only filter: no state store, no shuffle, no join, and
    * the blocklist never reshuffles per batch (the e11 broadcast-model
    * posture). Bloom false positives DROP a rare clean row (deterministic
    * which ones); false negatives are impossible, so nothing blocked ever
    * leaks through — the right asymmetry for a blocklist. */
  def bloomBlocklistIntake(docs: DataFrame, bitmaps: Array[String],
      hexChars: Int, keyCol: String = "doc_id"): DataFrame =
    docs.withColumn("blocked",
        // string-normalize the key so stream probes hash identically to
        // the string-keyed bloom build (and its oracle replay)
        graft.operators.Sketch.bloomMightContain(
          s"CAST($keyCol AS STRING)", bitmaps, hexChars))
      .filter(!col("blocked")).drop("blocked")

  /** Rule-gated streaming intake: the named Gopher battery + C4 line
    * filters ([[graft.text.QualityRules]]) applied to an unbounded
    * stream. Both batteries are stateless map-only projections — no
    * state store, no shuffle, no model — so a crawl front is gated by
    * the SAME named rules the batch pipeline audits on, with every
    * per-rule verdict retained on the admitted rows for routing and
    * debugging ("which rule nearly killed this"). */
  def rulesIntake(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.text.QualityRules.c4(
        graft.text.QualityRules.gopher(docs, textCol), textCol)
      .filter(col("pass") === 1 && col("keep") === 1)

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

  /** Streaming near-dup intake: each arriving document probes the EXISTING
    * corpus's MinHash-LSH band lattice — the streaming sibling of
    * [[graft.operators.Dedup.minhashPairs]] in the incremental-dedup shape
    * ([[graft.operators.Dedup.incrementalDedup]] /
    * [[VectorStreams.ivfIntake]]): the small arriving side does the
    * moving, the corpus never shuffles.
    *
    * Per micro-batch, the batch's signatures band map-side and BROADCAST
    * onto the corpus's map-only banding — one equality join on
    * (band, bucket) in which the corpus carries no Exchange at all
    * (asserted in ScalePlanSpec). A candidate pair surfaces once per
    * shared band, so the FIRST-SHARED-BAND filter (the
    * `RangeJoin.overlapJoin` dedup trick) keeps exactly one copy
    * statelessly — no `distinct`, which on a stream would be an unbounded
    * state store. Every stage is a stateless map or broadcast join, so the
    * result is append-mode legal with no watermark.
    *
    * LSH bounds recall (a pair must share at least one band), but every
    * surfaced candidate is verified EXACTLY: both sides carry their
    * sorted-distinct shingle-hash sets through the join and the pair's
    * true Jaccard gates the output — the standard candidates-then-verify
    * LSH pipeline, and (unlike the signature estimate) deterministic for
    * an oracle to replay. Returns (qid, nid, est_jaccard, jaccard) for
    * pairs with exact `jaccard >= minJaccard`, banded identically to
    * `minhashPairs` (same kernels, same seed). */
  def nearDupIntake(newDocs: DataFrame, corpus: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 64, bands: Int = 16, shingle: Int = 3,
      minJaccard: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(k % bands == 0,
      s"k ($k) must be a multiple of bands ($bands)")
    val rows = k / bands
    def banded(df: DataFrame, id: String, sig: String, sh: String) =
      df.select(col(idCol).as(id),
        shingle_hashes(col(textCol), lit(shingle)).as(sh))
        .select(col(id), col(sh),
          minhash_signature(col(sh), lit(k), lit(seed)).as(sig))
        .select(col(id), col(sh), col(sig), posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), " +
            s"b -> hash(slice($sig, b * $rows + 1, $rows), b))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // deliberately NO Scatter on the corpus: its plan re-executes every
    // micro-batch and must stay exchange-free (the incremental contract)
    val corpusBands = banded(corpus, "nid", "nsig", "nsh")
    val batchBands = banded(newDocs, "qid", "qsig", "qsh")
    corpusBands.join(broadcast(batchBands), Seq("band", "bucket"))
      .withColumn("first_band", expr(
        s"element_at(filter(transform(sequence(0, ${bands - 1}), " +
          s"b -> IF(hash(slice(qsig, b * $rows + 1, $rows), b) = " +
          s"hash(slice(nsig, b * $rows + 1, $rows), b), b, -1)), " +
          "v -> v >= 0), 1)"))
      .filter(col("band") === col("first_band"))
      .withColumn("est_jaccard", expr(
        s"aggregate(zip_with(qsig, nsig, (x, y) -> IF(x = y, 1, 0)), " +
          s"0, (acc, v) -> acc + v) / $k.0"))
      .withColumn("jaccard", jaccard_sorted(col("qsh"), col("nsh")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("qid"), col("nid"), col("est_jaccard"), col("jaccard"))
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
