package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model scoring for corpus quality filtering
  * — the CCNet recipe (Wenzek et al., LREC 2020: score every document
  * against an LM trained on a trusted reference corpus, then filter or
  * stratify on perplexity) with the smoothing that actually distributes:
  * Stupid Backoff (Brants et al., EMNLP 2007). Stupid Backoff needs no
  * discount-estimation pass over held-out data — the score of a token is
  * the highest-order relative frequency that exists, damped by a fixed
  * 0.4 multiplier per backed-off order:
  *
  *   S(w | w-2 w-1) = c(w-2 w-1 w) / c(w-2 w-1)        when the trigram exists
  *                  = 0.4  · c(w-1 w) / c(w-1)          else, when the bigram exists
  *                  = 0.4² · c(w) / N                   else, when the word exists
  *                  = 0.4² · 1 / N                      else (out-of-vocabulary)
  *
  * Scale shape (the reason this fits a 100 TB corpus where KenLM does
  * not): the model IS a distributed count table — one `(gram_hash, count)`
  * DataFrame covering orders 1..3, built by a single map-side gram explode
  * + hash-keyed groupBy with partial aggregation. Scoring never broadcasts
  * or collects the model: each scored position probes its five needed
  * grams (trigram, its context, bigram, its context, unigram) through ONE
  * hash-equality join against the count table, pivots back per position,
  * and aggregates per document with map-side combine. Every stage is an
  * equality shuffle or a map-side explode; nothing is driver-side and no
  * all-pairs path exists. Grams are 64-bit `xxhash64(order, words...)`
  * keys, so shuffle rows stay narrow regardless of token length.
  *
  * Determinism contract (for the oracle gate): tokens are the non-empty
  * results of splitting on a single space; positions re-index after the
  * empty filter; only positions with a full trigram context (the 3rd
  * token onward) are scored. `score_micro` is the per-position
  * `round(1e6 · (ln(num/den) + backoffs · ln 0.4))` summed as a long —
  * integer arithmetic after one correctly-rounded transcendental, the
  * repo's scaled-long convention for hash-exact float comparisons.
  */
object NgramLm {

  /** Gram-count model: `counts` is (gram_hash: long, cnt: long) over
    * orders 1..3; `total` is a 1-row (n_total: long) frame — kept as a
    * DataFrame so scoring composes without an eager driver action. */
  final case class Model(counts: DataFrame, total: DataFrame)

  private def toksCol(textCol: Column): Column =
    filter(split(coalesce(textCol, lit("")), " "), t => length(t) > 0)

  /** Train gram counts (orders 1..3) over `docs(textCol)`. One shuffle:
    * the hash-keyed count aggregation. */
  def train(docs: DataFrame, textCol: String = "text"): Model = {
    val toks = docs.select(toksCol(col(textCol)).as("toks"))
    // per-order gram hash arrays, map-side (element access is 0-based in
    // Spark SQL on array columns)
    // sequence(lo, hi) with hi < lo counts DOWN in Spark — the short-doc
    // guards keep gram ranges ascending-or-empty
    val grams = toks.select(
      concat(
        expr("transform(toks, t -> xxhash64(1, t))"),
        expr("case when size(toks) >= 2 then " +
          "transform(sequence(1, size(toks) - 1), i -> " +
          "xxhash64(2, toks[i - 1], toks[i])) " +
          "else cast(array() as array<bigint>) end"),
        expr("case when size(toks) >= 3 then " +
          "transform(sequence(2, size(toks) - 1), i -> " +
          "xxhash64(3, toks[i - 2], toks[i - 1], toks[i])) " +
          "else cast(array() as array<bigint>) end")
      ).as("hs"))
      // explode_OUTER + isNotNull, not plain explode: the inferred
      // generate filters (size > 0) INLINE the whole gram-array transform
      // — with the tokenizer re-evaluated per element access, O(n²) per
      // doc (the InferFiltersFromGenerate finding, docs/NOTES.md round 7)
      .select(explode_outer(col("hs")).as("gram_hash"))
      .filter(col("gram_hash").isNotNull)
    val counts = grams.groupBy("gram_hash").agg(count(lit(1)).as("cnt"))
    val total = toks.select(sum(size(col("toks"))).cast("long").as("n_total"))
    Model(counts, total)
  }

  private val LnBackoff = math.log(0.4)

  /** Score every document: per-doc scored-position count, per-backoff-level
    * hit counts, OOV count, the numerator/denominator count sums (integer
    * diagnostics that pin the model exactly), the scaled-long log score,
    * and the double log-probability. Documents with fewer than 3 tokens
    * score zero positions and keep zeroed columns. */
  def score(model: Model, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), toksCol(col(textCol)).as("toks"))
    // five probe rows per scored position, map-side: tag encodes which of
    // the backoff grams the row resolves
    val probes = toks
      .where(size(col("toks")) >= 3)
      .select(col(idCol), expr(
        """flatten(transform(sequence(2, size(toks) - 1), i -> array(
             struct(i as ri, 3 as tag, xxhash64(3, toks[i-2], toks[i-1], toks[i]) as gram_hash),
             struct(i as ri, 2 as tag, xxhash64(2, toks[i-2], toks[i-1]) as gram_hash),
             struct(i as ri, 1 as tag, xxhash64(2, toks[i-1], toks[i]) as gram_hash),
             struct(i as ri, 0 as tag, xxhash64(1, toks[i-1]) as gram_hash),
             struct(i as ri, -1 as tag, xxhash64(1, toks[i]) as gram_hash))))
        """).as("ps"))
      // explode_OUTER + isNotNull (see train): the inferred size(ps) > 0
      // filter would rebuild the five-probe struct array with the
      // tokenizer inlined per subscript — measured 22 s vs 1.5 s on the
      // sf0.1 corpus
      .select(col(idCol), explode_outer(col("ps")).as("p"))
      .filter(col("p").isNotNull)
      .select(col(idCol), col("p.ri"), col("p.tag"), col("p.gram_hash"))
    // ONE equality join resolves all five probe kinds
    val resolved = probes.join(model.counts, Seq("gram_hash"), "left")
      .groupBy(col(idCol), col("ri"))
      .agg(
        max(when(col("tag") === 3, col("cnt"))).as("c3"),
        max(when(col("tag") === 2, col("cnt"))).as("c2ctx"),
        max(when(col("tag") === 1, col("cnt"))).as("c2"),
        max(when(col("tag") === 0, col("cnt"))).as("c1ctx"),
        max(when(col("tag") === -1, col("cnt"))).as("c1"))
      .crossJoin(broadcast(model.total))
    val level = when(col("c3").isNotNull, 3)
      .when(col("c2").isNotNull, 2)
      .when(col("c1").isNotNull, 1)
      .otherwise(0)
    val num = when(col("c3").isNotNull, col("c3"))
      .when(col("c2").isNotNull, col("c2"))
      .when(col("c1").isNotNull, col("c1"))
      .otherwise(lit(1L)) // OOV: one pseudo-count over N
    val den = when(col("c3").isNotNull, col("c2ctx"))
      .when(col("c2").isNotNull, col("c1ctx"))
      .otherwise(col("n_total"))
    val term = log(num.cast("double") / den.cast("double")) +
      (lit(3) - greatest(level, lit(1))).cast("double") * lit(LnBackoff)
    val perPos = resolved.select(col(idCol),
      level.as("level"),
      when(level === 0, lit(0L)).otherwise(num).as("numc"),
      den.as("denc"),
      round(term * 1e6).cast("long").as("micro"),
      term.as("lp"))
    val agg0 = perPos.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_scored"),
      sum(when(col("level") === 3, 1L).otherwise(0L)).as("n_tri"),
      sum(when(col("level") === 2, 1L).otherwise(0L)).as("n_bi"),
      sum(when(col("level") === 1, 1L).otherwise(0L)).as("n_uni"),
      sum(when(col("level") === 0, 1L).otherwise(0L)).as("n_oov"),
      sum(col("numc")).as("sum_num"),
      sum(col("denc")).as("sum_den"),
      sum(col("micro")).as("score_micro"),
      sum(col("lp")).as("logprob"))
    // short documents keep zeroed diagnostics instead of vanishing
    docs.select(col(idCol)).join(agg0, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sum_num"), lit(0L)).as("sum_num"),
        coalesce(col("sum_den"), lit(0L)).as("sum_den"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"),
        col("logprob"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020 §4.3):
    * rank every document by its trusted-LM per-token log-probability and
    * cut into `nBuckets` equal-population buckets — bucket 1 (head) is the
    * most reference-like slice, the one CCNet keeps for pretraining.
    *
    * Determinism & replayability: the per-doc key is
    * `score_micro / n_scored` (a double computed from two integer-exact
    * longs — IEEE division is identical across engines) with doc-id
    * tie-break; unscored docs (< 3 tokens) sort last (worst bucket).
    * Threshold docs are the order statistics at rank `floor(k·n/nBuckets)`
    * over the SAMPLE, and a document's bucket is `1 + #(thresholds
    * lexicographically below it)` — all SQL-replayable arithmetic.
    *
    * Scale shape: CCNet computes its percentile cutoffs from a sample, and
    * so does this — `sampleSize` lowest-id docs (deterministic) sort ON THE
    * DRIVER (bounded; two longs + an id per row), the nBuckets-1 cutoffs
    * broadcast as plan literals, and assignment is MAP-ONLY over the
    * scored frame. No global sort, no unpartitioned window — the shuffle
    * cost is exactly [[score]]'s one hash join. Per-language corpora call
    * this per language, the paper's layout. */
  def perplexityBuckets(model: Model, docs: DataFrame, nBuckets: Int = 3,
      sampleSize: Int = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100, s"nBuckets: $nBuckets")
    require(sampleSize >= nBuckets, s"sampleSize: $sampleSize")
    // snapshot the scored frame once (3 longs/row): the sample action,
    // the count, and the returned assignment all reuse the materialized
    // result instead of re-running the scoring join per action
    val scored = score(model, docs, idCol, textCol)
      .select(col(idCol), col("n_scored"), col("score_micro"))
      .localCheckpoint(true)
    val total = scored.count()
    // TakeOrdered allocates a k-entry heap PER TASK — only pay it when
    // the corpus actually exceeds the sample budget
    val sampleRows =
      if (total <= sampleSize) scored.collect()
      else scored.orderBy(col(idCol)).limit(sampleSize).collect()
    val sample = sampleRows.map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    require(sample.nonEmpty, "perplexityBuckets needs a non-empty corpus")
    // best first: (scored?, per-token log-prob DESC, id) — a higher
    // log-probability is MORE reference-like (lower perplexity);
    // unscored docs sort last
    val ordered = sample.sortBy { case (n, micro, id) =>
      (n == 0L, if (n == 0L) 0.0 else -micro.toDouble / n, id)
    }
    val n = ordered.length
    val cuts = (1 until nBuckets).map { k =>
      ordered(math.max(0, (k.toLong * n / nBuckets).toInt - 1) + 0)
    }
    // a doc is past cut (nc, microc, idc) iff it sorts strictly after it
    // in the best-first order above
    def after(cut: (Long, Long, Long)): Column = {
      val (nc, microc, idc) = cut
      val unscored = col("n_scored") === 0L
      // ANSI mode evaluates both OR branches: guard the division
      val r = when(unscored, lit(0.0))
        .otherwise(col("score_micro").cast("double") / col("n_scored"))
      if (nc == 0L) {
        // cut is an unscored doc: only unscored docs with larger id follow
        unscored && col(idCol) > idc
      } else {
        val rc = microc.toDouble / nc
        unscored || (r < rc) || (r === rc && col(idCol) > idc)
      }
    }
    val bucket = cuts.map(c => when(after(c), 1).otherwise(0))
      .reduce(_ + _) + 1
    scored.select(col(idCol), col("n_scored"), col("score_micro"),
      bucket.cast("int").as("bucket"))
  }
}
