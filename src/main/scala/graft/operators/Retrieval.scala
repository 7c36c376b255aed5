package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the document corpus — the search half of
  * training-data curation: seeding quality subsets from exemplar queries,
  * auditing what a filter kept, and benchmark leakage triage beyond exact
  * n-gram contamination (`TrainingData.contamination`).
  *
  * BM25 per Robertson & Zaragoza, "The Probabilistic Relevance Framework:
  * BM25 and Beyond" (Found. Trends IR 2009), with the Lucene-style
  * non-negative idf `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  */
object Retrieval {

  /** Per-(query, doc) BM25 scores for every doc sharing at least one term
    * with the query.
    *
    * Scale shape: the inverted index is the (doc, term, tf) aggregate —
    * map-side combinable, one shuffle keyed by (doc, term). The query set
    * is small by definition: its distinct terms BROADCAST to semi-filter
    * the index, so `df` is computed only for query terms (a ≤|terms|-row
    * aggregate, broadcast back), and candidate scoring touches only
    * postings of query terms — never the full corpus per query. Doc
    * length and the global `avgdl`/`N` scalars ride 1-row aggregates.
    * Nothing driver-side, no UDFs, no cartesian.
    *
    * Returns `(qid, did, n_hit, score)` — `n_hit` = how many of the
    * query's distinct terms the doc contains. */
  def bm25Scores(docs: DataFrame, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id",
      qIdCol: String = "query_id", qTextCol: String = "qtext"): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, 0 <= b <= 1: $k1 $b")
    def toks(c: String) = s"filter(split($c, '\\\\s+'), t -> t <> '')"
    val qterms = queries
      .select(col(qIdCol).as("qid"), explode(expr(toks(qTextCol))).as("term"))
      .distinct()
    // doc length + global scalars are MAP-ONLY (per-row token count,
    // combinable aggregate): the full corpus is never shuffled by
    // (doc, term). The only exchange keyed on terms carries query-term
    // postings exclusively — the token stream is semi-filtered against
    // the broadcast query vocabulary BEFORE the tf aggregate, so a
    // 4-term query over 60M tokens shuffles ~postings(4 terms), not 60M
    // (measured 74 s → 8 s at 1M docs).
    // dl has TWO consumers (the global scalars aggregate and the final
    // per-doc join) and tfq has two more (the df aggregate and the score
    // join) — without materialization each consumer re-tokenizes the full
    // corpus, four text passes per call. Both frames are COMPACT proxies
    // of the text (dl: 16 bytes/doc; tfq: postings of the query terms
    // only), so buffering each once follows the minhashPairs
    // compact-vs-exploded rule: two corpus passes instead of four, at any
    // scale.
    val dl = Scatter(docs).select(col(idCol).as("did"),
      expr(s"size(${toks(textCol)})").cast("long").as("dl"))
      .localCheckpoint(true)
    val scalars = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
      .select(col("n_docs"),
        (col("tot_dl").cast("double") / col("n_docs")).as("avgdl"))
    val docTerms = Scatter(docs)
      .select(col(idCol).as("did"), explode(expr(toks(textCol))).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
    val tfq = docTerms.groupBy("did", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    tfq.join(broadcast(qterms), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("did"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib", col("idf") *
        (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("qid", "did")
      .agg(count(lit(1)).as("n_hit"), sum("contrib").as("score"))
  }

  /** BM25 top-`k` per query: [[bm25Scores]] ranked by (score desc, did).
    * The per-query window is rank-limit-pushed (WindowGroupLimit) — map
    * tasks keep a local top-`k` per query before the shuffle. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id",
      qIdCol: String = "query_id", qTextCol: String = "qtext"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
    bm25Scores(docs, queries, k1, b, textCol, idCol, qIdCol, qTextCol)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Per-document top-`k` keywords by tf-idf — corpus auditing ("what is
    * this slice about"), labeling dedup/semantic clusters, and
    * topic-balance checks. idf is the smoothed `ln((N+1)/(df+1))` (never
    * negative, never divides by zero); ties on the 6-dp-rounded score
    * break by term so the cut line replays across engines.
    *
    * Scale shape: one (doc, term) combinable tf aggregate over the
    * exploded token stream; `df` is a term-keyed aggregate OF THE TF
    * TABLE (no second corpus pass); `N` rides a broadcast 1-row
    * aggregate; the top-k is a doc-partitioned rank window whose
    * `row_number ≤ k` CONSTANT filter pushes a WindowGroupLimit, so map
    * tasks keep k rows per doc before the shuffle. The tf↔df join is a
    * plain term-keyed hash join — the vocabulary can exceed broadcast
    * size at corpus scale. */
  def tfidfKeywords(docs: DataFrame, k: Int = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    def toks(c: String) = s"filter(split($c, '\\\\s+'), t -> t <> '')"
    val terms = Scatter(docs)
      .select(col(idCol).as("did"), explode(expr(toks(textCol))).as("term"))
    val tf = terms.groupBy("did", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score6", round(col("tf") *
        log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy("did").orderBy(col("score6").desc,
      col("term"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col("did").as(idCol), col("rk"), col("term"), col("tf"),
        col("df"), col("score6"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse per-query top-N lists from independent retrievers by
    * `score(q, d) = Σ_legs 1 / (kRrf + rank_leg(q, d))`, missing legs
    * contributing nothing. Rank-based fusion needs no score calibration
    * between legs — the standard way to combine sparse (BM25) and dense
    * (embedding) retrieval in a RAG / curation pipeline.
    *
    * Each leg is a `(qid, did, rk)` frame (1-based ranks, typically the
    * output of [[bm25TopK]] or `Similarity.bruteForceTopK`-shaped dense
    * ranking). Scale shape: legs union WITHOUT a shuffle, the fusion is
    * one combinable (qid, did) aggregate, and the final top-`k` is a
    * qid-partitioned rank window whose constant `rk <= k` filter pushes a
    * WindowGroupLimit. Leg inputs are already top-N-bounded per query, so
    * every post-union structure is O(|queries| · N · legs).
    *
    * Determinism: the fused score is rounded to 9 dp and ties break by
    * `did`, so the cut line replays across engines. With two legs the
    * double sum is order-independent (IEEE addition is commutative);
    * three-plus legs introduce association order — keep an eye on
    * sub-1e-9 ties there (the discrete 1/(kRrf+rk) value space makes
    * them practically impossible for N ≤ 1000).
    *
    * Returns `(qid, did, n_legs, rrf9, rk)` with `rk <= k`. */
  def rrfFuse(legs: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "need at least one leg")
    require(k >= 1, s"k must be positive: $k")
    require(kRrf >= 1, s"kRrf must be positive: $kRrf")
    val all = legs.map(_.select(col("qid"), col("did"), col("rk")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy("qid").orderBy(col("rrf9").desc, col("did"))
    all.groupBy("qid", "did")
      .agg(count(lit(1)).cast("int").as("n_legs"),
        round(sum(lit(1.0) / (lit(kRrf) + col("rk"))), 9).as("rrf9"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** Hybrid sparse+dense retrieval: BM25 over `docs` fused with cosine
    * similarity over `corpusVecs` via [[rrfFuse]]. `queries` carries the
    * lexical side (`query_id`, `qtext`); `queryVecs` the dense side
    * (same id space: `vec_id`, `embedding`); docs and vectors share the
    * document id space.
    *
    * Both legs rank on 6-dp-rounded scores with doc-id tie-breaks so
    * fused output replays bit-for-bit across engines. The dense leg
    * broadcasts the (small) query set and streams the corpus — no
    * corpus shuffle; the lexical leg inherits [[bm25Scores]]'s
    * query-vocabulary semi-filter. */
  def hybridTopK(docs: DataFrame, queries: DataFrame,
      corpusVecs: DataFrame, queryVecs: DataFrame, k: Int,
      topNPerLeg: Int = 20, kRrf: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topNPerLeg >= k, s"topNPerLeg must be >= k: $topNPerLeg < $k")
    val wLex = Window.partitionBy("qid").orderBy(col("s6").desc, col("did"))
    val lex = bm25Scores(docs, queries, k1, b)
      .withColumn("s6", round(col("score"), 6))
      .withColumn("rk", row_number().over(wLex))
      .filter(col("rk") <= topNPerLeg)
      .select("qid", "did", "rk")
    val q = queryVecs.select(col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val wDen = Window.partitionBy("qid").orderBy(col("c6").desc, col("did"))
    val dense = Scatter(corpusVecs)
      .select(col("vec_id").as("did"), col("embedding").as("nv"))
      .crossJoin(broadcast(q))
      .withColumn("c6", round(
        graft.functions.GraftFunctions.cosine_similarity(
          col("qv"), col("nv")), 6))
      .withColumn("rk", row_number().over(wDen))
      .filter(col("rk") <= topNPerLeg)
      .select("qid", "did", "rk")
    rrfFuse(Seq(lex, dense), k, kRrf)
  }

  /** Exact phrase search via positional postings — the operator BM25's
    * bag-of-words scoring cannot express (finding literal quotes,
    * benchmark prompts, or license sentences verbatim in a corpus).
    *
    * Plan: tokenize map-only, keep ONLY positions of the phrase's own
    * terms (an isin pushdown — at 100 TB the shuffle carries the phrase
    * terms' postings, a vanishing fraction of the corpus), emit one
    * (start = pos − slot, slot) candidate per matching phrase slot, and a
    * single groupBy(doc, start) counts distinct slots — a start where all
    * `m` slots check in is a verbatim occurrence. `countDistinct(slot)`
    * (not count) makes repeated phrase terms ("buffalo buffalo") exact.
    * One aggregate, no self-join chain, no window.
    *
    * Returns one row per matching doc: (`idCol`, n_matches, first_start)
    * with token-index starts. Matching is whitespace-token exact,
    * lowercased — the tokenization the oracle replays. */
  def phraseMatch(docs: DataFrame, phrase: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    require(phrase.forall(_.matches("[\\p{L}\\p{N}_-]+")),
      s"phrase terms must be bare tokens: $phrase")
    val m = phrase.length
    val phraseSql = phrase.map(w => s"'$w'").mkString(", ")
    val pos = Scatter(docs).select(col(idCol).as("id"),
        posexplode(split(
          regexp_replace(trim(lower(col(textCol))), "\\s+", " "), " ")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .filter(col("tok").isin(phrase.distinct: _*))
    val cand = pos.select(col("id"), explode(expr(
        s"transform(filter(sequence(0, ${m - 1}), " +
          s"i -> element_at(array($phraseSql), i + 1) = tok), " +
          "i -> named_struct('start', p - i, 'slot', i))")).as("e"))
      .select(col("id"), col("e.start").as("start"), col("e.slot").as("slot"))
      .filter(col("start") >= 0)
    cand.groupBy("id", "start")
      .agg(countDistinct("slot").as("nslots"))
      .filter(col("nslots") === m)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"), min("start").as("first_start"))
      .select(col("id").as(idCol), col("n_matches"), col("first_start"))
  }
}
