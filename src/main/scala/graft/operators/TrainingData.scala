package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Training-corpus preparation operators beyond dedup: context-window
  * chunking, benchmark decontamination, and stratified mix sampling — the
  * stages between "raw deduped text" and "training batches" in an LLM data
  * pipeline. All are single-shuffle-or-less declarative plans.
  */
object TrainingData {

  /** Split documents into fixed-token-budget chunks: one output row per
    * chunk, `(doc_id, chunk_id, tok_start, n_tok)` with whitespace-token
    * indexing. Pure per-row explode — no shuffle at all; at 100 TB this is
    * a map-only stage that parallelizes with the scan. `overlap` tokens of
    * stride overlap carry context across chunk boundaries (0 = disjoint). */
  def chunkTokens(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    docs
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, greatest(0, cast(ceil((size(split($textCol, ' ')) " +
            s"- $overlap) / $stride.0) as int) - 1)), " +
          s"c -> least($maxTokens, size(split($textCol, ' ')) - c * $stride))")))
      .select(col(idCol), col("pos").as("chunk_id"),
        (col("pos") * stride).as("tok_start"), col("col").as("n_tok"))
  }

  /** Benchmark decontamination probe: corpus documents sharing at least one
    * word `n`-gram with the held-out `evalSet`. Returns one row per
    * contaminated corpus doc with the count of distinct matching eval docs.
    *
    * Scale shape: the eval set is always tiny relative to the corpus
    * (thousands of benchmark docs vs a 100 TB corpus), so its exploded
    * grams are BROADCAST and the corpus side never shuffles in full — the
    * whole probe is a map-side explode + broadcast hash join; the only
    * shuffles run over the matched subset (corpus rows that hit an eval
    * gram). `maxPosting` drops grams shared by more than that many corpus
    * docs (boilerplate carries no contamination signal but quadratic cost);
    * the hot-gram count is computed over the matched subset too — posting
    * counts of unmatched grams are irrelevant, so no full-corpus
    * aggregation is ever needed. */
  def contamination(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id",
      maxPosting: Int = 10000): DataFrame = {
    // grams travel as 64-bit hashes (the codegen'd shingle_hashes kernel,
    // distinct per doc), not strings: at corpus scale the string grams are
    // most of the map-side cost (~25 bytes built per gram vs one long) —
    // measured 3× on the 1M-doc stress. Hash equality stands in for string
    // equality; a cross-side collision needs |corpus grams|·|eval grams|
    // ≈ 2^64, vanishing at any realistic size. Docs shorter than n words
    // produce no grams (explicit filter — the kernel would hash the whole
    // short text instead).
    def grams(df: DataFrame, outId: String): DataFrame =
      df.filter(size(split(col(textCol), " ")) >= n)
        .select(col(idCol).as(outId),
          explode(shingle_hashes(col(textCol), lit(n))).as("gram"))
    val cg = grams(corpus, "doc_id_c")
    val eg = grams(evalSet, "doc_id_e").distinct()
    val matched = cg.join(broadcast(eg), Seq("gram"))
      .filter(col("doc_id_c") =!= col("doc_id_e"))
    // hot-gram cap over the matched subset only: posting count = distinct
    // corpus docs containing the gram, identical to a full-corpus count for
    // every gram that can reach the output
    val hot = matched.groupBy("gram")
      .agg(countDistinct(col("doc_id_c")).as("n_docs"))
      .filter(col("n_docs") > maxPosting)
      .select("gram")
    matched.join(broadcast(hot), Seq("gram"), "left_anti")
      .groupBy(col("doc_id_c").as(idCol))
      .agg(countDistinct(col("doc_id_e")).as("n_eval_docs"),
        countDistinct(col("gram")).as("n_shared_grams"))
  }

  /** Repetition quality signals (the Gopher/MassiveText repetition filters,
    * Rae et al. 2021 §A1.1.3): per document, total/distinct word counts, the
    * top single-word count and the top word-bigram count. High
    * `top_word_n / n_words` or `top_bigram_n / n_words` flags degenerate
    * repetitive text (boilerplate, keyword stuffing, decoding loops) that
    * survives dedup but poisons training mixes.
    *
    * Scale shape: explode → two-level hash aggregate, all map-side
    * combinable (partial max/count per partition before the shuffle), so the
    * shuffle carries one row per (doc, distinct word|bigram) — never the raw
    * token stream. No driver-side state; fractions are left to the caller so
    * the gate can emit exact integers (double division rounds differently
    * across engines at .5 ulp boundaries). */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("word"))
    val uni = words.groupBy("id", "word").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_word_n"))
    // consecutive-word bigrams via index arithmetic on the split array;
    // guard the 1-word doc (sequence(1, 0) would DESCEND in Spark)
    val bigrams = docs.select(col(idCol).as("id"),
      explode(expr(
        s"CASE WHEN size(split($textCol, ' ')) < 2 THEN array() " +
          s"ELSE transform(sequence(1, size(split($textCol, ' ')) - 1), " +
          s"i -> concat(element_at(split($textCol, ' '), i), ' ', " +
          s"element_at(split($textCol, ' '), i + 1))) END")).as("bigram"))
    val bg = bigrams.groupBy("id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_bigram_n"))
    uni.join(bg, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_words"), col("n_distinct_words"),
        col("top_word_n"), coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  /** Deterministic content-stable train/val/test split: bucket 0..255 from
    * the first two hex chars of md5(text), thresholds in bucket units
    * (e.g. 205/230 ≈ 80/10/10). Hashing CONTENT (not ids or row position)
    * keeps the assignment stable under re-sharding, re-ordering, and
    * re-ingestion — the property that stops eval contamination when the
    * corpus is rebuilt. Pure map-side expression; no shuffle, no UDF. */
  def hashSplit(docs: DataFrame, textCol: String = "text",
      trainUpto: Int = 205, valUpto: Int = 230): DataFrame = {
    require(0 <= trainUpto && trainUpto <= valUpto && valUpto <= 256,
      s"need 0 <= trainUpto <= valUpto <= 256: $trainUpto, $valUpto")
    val hexVal = (c: Int) => // value of hex char at 1-based position c
      expr(s"instr('0123456789abcdef', substr(md5(cast($textCol AS binary)), $c, 1)) - 1")
    val bucket = (hexVal(1) * 16 + hexVal(2)).cast("int")
    docs.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainUpto, "train")
          .when(col("bucket") < valUpto, "val")
          .otherwise("test"))
  }

  /** PII scrub patterns, applied in order (emails first — they contain the
    * dots and digits the later patterns would mangle; then IPv4; then long
    * digit runs). All patterns are portable RE2/Java regex (no lookaround,
    * no backreferences) so SQL engines agree on the result. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>",
    "[0-9]{6,}" -> "<NUM>")

  /** Redact PII-shaped spans (emails, IPv4 addresses, ≥6-digit runs) from a
    * text column. Pure map-side `regexp_replace` chain — codegen'd, no UDF,
    * no shuffle; at 100 TB this fuses into the scan projection. */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** Stratified downsampling for training-mix reweighting: keep a
    * per-stratum fraction of rows, decided deterministically from `keyExpr
    * mod 100` (pass e.g. `pmod(xxhash64(col), 100)` for hash sampling or a
    * plain id column for reproducible audits). `ratesPct` maps stratum →
    * keep-percentage; strata not listed keep everything. Pure filter — no
    * shuffle, fully pushdown-friendly. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyExpr: Column,
      ratesPct: Map[String, Int]): DataFrame = {
    require(ratesPct.values.forall(r => r >= 0 && r <= 100),
      s"rates must be percentages in [0,100]: $ratesPct")
    val keep = ratesPct.foldLeft(lit(100)) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(rate)).otherwise(acc)
    }
    df.filter(pmod(keyExpr, lit(100)) < keep)
  }
}
