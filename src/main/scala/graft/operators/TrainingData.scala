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
    val cg = grams(Scatter(corpus), "doc_id_c")
    val eg = grams(evalSet, "doc_id_e").distinct()
    // materialize the matched subset: it has TWO consumers (the hot-gram
    // count and the final anti-join+aggregate), and without buffering each
    // one re-runs the corpus-wide shingle kernel + explode + broadcast
    // join — the dominant cost of the whole operator. Matched is the
    // CONTAMINATED pair set — bounded by the eval overlap, orders of
    // magnitude below the corpus gram stream it derives from — so one
    // executor-cached pass wins at any scale (the jaccardPairs compact-
    // vs-exploded materialization rule).
    val matched = cg.join(broadcast(eg), Seq("gram"))
      .filter(col("doc_id_c") =!= col("doc_id_e"))
      .localCheckpoint(true)
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

  /** Corpus-level line deduplication (the C4 pipeline's "discard duplicate
    * lines across the corpus" stage, Raffel et al. 2020 §2.2): every line is
    * kept only at its FIRST occurrence — the (lowest doc, lowest position)
    * one — and removed everywhere else, including repeats inside one
    * document. Returns one row per input document:
    * `(doc_id, n_lines, n_kept, text_kept)` with the surviving lines
    * re-joined by the same delimiter (empty string when nothing survives).
    *
    * Scale shape (VERDICT r4 #2): boilerplate lines — the empty line, nav
    * bars, cookie banners — are the corpus's hottest keys, realistically a
    * double-digit percentage of a web crawl. A window `row_number` over
    * `partitionBy(line)` has NO partial aggregation: every occurrence of the
    * hot line ships to a single reducer (WindowExec sorts after the
    * exchange). So first-occurrence election is a `groupBy(line).agg(min(
    * struct(id, pos)))` instead — map-side combinable, each map task
    * collapses the hot line to ONE candidate row before the shuffle. The
    * winners (one row per distinct line) then regroup by winning doc for
    * reassembly and left-join to per-doc line counts; both of those shuffles
    * are keyed by doc id, where groups are bounded by document size — no hot
    * key survives past the combiner. Line strings travel once per
    * occurrence (the election) plus once per DISTINCT line (reassembly),
    * strictly less than the old rank+reassemble plan. No join on the line
    * key at all. */
  def lineDedup(docs: DataFrame, delim: String = "\n",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // null text coalesces to "" (one empty line) rather than silently
    // dropping the document from the output — posexplode of a null split
    // emits no row at all, which would make the doc vanish
    val lines = docs.select(col(idCol).as("__id"),
      posexplode(split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(delim))))
      .select(col("__id"), col("pos"), col("col").as("line"))
    // struct ordering is field-by-field, so min(struct(id, pos)) is exactly
    // the (lowest doc, lowest position) occurrence the C4 rule keeps
    val winners = lines.groupBy(col("line"))
      .agg(min(struct(col("__id"), col("pos"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.pos").as("pos"), col("line"))
    val kept = winners.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            struct(col("pos"), col("line")))),
          x => x.getField("line")), delim).as("text_kept"))
    val totals = lines.groupBy(col("__id")).agg(count(lit(1)).as("n_lines"))
    totals.join(kept, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Exact duplicate-span detection (the signal behind suffix-array
    * substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better"): every `spanLen`-character window of every
    * document, grouped across the corpus; spans appearing in at least
    * `minDocs` distinct documents come back as
    * `(span, n_docs, n_occ)` — the memorization-risk inventory a substring
    * deduper would cut.
    *
    * Scale shape: a map-only window explode (one row per character
    * position — `stride > 1` thins it for survey-level scans) into a single
    * count aggregate. With `hashed = true` the shuffle carries a 64-bit
    * `xxhash64` of each span instead of the string — at 100 TB the span
    * strings are ~spanLen× the corpus and the hash cuts shuffle bytes by
    * that factor; collisions need ~2^32 distinct spans per false merge.
    * The string form is for oracles and small corpora. */
  def dupSpans(docs: DataFrame, spanLen: Int, minDocs: Int = 2,
      stride: Int = 1, hashed: Boolean = false,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(spanLen > 0 && stride > 0, s"spanLen=$spanLen stride=$stride")
    // the span explode + hash + partial agg run pre-shuffle — scatter a
    // few-split corpus first (no-op when splits >= cores)
    val spans = Scatter(docs)
      .filter(length(col(textCol)) >= spanLen)
      .select(col(idCol).as("__id"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - ${spanLen - 1}, $stride), " +
            s"i -> substring($textCol, i, $spanLen))")).as("span"))
    val keyed = if (hashed) spans.select(col("__id"), xxhash64(col("span")).as("span"))
                else spans
    // pre-partition by span: the single-distinct aggregate otherwise plans
    // TWO corpus-sized exchanges — one keyed (span, __id) for the distinct
    // phase and one keyed (span) for the final counts, and with mostly
    // unique spans the second carries nearly every row again. With rows
    // co-located by span up front, hashpartitioning(span) satisfies both
    // phases' clustered distributions and the whole aggregate runs behind
    // ONE exchange — half the shuffle bytes of the dominant cost. (The
    // lost phase-1 map-side dedup only merged identical windows repeated
    // within one doc+task — negligible against a full second shuffle.)
    keyed.repartition(col("span"))
      .groupBy(col("span"))
      .agg(countDistinct(col("__id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** GPT-style sequence packing: concatenate documents (whitespace token
    * counts) in deterministic order and cut the stream every `budget`
    * tokens, letting documents straddle sequence boundaries. Emits one row
    * per (document, training sequence) overlap:
    * `(doc_id, shard, seq_id, n_tok_in_seq)`.
    *
    * Scale shape: a single GLOBAL running sum is a one-task window at 100 TB,
    * so packing is sharded the way training loaders shard anyway —
    * documents land in `nShards` deterministic shards (`doc_id % nShards`)
    * and each shard packs independently under
    * `Window.partitionBy(shard)` — `nShards` parallel windows, one shuffle.
    * Straddle rows come from a per-row `sequence()` explode (map-only). */
  def packSequences(docs: DataFrame, budget: Int, nShards: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && nShards > 0, s"budget=$budget nShards=$nShards")
    // null text counts as an empty document (1 whitespace token, the
    // formula's floor) instead of silently dropping the row: a null n_tok
    // would null the row's own sequence() explode while the window sum
    // skipped it — the doc would vanish but still occupy no budget, an
    // inconsistent half-presence
    val safeText = coalesce(col(textCol), lit(""))
    val nTok = (lit(1) + length(safeText)
      - length(translate(safeText, " ", ""))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        nTok.as("n_tok"))
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("end_tok", col("start_tok") + col("n_tok"))
      .withColumn("seq_id", explode(sequence(
        floor(col("start_tok") / budget),
        floor((col("end_tok") - 1) / budget))))
      .select(col(idCol), col("shard"), col("seq_id").cast("long").as("seq_id"),
        (least(col("end_tok"), (col("seq_id") + 1) * budget)
          - greatest(col("start_tok"), col("seq_id") * budget)).as("n_tok_in_seq"))
  }

  /** Deterministic corpus shuffle — the stable pseudo-random training order
    * a data loader needs, reproducible across re-runs and re-sharding
    * because it derives ONLY from (id, seed), never from row position.
    * Returns `(id, shard, pos)`: read order is (shard, pos).
    *
    * Scale shape: shard = two md5 hex chars of the seeded id hash (so any
    * SQL engine replicates it), position = rank of the hash within the
    * shard — `nShards` PARALLEL window sorts, never one global sort. At
    * 100 TB pick nShards ≈ cluster parallelism; each shard sorts
    * ~corpus/nShards rows in its own task, the same cost profile as the
    * terasort-style repartitionByRange it replaces, but with stable shard
    * identity. Map-side expression + one shuffle. */
  def shuffleDeterministic(docs: DataFrame, seed: String, nShards: Int = 64,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0 && nShards <= 256,
      s"nShards must be in 1..256 (shards come from one hash byte): $nShards")
    // a null id hashes like the empty string (concat of a null would null
    // the key → null shard); ids are expected unique — rows sharing an id
    // (or several null ids) tie on the key and their relative pos is
    // tie-broken by id only, so equal ids order arbitrarily
    val key = md5(concat(coalesce(col(idCol).cast("string"), lit("")),
      lit(":" + seed)))
    // first two hex chars → 0..255 → mod nShards; instr arithmetic is
    // portable (DuckDB strpos ≡ Spark instr, both 1-based)
    val hv = (c: Int) =>
      expr(s"instr('0123456789abcdef', substr(__key, $c, 1)) - 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    docs.select(col(idCol), key.as("__key"))
      .withColumn("shard", pmod(hv(1) * 16 + hv(2), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Per-domain document caps + blocklist — the CommonCrawl-style guard
    * against any one domain dominating the mix. Keeps at most `cap`
    * documents per domain, chosen deterministically by seeded id hash (so
    * the survivor set is stable under re-ingestion), and drops blocklisted
    * domains outright. Output carries `domain_rank` (1..cap).
    *
    * Scale shape: `row_number ≤ cap` over a domain-partitioned window is
    * rank-limit-pushed by Catalyst (WindowGroupLimit): every map task keeps
    * only its local top-`cap` per domain BEFORE the shuffle, so a hot
    * domain ships ~cap rows per upstream partition, not its full row set
    * (plan-asserted in ScalePlanSpec). For blocklists too big to inline,
    * broadcast an anti-join instead of the `isin` filter. */
  def domainCap(docs: DataFrame, domainCol: String, cap: Int,
      seed: String = "domain-cap", blocklist: Seq[String] = Nil,
      idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    // null domains form their own capped group; the blocklist filter must
    // keep them too (bare `!isin` is NULL for a null domain — it would drop
    // null-domain rows only when a blocklist is present, an inconsistency)
    val allowed =
      if (blocklist.isEmpty) docs
      else docs.filter(coalesce(!col(domainCol).isin(blocklist: _*), lit(true)))
    val key = md5(concat(coalesce(col(idCol).cast("string"), lit("")),
      lit(":" + seed)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__key"), col(idCol))
    allowed.withColumn("__key", key)
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= cap)
      .drop("__key")
  }

  /** Exact duplicate-span REMOVAL — the acting half of [[dupSpans]]'s
    * inventory (Lee et al. 2022 substring dedup): every character covered
    * by a `spanLen`-window whose content occurs at least `minCount` times
    * corpus-wide is cut, EXCEPT characters inside the span's globally
    * first occurrence (lowest (doc, offset)) — so exactly one copy of each
    * duplicated region survives, and a fully duplicated document empties
    * while its original stays intact. Returns one row per document:
    * `(doc_id, n_chars, n_removed, text_kept)`.
    *
    * Scale shape: the same map-only window explode as [[dupSpans]]
    * (hashed = 64-bit spans through the shuffle) into one count+min
    * aggregate, a join back to occurrences, and a per-doc aggregation of
    * OFFSETS (ints, bounded by doc length — never the windows themselves).
    * The cut is an O(events) interval sweep per document, expressed with
    * higher-order functions (`aggregate` over the sorted ±1 coverage
    * events), not a UDF and not per-character work. */
  def removeDupSpans(docs: DataFrame, spanLen: Int, minCount: Int = 2,
      hashed: Boolean = true, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(spanLen > 0 && minCount >= 2, s"spanLen=$spanLen minCount=$minCount")
    // null text = empty document (kept empty), like lineDedup/packSequences
    val withText = docs.withColumn("__text", coalesce(col(textCol), lit("")))
    // null-id docs can't participate in first-occurrence bookkeeping (the
    // equality join back to the doc would never match, so their windows
    // would count toward removal elsewhere while the doc itself passed
    // through uncut — a one-sided inconsistency); they bypass the index
    // entirely and come back unchanged via the left join
    val occ = withText
      .filter(col(idCol).isNotNull)
      .filter(length(col("__text")) >= spanLen)
      .select(col(idCol).as("__id"),
        posexplode(expr(
          s"transform(sequence(1, length(__text) - ${spanLen - 1}), " +
            s"i -> substring(__text, i, $spanLen))")))
      .select(col("__id"), (col("pos") + 1).as("__off"), col("col").as("__span"))
    val keyed =
      if (hashed) occ.select(col("__id"), col("__off"), xxhash64(col("__span")).as("__span"))
      else occ
    val firsts = keyed.groupBy(col("__span"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col("__id"), col("__off"))).as("__first"))
      .filter(col("__n") >= minCount)
      .select(col("__span"),
        col("__first.__id").as("__fid"), col("__first.__off").as("__foff"))
    val marks = keyed.join(firsts, Seq("__span"))
      .select(col("__id"), col("__off"),
        (col("__id") === col("__fid") && col("__off") === col("__foff")).as("__prot"))
    val perDoc = marks.groupBy(col("__id"))
      .agg(collect_list(when(!col("__prot"), col("__off"))).as("__roffs"),
        collect_list(when(col("__prot"), col("__off"))).as("__poffs"))
    // coverage events: +1/-1 at each interval edge for removable (rd) and
    // protected (pd) windows; a character is kept iff rd = 0 OR pd > 0.
    // The sweep emits the kept segments between consecutive events —
    // O(|offsets|) per doc, zero-length segments at ties are harmless.
    val events =
      s"""array_sort(concat(
            flatten(transform(coalesce(__roffs, array()), o -> array(
              named_struct('pos', o, 'rd', 1, 'pd', 0),
              named_struct('pos', o + $spanLen, 'rd', -1, 'pd', 0)))),
            flatten(transform(coalesce(__poffs, array()), o -> array(
              named_struct('pos', o, 'rd', 0, 'pd', 1),
              named_struct('pos', o + $spanLen, 'rd', 0, 'pd', -1))))))"""
    val kept =
      s"""aggregate($events,
            named_struct('cur', 1, 'rd', 0, 'pd', 0, 'acc', ''),
            (a, e) -> named_struct(
              'cur', e.pos,
              'rd', a.rd + e.rd,
              'pd', a.pd + e.pd,
              'acc', concat(a.acc,
                IF(a.rd = 0 OR a.pd > 0, substring(__text, a.cur, e.pos - a.cur), ''))),
            a -> concat(a.acc,
              IF(a.rd = 0 OR a.pd > 0,
                 substring(__text, a.cur, length(__text) + 1 - a.cur), '')))"""
    withText.join(perDoc, withText(idCol) === perDoc("__id"), "left")
      .withColumn("text_kept", expr(kept))
      .select(col(idCol),
        length(col("__text")).cast("long").as("n_chars"),
        (length(col("__text")) - length(col("text_kept"))).cast("long").as("n_removed"),
        col("text_kept"))
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

  /** Temperature-scaled domain mixing (the multilingual/multi-corpus
    * sampling rule of Arivazhagan et al. 2019 §4.2 / GPT-3 Table 2.2 /
    * PaLM): domain `d` gets a quota `⌊total · n_d^(1/T) / Σ_e n_e^(1/T)⌋`
    * — T=1 is proportional sampling, T→∞ uniform across domains — and the
    * quota is filled deterministically by seeded id-hash order, so the
    * drawn mix is stable under re-ingestion and replayable in SQL.
    *
    * Scale shape: the quota table is one tiny per-domain aggregate
    * (broadcast back); ranking is a domain-partitioned window whose
    * `row_number ≤ total` CONSTANT pre-filter lets Catalyst push a
    * WindowGroupLimit (map tasks keep their local top-`total` per domain
    * before the shuffle), then the per-domain `rank ≤ quota` filter
    * applies the real cap. Output rows carry `n_domain`, `quota`, and
    * `domain_rank` for audit. */
  def temperatureMix(docs: DataFrame, domainCol: String, total: Int,
      temperature: Double, seed: String = "temp-mix",
      idCol: String = "doc_id"): DataFrame = {
    require(total > 0, s"total must be positive: $total")
    require(temperature > 0, s"temperature must be positive: $temperature")
    val cnts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_domain"))
      .withColumn("w", pow(col("n_domain").cast("double"),
        lit(1.0 / temperature)))
    val quota = cnts.crossJoin(cnts.agg(sum("w").as("sw")))
      .select(col(domainCol), col("n_domain"),
        floor(lit(total.toDouble) * col("w") / col("sw")).cast("long")
          .as("quota"))
    val key = md5(concat(coalesce(col(idCol).cast("string"), lit("")),
      lit(":" + seed)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__key"), col(idCol))
    docs.withColumn("__key", key)
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= total)
      .join(broadcast(quota), Seq(domainCol))
      .filter(col("domain_rank") <= col("quota"))
      .drop("__key")
  }

  /** Token-budgeted temperature mixing — [[temperatureMix]]'s quota rule
    * applied to TOKEN mass instead of document counts, the form real
    * pretraining mixes are specified in ("X billion tokens of web, Y of
    * code at T=2"): domain `d` gets `⌊total · tok_d^(1/T) / Σ_e
    * tok_e^(1/T)⌋` tokens and fills it greedily in seeded id-hash order
    * (deterministic, SQL-replayable; the boundary doc that would overflow
    * the quota is excluded). Token counts must be positive non-null.
    *
    * Scale shape: the quota table is one tiny per-domain aggregate
    * (broadcast back); the fill is a domain-partitioned running-sum
    * window — parallel across domains. A `row_number ≤ total` constant
    * prefilter (valid because tokens ≥ 1 ⇒ rank ≤ cum ≤ quota ≤ total)
    * sits on its own rank-only window so Catalyst CAN turn it into a
    * map-side WindowGroupLimit — but note the optimizer only does so
    * when `total` is below `spark.sql.optimizer.windowGroupLimitThreshold`
    * (default 1000); token-scale budgets exceed that, where the filter
    * is just a cheap reducer-side guard. Caveat: one domain's rows land
    * on one reducer; if a single domain is itself corpus-scale, run
    * [[tokenBudgetSelect]] per hot domain instead (its boundary-bucket
    * machinery avoids the monolithic window). */
  def temperatureMixTokens(docs: DataFrame, domainCol: String,
      totalTokens: Long, temperature: Double,
      seed: String = "temp-mix-tok", idCol: String = "doc_id",
      tokensCol: String = "tokens"): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive: $totalTokens")
    require(temperature > 0, s"temperature must be positive: $temperature")
    val cnts = docs.groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).as("tok_domain"))
      .withColumn("w", pow(col("tok_domain").cast("double"),
        lit(1.0 / temperature)))
    val quota = cnts.crossJoin(cnts.agg(sum("w").as("sw")))
      .select(col(domainCol), col("tok_domain"),
        floor(lit(totalTokens.toDouble) * col("w") / col("sw"))
          .cast("long").as("quota"))
    val key = md5(concat(coalesce(col(idCol).cast("string"), lit("")),
      lit(":" + seed)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__key"), col(idCol))
    // TWO windows on the same (domain, key) spec: a mixed rank+sum
    // window disqualifies InsertWindowGroupLimit outright, while the
    // rank-only window qualifies whenever `total` is under the
    // configured threshold; the running sum then rides the SAME
    // partitioning+ordering — no second exchange or sort. Filtering
    // between them is exact: rank ≤ total keeps a PREFIX of each
    // domain's order (and a dropped row has cum ≥ rank > total ≥ quota),
    // so the prefix sums are unchanged.
    docs.withColumn("__key", key)
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= totalTokens)
      .withColumn("cum_tokens", sum(col(tokensCol)).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .join(broadcast(quota), Seq(domainCol))
      .filter(col("cum_tokens") <= col("quota"))
      .drop("__key")
  }

  /** One-row dataset card — the summary every corpus release ships:
    * doc/token totals, language and domain cardinalities, token-length
    * order statistics (exact interpolated percentiles), the dominant
    * domain (count argmax, ties to the lexicographically greatest name —
    * deterministic and SQL-replayable), and the exact-duplicate rate
    * from 128-bit content hashes.
    *
    * Scale shape: one map pass (token count + md5), one combinable
    * global aggregate (the percentiles are Spark's exact `percentile`,
    * a sort-based but single-column aggregate), one tiny per-domain
    * count aggregate reduced by a struct-max, broadcast back. Nothing
    * driver-side, no windows. */
  def corpusReport(docs: DataFrame, domainCol: String = "source",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val toks = expr(
      s"1 + length($textCol) - length(replace($textCol, ' ', ''))")
      .cast("long")
    val base = docs.select(col(domainCol).as("__d"), col(langCol).as("__l"),
      toks.as("__t"), md5(col(textCol).cast("binary")).as("__h"))
    val global = base.agg(
      count(lit(1)).as("n_docs"),
      sum("__t").as("n_tokens"),
      countDistinct(col("__l")).as("n_langs"),
      countDistinct(col("__d")).as("n_domains"),
      countDistinct(col("__h")).as("n_unique_texts"),
      expr("percentile(__t, 0.5)").as("median_tokens"),
      expr("percentile(__t, 0.9)").as("p90_tokens"))
    val top = base.groupBy(col("__d")).agg(count(lit(1)).as("c"))
      .agg(max(struct(col("c"), col("__d"))).as("m"))
      .select(col("m.__d").as("top_domain"), col("m.c").as("top_domain_docs"))
    global.crossJoin(broadcast(top))
      .withColumn("dup_doc_rate6", round(lit(1.0) -
        col("n_unique_texts").cast("double") / col("n_docs"), 6))
  }

  /** Per-group dataset-card slice: one row per (domain, lang) with doc
    * count, token mass, dup rate, and EXACT interpolated token-count
    * quantiles (p25/p50/p75/p95 — `percentile`, the same ≡ quantile_cont
    * bridge `corpusReport` pins). The grouped companion to the one-row
    * card: this is the table a mixture designer reads before setting
    * per-domain caps/temperatures.
    *
    * Scale shape: one hash aggregate keyed by the group; the exact
    * percentile gathers each GROUP's token-count multiset on its reducer
    * (bounded by docs-per-group, never the corpus). Groups here are
    * (domain, lang) slices — thousands of rows out. If a single group
    * were corpus-sized, swap `percentile` for `approx_percentile` — the
    * report is advisory, the quantile is its only non-combinable leg. */
  def groupReport(docs: DataFrame, domainCol: String = "source",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val toks = expr(
      s"1 + length($textCol) - length(replace($textCol, ' ', ''))")
      .cast("long")
    docs.select(col(domainCol).as("domain"), col(langCol).as("lang"),
        toks.as("__t"), md5(col(textCol).cast("binary")).as("__h"))
      .groupBy(col("domain"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__t").as("n_tokens"),
        countDistinct(col("__h")).as("n_unique_texts"),
        round(expr("percentile(__t, 0.25)"), 6).as("p25_tokens"),
        round(expr("percentile(__t, 0.5)"), 6).as("p50_tokens"),
        round(expr("percentile(__t, 0.75)"), 6).as("p75_tokens"),
        round(expr("percentile(__t, 0.95)"), 6).as("p95_tokens"),
        min("__t").as("min_tokens"),
        max("__t").as("max_tokens"))
      .withColumn("dup_doc_rate6", round(lit(1.0) -
        col("n_unique_texts").cast("double") / col("n_docs"), 6))
  }

  /** End-to-end curation: the canonical stage chain a raw crawl passes
    * before training — exact dedup (lowest id survives), a token-count
    * floor, per-domain capping in seeded-hash order, and the
    * content-stable train/val/test split — as ONE composed call whose
    * whole output is SQL-replayable (every stage reuses an
    * independently-oracled primitive). Token counting uses the
    * space-count+1 arithmetic so multi-space behavior matches the SQL
    * replay exactly.
    *
    * Scale shape: one hash aggregate (dedup), a map-side filter, one
    * rank-limit-pushed window (cap), and a map-side split — two shuffles
    * total, nothing driver-side. */
  def curate(docs: DataFrame, minTokens: Int = 20,
      domainCol: String = "source", cap: Int = 15, seed: String = "curate",
      trainUpto: Int = 205, valUpto: Int = 230,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keep = Dedup.exact(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val deduped = docs.join(keep, Seq(idCol), "left_semi")
    val filtered = deduped.filter(
      expr(s"1 + length($textCol) - length(replace($textCol, ' ', ''))")
        >= minTokens)
    val capped = domainCap(filtered, domainCol, cap, seed)
    hashSplit(capped, textCol, trainUpto, valUpto)
      .select(col(idCol), col(domainCol).as("domain"), col("domain_rank"),
        col("bucket"), col("split"))
  }

  /** Corpus snapshot diff — the incremental-curation audit between two
    * versions of a corpus: per document id, `added` (new id), `removed`
    * (id gone), `changed` (same id, different content hash), or `same`.
    * One full-outer equality join on the id with map-side content hashes;
    * nothing else shuffles. Run it before promoting a rebuilt corpus to
    * answer "what did this pipeline change?" at 100 TB without diffing
    * bytes. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("__oh"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("__nh"))
    o.join(n, Seq("id"), "full")
      .withColumn("status",
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("same"))
      .select(col("id"), col("status"))
  }

  /** Chat-format (SFT/RLHF example) validation: parse a JSON `messages`
    * array — `[{"role": ..., "content": ...}, ...]` — and check the
    * structural contract instruction-tuning pipelines enforce before a
    * conversation may enter a training mix:
    *   1. parseable, ≥ 2 turns;
    *   2. starts with `user` (or a `system` turn followed by `user`);
    *   3. after the optional system turn, roles are exactly
    *      user/assistant strictly alternating;
    *   4. every content non-empty;
    *   5. ends with an `assistant` turn (the example is complete).
    * `reason` is the FIRST failed rule in that order ("ok" when valid) —
    * a stable triage key for ingest dashboards. Per-role content lengths
    * ride along for token budgeting.
    *
    * Pure per-row work: `from_json` + higher-order functions, codegen, no
    * UDF, no shuffle — fuses into the scan at any scale. */
  def validateChat(df: DataFrame, msgsCol: String = "messages",
      idCol: String = "doc_id"): DataFrame = {
    val msgSchema = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("role",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.StringType))))
    df.withColumn("__m", from_json(col(msgsCol), msgSchema))
      .withColumn("n_turns", coalesce(size(col("__m")), lit(-1)))
      .withColumn("__roles", expr("transform(__m, x -> x.role)"))
      .withColumn("__ofs", expr("IF(__roles[0] = 'system', 1, 0)"))
      .withColumn("__starts_ok", expr(
        "__roles[0] IN ('user', 'system') AND element_at(__roles, __ofs + 1) = 'user'"))
      .withColumn("__alt_ok", expr(
        """forall(IF(n_turns - 1 < __ofs + 1, array(),
             sequence(__ofs + 1, n_turns - 1)),
           i -> __roles[i] != __roles[i - 1] AND
             __roles[i] IN ('user', 'assistant'))"""))
      .withColumn("__nonempty", expr(
        "forall(__m, x -> x.content IS NOT NULL AND length(x.content) > 0)"))
      .withColumn("__ends_ok", expr("__roles[n_turns - 1] = 'assistant'"))
      .withColumn("reason",
        when(col("__m").isNull, "parse")
          .when(col("n_turns") < 2, "short")
          .when(!col("__starts_ok"), "start")
          .when(!col("__alt_ok"), "alternate")
          .when(!col("__nonempty"), "empty")
          .when(!col("__ends_ok"), "end")
          .otherwise("ok"))
      .withColumn("valid", col("reason") === "ok")
      .withColumn("n_chars_user", coalesce(expr(
        """aggregate(filter(__m, x -> x.role = 'user'), CAST(0 AS BIGINT),
           (acc, x) -> acc + coalesce(length(x.content), 0))"""), lit(0L)))
      .withColumn("n_chars_assistant", coalesce(expr(
        """aggregate(filter(__m, x -> x.role = 'assistant'), CAST(0 AS BIGINT),
           (acc, x) -> acc + coalesce(length(x.content), 0))"""), lit(0L)))
      .select(col(idCol), col("n_turns"), col("n_chars_user"),
        col("n_chars_assistant"), col("valid"), col("reason"))
  }

  /** Chat → training record: flatten a validated conversation into one
    * role-tagged text (`<|role|>content` per turn, the chat-template
    * shape) plus LOSS-MASK SPANS — the [start, end) character ranges of
    * assistant turns, which are the only tokens an SFT loss should
    * backpropagate through. Downstream tokenization maps char spans to
    * token masks.
    *
    * One `aggregate` higher-order function builds text and spans in a
    * single left fold over the turns — per-row codegen, no UDF, no
    * shuffle. Returns `(idCol, text, mask_spans array<struct<s,e>>,
    * n_spans, mask_chars)`; unparseable rows yield null text and empty
    * spans (filter on [[validateChat]] upstream). */
  def chatToTraining(df: DataFrame, msgsCol: String = "messages",
      idCol: String = "doc_id"): DataFrame = {
    val msgSchema = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("role",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.StringType))))
    df.withColumn("__m", from_json(col(msgsCol), msgSchema))
      .withColumn("__acc", expr(
        """aggregate(
             coalesce(__m, CAST(array() AS ARRAY<STRUCT<role STRING, content STRING>>)),
             struct(CAST('' AS STRING) AS txt,
               CAST(array() AS ARRAY<STRUCT<s INT, e INT>>) AS spans),
             (acc, x) -> struct(
               concat(acc.txt, '<|', x.role, '|>', coalesce(x.content, '')) AS txt,
               IF(x.role = 'assistant',
                 array_append(acc.spans, struct(
                   CAST(length(acc.txt) + length(x.role) + 4 AS INT) AS s,
                   CAST(length(acc.txt) + length(x.role) + 4 +
                     length(coalesce(x.content, '')) AS INT) AS e)),
                 acc.spans) AS spans))"""))
      .select(col(idCol),
        when(col("__m").isNotNull, col("__acc.txt")).as("text"),
        col("__acc.spans").as("mask_spans"),
        size(col("__acc.spans")).as("n_spans"),
        expr("aggregate(__acc.spans, CAST(0 AS BIGINT), (a, sp) -> a + (sp.e - sp.s))")
          .as("mask_chars"))
  }

  /** Feature-hash bucket of a token expression: the first `hexChars` hex
    * digits of md5, decoded by the same portable `instr` arithmetic as
    * [[hashSplit]] so SQL engines agree bit-for-bit (4096 buckets at 3
    * hex chars). Pure codegen'd string arithmetic — no UDF. */
  /** SQL string literal with single quotes doubled — caller-provided
    * seeds go through [[md5Bucket]] as raw SQL text and must not be able
    * to break expression parsing. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def md5Bucket(tok: String, hexChars: Int): Column = {
    val hexVal = (c: Int) =>
      s"(instr('0123456789abcdef', substr(md5(cast($tok AS binary)), $c, 1)) - 1)"
    expr((1 to hexChars).map(hexVal)
      .reduceLeft((acc, h) => s"($acc * 16 + $h)")).cast("int")
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every raw
    * document by how much more likely its hashed-n-gram bag is under the
    * TARGET distribution than under the RAW distribution,
    * `logw(x) = Σ_tokens [ln p̂_target(b(tok)) − ln p̂_raw(b(tok))]`,
    * with unigram+bigram features hashed into `nBuckets` buckets and
    * add-one smoothing on both histograms. Resampling by these weights
    * shifts a web-scale crawl toward a quality target domain without
    * training a classifier.
    *
    * Scale shape: the two histograms are ≤`nBuckets`-row aggregates
    * (map-side combinable counts over the exploded token stream); the
    * per-bucket log-ratio table — at most `nBuckets` rows regardless of
    * corpus size — BROADCASTS to the raw-side token stream, and the
    * per-doc score is one map-side-combinable sum. Two scans of the raw
    * corpus (histogram + score), one of the target, no shuffle wider than
    * doc_id. Feature hashing is the portable md5-hex arithmetic of
    * [[hashSplit]], so the whole pipeline — buckets, smoothing, log
    * ratios — replays exactly in any SQL engine.
    *
    * Returns `(idCol, n_feats, logw)`: feature count and raw importance
    * log-weight per raw document (docs with zero features score 0). */
  def dsirWeights(raw: DataFrame, target: DataFrame, nBuckets: Int = 4096,
      bigrams: Boolean = true, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val hexChars = (math.log(nBuckets.toDouble) / math.log(16)).toInt
    require(nBuckets == math.pow(16, hexChars).toInt,
      s"nBuckets must be a power of 16 (md5 hex prefix): $nBuckets")
    // unigram + bigram feature stream: array ops + explode, per-row codegen
    def feats(df: DataFrame, outId: String): DataFrame = {
      val toks = s"filter(split($textCol, '\\\\s+'), t -> t <> '')"
      val grams =
        if (bigrams)
          s"""concat($toks, zip_with($toks, slice($toks, 2, size($toks)),
                (a, b) -> concat(a, ' ', b)))"""
        else toks
      // coalesce makes `b` non-nullable so the downstream equality join
      // infers NO isnotnull(bucket-expr) filter — without it the whole
      // 3-hex md5 arithmetic is inlined into a pushed filter and runs
      // twice per token (the j3 coalesce-key fix, docs/NOTES.md round 7);
      // -1 can never collide with a real bucket
      df.select(col(idCol).as(outId), explode_outer(expr(grams)).as("tok"))
        .filter(col("tok").isNotNull)
        .select(col(outId), coalesce(md5Bucket("tok", hexChars), lit(-1))
          .as("b"))
    }
    val rawF = feats(Scatter(raw), "rid")
    val tgtF = feats(target, "tid")
    // histograms ride bucket-row aggregates (<= nBuckets rows however
    // large the corpus is); the scalar totals are SUMS OF THE HISTOGRAMS,
    // not separate corpus scans — the token streams are read exactly
    // twice for raw (histogram + scoring) and once for target
    val rawHist = rawF.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgtHist = tgtF.groupBy("b").agg(count(lit(1)).as("ct"))
    val rawTot = rawHist.agg(sum(col("cr")).as("nr"))
    val tgtTot = tgtHist.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val ratio = rawHist.join(tgtHist, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(rawTot).crossJoin(tgtTot)
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + nBuckets)) -
          log((col("cr") + 1).cast("double") / (col("nr") + nBuckets)))
          .as("lr"))
    val scored = rawF.join(broadcast(ratio), Seq("b"))
      .groupBy(col("rid").as(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("logw"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_feats")).na.fill(0.0, Seq("logw"))
  }

  /** DSIR selection: keep the `k` raw documents with the largest
    * importance weights. `gumbelSeed` switches from deterministic top-k to
    * the paper's Gumbel-top-k resampling — equivalent to sampling without
    * replacement ∝ exp(logw) — using a HASH-derived uniform (md5 of
    * seed‖doc id), so the "randomness" is reproducible and replayable in
    * SQL, never a nondeterministic rand(). Ordering ties break by id.
    * The top-k itself is TakeOrdered (sort-free at any corpus size). */
  def dsirSelect(raw: DataFrame, target: DataFrame, k: Int,
      nBuckets: Int = 4096, bigrams: Boolean = true,
      gumbelSeed: Option[String] = None, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = dsirWeights(raw, target, nBuckets, bigrams, textCol, idCol)
    val keyed = gumbelSeed match {
      case None => w.withColumn("key", col("logw"))
      case Some(seed) =>
        // u in (0,1): 6 md5 hex chars -> (v + 0.5) / 16^6; gumbel = -ln(-ln u)
        val u = (md5Bucket(s"concat(${sqlLit(seed)}, $idCol)", 6)
          .cast("double") + 0.5) / math.pow(16, 6)
        w.withColumn("key", col("logw") - log(-log(u)))
    }
    keyed.orderBy(col("key").desc, col(idCol)).limit(k)
      .select(col(idCol), col("n_feats"), col("logw"))
  }

  /** Token-budget greedy selection: order the corpus best-first by
    * (`scoreCol` DESC, id ASC) and keep the maximal prefix whose running
    * token sum stays within `budget` — the stage that turns "scored,
    * deduped corpus" into "the N-token training set" of a
    * compute-budgeted pretraining run. Token counts must be positive
    * non-null longs, so the running sum is strictly monotone and the
    * selected set is exactly `WHERE cum_tokens <= budget` in SQL.
    *
    * Scale shape: a global running sum needs a total order but never a
    * global sort. `sampleSize` lowest-id docs sort ON THE DRIVER to give
    * `nBuckets-1` order-statistic cuts along the best-first order (the
    * [[graft.text.NgramLm.perplexityBuckets]] pattern — cuts broadcast
    * as plan literals); one tiny per-bucket token-mass aggregate
    * (≤ nBuckets rows collected) locates the single bucket the budget
    * boundary lands in; every earlier bucket is kept MAP-ONLY, and only
    * the boundary slice (~n/nBuckets rows when the sample is
    * representative) pays a single-partition running-sum window. At
    * 100 TB with nBuckets=4096 the windowed slice is ~0.02% of the
    * corpus; size nBuckets so corpus/nBuckets fits one task. Scores must
    * be non-null and NaN-free (NaN has no total order against cuts). */
  def tokenBudgetSelect(docs: DataFrame, budget: Long, scoreCol: String,
      tokensCol: String, idCol: String = "doc_id", nBuckets: Int = 256,
      sampleSize: Int = 100000): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    require(nBuckets >= 2 && nBuckets <= 65536, s"nBuckets: $nBuckets")
    require(sampleSize >= nBuckets, s"sampleSize: $sampleSize")
    // snapshot the slim frame once (double + 2 longs/row): the sample
    // action, the mass aggregate, and the returned selection all reuse
    // the materialized result instead of re-running upstream per action
    // null score/id/tokens rows cannot participate in the total order —
    // exclude them explicitly (a null bucket would otherwise poison the
    // driver's mass scan), matching the scaladoc contract
    val slim = docs.select(col(idCol).cast("long").as(idCol),
      col(scoreCol).cast("double").as("__s"),
      col(tokensCol).cast("long").as("__t"))
      .filter(col(idCol).isNotNull && col("__s").isNotNull &&
        !isnan(col("__s")) && col("__t").isNotNull)
      .localCheckpoint(true)
    val total = slim.count()
    val sampleRows =
      if (total <= sampleSize) slim.collect()
      else slim.orderBy(col(idCol)).limit(sampleSize).collect()
    require(sampleRows.nonEmpty, "tokenBudgetSelect needs a non-empty corpus")
    // best first: (score DESC, id ASC)
    val ordered = sampleRows.map(r => (r.getDouble(1), r.getLong(0)))
      .sortBy { case (s, id) => (-s, id) }
    val n = ordered.length
    val cuts = (1 until nBuckets).map { k =>
      ordered(math.max(0, (k.toLong * n / nBuckets).toInt - 1))
    }
    // a doc is past cut (sc, idc) iff it sorts strictly after it in the
    // best-first order; bucket = #cuts passed (0-based, order-respecting:
    // every row of bucket i precedes every row of bucket i+1 globally).
    // cut_rank is one codegen'd binary search per row — O(log nBuckets),
    // allocation-free (a reduced when-chain overflows Catalyst past ~1k
    // cuts; a zip_with HOF allocates a struct array per row)
    val table = graft.functions.CutTable(cuts.map(_._1).toArray,
      cuts.map(_._2).toArray)
    val bucket = cut_rank(col("__s"), col(idCol), table)
    val withB = slim.withColumn("__b", bucket)
    val mass = withB.groupBy(col("__b")).agg(sum(col("__t")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // driver prefix-scan over <= nBuckets rows: find the boundary bucket
    var acc = 0L
    var boundary = -1
    var offset = 0L
    for ((b, m) <- mass if boundary < 0) {
      if (acc + m > budget) { boundary = b; offset = acc } else acc += m
    }
    val selected =
      if (boundary < 0) withB // the whole corpus fits the budget
      else {
        val below = withB.filter(col("__b") < boundary)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__s").desc, col(idCol))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        // single-partition window over the boundary slice ONLY — bounded
        // by the bucket width, never the corpus (see scaladoc)
        val edge = withB.filter(col("__b") === boundary)
          .withColumn("__c", sum(col("__t")).over(w))
          .filter(col("__c") + lit(offset) <= budget)
          .drop("__c")
        below.unionByName(edge)
      }
    selected.select(col(idCol), col("__s").as(scoreCol),
      col("__t").as(tokensCol))
  }

  /** Weighted sampling WITHOUT replacement, ∝ `weightCol` (Efraimidis &
    * Spirakis, IPL 2006, via the equivalent Gumbel-top-k form): key =
    * ln(w) + Gumbel(0,1), keep the n largest keys. The Gumbel noise is
    * the repo's HASH-DERIVED uniform (md5 of seed ∥ id — the
    * [[dsirSelect]] trick), so the sample is deterministic given the
    * seed, reproducible across runs/partitionings, and SQL-replayable.
    *
    * Scale shape: map-only key projection + TakeOrderedAndProject (per-
    * partition top-n, combined on the driver — never a global sort).
    * Weights must be strictly positive; null/zero/negative rows are
    * excluded (ln undefined), matching the SQL replay's WHERE. */
  def weightedSample(docs: DataFrame, weightCol: String, n: Int,
      seed: String, idCol: String = "doc_id"): DataFrame = {
    require(n >= 0, s"n must be non-negative: $n")
    val u = (md5Bucket(s"concat(${sqlLit(seed)}, $idCol)", 6)
      .cast("double") + 0.5) / math.pow(16, 6)
    docs.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("samp_key",
        log(col(weightCol).cast("double")) - log(-log(u)))
      .orderBy(col("samp_key").desc, col(idCol)).limit(n)
  }

  /** PMI collocation mining (Church & Hanks 1990): adjacent-token bigrams
    * scored by pointwise mutual information,
    * pmi = ln( (n_ab/B) / ((n_a/T)·(n_b/T)) ) — the signal behind
    * multi-word-expression vocab induction and tokenizer merge seeding
    * ("new york" is a unit; "of the" is chance).
    *
    * Scale shape: bigram build is map-only (adjacent pairs from the token
    * array — no window, no self-join); unigram and bigram counts are
    * combinable hash aggregates; the two n_a/n_b lookups are plain
    * token-keyed equality joins (the vocab can exceed broadcast size at
    * corpus scale); T and B ride broadcast 1-row aggregates. `minCount`
    * drops the unstable low-count tail BEFORE the joins. */
  def collocations(docs: DataFrame, minCount: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val toks = Scatter(docs).select(split(
      regexp_replace(trim(lower(col(textCol))), "\\s+", " "), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    val tTotal = uni.agg(sum("n_tok").as("t_total"))
    val biAll = toks.filter(size(col("w")) >= 2) // sequence(0,<0) descends
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> " +
          "named_struct('w1', element_at(w, i + 1), " +
          "'w2', element_at(w, i + 2)))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val bTotal = biAll.agg(sum("n_ab").as("b_total"))
    biAll.filter(col("n_ab") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("n_tok").as("n_a")), "w1")
      .join(uni.select(col("tok").as("w2"), col("n_tok").as("n_b")), "w2")
      .crossJoin(broadcast(tTotal))
      .crossJoin(broadcast(bTotal))
      .withColumn("pmi6", round(log(
        (col("n_ab").cast("double") / col("b_total")) /
          ((col("n_a").cast("double") / col("t_total")) *
            (col("n_b").cast("double") / col("t_total")))), 6))
      .select(col("w1"), col("w2"), col("n_ab"), col("pmi6"))
  }
}
