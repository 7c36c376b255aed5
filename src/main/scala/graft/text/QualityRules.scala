package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named document-quality rule batteries from the public pipeline papers —
  * the Gopher heuristics (Rae et al. 2021, Appendix A1.1) and the C4 line
  * filters (Raffel et al. 2020 §2.2). Unlike [[TextLib.qualityScore]]'s
  * single scalar, these emit the per-rule verdicts pipelines actually
  * gate and audit on ("which rule killed this doc").
  *
  * Everything is Column arithmetic over split/filter/aggregate HOFs — no
  * kernel, no UDF — and replays verbatim in ANSI SQL. Every threshold
  * compares INTEGER cross-products (e.g. mean word length in [3,10] is
  * `3·n_words ≤ Σlen ≤ 10·n_words`), so there is no floating point
  * anywhere and oracle hashes match bit-for-bit.
  *
  * Shape notes for scale: the word/line arrays are materialized ONCE as
  * intermediate columns and every count reads the shared attribute —
  * staged projections that CollapseProject keeps apart, instead of one
  * giant struct expression that would re-split the text per rule
  * (~15×). Spark's higher-order functions are CodegenFallback, so this
  * Project is interpreted — a deliberate trade: it stays a map-only,
  * shuffle-free pass that rides the scan, and the per-row cost is one
  * tokenization + O(words) counting.
  */
object QualityRules {

  /** Gopher's stop-word presence list (Rae et al. 2021 A1.1). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def flag(c: Column): Column = when(c, 1).otherwise(0)

  /** Append the Gopher rule battery to `docs`: integer evidence columns
    * `n_words`, `sum_len` (total word chars), `n_sym` (`#` and `...`
    * marks), `n_lines`, `n_bullet` (lines starting `- ` / `* `),
    * `n_ellip` (lines ending `...`), `n_alpha` (words containing a
    * letter), `n_stop` (distinct stop-words present); 0/1 flags
    * `g_words` (50 ≤ n_words ≤ 100000), `g_mean` (mean word length in
    * [3,10]), `g_sym` (symbol ratio ≤ 0.1), `g_bullet` (≤ 10% bullet
    * lines), `g_ellip` (≤ 30% ellipsis lines), `g_alpha` (≥ 80%
    * alphabetic words), `g_stop` (≥ 2 stop-words); `pass` = all seven. */
  def gopher(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val staged = docs
      .withColumn("__ws", filter(split(text, "[ \n]"), w => w =!= ""))
      .withColumn("__ls", split(text, "\n"))
    val ws = col("__ws")
    val ls = col("__ls")
    val counted = staged
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("sum_len", aggregate(ws, lit(0L), (a, w) => a + length(w)))
      .withColumn("n_sym",
        (length(text) - length(replace(text, lit("#"), lit(""))))
          .cast("long") +
          ((length(text) - length(replace(text, lit("..."), lit("")))) / 3)
            .cast("long"))
      .withColumn("n_lines", size(ls).cast("long"))
      .withColumn("n_bullet", size(filter(ls,
        l => l.startsWith("- ") || l.startsWith("* "))).cast("long"))
      .withColumn("n_ellip",
        size(filter(ls, l => l.endsWith("..."))).cast("long"))
      .withColumn("n_alpha",
        size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stop", StopWords.map(s =>
        when(array_contains(ws, s), 1L).otherwise(0L)).reduce(_ + _))
      .drop("__ws", "__ls")
    counted
      .withColumn("g_words",
        flag(col("n_words") >= 50L && col("n_words") <= 100000L))
      .withColumn("g_mean", flag(lit(3L) * col("n_words") <= col("sum_len")
        && col("sum_len") <= lit(10L) * col("n_words")))
      .withColumn("g_sym", flag(lit(10L) * col("n_sym") <= col("n_words")))
      .withColumn("g_bullet",
        flag(lit(10L) * col("n_bullet") <= col("n_lines")))
      .withColumn("g_ellip",
        flag(lit(10L) * col("n_ellip") <= lit(3L) * col("n_lines")))
      .withColumn("g_alpha",
        flag(lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")))
      .withColumn("g_stop", flag(col("n_stop") >= 2L))
      .withColumn("pass", col("g_words") * col("g_mean") * col("g_sym") *
        col("g_bullet") * col("g_ellip") * col("g_alpha") * col("g_stop"))
  }

  /** Append C4's line-level cleanup + document verdicts (Raffel et al.
    * 2020 §2.2): keep only lines that end in terminal punctuation
    * (. ! ? ") AND have ≥ `minLineWords` words; the document survives
    * iff ≥ `minSentences` lines remain, no "lorem ipsum", and no `{`
    * (the code tell). Adds `clean_text` (kept lines rejoined by \n),
    * `n_kept`, and 0/1 flags `c_sentences`, `c_lorem`, `c_brace`,
    * `keep`. */
  def c4(docs: DataFrame, textCol: String = "text", minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val text = col(textCol)
    val staged = docs.withColumn("__kept",
      filter(split(text, "\n"), l =>
        (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
          l.endsWith("\"")) &&
          size(filter(split(l, " "), w => w =!= "")) >= minLineWords))
    val counted = staged
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .drop("__kept")
    counted
      .withColumn("c_sentences",
        flag(col("n_kept") >= minSentences.toLong))
      .withColumn("c_lorem", flag(!lower(text).contains("lorem ipsum")))
      .withColumn("c_brace", flag(!text.contains("{")))
      .withColumn("keep",
        col("c_sentences") * col("c_lorem") * col("c_brace"))
  }
}
