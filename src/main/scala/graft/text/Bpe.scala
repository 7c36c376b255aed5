package graft.text

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al., ACL 2016 — the GPT-2 /
  * sentencepiece family), trained and applied the way production LLM
  * pipelines actually do it at corpus scale:
  *
  *   1. TRAIN on the WORD HISTOGRAM, not the raw corpus. The merge loop
  *      only ever needs (word, frequency): a map-side-combinable
  *      `groupBy(word).count()` reduces 100 TB of text to a bounded
  *      top-`maxWords` table (TakeOrdered — no full sort), and the greedy
  *      pair-merge iteration runs driver-side on that histogram. This is
  *      the same shape sentencepiece/HF-tokenizers use (they pre-count
  *      words before merging) — the O(numMerges) sequential loop is
  *      inherently driver-side work on bounded state, not a shuffle.
  *   2. ENCODE as a map-only broadcast-model expression
  *      ([[graft.functions.BpeEncode]]): the merge-rank table rides to
  *      executors inside the serialized expression (codegen embeds it via
  *      `addReferenceObj`), each row is tokenized independently, and a
  *      per-executor word→tokens cache exploits the Zipfian word
  *      distribution. No shuffle, no state, scales linearly.
  *
  * Character-level symbols with an explicit end-of-word marker ([[Bpe.EOW]])
  * make decode a pure string fold (`concat tokens; EOW → space`), giving the
  * correctness gate an exact roundtrip invariant the DuckDB oracle can
  * express (reference analogue: the token-count runbook column,
  * east_asia.py's DuckDB pipelines carry no tokenizer — this extends the
  * surface per SURVEY.md §7.6).
  */
object Bpe {

  /** End-of-word marker symbol. Chosen (as in the original BPE paper) so
    * `decode(encode(text)) == text` for single-space-separated text. */
  val EOW = "</w>"

  /** Train `numMerges` merges from a (word, frequency) histogram.
    *
    * Deterministic: the best pair is the highest-frequency one, ties broken
    * by lexicographically smallest (first, then second) — selection scans
    * the count map with an explicit comparison, so hash-iteration order
    * never leaks into the result. Stops early when no adjacent pair occurs
    * at least twice (further merges would be noise).
    *
    * Incremental maintenance: after a merge only the words that CONTAIN the
    * merged pair have their pair contributions recomputed (classic fast-BPE
    * bookkeeping), so a merge step costs O(affected words), not O(corpus).
    */
  def trainFromHistogram(hist: Seq[(String, Long)], numMerges: Int): Array[(String, String)] = {
    // each word as its symbol sequence (chars + EOW), with frequency
    val words: Array[Array[String]] =
      hist.map { case (w, _) => w.toCharArray.map(_.toString) :+ EOW }.toArray
    val freqs: Array[Long] = hist.map(_._2).toArray

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val syms = words(wi); val f = freqs(wi) * sign
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (sign > 0) occurs.getOrElseUpdate(p, mutable.BitSet.empty).add(wi)
        j += 1
      }
    }
    var wi = 0
    while (wi < words.length) { addWord(wi, 1L); wi += 1 }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      // explicit scan: max count, then smallest (a, b) — deterministic
      var best: (String, String) = null
      var bestC = 1L // require count >= 2
      counts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val touched = occurs.getOrElse(best, mutable.BitSet.empty).toArray
        touched.foreach { ti =>
          addWord(ti, -1L)
          words(ti) = mergePair(words(ti), best._1, best._2)
          addWord(ti, 1L)
        }
        // occurs sets are add-only (stale entries are harmless: addWord(-1)
        // then (+1) on a word without the pair is a no-op), except the
        // merged pair itself, which can never reappear
        occurs.remove(best)
        counts.remove(best)
        step += 1
      }
    }
    merges.toArray
  }

  /** Replace every non-overlapping adjacent (a, b) with the symbol a+b,
    * left to right. */
  def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Distributed train: word histogram via map-side-combinable
    * `groupBy(word).count()`, capped at the `maxWords` most frequent
    * (deterministic `count DESC, word ASC` TakeOrdered — a top-K, never a
    * full sort), then the driver-side merge loop on the bounded histogram.
    * The collect is bounded by `maxWords`, consistent with the library's
    * bounded-driver-state policy (cf. Skew.maxHotKeys, IVF training
    * sample). */
  def train(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 200, maxWords: Int = 100000): BpeModel = {
    val hist = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    new BpeModel(trainFromHistogram(hist, numMerges).map { case (a, b) => a + " " + b })
  }
}

/** A trained BPE model: the ordered merge list, serialized as "a b" strings
  * (symbols never contain spaces — words are split ON spaces and [[Bpe.EOW]]
  * has none). Top-level class (not nested in the object) so generated Java
  * can reference it by a plain binary name from `addReferenceObj`. */
final class BpeModel(val merges: Array[String]) extends Serializable {

  /** merge pair → rank (lower merges first). Rebuilt lazily per executor. */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), i); i += 1 }
    m
  }

  /** Zipf cache: word → tokens, per executor. Bounded; once full, cold tail
    * words just re-encode (no eviction churn on the hot head). */
  @transient private lazy val cache = new ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 16

  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms: Array[String] = word.toCharArray.map(_.toString) :+ Bpe.EOW
    var continue = true
    while (continue && syms.length > 1) {
      // lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestA: String = null; var bestB: String = null
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestA = syms(j); bestB = syms(j + 1) }
        j += 1
      }
      if (bestA == null) continue = false
      else syms = Bpe.mergePair(syms, bestA, bestB)
    }
    if (cache.size < CacheCap) cache.put(word, syms)
    syms
  }

  /** Tokenize space-separated text. Empty input → empty token array. */
  def encode(text: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](text.length / 4 + 4)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) out ++= encodeWord(text.substring(start, i))
        else if (i < n) out += Bpe.EOW // empty word between two spaces keeps decode exact
        start = i + 1
      }
      i += 1
    }
    // a trailing space would otherwise be absorbed by decode's
    // strip-one-trailing-EOW; an extra marker keeps roundtrip exact
    if (n > 0 && text.charAt(n - 1) == ' ') out += Bpe.EOW
    out.toArray
  }

  /** Inverse of [[encode]] for space-separated text: concatenate and turn
    * each end-of-word marker back into the following space (no trailing
    * space after the last token). */
  def decode(tokens: Array[String]): String = {
    val sb = new java.lang.StringBuilder
    tokens.foreach(sb.append)
    val s = sb.toString
    val noTail = if (s.endsWith(Bpe.EOW)) s.substring(0, s.length - Bpe.EOW.length) else s
    noTail.replace(Bpe.EOW, " ")
  }

  def vocabSize: Int = merges.length
}
