package graft.text

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo, ACL 2018 "Subword Regularization" — the
  * sentencepiece-unigram family, the other production tokenizer besides
  * BPE). Same corpus-scale shape as [[Bpe]]:
  *
  *   1. TRAIN on the bounded WORD HISTOGRAM (map-side-combinable count +
  *      TakeOrdered top-`maxWords`); seeding + EM run driver-side on that
  *      bounded state. Seed vocabulary = every substring of histogram
  *      words up to `maxPieceLen`, weighted by word frequency, top
  *      `seedSize` — plus every single character (kept unconditionally,
  *      the coverage guarantee that makes encoding total). EM is the
  *      hard (Viterbi) variant: the E-step segments each histogram word
  *      under current piece log-probs and accumulates frequency-weighted
  *      piece counts; the M-step re-normalizes and prunes to the target
  *      vocabulary (all single chars + top multi-char pieces by
  *      probability). Hard EM is deterministic — no sampling — which the
  *      oracle contract needs; the soft forward-backward E-step changes
  *      probabilities, not the decode∘encode identity this library pins.
  *   2. ENCODE as the map-only broadcast-model expression
  *      [[graft.functions.UnigramEncode]]: per-word Viterbi segmentation
  *      maximizing Σ log p(piece), per-executor word cache, no shuffle.
  *
  * Word boundaries use [[Bpe.EOW]] as a standalone token after every word
  * (sentencepiece's ▁ prefix transposed to the suffix convention [[Bpe]]
  * already established), so `decode(encode(text)) == text` exactly and
  * the DuckDB oracle can express the roundtrip contract. */
object Unigram {

  /** Train from a (word, frequency) histogram. Deterministic: seed
    * selection orders by (weighted count desc, piece asc); Viterbi breaks
    * score ties toward the segmentation found first in ascending
    * start-position scan; pruning orders by (prob desc, piece asc). */
  def trainFromHistogram(hist: Seq[(String, Long)], vocabSize: Int,
      seedSize: Int = 2000, emIters: Int = 4,
      maxPieceLen: Int = 8): UnigramModel = {
    require(vocabSize >= 1 && seedSize >= 1 && emIters >= 1 && maxPieceLen >= 1)
    // substring seed counts, frequency-weighted
    val subCounts = mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          subCounts(p) = subCounts.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    if (subCounts.isEmpty) return new UnigramModel(Array.empty, Array.empty)
    val chars: Set[String] = subCounts.keysIterator.filter(_.length == 1).toSet
    val seeds: Seq[String] = chars.toSeq ++
      subCounts.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)
    // init probs proportional to weighted counts
    var pieces = seeds.sorted.toArray
    var logp: Map[String, Double] = {
      val tot = pieces.map(subCounts(_).toDouble).sum
      pieces.map(p => p -> math.log(subCounts(p) / tot)).toMap
    }
    var it = 0
    while (it < emIters) {
      // E: Viterbi-segment each histogram word, accumulate piece counts
      val counts = mutable.HashMap.empty[String, Double]
      val m = new UnigramModel(logp.keys.toArray.sorted,
        logp.keys.toArray.sorted.map(logp))
      hist.foreach { case (w, f) =>
        m.segmentWord(w).foreach { p =>
          counts(p) = counts.getOrElse(p, 0.0) + f.toDouble
        }
      }
      // M: renormalize over surviving pieces (chars always survive), prune
      val kept = counts.keysIterator.filter(_.length > 1).toSeq
        .sortBy(p => (-counts(p), p)).take(math.max(0, vocabSize - chars.size))
      val alive = chars.toSeq ++ kept
      val tot = alive.map(p => counts.getOrElse(p, 0.5)).sum // chars floor 0.5
      logp = alive.map(p => p -> math.log(counts.getOrElse(p, 0.5) / tot)).toMap
      it += 1
    }
    pieces = logp.keys.toArray.sorted
    new UnigramModel(pieces, pieces.map(logp))
  }

  /** Distributed train: word histogram (one combinable shuffle, bounded
    * TakeOrdered collect — the [[Bpe.train]] shape), then driver EM. */
  def train(docs: DataFrame, textCol: String = "text", vocabSize: Int = 400,
      maxWords: Int = 100000, seedSize: Int = 2000, emIters: Int = 4,
      maxPieceLen: Int = 8): UnigramModel = {
    val hist = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromHistogram(hist, vocabSize, seedSize, emIters, maxPieceLen)
  }
}

/** A trained unigram model: sorted piece array + matching log-probs.
  * Top-level class so generated Java can reference it from
  * `addReferenceObj` (the [[BpeModel]] pattern). */
final class UnigramModel(val pieces: Array[String],
    val logProbs: Array[Double]) extends Serializable {
  require(pieces.length == logProbs.length)

  @transient private lazy val lp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logProbs(i)); i += 1 }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  /** unknown-character score: below every real piece, so unknowns only
    * ever stand alone (keeps decode exact for out-of-training chars) */
  @transient private lazy val unkScore: Double =
    (if (logProbs.isEmpty) 0.0 else logProbs.min) - 20.0

  @transient private lazy val cache = new ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 16

  /** Viterbi segmentation of one word: maximize Σ log p(piece). Ties break
    * toward the candidate discovered first (ascending start position, so
    * longer final pieces win on equal score only via strict >). */
  def segmentWord(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      // always allow the single-char fallback even past maxLen bounds
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val s = lp.get(piece)
          val score =
            if (s != null) best(j) + s.doubleValue
            else if (i - j == 1) best(j) + unkScore
            else Double.NegativeInfinity
          if (score > best(i)) { best(i) = score; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverseIterator.toArray
  }

  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val toks = segmentWord(word) :+ Bpe.EOW
    if (cache.size < CacheCap) cache.put(word, toks)
    toks
  }

  /** Tokenize space-separated text — the exact [[BpeModel.encode]] word
    * walk, so the roundtrip contract (decode = concat, EOW→space) is
    * shared between both tokenizer families. */
  def encode(text: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](text.length / 4 + 4)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) out ++= encodeWord(text.substring(start, i))
        else if (i < n) out += Bpe.EOW
        start = i + 1
      }
      i += 1
    }
    if (n > 0 && text.charAt(n - 1) == ' ') out += Bpe.EOW
    out.toArray
  }

  def decode(tokens: Array[String]): String = {
    val sb = new java.lang.StringBuilder
    tokens.foreach(sb.append)
    val s = sb.toString
    val noTail = if (s.endsWith(Bpe.EOW)) s.substring(0, s.length - Bpe.EOW.length) else s
    noTail.replace(Bpe.EOW, " ")
  }

  def vocabSize: Int = pieces.length
}
