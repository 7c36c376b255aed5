package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.text.{Bpe, BpeModel}

/** BPE tokenizer: deterministic histogram training, greedy rank encoding,
  * exact decode roundtrip, and the distributed train + broadcast-encode
  * path. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("trainFromHistogram: classic merges, deterministic tie-break") {
    // single word "ab" ×10: first merge fuses the only adjacent char pair,
    // second attaches the end-of-word marker
    val m1 = Bpe.trainFromHistogram(Seq(("ab", 10L)), 4)
    assert(m1.toSeq == Seq(("a", "b"), ("ab", Bpe.EOW)))
    // Sennrich-style: "est" dominates across newest/widest
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m2 = Bpe.trainFromHistogram(hist, 3)
    assert(m2(0) == ("e", "s")) // freq 9, the highest pair
    assert(m2(1) == ("es", "t")) // still 9
    assert(m2(2) == ("est", Bpe.EOW)) // 9 again — chains deterministically
    // ties broken by smallest pair: "xy" and "xz" both freq 5 → ("x","y")
    val m3 = Bpe.trainFromHistogram(Seq(("xy", 5L), ("xz", 5L)), 1)
    assert(m3.head == ("x", "y"))
    // pairs occurring once are never merged
    assert(Bpe.trainFromHistogram(Seq(("abc", 1L)), 5).isEmpty)
  }

  test("encode: greedy by rank; unseen characters stay single") {
    // exactly the 3 merges asserted above: es, est, est</w>
    val model = new BpeModel(Bpe.trainFromHistogram(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 3)
      .map { case (a, b) => a + " " + b })
    assert(model.encodeWord("newest").toSeq == Seq("n", "e", "w", "est</w>"))
    // "ba" never seen: falls back to chars + marker
    assert(model.encodeWord("zq").toSeq == Seq("z", "q", Bpe.EOW))
    assert(model.encode("").isEmpty)
  }

  test("decode inverts encode, including space edge cases") {
    val model = new BpeModel(Bpe.trainFromHistogram(
      Seq(("ab", 10L), ("abc", 4L)), 6).map { case (a, b) => a + " " + b })
    for (t <- Seq("ab abc", "ab", "x ab y", "", " ", "a  b", " lead", "trail ",
        "double  space ")) {
      assert(model.decode(model.encode(t)) == t, s"roundtrip of '$t'")
    }
    // property: random lowercase strings with irregular spacing
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val t = (1 to rnd.nextInt(12)).map(_ =>
        if (rnd.nextInt(4) == 0) " " else ('a' + rnd.nextInt(5)).toChar.toString).mkString
      assert(model.decode(model.encode(t)) == t, s"roundtrip of '$t'")
    }
  }

  test("distributed train + bpe_encode expression roundtrip and compression") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, s"the quick brown fox ${i % 7} jumps over the lazy dog ${i % 3}"))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 60, maxWords = 1000)
    assert(model.vocabSize > 0 && model.vocabSize <= 60)
    val out = docs.select(col("doc_id"), col("text"),
        bpe_encode(col("text"), model).as("toks"))
      .withColumn("joined", concat_ws("", col("toks")))
      .withColumn("expected",
        concat(regexp_replace(col("text"), lit(" "), lit(Bpe.EOW)), lit(Bpe.EOW)))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("n_words", size(split(col("text"), lit(" "))))
    assert(out.filter(col("joined") =!= col("expected")).count() == 0)
    // trained merges actually compress: far fewer tokens than base symbols
    val agg = out.agg(sum("n_tok"), sum(length(col("text")) + 1)).head
    assert(agg.getLong(0) < agg.getLong(1) / 2,
      s"expected >2x compression, got ${agg.getLong(0)} vs base ${agg.getLong(1)}")
    // and never fewer than one token per word
    assert(out.filter(col("n_tok") < col("n_words")).count() == 0)
  }
}
