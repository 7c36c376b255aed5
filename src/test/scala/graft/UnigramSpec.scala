package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Bpe, Unigram, UnigramModel}

class UnigramSpec extends AnyFunSuite {

  test("Viterbi picks the higher-likelihood segmentation") {
    // p(ab) large, p(a)/p(b) small: "ab" must come out whole; "ba" must
    // fall back to chars
    val m = new UnigramModel(Array("a", "ab", "b"),
      Array(math.log(0.1), math.log(0.8), math.log(0.1)))
    assert(m.segmentWord("ab").toSeq == Seq("ab"))
    assert(m.segmentWord("ba").toSeq == Seq("b", "a"))
    assert(m.segmentWord("abab").toSeq == Seq("ab", "ab"))
    // one big piece beats two small ones even when chained
    assert(m.segmentWord("aab").toSeq == Seq("a", "ab"))
  }

  test("unknown characters stand alone and decode exactly") {
    val m = new UnigramModel(Array("a", "ab"),
      Array(math.log(0.3), math.log(0.7)))
    assert(m.segmentWord("axb").toSeq == Seq("a", "x", "b"))
    val toks = m.encode("ab xy")
    assert(m.decode(toks) == "ab xy")
  }

  test("training learns frequent multi-char pieces; roundtrip over corpus") {
    val hist = Seq(("thethe", 50L), ("the", 100L), ("cat", 30L), ("dog", 20L))
    val m = Unigram.trainFromHistogram(hist, vocabSize = 20, seedSize = 50,
      emIters = 3, maxPieceLen = 4)
    // 'the' is the dominant substring: it must be in the vocabulary and
    // segment as one piece
    assert(m.pieces.contains("the"), m.pieces.toSeq)
    assert(m.segmentWord("the").toSeq == Seq("the"))
    assert(m.segmentWord("thethe").length <= 2)
    // roundtrip across words incl. unseen combinations
    for (t <- Seq("the cat", "dog thethe cat", "", "the  cat", " the"))
      assert(m.decode(m.encode(t)) == t, s"roundtrip '$t'")
  }

  test("training is deterministic and respects vocabSize") {
    val hist = (0 until 50).map(i => (s"word$i${"ab" * (i % 3)}", (i + 1).toLong))
    val a = Unigram.trainFromHistogram(hist, vocabSize = 30, seedSize = 100)
    val b = Unigram.trainFromHistogram(hist, vocabSize = 30, seedSize = 100)
    assert(a.pieces.toSeq == b.pieces.toSeq)
    assert(a.logProbs.toSeq == b.logProbs.toSeq)
    val chars = hist.flatMap(_._1.toSeq).map(_.toString).distinct.size
    assert(a.vocabSize <= math.max(chars, 30) + chars)
    // every single char survives pruning (coverage guarantee)
    hist.flatMap(_._1.toSeq).map(_.toString).distinct.foreach(c =>
      assert(a.pieces.contains(c), s"char '$c' must stay"))
  }

  test("roundtrip property: 200 random strings through a trained model") {
    val rnd = new scala.util.Random(5)
    val vocabChars = "abcdef "
    val corpus = (0 until 100).map(_ =>
      (0 until 12).map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString)
    val hist = corpus.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val m = Unigram.trainFromHistogram(hist, vocabSize = 60)
    (0 until 200).foreach { _ =>
      val t = (0 until rnd.nextInt(20)).map(_ =>
        vocabChars(rnd.nextInt(vocabChars.length))).mkString
      assert(m.decode(m.encode(t)) == t, s"roundtrip '$t'")
    }
    // EOW piece boundary: empty words between double spaces preserved
    assert(m.decode(m.encode("a  b")) == "a  b")
  }

  test("trained model compresses: fewer tokens than characters") {
    val words = Seq("internationalization", "international", "nation",
      "nationalize", "rationalize")
    val hist = words.map(w => (w, 100L))
    val m = Unigram.trainFromHistogram(hist, vocabSize = 40, emIters = 4)
    val text = words.mkString(" ")
    val nTok = m.encode(text).length - words.length // minus EOW markers
    assert(nTok * 2 < text.replace(" ", "").length,
      s"expected >=2x compression: $nTok tokens")
  }

  test("shares the EOW convention with BPE (mixed pipelines decode alike)") {
    val m = new UnigramModel(Array("a"), Array(0.0))
    val toks = m.encode("a a")
    assert(toks.count(_ == Bpe.EOW) == 2)
  }
}
