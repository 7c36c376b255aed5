package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.NgramLm

/** Stupid-Backoff trigram LM semantics pinned against a hand-worked
  * corpus: every backoff level, the OOV floor, the count diagnostics,
  * and the scaled-long score contract. */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // train corpus: N = 9; uni a:3 b:3 c:2 d:1; bi ab:3 bc:2 ca:1 bd:1;
  // tri abc:2 bca:1 cab:1 abd:1
  private lazy val model = NgramLm.train(
    Seq("a b c a b d", "a b c").toDF("text"))

  test("backoff levels, diagnostics, and log score match hand computation") {
    val docs = Seq((10L, "a b c a b z b c d")).toDF("doc_id", "text")
    val r = NgramLm.score(model, docs).collect().head
    assert(r.getAs[Long]("n_scored") == 7)
    assert(r.getAs[Long]("n_tri") == 3)
    assert(r.getAs[Long]("n_bi") == 1)
    assert(r.getAs[Long]("n_uni") == 2)
    assert(r.getAs[Long]("n_oov") == 1)
    assert(r.getAs[Long]("sum_num") == 10) // 2+1+1+0+3+2+1
    assert(r.getAs[Long]("sum_den") == 36) // 3+2+1+9+9+3+9
    val L = math.log(0.4)
    val terms = Seq(
      math.log(2.0 / 3.0),               // (a,b,c) trigram
      math.log(1.0 / 2.0),               // (b,c,a) trigram
      math.log(1.0 / 1.0),               // (c,a,b) trigram
      math.log(1.0 / 9.0) + 2 * L,       // (a,b,z) OOV
      math.log(3.0 / 9.0) + 2 * L,       // (b,z,b) unigram b
      math.log(2.0 / 3.0) + L,           // (z,b,c) bigram bc | b
      math.log(1.0 / 9.0) + 2 * L)       // (b,c,d) unigram d
    assert(math.abs(r.getAs[Double]("logprob") - terms.sum) < 1e-9)
    assert(r.getAs[Long]("score_micro") ==
      terms.map(t => math.rint(t * 1e6).toLong).sum)
  }

  test("short, empty, null, and fully-OOV documents") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null: String), (4L, "q q q"))
      .toDF("doc_id", "text")
    val rs = NgramLm.score(model, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(rs(id).getAs[Long]("n_scored") == 0, s"doc $id")
      assert(rs(id).getAs[Long]("score_micro") == 0L, s"doc $id")
      assert(rs(id).isNullAt(rs(id).fieldIndex("logprob")), s"doc $id")
    }
    val oov = rs(4L)
    assert(oov.getAs[Long]("n_scored") == 1 && oov.getAs[Long]("n_oov") == 1)
    assert(oov.getAs[Long]("sum_num") == 0 && oov.getAs[Long]("sum_den") == 9)
    val want = math.log(1.0 / 9.0) + 2 * math.log(0.4)
    assert(math.abs(oov.getAs[Double]("logprob") - want) < 1e-12)
  }

  test("training is robust to short docs and a doc with repeated tokens") {
    val m = NgramLm.train(Seq("x", "x y", "", "x x x").toDF("text"))
    // grams: "x": [x]; "x y": [x, y, xy]; "": []; "x x x": [x,x,x, xx,xx, xxx]
    // → 6 unigram + 3 bigram + 1 trigram instances; N = 6
    val counts = m.counts.collect()
    assert(counts.map(_.getAs[Long]("cnt")).sum == 6 + 3 + 1)
    assert(m.total.collect().head.getAs[Long]("n_total") == 6)
    val scored = NgramLm.score(m, Seq((1L, "x x x")).toDF("doc_id", "text"))
      .collect().head
    assert(scored.getAs[Long]("n_scored") == 1 && scored.getAs[Long]("n_tri") == 1)
    // S(x|x x) = c(xxx)/c(xx) = 1/2
    assert(math.abs(scored.getAs[Double]("logprob") - math.log(0.5)) < 1e-12)
  }

  test("perplexityBuckets: equal-population CCNet cuts, head most reference-like") {
    // reference corpus: pure "alpha beta gamma" prose; docs range from
    // pure reference text (head) to pure OOV noise (tail)
    val ref = (0 until 50).map(i => s"alpha beta gamma alpha beta gamma a$i")
      .toDF("text")
    val m = NgramLm.train(ref)
    val docs = (0 until 90).map { i =>
      val text =
        if (i % 3 == 0) "alpha beta gamma alpha beta gamma"
        else if (i % 3 == 1) "alpha beta zork quux alpha mixed"
        else s"zz$i qq$i ww$i ee$i rr$i tt$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val out = NgramLm.perplexityBuckets(m, docs, nBuckets = 3,
      sampleSize = 1000)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // equal population: 30 docs per bucket
    assert((1 to 3).forall(b => out.values.count(_ == b) == 30),
      s"bucket sizes: ${out.values.groupBy(identity).view.mapValues(_.size).toMap}")
    // the reference-like class is the head, the OOV class the tail
    (0 until 90).foreach { i =>
      val want = i % 3 + 1
      assert(out(i.toLong) == want, s"doc $i: ${out(i.toLong)} vs $want")
    }
    // short/unscored docs land in the worst bucket
    val withShort = docs.unionByName(Seq((1000L, "xy")).toDF("doc_id", "text"))
    val out2 = NgramLm.perplexityBuckets(m, withShort, nBuckets = 3,
      sampleSize = 1000).collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out2(1000L) == 3, s"unscored doc bucket: ${out2(1000L)}")
    // loud validation
    intercept[IllegalArgumentException](
      NgramLm.perplexityBuckets(m, docs, nBuckets = 1))
  }
}
