package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark table"), // tf=3 for spark, short doc
    (2L, "spark table scan scan scan scan scan scan scan scan"), // long doc
    (3L, "spark table"), // both terms, shortest
    (4L, "hash join merge sort"),
    (5L, "the quick brown fox")).toDF("doc_id", "text")

  test("bm25: tf saturation, length normalization, idf ordering") {
    val q = Seq((1L, "spark table")).toDF("query_id", "qtext")
    val s = Retrieval.bm25Scores(corpus, q)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // docs 1,2,3 contain both terms; 4,5 neither-scored rows absent for 5
    assert(s.contains(1L) && s.contains(2L) && s.contains(3L) && !s.contains(5L))
    // doc 3 (short, both terms once) must beat doc 2 (same terms, 5x length)
    assert(s(3L) > s(2L), s"length normalization: ${s}")
    // every score positive; rarer term contributes more: doc 4 only in
    // a 'hash join' query
    val q2 = Seq((2L, "hash join")).toDF("query_id", "qtext")
    val s2 = Retrieval.bm25Scores(corpus, q2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(s2.keySet == Set(4L), s"only doc 4 matches: $s2")
    assert(s2(4L) > 0)
  }

  test("bm25TopK: rank order, k cut, tie-break by doc id") {
    val q = Seq((1L, "spark")).toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(corpus, q, k = 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(4)))
    assert(top.length == 2)
    // doc 1 has tf=3 in 4 tokens -> highest spark score
    assert(top(0)._1 == 1L, s"tf winner first: ${top.toSeq}")
    // n_hit counts distinct matched terms
    val nh = Retrieval.bm25Scores(corpus, Seq((9L, "spark table"))
        .toDF("query_id", "qtext"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(nh(1L) == 2L && !nh.contains(4L), s"n_hit: $nh")
  }

  test("tfidfKeywords: rare terms outrank common, k cut, term tie-break") {
    val kw = Retrieval.tfidfKeywords(corpus, k = 2).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
    // doc 1: 'spark' (tf 3) beats 'table' despite spark's higher df
    assert(kw(1L) == Seq("spark", "table"), kw(1L).toString)
    // doc 2: 'scan' tf=8 and df=1 dominates
    assert(kw(2L).head == "scan")
    // doc 5: unique terms, idf equal -> alphabetical tie-break
    assert(kw(5L) == Seq("brown", "fox"), kw(5L).toString)
    // every doc emits at most k rows, ranks contiguous from 1
    assert(kw.values.forall(_.length <= 2))
    // rank filter pushes a WindowGroupLimit (map-side top-k per doc)
    val plan = Retrieval.tfidfKeywords(corpus, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("rrfFuse: both-leg docs beat single-leg, math exact, k cut") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "did", "rk")
    val den = Seq((1L, 10L, 2), (1L, 13L, 1), (1L, 11L, 3))
      .toDF("qid", "did", "rk")
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    // doc 10: 1/(60+1) + 1/(60+2) — both legs, top fused
    assert(out(0)._1 == 10L && out(0)._2 == 2, out.toSeq.toString)
    assert(math.abs(out(0)._3 - (1.0 / 61 + 1.0 / 62)) < 1e-9)
    // doc 11 (ranks 2+3) beats the single-leg rank-1 doc 13 (1/61 alone)
    assert(out(1)._1 == 11L, out.toSeq.toString)
    assert(out(2)._1 == 13L && out(2)._2 == 1)
    // k cut: doc 12 (single leg, rank 3) fell off
    assert(out.length == 3 && !out.exists(_._1 == 12L))
    // fused top-k is WindowGroupLimit-pushed
    val plan = Retrieval.rrfFuse(Seq(lex, den), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("hybridTopK: fuses lexical and dense legs over a shared id space") {
    // corpus: doc 1 is the lexical hit for 'spark table'; vectors make
    // doc 4 the dense hit; doc 3 is mid in both -> fusion favors 3
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(0.3f, 0.7f)),
      (3L, Array(0.8f, 0.6f)), (4L, Array(1.0f, 0.0f)),
      (5L, Array(-1.0f, 0.1f))).toDF("vec_id", "embedding")
    val q = Seq((1L, "spark table")).toDF("query_id", "qtext")
    val qv = Seq((1L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridTopK(corpus, q, vecs, qv, k = 5,
        topNPerLeg = 5)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // doc 4: dense rank 1 but NO lexical leg ('hash join merge sort');
    // doc 3: lexical rank 1 (short, both terms) + dense rank 2 -> wins
    assert(out.head._1 == 3L && out.head._2 == 2, out.toSeq.toString)
    assert(out.map(_._1).contains(4L))
    // doc 5 never matched lexically; dense-only legs still surface it
    val d5 = out.find(_._1 == 5L)
    assert(d5.exists(_._2 == 1), out.toSeq.toString)
  }

  test("bm25 query terms absent from the corpus contribute nothing") {
    val q = Seq((1L, "spark zzzznotaword")).toDF("query_id", "qtext")
    val rows = Retrieval.bm25Scores(corpus, q).collect()
    // only docs containing 'spark' score, all with n_hit 1
    assert(rows.nonEmpty && rows.forall(_.getLong(2) == 1L))
  }

  test("phraseMatch: exact positions, counts, and misses") {
    val docs = Seq(
      (1L, "the quick brown fox the quick brown cat"),  // 2 matches of 2-gram
      (2L, "quick the brown"),                          // terms, wrong order
      (3L, "THE  Quick   brown"),                       // case + multi-space
      (4L, "nothing here"),
      (5L, "the quick")                                 // prefix only for 3-gram
    ).toDF("doc_id", "text")
    val out2 = Retrieval.phraseMatch(docs, Seq("the", "quick"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out2 == Map(1L -> ((2L, 0)), 3L -> ((1L, 0)), 5L -> ((1L, 0))))
    val out3 = Retrieval.phraseMatch(docs, Seq("the", "quick", "brown"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // doc 1 holds the trigram twice: "the quick brown fox the quick brown"
    assert(out3 == Map(1L -> ((2L, 0)), 3L -> ((1L, 0))))
  }

  test("phraseMatch: repeated phrase terms and overlapping occurrences") {
    val docs = Seq(
      (1L, "buffalo buffalo buffalo"), // "buffalo buffalo" at starts 0 AND 1
      (2L, "a b a b a")                // "a b a" at starts 0 AND 2 (overlap)
    ).toDF("doc_id", "text")
    val r1 = Retrieval.phraseMatch(docs, Seq("buffalo", "buffalo"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(r1 == Map(1L -> ((2L, 0))), r1.toString)
    val r2 = Retrieval.phraseMatch(docs, Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(r2 == Map(2L -> ((2L, 0))), r2.toString)
  }

  test("phraseMatch: rejects non-token phrase terms") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatch(docs, Seq("has space"))
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatch(docs, Seq("quote'd"))
    }
  }
}
