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

  test("bm25 query terms absent from the corpus contribute nothing") {
    val q = Seq((1L, "spark zzzznotaword")).toDF("query_id", "qtext")
    val rows = Retrieval.bm25Scores(corpus, q).collect()
    // only docs containing 'spark' score, all with n_hit 1
    assert(rows.nonEmpty && rows.forall(_.getLong(2) == 1L))
  }
}
