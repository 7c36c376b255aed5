package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

/** Co-occurrence contract: set semantics within a basket, exact counts
  * over the kept population, hub baskets dropped whole, (cnt desc,
  * other asc) deterministic rank order. */
class CoOccurSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], topK: Int,
      cap: Long = 1000L): Map[(Long, Int), (Long, Long)] =
    CoOccur.topCoOccur(rows.toDF("b", "i"), "b", "i", topK, cap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("pair counts and rank order, ties broken by partner id") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
    val out = run(rows, topK = 2)
    assert(out((1L, 1)) == ((2L, 3L)), out.toString)
    assert(out((1L, 2)) == ((3L, 1L)), out.toString)
    assert(out((2L, 1)) == ((1L, 3L)), out.toString)
    assert(out((3L, 1)) == ((1L, 1L)), "tie at cnt 1 -> smaller partner")
    assert(out((3L, 2)) == ((2L, 1L)), out.toString)
  }

  test("duplicate (basket, item) rows are presence, not weight") {
    val out = run(Seq((1L, 1L), (1L, 1L), (1L, 2L)), topK = 1)
    assert(out((1L, 1)) == ((2L, 1L)), out.toString)
    assert(out((2L, 1)) == ((1L, 1L)), out.toString)
  }

  test("hub basket over the cap is dropped whole, kept counts stay exact") {
    val hub = (1L to 5L).map(i => (99L, i))
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)) ++ hub
    val out = run(rows, topK = 3, cap = 4L)
    // pairs from basket 99 must not appear: items 3,4,5 vanish entirely
    assert(!out.keys.exists { case (item, _) => item >= 3L }, out.toString)
    assert(out((1L, 1)) == ((2L, 2L)), "hub contribution excluded")
    assert(out.size == 2, out.toString)
  }

  test("topK truncates below the full partner list") {
    val rows = for (b <- 1L to 3L; i <- 1L to 4L) yield (b, i)
    val out = run(rows, topK = 2)
    assert(out.size == 8, out.toString)
    assert(out((4L, 1)) == ((1L, 3L)) && out((4L, 2)) == ((2L, 3L)))
  }
}
