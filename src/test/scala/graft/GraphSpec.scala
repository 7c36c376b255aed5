package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pageRank: hand-computed 3-node chain with a dangling sink") {
    // 1 -> 2, 1 -> 3, 2 -> 3; 3 dangles. One iteration by hand (d=0.85):
    // r0 = 1/3 each; dangling mass dm = 1/3
    // r1(1) = .05 + .85*(1/9)            (only the dangling share)
    // r1(2) = .05 + .85*(1/6 + 1/9)
    // r1(3) = .05 + .85*(1/6 + 1/3 + 1/9)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val dm = 1.0 / 3
    assert(math.abs(r(1L) - (0.05 + 0.85 * dm / 3)) < 1e-12, r)
    assert(math.abs(r(2L) - (0.05 + 0.85 * (1.0 / 6 + dm / 3))) < 1e-12, r)
    assert(math.abs(r(3L) - (0.05 + 0.85 * (1.0 / 6 + 1.0 / 3 + dm / 3))) < 1e-12, r)
    // mass conservation with dangling redistribution
    assert(math.abs(r.values.sum - 1.0) < 1e-12, s"sum ${r.values.sum}")
  }

  test("pageRank: authority hub outranks leaves; mass conserved over iters") {
    // star: 10 leaves all link to node 0; 0 links back to leaf 1
    val edges = ((1L to 10L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(2L) * 3, s"hub must dominate: $r")
    assert(r(1L) > r(2L), s"hub's sole target beats other leaves: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"sum ${r.values.sum}")
  }

  test("pageRank: null edges dropped, validation is loud") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), None))
      .toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 2).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L, 2L))
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, damping = 1.0))
  }
}
