package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two triangles with a bridge, hand-unrolled 2 rounds") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (2L, 10L))
    assert(lpa(edges, 1) == Map(0L -> 1L, 1L -> 0L, 2L -> 0L,
      10L -> 2L, 11L -> 10L, 12L -> 10L))
    assert(lpa(edges, 2) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 2L, 12L -> 2L))
  }

  test("labelPropagation: iters=0 returns identity labels over the vertex set") {
    val out = lpa(Seq((5L, 6L), (6L, 7L)), 0)
    assert(out == Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }

  test("labelPropagation: star — hub adopts min leaf, leaves adopt hub") {
    val out = lpa((1L to 4L).map(l => (0L, l)), 1)
    assert(out == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("labelPropagation: clique converges to the min id; normalization holds") {
    // duplicates, reversed edges and a self-loop must not change counts
    val ids = Seq(3L, 5L, 7L, 9L)
    val clique = for (a <- ids; b <- ids if a != b) yield (a, b)
    val noisy = clique ++ Seq((3L, 3L), (5L, 3L), (5L, 3L))
    assert(lpa(noisy, 2) == ids.map(_ -> 3L).toMap)
  }

  test("triangles: K4 — every vertex in 3, brute force agrees") {
    val edges = (for (a <- 0L to 3L; b <- 0L to 3L if a < b)
      yield (a, b)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), out.toString)
  }

  test("triangles: star has none; zeros are present, not absent") {
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 6 && out.values.forall(_ == 0L), out.toString)
  }

  test("triangles: duplicates, reversed edges, self-loops normalize away") {
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 2L)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), out.toString)
  }

  test("triangles: ring with chords matches an in-test brute force") {
    val n = 12L
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n))).toDF("src", "dst")
    val und = (0L until n).flatMap(i =>
        Seq(Set(i, (i + 1) % n), Set(i, (i + 2) % n)))
      .filter(_.size == 2).distinct
    val verts = (0L until n)
    val brute = verts.map { v =>
      v -> (for (a <- verts; b <- verts if a < b && a != v && b != v
        if und.contains(Set(v, a)) && und.contains(Set(v, b)) &&
           und.contains(Set(a, b))) yield 1).size.toLong
    }.toMap
    val out = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == brute, s"got $out want $brute")
  }

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

  test("hits: authority concentrates on the linked-to node, norms are unit") {
    // 5 hubs all link to node 0; node 0 links to node 1
    val e = ((1L to 5L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val r = Graph.hits(e, iters = 3).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // node 0 is the sole heavily-linked target: max authority
    assert(r(0L)._2 > 0.9, s"authority hub: $r")
    // nodes 1..5 are the hubs pointing at it; node 0's own hub score is
    // tiny (it links only to the weak node 1)
    assert(r(2L)._1 > r(0L)._1, s"pure hubs outrank: $r")
    // L2 norms of both vectors are 1
    val hn = math.sqrt(r.values.map(v => v._1 * v._1).sum)
    val an = math.sqrt(r.values.map(v => v._2 * v._2).sum)
    assert(math.abs(hn - 1.0) < 1e-9 && math.abs(an - 1.0) < 1e-9, s"$hn $an")
    // nodes 2..5 have no in-links -> authority exactly 0
    assert((2L to 5L).forall(i => r(i)._2 == 0.0), s"leaf authorities: $r")
    // a genuinely sink-only node: add 6 with an in-link and no out-link
    val e2 = e.unionByName(Seq((0L, 6L)).toDF("src", "dst"))
    val r2 = Graph.hits(e2, iters = 2).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r2(6L)._1 == 0.0, s"no out-links -> hub 0: $r2")
  }

  test("pageRank: null edges dropped, validation is loud") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), None))
      .toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 2).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L, 2L))
    intercept[IllegalArgumentException](Graph.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, damping = 1.0))
  }

  test("reliable checkpointDir mode: identical results to localCheckpoint") {
    // the fault-tolerance opt-in must be a pure execution-strategy swap:
    // every rank/hub/auth/label bit-identical under both modes
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val e = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * i + 1) % 60))).toDF("src", "dst")
    def key(r: org.apache.spark.sql.Row) = r.getLong(0)
    val prLocal = Graph.pageRank(e, iters = 3).collect().map(r => key(r) -> r.getDouble(1)).toMap
    val prRel = Graph.pageRank(e, iters = 3, checkpointDir = Some(dir))
      .collect().map(r => key(r) -> r.getDouble(1)).toMap
    assert(prLocal == prRel, "pageRank results differ across checkpoint modes")
    val hLocal = Graph.hits(e, iters = 2).collect()
      .map(r => key(r) -> (r.getDouble(1), r.getDouble(2))).toMap
    val hRel = Graph.hits(e, iters = 2, checkpointDir = Some(dir)).collect()
      .map(r => key(r) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(hLocal == hRel, "hits results differ across checkpoint modes")
    // clusters: a 7-hop chain exercises >1 iteration (and the adaptive
    // pointer-jump probe) under both modes
    val pairs = (0L until 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cLocal = graft.operators.Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cRel = graft.operators.Dedup.clusters(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cLocal == cRel && cLocal.values.forall(_ == 0L),
      s"clusters results differ or unconverged: $cLocal vs $cRel")
    // reliable mode actually wrote checkpoint data
    assert(new java.io.File(dir).listFiles() != null &&
      new java.io.File(dir).listFiles().nonEmpty, "no reliable checkpoint written")
  }

  test("kHopReach: hand-checked 2-hop counts, cycles excluded, multi-paths deduped") {
    // directed: 1→2, 2→3, 3→1 (a 3-cycle), 1→3 (shortcut), 4→1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val out = Graph.kHopReach(e, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1: {2,3} 1-hop; 2-hop adds 3 (via 2, dup) and 1 (cycle, excluded) → 2
    // 2: {3} then {1} → 2 ; 3: {1} then {2,3→self excluded} → 2
    // 4: {1} then {2,3} → 3
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 3L), out.toString)
  }

  test("kHopReach: k=1 is plain out-neighbor counts; duplicate edges collapse") {
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 2L)).toDF("src", "dst")
    val out = Graph.kHopReach(e, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // self-loop 2→2 dropped entirely: vertex 2 has no surviving out-edge
    assert(out == Map(1L -> 2L), out.toString)
  }
}
