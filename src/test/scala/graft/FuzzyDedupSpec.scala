package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class FuzzyDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int = 2,
                    blockLen: Int = 8, maxBucket: Int = Int.MaxValue) =
    Dedup.editDistancePairs(rows.toDF("doc_id", "text"),
        maxDist = maxDist, blockLen = blockLen, maxBucket = maxBucket)
      .as[(Long, Long, Int)].collect().toSet

  test("middle edits within maxDist are found with exact distance") {
    val got = pairs(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown cat jumps over the lazy dog", // 3 subs
      3L -> "the quick brown fx jumps over the lazy dog", // 1 deletion vs 1
      4L -> "completely different text with no relatives"),
      maxDist = 3)
    assert(got == Set((1L, 2L, 3), (1L, 3L, 1), (2L, 3L, 4 - 1)))
  }

  test("identical texts pair at distance zero; past-threshold pairs drop") {
    val got = pairs(Seq(
      1L -> "same same same same same",
      2L -> "same same same same same",
      3L -> "same same XXXXX same same")) // 5 subs > maxDist=2
    assert(got == Set((1L, 2L, 0)))
  }

  test("recall contract: edits at BOTH ends are missed, one end survives") {
    val a = "aaaaaaaaaa MIDDLE zzzzzzzzzz"
    val endsEdited = "Xaaaaaaaaa MIDDLE zzzzzzzzX" // prefix+suffix both broken
    val frontEdited = "Xaaaaaaaaa MIDDLE zzzzzzzzzz" // suffix block intact
    assert(pairs(Seq(1L -> a, 2L -> endsEdited)).isEmpty)
    assert(pairs(Seq(1L -> a, 2L -> frontEdited)) == Set((1L, 2L, 1)))
  }

  test("length prefilter: same prefix but len gap > maxDist never refines") {
    val got = pairs(Seq(
      1L -> "prefix00 short",
      2L -> "prefix00 much much much longer text"))
    assert(got.isEmpty)
  }

  test("maxBucket caps hot blocks") {
    val boiler = (1L to 20L).map(i => i -> s"boilerplate prefix $i")
    assert(pairs(boiler, maxBucket = 5).isEmpty)
    // and without the cap the true near-dups are found (ids 1..9 differ
    // only in the final digit = suffix block, prefix block shared)
    val noCap = pairs(boiler)
    assert(noCap.nonEmpty)
  }

  test("short fields dedup with a blockLen sized to the field") {
    // len <= blockLen makes the whole string both blocks, so ANY edit
    // breaks both keys (the recall contract's degenerate corner) —
    // identical shorts still pair, and a field-sized blockLen restores
    // edit tolerance
    assert(pairs(Seq(1L -> "abc", 2L -> "abc")) == Set((1L, 2L, 0)))
    assert(pairs(Seq(1L -> "abc", 2L -> "abd")).isEmpty)
    assert(pairs(Seq(1L -> "abc", 2L -> "abd"), blockLen = 2) ==
      Set((1L, 2L, 1)))
  }
}
