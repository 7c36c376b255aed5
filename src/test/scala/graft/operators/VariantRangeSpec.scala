package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[RowGroupScan.variantInRange]] — the exact case-variant membership
  * test behind case-mapped predicate routing — cross-checked against a
  * brute-force enumeration of the variant set. */
class VariantRangeSpec extends AnyFunSuite {

  private def variants(x: String): Seq[String] =
    x.foldLeft(Seq("")) { (acc, ch) =>
      val forms = Seq(Character.toUpperCase(ch),
        Character.toLowerCase(ch)).distinct
      acc.flatMap(p => forms.map(p + _))
    }

  private def utf8Leq(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  private def brute(x: String, lo: String, hi: String): Boolean =
    variants(x).exists(v => utf8Leq(lo, v) && utf8Leq(v, hi))

  test("hand cases: single-case clusters prune, straddlers keep") {
    // all-upper group bounds vs a lowercase target: 'BUILDING' is a
    // variant of 'building' and sits inside [AUTOMOBILE, MACHINERY]
    assert(RowGroupScan.variantInRange("building",
      "AUTOMOBILE", "MACHINERY"))
    // no variant of 'building' (all start with B or b) fits
    // [FURNITURE, MACHINERY]: 'B…' < FURNITURE, 'b…' > MACHINERY
    assert(!RowGroupScan.variantInRange("building",
      "FURNITURE", "MACHINERY"))
    // constant group equal to a variant
    assert(RowGroupScan.variantInRange("building",
      "BUILDING", "BUILDING"))
    assert(!RowGroupScan.variantInRange("building",
      "BUILDINGS", "BUILDINGZ")) // longer strings, no 8-char variant
    // prefix-ordering edges: lo equals a variant's prefix
    assert(RowGroupScan.variantInRange("ab", "A", "zz"))
    assert(!RowGroupScan.variantInRange("ab", "ABX", "ABZ"))
    // empty target matches only the empty string
    assert(RowGroupScan.variantInRange("", "", "x"))
    assert(!RowGroupScan.variantInRange("", "a", "x"))
    // non-letters are fixed points
    assert(RowGroupScan.variantInRange("3-low", "3-LOW", "3-LOW"))
    assert(!RowGroupScan.variantInRange("3-low", "4-", "5-"))
  }

  test("exhaustive cross-check against brute-force variant enumeration") {
    val rnd = new scala.util.Random(42)
    val alphabet = "aB0~é"
    def randStr(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    (1 to 4000).foreach { _ =>
      // targets stay ASCII (the caller's guard); bounds may be any mix
      val x = randStr(4).filter(_.toInt < 128)
      val a = randStr(5); val b = randStr(5)
      val (lo, hi) = if (utf8Leq(a, b)) (a, b) else (b, a)
      assert(RowGroupScan.variantInRange(x, lo, hi) == brute(x, lo, hi),
        s"x='$x' lo='$lo' hi='$hi'")
      checked += 1
    }
    assert(checked == 4000)
  }
}
