package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[RowGroupScan.paddedVariantInRange]] — the padded-variant
  * membership test behind trim-mapped predicate routing —
  * cross-checked against a brute-force enumeration of the space-padded
  * variant set. The trailing-pad family ('r') is exact both ways; the
  * leading-pad modes ('l'/'b') are conservative-keep, so the
  * brute-force check is one-sided there: a reject must never hide a
  * real member. */
class PaddedRangeSpec extends AnyFunSuite {

  private val maxPad = 8

  private def variants(x: String, mode: Char): Seq[String] = {
    val lead = if (mode == 'r') Seq(0) else 0 to maxPad
    val trail = if (mode == 'l') Seq(0) else 0 to maxPad
    for (i <- lead; j <- trail)
      yield (" " * i) + x + (" " * j)
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

  private def brute(x: String, lo: String, hi: String,
      mode: Char): Boolean =
    variants(x, mode).exists(v => utf8Leq(lo, v) && utf8Leq(v, hi))

  test("hand cases: space-free clusters prune as tightly as equality") {
    // a sorted priority group [1-URGENT, 2-HIGH] cannot hold any
    // padded variant of '5-LOW' (all start with '5' or ' ')
    assert(!RowGroupScan.paddedVariantInRange("5-LOW",
      "1-URGENT", "2-HIGH", 'b'))
    assert(RowGroupScan.paddedVariantInRange("5-LOW",
      "4-NOT SPECIFIED", "5-LOW  ", 'b'))
    // a group whose smin starts with a space may hold leading-padded
    // variants of anything (conservative keep for 'b'/'l')
    assert(RowGroupScan.paddedVariantInRange("5-LOW",
      " padded", "2-HIGH", 'b'))
    assert(!RowGroupScan.paddedVariantInRange("5-LOW",
      " padded", "2-HIGH", 'r')) // trailing-only: exact reject
    // constant group equal to a trailing-padded variant
    assert(RowGroupScan.paddedVariantInRange("x", "x  ", "x  ", 'r'))
    assert(!RowGroupScan.paddedVariantInRange("x", "x !", "x !", 'r'))
    // lo = x ++ t with t all spaces: lo itself is the witness member
    assert(RowGroupScan.paddedVariantInRange("x", "x ", "x ", 'r'))
    // t's first non-space byte below 0x20: the witness is x padded one
    // space past it — kept only when that witness clears hi
    assert(RowGroupScan.paddedVariantInRange("x",
      "x \u0001", "x  ", 'r'))
    assert(!RowGroupScan.paddedVariantInRange("x",
      "x \u0001", "x \u0002", 'r'))
    // empty target: all-space strings
    assert(RowGroupScan.paddedVariantInRange("", "", "z", 'b'))
    assert(RowGroupScan.paddedVariantInRange("", "  ", "  ", 'r'))
    assert(!RowGroupScan.paddedVariantInRange("", "a", "z", 'r'))
    // 'l' point member: x itself with no trailing pads
    assert(RowGroupScan.paddedVariantInRange("x", "x", "x", 'l'))
    assert(!RowGroupScan.paddedVariantInRange("x", "x ", "x  ", 'l'))
  }

  test("trailing-pad mode is exact against brute-force enumeration") {
    val rnd = new scala.util.Random(43)
    val alphabet = "ab ~é"
    def randStr(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    (1 to 4000).foreach { _ =>
      // targets are trim fixed points (the lowering's guard)
      val x = randStr(3).replace(" ", "")
      val a = randStr(6); val b = randStr(6)
      val (lo, hi) = if (utf8Leq(a, b)) (a, b) else (b, a)
      assert(RowGroupScan.paddedVariantInRange(x, lo, hi, 'r') ==
        brute(x, lo, hi, 'r'), s"x='$x' lo='$lo' hi='$hi'")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("leading-pad modes never reject a real member") {
    val rnd = new scala.util.Random(44)
    val alphabet = "ab ~é"
    def randStr(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    Seq('l', 'b').foreach { mode =>
      (1 to 3000).foreach { _ =>
        val raw = randStr(3)
        val x = if (mode == 'l') raw.replaceAll("^ +", "")
                else raw.trim
        val a = randStr(6); val b = randStr(6)
        val (lo, hi) = if (utf8Leq(a, b)) (a, b) else (b, a)
        if (brute(x, lo, hi, mode))
          assert(RowGroupScan.paddedVariantInRange(x, lo, hi, mode),
            s"mode=$mode x='$x' lo='$lo' hi='$hi'")
      }
    }
  }
}
