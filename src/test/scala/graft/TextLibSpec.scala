package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextLib
import graft.vector.VectorLib

class TextLibSpec extends AnyFunSuite {

  test("tokenize and bpe-ish token count") {
    assert(TextLib.tokenize("a  b\tc").toSeq == Seq("a", "b", "c"))
    assert(TextLib.tokenize("").isEmpty)
    assert(TextLib.bpeIshTokenCount("hello world") == 2)
    assert(TextLib.bpeIshTokenCount("hello, world! 42") == 6) // hello , world ! 4 2
    assert(TextLib.bpeIshTokenCount(null) == 0)
  }

  test("shingles: count, dedup, short-text fallback") {
    val sh = TextLib.shingleHashes("a b c d e", 3)
    assert(sh.length == 3) // "a b c","b c d","c d e"
    assert(sh.sorted.toSeq == sh.toSeq) // sorted contract
    assert(TextLib.shingleHashes("a b", 3).length == 1) // whole-text fallback
    assert(TextLib.shingleHashes("", 3).isEmpty)
    // repeated shingles collapse
    assert(TextLib.shingleHashes("x y x y x y x y", 2).length <= 3)
  }

  test("exact jaccard on sorted hash arrays") {
    val a = TextLib.shingleHashes("the quick brown fox jumps", 2)
    assert(TextLib.jaccard(a, a) == 1.0)
    val b = TextLib.shingleHashes("completely different text here now", 2)
    assert(TextLib.jaccard(a, b) == 0.0)
    assert(TextLib.jaccard(Array.empty[Long], Array.empty[Long]) == 1.0)
  }

  test("minhash estimates jaccard") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val mut = (1 to 60).map(i => if (i % 10 == 0) s"x$i" else s"w$i").mkString(" ")
    val sa = TextLib.shingleHashes(base, 3)
    val sb = TextLib.shingleHashes(mut, 3)
    val exact = TextLib.jaccard(sa, sb)
    val est = TextLib.minHashJaccard(
      TextLib.minHashSignature(sa, 128, 42L), TextLib.minHashSignature(sb, 128, 42L))
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
    // deterministic across calls
    assert(TextLib.minHashSignature(sa, 16, 1L).toSeq ==
      TextLib.minHashSignature(sa, 16, 1L).toSeq)
  }

  test("simhash: identical → 0 distance, near → small, far → large") {
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val t1 = (1 to 80).map(i => s"w${i % 30}").mkString(" ")
    val t2 = t1 + " extra token tail"
    val t3 = (1 to 80).map(i => s"z$i q${i * 7}").mkString(" ")
    val h1 = TextLib.simHash64(TextLib.shingleHashes(t1, 3))
    val h1b = TextLib.simHash64(TextLib.shingleHashes(t1, 3))
    val h2 = TextLib.simHash64(TextLib.shingleHashes(t2, 3))
    val h3 = TextLib.simHash64(TextLib.shingleHashes(t3, 3))
    assert(dist(h1, h1b) == 0)
    assert(dist(h1, h2) < dist(h1, h3))
  }

  test("winnowing fingerprints: deterministic, robust to position shift") {
    val doc = "the quick brown fox jumps over the lazy dog again and again and again"
    val f1 = TextLib.winnowFingerprint(doc, 10, 6)
    val f2 = TextLib.winnowFingerprint("PREFIX " + doc, 10, 6)
    assert(f1.nonEmpty)
    val inter = f1.toSet.intersect(f2.toSet).size
    assert(inter.toDouble / f1.length > 0.5, "shifted doc shares most fingerprints")
    assert(TextLib.winnowFingerprint("short", 10, 6).isEmpty)
  }

  test("quality and language heuristics") {
    val good = "the cat sat on the mat and it was a good day for all of us to be here"
    val bad = "@@@@ ### $$$$ %%%% ^^^^"
    assert(TextLib.qualityScore(good) > TextLib.qualityScore(bad))
    assert(TextLib.detectLang("the cat and the dog sat on a mat in the sun") == "en")
    assert(TextLib.detectLang("der hund und die katze ist nicht zu haus") == "de")
    assert(TextLib.detectLang("el perro y la casa es una cosa de que") == "es")
    assert(TextLib.detectLang("") == "und")
  }

  test("vector kernel: cosine and rhp signatures") {
    val a = Array(1.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f)
    assert(VectorLib.cosine(a, a) == 1.0)
    assert(VectorLib.cosine(a, b) == 0.0)
    assert(VectorLib.cosine(a, Array(0f, 0f, 0f)) == 0.0)
    val v = Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    assert(VectorLib.rhpSignature(v, 16, 7L) == VectorLib.rhpSignature(v, 16, 7L))
    val neg = v.map(x => -x)
    // antipodal vectors get complementary signatures
    val s1 = VectorLib.rhpSignature(v, 16, 7L)
    val s2 = VectorLib.rhpSignature(neg, 16, 7L)
    assert((s1 ^ s2) == 0xffffL)
  }

  test("vector kernel: nearestCells orders by dot, ties to the lower index") {
    val cents = Array(
      Array(1.0f, 0.0f), Array(0.0f, 1.0f),
      Array(0.7f, 0.7f), Array(0.0f, 1.0f)) // index 3 duplicates index 1
    val v = Array(0.1f, 1.0f)
    val top = VectorLib.nearestCells(v, cents, 3)
    // dots: 0.1, 1.0, 0.77, 1.0 → order (1, 3 tie) -> lower index first
    assert(top.toSeq == Seq(1, 3, 2), s"got ${top.toSeq}")
    assert(top.distinct.length == top.length)
    // n larger than codebook clamps
    assert(VectorLib.nearestCells(v, cents, 10).length == 4)
    // single best equals head of multi
    assert(VectorLib.nearestCells(v, cents, 1).head == 1)
  }

  test("unicodeNormalize: UAX #15 forms, loud unknown-form failure") {
    import TextLib.unicodeNormalize
    val composed = "Caf\u00e9"
    val decomposed = "Cafe\u0301"
    assert(unicodeNormalize(decomposed, "NFC") == composed)
    assert(unicodeNormalize(composed, "NFD") == decomposed)
    // NFC must NOT touch compatibility characters; NFKC folds them
    assert(unicodeNormalize("\uFB01ne", "NFC") == "\uFB01ne")
    assert(unicodeNormalize("\uFB01ne", "NFKC") == "fine")
    assert(unicodeNormalize("2\u00B9", "NFKC") == "21")
    // B + combining cedilla has no precomposed form: NFC leaves it alone
    assert(unicodeNormalize("B\u0327", "NFC") == "B\u0327")
    // case-insensitive form names; unknown forms fail loudly
    assert(unicodeNormalize(decomposed, "nfc") == composed)
    val ex = intercept[IllegalArgumentException](unicodeNormalize("x", "NFX"))
    assert(ex.getMessage.contains("unknown form"))
  }

  test("vector kernel: PQ encode/LUT/ADC approximate the true dot product") {
    import VectorLib._
    val rnd = new scala.util.Random(5)
    val vecs = Array.fill(400)(Array.fill(32)(rnd.nextFloat() - 0.5f))
    val cents = graft.operators.Similarity.trainSpherical(vecs, 8, 4)
    val residuals = vecs.map { v =>
      val vh = unit(v)
      val c = cents(nearestCells(vh, cents, 1)(0))
      Array.tabulate(32)(i => vh(i) - (if (i < c.length) c(i) else 0f))
    }
    val books = graft.operators.Similarity.trainPq(residuals, m = 4, ksub = 32, iters = 4)
    val q = vecs(7)
    val lut = pqLut(q, books)
    var worst = 0.0
    vecs.take(100).foreach { x =>
      val (cell, codes) = ivfPqAssign(x, cents, books)
      val adc = cellDot(q, cents, cell) + pqAdc(lut, 32, codes)
      val exact = dot(unit(q), unit(x))
      worst = math.max(worst, math.abs(adc - exact))
    }
    // PQ is lossy by design; the ADC estimate must stay within the
    // quantization-error band that keeps a refine=64 shortlist reliable
    assert(worst < 0.35, s"ADC error band too wide: $worst")
    // the self-match scores near 1.0 (its own quantization error only)
    val (cell7, codes7) = ivfPqAssign(q, cents, books)
    val self = cellDot(q, cents, cell7) + pqAdc(lut, 32, codes7)
    assert(self > 0.8, s"self ADC should approach 1.0: $self")
  }

  test("urlHost / registrableDomain edge shapes") {
    import graft.text.TextLib.{registrableDomain => rd, urlHost => uh}
    assert(uh("https://www.Example.COM/p?q#f") == "www.example.com")
    assert(uh("http://user:pw@host.net:8080/x") == "host.net")
    assert(uh("ftp://a.b.c.") == "a.b.c") // trailing dot stripped
    assert(uh("https://[2001:DB8::1]:443/x") == "[2001:db8::1]")
    assert(uh("no-scheme.com/x") == null)
    assert(uh("https:///path") == null)
    assert(uh(null) == null)
    assert(rd("www.example.com") == "example.com")
    assert(rd("a.b.sub.example.co.uk") == "example.co.uk")
    assert(rd("example.com.au") == "example.com.au") // already registrable
    assert(rd("localhost") == "localhost")
    assert(rd(null) == null)
  }

  test("compressRatio orders repetition < prose, bounded, null-safe") {
    import graft.text.TextLib.compressRatio
    val prose = "the quick brown fox jumps over the lazy dog near the river bank today"
    val rep = (prose + " ") * 30
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString
    assert(compressRatio(rep) < compressRatio(prose))
    assert(compressRatio(rep) < 0.1, s"30x repetition: ${compressRatio(rep)}")
    assert(compressRatio(noise) > 0.8, s"printable noise: ${compressRatio(noise)}")
    assert(compressRatio("") == 1.0 && compressRatio(null) == 1.0)
  }

  test("fixMojibake: single and double mangling repaired, clean text safe") {
    import graft.text.TextLib.fixMojibake
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // "sloppy" CP1252 decode (what real-world mojibake pipelines do):
    // undefined bytes 0x81/0x8D/0x8F/0x90/0x9D pass through as C1 chars
    // instead of being destroyed into U+FFFD the way Java's strict
    // charset does — fixMojibake's back-map handles both
    val fwd: Map[Int, Char] = Map(0x80 -> '\u20AC', 0x82 -> '\u201A',
      0x83 -> '\u0192', 0x84 -> '\u201E', 0x85 -> '\u2026', 0x86 -> '\u2020',
      0x87 -> '\u2021', 0x88 -> '\u02C6', 0x89 -> '\u2030', 0x8A -> '\u0160',
      0x8B -> '\u2039', 0x8C -> '\u0152', 0x8E -> '\u017D', 0x91 -> '\u2018',
      0x92 -> '\u2019', 0x93 -> '\u201C', 0x94 -> '\u201D', 0x95 -> '\u2022',
      0x96 -> '\u2013', 0x97 -> '\u2014', 0x98 -> '\u02DC', 0x99 -> '\u2122',
      0x9A -> '\u0161', 0x9B -> '\u203A', 0x9C -> '\u0153', 0x9E -> '\u017E',
      0x9F -> '\u0178')
    def mangle(s: String): String = s.getBytes(utf8)
      .map(b => fwd.getOrElse(b & 0xff, (b & 0xff).toChar)).mkString
    for (orig <- Seq("café", "naïve — déjà vu™", "Füße größer",
        "euro € quote \u2019 dash \u2013", "日本語テキスト")) {
      assert(fixMojibake(mangle(orig)) == orig, s"single: $orig")
      assert(fixMojibake(mangle(mangle(orig))) == orig, s"double: $orig")
      // clean text must pass through untouched
      assert(fixMojibake(orig) == orig, s"clean: $orig")
    }
    // ASCII and empty are identity
    assert(fixMojibake("plain ascii") == "plain ascii")
    assert(fixMojibake("") == "" && fixMojibake(null) == null)
    // lone high-bit chars that are NOT valid UTF-8 sequences stay as-is
    assert(fixMojibake("a\u00e9b") == "a\u00e9b")
  }
}
