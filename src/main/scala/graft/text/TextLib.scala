package graft.text

/** Pure-Scala text/dedup kernel: stable 64-bit hashing, MinHash, SimHash,
  * winnowing fingerprints, and a tiny n-gram language scorer. These back the
  * training-data-pipeline operators (exact/near dedup, fingerprinting,
  * language ID) that extend the reference's surface for 100 TB text corpora.
  *
  * Everything here is deterministic (fixed seeds), allocation-light, and
  * independent of Spark so it unit-tests in isolation; the Catalyst layer in
  * [[graft.functions.TextFunctions]] wraps these as expressions.
  */
object TextLib {

  // ---------------------------------------------------------------------
  // Stable 64-bit string hash (FNV-1a — public-domain algorithm). We do not
  // use String.hashCode (32-bit, collision-heavy) nor rely on Spark's
  // xxhash64 here so the kernel stays Spark-free; the Catalyst layer may
  // still use xxhash64 for column-level hashing.
  // ---------------------------------------------------------------------
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def hash64(s: CharSequence): Long = {
    var h = FnvOffset
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      h ^= (c & 0xff)
      h *= FnvPrime
      h ^= (c >>> 8)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def hash64(v: Long): Long = {
    // 64-bit finalizer (splitmix64 mixing constants, public domain)
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // ---------------------------------------------------------------------
  // Tokenization
  // ---------------------------------------------------------------------

  /** Whitespace tokenizer (the baseline token counter). */
  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.split("\\s+").filter(_.nonEmpty)

  /** BPE-ish subword-shaped token count: runs of letters, runs of digits,
    * or single non-space symbols — the regex family GPT-style tokenizers
    * use as a pre-tokenizer. A cheap, deterministic proxy for "LLM tokens"
    * usable at scale without a vocab file. */
  private val BpeIsh = java.util.regex.Pattern.compile(
    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")

  def bpeIshTokenCount(text: String): Int = {
    if (text == null) return 0
    val m = BpeIsh.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Hashed word n-gram shingles (distinct), the input to MinHash/Jaccard. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) {
      if (toks.isEmpty) return Array.empty
      return Array(hash64(toks.mkString(" ")))
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(hash64(sb))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  // ---------------------------------------------------------------------
  // MinHash
  // ---------------------------------------------------------------------

  /** k-permutation MinHash signature over a set of element hashes.
    * Permutation i is the splitmix64 mix of (x ^ seed_i) — a standard
    * tabulation-free construction; deterministic across runs/JVMs. */
  def minHashSignature(elems: Array[Long], k: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (elems == null || elems.isEmpty) return sig
    var i = 0
    while (i < k) {
      val s = hash64(seed + i * 0x9e3779b97f4a7c15L)
      var best = Long.MaxValue
      var j = 0
      while (j < elems.length) {
        val h = hash64(elems(j) ^ s)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  /** Estimated Jaccard from two signatures. */
  def minHashJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.length != b.length || a.length == 0) return 0.0
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Exact Jaccard of two sorted-distinct hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  // ---------------------------------------------------------------------
  // SimHash (64-bit) over token hashes
  // ---------------------------------------------------------------------

  def simHash64(elems: Array[Long]): Long = {
    if (elems == null || elems.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < elems.length) {
      val h = elems(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003):
  // rolling k-gram hashes, keep the min in each window of w — a compact,
  // position-robust fingerprint for plagiarism/near-dup detection.
  // ---------------------------------------------------------------------

  def winnowFingerprint(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val kh = new Array[Long](n)
    var i = 0
    while (i < n) { kh(i) = hash64(text.subSequence(i, i + k)); i += 1 }
    if (n <= w) return Array(kh.min)
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= n) {
      var best = Long.MaxValue
      var j = start
      while (j < start + w) { if (kh(j) < best) best = kh(j); j += 1 }
      out.add(best)
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    arr
  }

  // ---------------------------------------------------------------------
  // Quality / language heuristics
  // ---------------------------------------------------------------------

  def punctRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    var p = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) p += 1
      i += 1
    }
    p.toDouble / text.length
  }

  private val StopwordsEn: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  def stopwordRatio(text: String): Double = {
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    var s = 0
    var i = 0
    while (i < toks.length) {
      if (StopwordsEn.contains(toks(i).toLowerCase)) s += 1
      i += 1
    }
    s.toDouble / toks.length
  }

  /** Composite [0,1] quality score (length + stopword presence − excess
    * punctuation), the shape of a C4/Gopher-style filter stage. */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    val lenScore = math.min(1.0, toks.length / 50.0)
    val meanWordLen = toks.map(_.length).sum.toDouble / toks.length
    val wordLenScore = if (meanWordLen >= 2.0 && meanWordLen <= 12.0) 1.0 else 0.0
    val punct = punctRatio(text)
    val punctScore = if (punct < 0.2) 1.0 else math.max(0.0, 1.0 - punct)
    val stop = math.min(1.0, stopwordRatio(text) * 5.0)
    0.35 * lenScore + 0.2 * wordLenScore + 0.2 * punctScore + 0.25 * stop
  }

  /** Character-frequency language scorer: cheap trigram/letter-profile
    * heuristic over a fixed profile table. Profiles are letter frequency
    * signatures of the language's most common function words; score =
    * fraction of tokens matching the profile's marker set. Returns the
    * best-scoring language code, "und" when nothing scores. */
  private val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "it" -> Set("il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"))

  def detectLang(text: String): String = {
    val toks = tokenize(text).map(_.toLowerCase)
    if (toks.isEmpty) return "und"
    var bestLang = "und"
    var bestScore = 0.0
    LangMarkers.foreach { case (lang, markers) =>
      var hits = 0
      var i = 0
      while (i < toks.length) {
        if (markers.contains(toks(i))) hits += 1
        i += 1
      }
      val score = hits.toDouble / toks.length
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }
    bestLang
  }

  /** Unicode normalization (UAX #15) — the canonical first step of corpus
    * cleaning: visually identical strings with different codepoint
    * sequences (decomposed accents, compatibility ligatures, width
    * variants) collapse to one byte form, so exact/near dedup and token
    * counts stop fracturing on encoding happenstance. Forms: NFC, NFD,
    * NFKC, NFKD (case-insensitive); unknown forms fail loudly — a typo'd
    * form silently not normalizing would corrupt every downstream dedup. */
  def unicodeNormalize(s: String, form: String): String = {
    val f = form.toUpperCase match {
      case "NFC"  => java.text.Normalizer.Form.NFC
      case "NFD"  => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other  => throw new IllegalArgumentException(
        s"unicode_normalize: unknown form '$other' (want NFC|NFD|NFKC|NFKD)")
    }
    java.text.Normalizer.normalize(s, f)
  }

  /** Lowercased host of a URL: after the scheme, skipping userinfo,
    * stopping at port/path/query/fragment; trailing dot stripped. Null
    * for strings without a scheme://host shape. The key a crawl pipeline
    * extracts before any domain-level capping or mixing. */
  def urlHost(url: String): String = {
    if (url == null) return null
    val at = url.indexOf("://")
    if (at <= 0) return null
    var i = at + 3
    // userinfo ends at the LAST '@' before the authority ends
    val authEnd = {
      var j = i
      while (j < url.length && "/?#".indexOf(url.charAt(j)) < 0) j += 1
      j
    }
    val lastAt = url.lastIndexOf('@', authEnd - 1)
    if (lastAt >= i) i = lastAt + 1
    // bracketed IPv6 literal: [..] verbatim (colons inside are not ports)
    if (i < authEnd && url.charAt(i) == '[') {
      val close = url.indexOf(']', i)
      if (close < 0 || close >= authEnd) return null
      return url.substring(i, close + 1).toLowerCase
    }
    var e = i
    while (e < authEnd && url.charAt(e) != ':') e += 1
    if (e == i) return null
    var host = url.substring(i, e).toLowerCase
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.isEmpty) null else host
  }

  /** Common multi-label public suffixes (a small, cited subset of the
    * Mozilla Public Suffix List — publicsuffix.org; the full list is a
    * drop-in replacement). Registrable domain = one label above the
    * public suffix. */
  private val multiSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "go.kr", "ne.kr",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.nz", "co.id", "co.th")

  /** Registrable ("pay-level") domain of a host: the label above the
    * public suffix — two labels normally, three over a multi-label suffix
    * (co.uk family). Single-label hosts (localhost, intranet names)
    * return themselves. */
  def registrableDomain(host: String): String = {
    if (host == null) return null
    val labels = host.split("\\.")
    if (labels.length <= 1) return host
    val last2 = labels.takeRight(2).mkString(".")
    if (labels.length >= 3 && multiSuffixes.contains(last2))
      labels.takeRight(3).mkString(".")
    else last2
  }

  /** Deflate compressibility ratio (compressed bytes / raw bytes, zlib
    * level 6): the classic cheap junk detector — boilerplate and
    * keyword-stuffed pages compress far below normal prose, while
    * random/encrypted blobs sit near (or slightly above) 1.0. Empty or
    * null text reports 1.0 (nothing to judge). */
  def compressRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 1.0
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  /** Mojibake repair (the ftfy core move): text that went UTF-8 →
    * mis-decoded as Latin-1/Windows-1252 → re-encoded shows as "Ã©"-style
    * runs. If re-encoding the string as Latin-1/CP1252 yields bytes that
    * decode as STRICTLY VALID UTF-8 and that decoding is shorter, the
    * original encoding chain is unambiguous — undo it (repeatedly, for
    * double-mangled text). Text that does not round-trip is returned
    * unchanged: the repair can never corrupt clean input, because clean
    * non-ASCII text re-encoded as CP1252 almost never forms valid UTF-8
    * multi-byte sequences by accident. */
  def fixMojibake(text: String): String = {
    if (text == null || text.isEmpty) return text
    var cur = text
    var rounds = 0
    while (rounds < 3) { // double-mangling is real; deeper is pathological
      val repaired = demojibakeOnce(cur)
      if (repaired == null) return cur
      cur = repaired
      rounds += 1
    }
    cur
  }

  private def demojibakeOnce(t: String): String = {
    // fast reject: pure ASCII cannot be mojibake
    var i = 0
    var hasHigh = false
    while (i < t.length && !hasHigh) { if (t.charAt(i) > 127) hasHigh = true; i += 1 }
    if (!hasHigh) return null
    // map chars back to the bytes a CP1252 mis-decode produced; chars
    // outside CP1252's image mean this is NOT mojibake of that kind
    val bytes = new Array[Byte](t.length)
    i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      val b =
        if (c <= 0xff) c.toInt
        else Cp1252Back.getOrElse(c, -1)
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a genuine repair SHRINKS (multi-byte sequences collapse); an
      // ASCII-identical "decode" is a no-op, not evidence
      if (out.length < t.length) out else null
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** The 27 CP1252 codepoints that differ from Latin-1 in 0x80-0x9F
    * (public Windows-1252 table) — mojibake routinely carries these
    * (e.g. \u20AC for byte 0x80, \u2019 for 0x92). */
  private val Cp1252Back: Map[Char, Int] = Map(
    '\u20AC' -> 0x80, '\u201A' -> 0x82, '\u0192' -> 0x83, '\u201E' -> 0x84,
    '\u2026' -> 0x85, '\u2020' -> 0x86, '\u2021' -> 0x87, '\u02C6' -> 0x88,
    '\u2030' -> 0x89, '\u0160' -> 0x8A, '\u2039' -> 0x8B, '\u0152' -> 0x8C,
    '\u017D' -> 0x8E, '\u2018' -> 0x91, '\u2019' -> 0x92, '\u201C' -> 0x93,
    '\u201D' -> 0x94, '\u2022' -> 0x95, '\u2013' -> 0x96, '\u2014' -> 0x97,
    '\u02DC' -> 0x98, '\u2122' -> 0x99, '\u0161' -> 0x9A, '\u203A' -> 0x9B,
    '\u0153' -> 0x9C, '\u017E' -> 0x9E, '\u0178' -> 0x9F)
}
