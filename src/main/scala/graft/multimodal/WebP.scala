package graft.multimodal

/** WebP container walk + full VP8L (lossless) decode, from the public
  * specs: RIFF container (RFC 9649 §2) and the WebP Lossless Bitstream
  * Specification (RFC 9649 §3) — the modern image format crawled media
  * ships in next to JPEG/PNG (reference behavior: gis-etl treats media
  * as opaque blobs; this is extension surface completing the image
  * family with the JpegCodec/PngCodec posture).
  *
  * Surface:
  *  - [[webpMeta]]: chunk walk — format (lossy/lossless/extended),
  *    canvas dims (VP8 frame tag, VP8L 14-bit dims, VP8X 24-bit canvas),
  *    alpha/animation flags. VP8 (lossy) stays metadata-only — a full
  *    DCT predictive codec is out of scope and said so.
  *  - [[vp8lDecode]]: the complete lossless path — LSB-first bit
  *    reading, simple + code-length-coded canonical prefix codes, meta
  *    prefix groups, color cache, LZ77 with the 120-entry distance
  *    mapping, and all four transforms (predictor with the full
  *    14-mode set, color transform, subtract-green, color indexing
  *    with sub-byte pixel packing), inverted in reverse read order.
  *  - [[writeWebpLossless]]: a from-spec ENCODER for fixtures (the
  *    JpegArith validation pattern: round-trip losslessness proves both
  *    sides against the spec). Options exercise each decode path:
  *    subtract-green, predictor blocks, palette packing, color cache,
  *    row-copy LZ77, meta prefix groups.
  *
  * Per-blob kernel, crawl posture: anything malformed returns null /
  * empty, never throws. Scale shape: pure per-row compute, no state. */
object WebP extends Serializable {

  final case class WebpMeta(format: String, width: Int, height: Int,
      has_alpha: Boolean, has_anim: Boolean, n_chunks: Int)

  final case class Vp8lImage(width: Int, height: Int, argb: Array[Int])

  // ---- RIFF container ----------------------------------------------------

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Chunk walk; null for non-WebP input. */
  def webpMeta(p: Array[Byte]): WebpMeta = {
    if (p == null || p.length < 20 || fourcc(p, 0) != "RIFF" ||
      fourcc(p, 8) != "WEBP") return null
    try {
      var off = 12
      var format = ""
      var w = 0
      var h = 0
      var alpha = false
      var anim = false
      var n = 0
      while (off + 8 <= p.length) {
        val tag = fourcc(p, off)
        val size = u32le(p, off + 4).toInt
        val data = off + 8
        if (size < 0 || data + size > p.length) {
          return WebpMeta(format, w, h, alpha, anim, n)
        }
        n += 1
        tag match {
          case "VP8 " => // lossy: 3-byte frame tag, 0x9d012a, 14-bit dims
            if (format.isEmpty) format = "lossy"
            if (size >= 10 && (p(data + 3) & 0xff) == 0x9d &&
              (p(data + 4) & 0xff) == 0x01 && (p(data + 5) & 0xff) == 0x2a) {
              if (w == 0) {
                w = ((p(data + 6) & 0xff) | ((p(data + 7) & 0x3f) << 8))
                h = ((p(data + 8) & 0xff) | ((p(data + 9) & 0x3f) << 8))
              }
            }
          case "VP8L" => // lossless: 0x2f then 14+14 bit dims, alpha bit
            if (format.isEmpty) format = "lossless"
            if (size >= 5 && (p(data) & 0xff) == 0x2f) {
              val bits = u32le(p, data + 1)
              if (w == 0) {
                w = ((bits & 0x3fff) + 1).toInt
                h = (((bits >> 14) & 0x3fff) + 1).toInt
              }
              alpha = alpha || ((bits >> 28) & 1) == 1
            }
          case "VP8X" => // extended: flags + 24-bit minus-one canvas
            format = "extended"
            if (size >= 10) {
              alpha = alpha || ((p(data) & 0x10) != 0)
              anim = anim || ((p(data) & 0x02) != 0)
              w = 1 + ((p(data + 4) & 0xff) | ((p(data + 5) & 0xff) << 8) |
                ((p(data + 6) & 0xff) << 16))
              h = 1 + ((p(data + 7) & 0xff) | ((p(data + 8) & 0xff) << 8) |
                ((p(data + 9) & 0xff) << 16))
            }
          case "ALPH" => alpha = true
          case _ => ()
        }
        off = data + size + (size & 1) // chunks are 2-byte aligned
      }
      if (format.isEmpty) return null
      WebpMeta(format, w, h, alpha, anim, n)
    } catch { case _: Exception => null }
  }

  // ---- bit IO (LSB-first, per RFC 9649 §3.2) -----------------------------

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) throw new IllegalArgumentException("bit overrun")
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << bit
        bit += 1
        if (bit == 8) { out.write(cur); cur = 0; bit = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      if (bit > 0) { out.write(cur); cur = 0; bit = 0 }
      out.toByteArray
    }
  }

  // ---- canonical prefix codes --------------------------------------------

  /** Decode table from code lengths: map (len, code) -> symbol, walked
    * MSB-of-code-first (DEFLATE canonical assignment per the spec). A
    * length array with a single used symbol decodes it with ZERO bits. */
  private final class PrefixCode(lengths: Array[Int]) {
    private val byKey = new java.util.HashMap[Long, Integer]()
    private var only = -1
    private var nUsed = 0
    var maxLen = 0
    locally {
      val blCount = new Array[Int](16)
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) {
          if (l > 15) throw new IllegalArgumentException("len > 15")
          blCount(l) += 1
          nUsed += 1
          only = s
          if (l > maxLen) maxLen = l
        }
        s += 1
      }
      val nextCode = new Array[Int](16)
      var code = 0
      var l = 1
      while (l <= 15) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      s = 0
      while (s < lengths.length) {
        val ln = lengths(s)
        if (ln > 0) {
          byKey.put((ln.toLong << 32) | nextCode(ln), s)
          nextCode(ln) += 1
        }
        s += 1
      }
    }
    def read(in: BitReader): Int = {
      if (nUsed <= 1) return if (only >= 0) only else 0
      var code = 0
      var len = 0
      while (len <= maxLen) {
        code = (code << 1) | in.readBits(1)
        len += 1
        val hit = byKey.get((len.toLong << 32) | code)
        if (hit != null) return hit
      }
      throw new IllegalArgumentException("bad prefix code")
    }
  }

  /** kCodeLengthCodeOrder (RFC 9649 §3.7.2.2). */
  private val CodeLengthOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded normal form). */
  private def readPrefixCode(in: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (in.readBits(1) == 1) { // simple code
      val numSymbols = in.readBits(1) + 1
      val first8 = in.readBits(1) == 1
      val s0 = if (first8) in.readBits(8) else in.readBits(1)
      if (s0 >= alphabetSize) throw new IllegalArgumentException("sym range")
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = in.readBits(8)
        if (s1 >= alphabetSize) throw new IllegalArgumentException("sym range")
        lengths(s1) = 1
      }
      // single-symbol codes read zero bits; PrefixCode handles via nUsed
      new PrefixCode(lengths)
    } else {
      val numCodeLengths = 4 + in.readBits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clLengths(CodeLengthOrder(i)) = in.readBits(3)
        i += 1
      }
      val clCode = new PrefixCode(clLengths)
      var maxSymbol = alphabetSize
      if (in.readBits(1) == 1) { // use length/max_symbol cap
        val lengthNBits = 2 + 2 * in.readBits(3)
        maxSymbol = 2 + in.readBits(lengthNBits)
      }
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(in)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else if (cl == 16) {
          val rep = 3 + in.readBits(2)
          var k = 0
          while (k < rep && symbol < alphabetSize) {
            lengths(symbol) = prevLen; symbol += 1; k += 1
          }
        } else if (cl == 17) {
          symbol += 3 + in.readBits(3)
        } else { // 18
          symbol += 11 + in.readBits(7)
        }
      }
      new PrefixCode(lengths)
    }
  }

  // ---- LZ77 helpers ------------------------------------------------------

  /** Prefix-coded value (lengths and distances, RFC 9649 §3.6.2.2):
    * code < 4 → code + 1; else offset + extra + 1. */
  private def readPrefixValue(in: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + in.readBits(extraBits) + 1
    }

  /** (code, extra, extraBits) for a value — encoder side. */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefix value >= 1: $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val eb = (code - 2) >> 1
        val off = (2 + (code & 1)) << eb
        if (v >= off + 1 && v <= off + (1 << eb)) return (code, v - 1 - off, eb)
        code += 1
      }
      throw new IllegalArgumentException(s"prefix value too big: $v")
    }
  }

  /** The 120-entry short-distance map (RFC 9649 §3.6.2.2): pairs are
    * (xoffset, yoffset); dist = yoff * width + xoff, clamped to >= 1.
    * Codes > 120 carry dist = code - 120 directly (the only form our
    * encoder emits — the table is decode-only surface for external
    * files; WebPSpec pins the convention on the first entries). */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private[multimodal] def mapDistance(distCode: Int, width: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val (xoff, yoff) = DistanceMap(distCode - 1)
      math.max(1, yoff * width + xoff)
    }

  private def cacheKey(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ---- entropy-coded image decode ----------------------------------------

  private final case class Groups(codes: Array[Array[PrefixCode]],
      metaImage: Array[Int], metaBits: Int, metaW: Int)

  /** One spatially/entropy-coded image (RFC 9649 §3.7.2): cache info,
    * meta prefix (level0 only), prefix code groups, LZ77 data. */
  private def decodeImageStream(in: BitReader, w: Int, h: Int,
      level0: Boolean): Array[Int] = {
    // color cache
    val cacheBits = if (in.readBits(1) == 1) in.readBits(4) else 0
    if (cacheBits > 11) throw new IllegalArgumentException("cache bits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    // meta prefix groups (main image only)
    var metaImage: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var nGroups = 1
    if (level0 && in.readBits(1) == 1) {
      metaBits = in.readBits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      val img = decodeImageStream(in, metaW, metaH, level0 = false)
      metaImage = img.map(px => ((px >> 8) & 0xffff)) // (red << 8) | green
      nGroups = metaImage.max + 1
    }
    val greenAlphabet = 256 + 24 + cacheSize
    val codes = Array.fill(nGroups) {
      Array(readPrefixCode(in, greenAlphabet), readPrefixCode(in, 256),
        readPrefixCode(in, 256), readPrefixCode(in, 256),
        readPrefixCode(in, 40))
    }
    // LZ77-coded pixels
    val out = new Array[Int](w * h)
    var i = 0
    val n = w * h
    while (i < n) {
      val g = if (metaImage == null) codes(0)
      else {
        val x = i % w
        val y = i / w
        codes(metaImage((y >> metaBits) * metaW + (x >> metaBits)))
      }
      val s = g(0).read(in)
      if (s < 256) {
        val red = g(1).read(in)
        val blue = g(2).read(in)
        val alpha = g(3).read(in)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(i) = px
        if (cache != null) cache(cacheKey(px, cacheBits)) = px
        i += 1
      } else if (s < 256 + 24) {
        val length = readPrefixValue(in, s - 256)
        val distCode = readPrefixValue(in, g(4).read(in))
        val dist = mapDistance(distCode, w)
        if (dist > i || length > n - i)
          throw new IllegalArgumentException("lz77 range")
        var k = 0
        while (k < length) {
          val px = out(i - dist)
          out(i) = px
          if (cache != null) cache(cacheKey(px, cacheBits)) = px
          i += 1
          k += 1
        }
      } else {
        if (cache == null) throw new IllegalArgumentException("cache ref")
        out(i) = cache(s - 256 - 24)
        i += 1
      }
    }
    out
  }

  // ---- transforms (inverse) ----------------------------------------------

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, SIMD-style on the packed pixel
    var r = 0
    var sh = 0
    while (sh < 32) {
      val va = (a >>> sh) & 0xff
      val vb = (b >>> sh) & 0xff
      r |= ((va + vb) / 2) << sh
      sh += 8
    }
    r
  }

  private def addPixels(a: Int, b: Int): Int = {
    var r = 0
    var sh = 0
    while (sh < 32) {
      r |= (((a >>> sh) + (b >>> sh)) & 0xff) << sh
      sh += 8
    }
    r
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0
    var pT = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xff
      val ct = (t >>> sh) & 0xff
      val ctl = (tl >>> sh) & 0xff
      val pred = cl + ct - ctl
      pL += math.abs(pred - cl)
      pT += math.abs(pred - ct)
      sh += 8
    }
    if (pL <= pT) l else t
  }

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var r = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
        ((tl >>> sh) & 0xff))
      r |= v << sh
      sh += 8
    }
    r
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var r = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      r |= clamp255(a + (a - b) / 2) << sh
      sh += 8
    }
    r
  }

  /** Predict one pixel at flat index i (mode per RFC 9649 §3.5.1); edge
    * rules: (0,0) → opaque black, top row → L, left column → T. The
    * top-right neighbor at the right edge resolves to the flat-array
    * successor of T — i.e. the CURRENT row's first pixel — matching the
    * row-major reference layout. */
  private def predict(mode: Int, out: Array[Int], i: Int, w: Int): Int = {
    val x = i % w
    val y = i / w
    if (x == 0 && y == 0) return 0xff000000
    if (y == 0) return out(i - 1) // top row: L
    if (x == 0) return out(i - w) // left column: T
    val l = out(i - 1)
    val t = out(i - w)
    val tl = out(i - w - 1)
    val tr = out(i - w + 1)
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case _ => throw new IllegalArgumentException(s"predictor $mode")
    }
  }

  private def colorDelta(t: Int, c: Int): Int =
    ((t.toByte.toInt * c.toByte.toInt) >> 5)

  // ---- VP8L decode entry -------------------------------------------------

  /** Locate the VP8L payload inside a WebP file (or accept a bare VP8L
    * stream starting 0x2f); null when absent. Returns (start, end). */
  private def vp8lSpan(p: Array[Byte]): (Int, Int) = {
    if (p == null || p.length < 5) return null
    if ((p(0) & 0xff) == 0x2f) return (0, p.length)
    if (p.length < 20 || fourcc(p, 0) != "RIFF" || fourcc(p, 8) != "WEBP")
      return null
    var off = 12
    while (off + 8 <= p.length) {
      val size = u32le(p, off + 4).toInt
      if (size < 0 || off + 8 + size > p.length) return null
      if (fourcc(p, off) == "VP8L") return (off + 8, off + 8 + size)
      off += 8 + size + (size & 1)
    }
    null
  }

  /** Full VP8L decode; null for non-lossless / malformed input. */
  def vp8lDecode(p: Array[Byte]): Vp8lImage = {
    try {
      val span = vp8lSpan(p)
      if (span == null) return null
      val in = new BitReader(p, span._1, span._2)
      if (in.readBits(8) != 0x2f) return null
      val w = in.readBits(14) + 1
      val h = in.readBits(14) + 1
      in.readBits(1) // alpha hint
      if (in.readBits(3) != 0) return null // version must be 0
      // transforms, in read order
      var xsize = w
      val transforms = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Array[Int], Int)] // (type, data, aux)
      var seen = 0
      while (in.readBits(1) == 1) {
        val tt = in.readBits(2)
        if ((seen & (1 << tt)) != 0)
          throw new IllegalArgumentException("dup transform")
        seen |= 1 << tt
        tt match {
          case 0 | 1 => // predictor / color transform: block sub-image
            val sizeBits = in.readBits(3) + 2
            val bw = (xsize + (1 << sizeBits) - 1) >> sizeBits
            val bh = (h + (1 << sizeBits) - 1) >> sizeBits
            transforms += ((tt, decodeImageStream(in, bw, bh, level0 = false),
              sizeBits))
          case 2 => // subtract-green
            transforms += ((2, null, 0))
          case 3 => // color indexing: palette (delta-coded) + packing
            val ctSize = in.readBits(8) + 1
            val raw = decodeImageStream(in, ctSize, 1, level0 = false)
            val palette = raw.clone()
            var i = 1
            while (i < ctSize) {
              palette(i) = addPixels(palette(i), palette(i - 1))
              i += 1
            }
            val widthBits =
              if (ctSize <= 2) 3 else if (ctSize <= 4) 2
              else if (ctSize <= 16) 1 else 0
            transforms += ((3, palette, widthBits))
            xsize = (xsize + (1 << widthBits) - 1) >> widthBits
        }
      }
      var data = decodeImageStream(in, xsize, h, level0 = true)
      var dataW = xsize
      // apply inverses in REVERSE read order
      transforms.reverseIterator.foreach { case (tt, aux, bits) =>
        tt match {
          case 3 => // palette lookup (+ unpack when widthBits > 0)
            val palette = aux
            val out = new Array[Int](w * h)
            val bpp = 8 >> bits
            val perByte = 1 << bits
            val mask = (1 << bpp) - 1
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val packed = data(y * dataW + (x >> bits))
                val idx = ((packed >> 8) >> ((x & (perByte - 1)) * bpp)) & mask
                out(y * w + x) =
                  if (idx < palette.length) palette(idx) else 0
                x += 1
              }
              y += 1
            }
            data = out
            dataW = w
          case 2 => // add green back to red and blue
            var i = 0
            while (i < data.length) {
              val px = data(i)
              val g = (px >> 8) & 0xff
              val r = (((px >> 16) & 0xff) + g) & 0xff
              val b = ((px & 0xff) + g) & 0xff
              data(i) = (px & 0xff00ff00) | (r << 16) | b
              i += 1
            }
          case 1 => // color transform inverse
            val bw = (dataW + (1 << bits) - 1) >> bits
            var i = 0
            while (i < data.length) {
              val x = i % dataW
              val y = i / dataW
              // element channels (RFC 9649 §3.5.2): red_to_blue rides the
              // RED channel, green_to_blue the GREEN, green_to_red the BLUE
              val cte = aux((y >> bits) * bw + (x >> bits))
              val r2b = (cte >> 16) & 0xff
              val g2b = (cte >> 8) & 0xff
              val g2r = cte & 0xff
              val px = data(i)
              val g = (px >> 8) & 0xff
              val r = (((px >> 16) & 0xff) + colorDelta(g2r, g)) & 0xff
              val b = ((px & 0xff) + colorDelta(g2b, g) +
                colorDelta(r2b, r)) & 0xff
              data(i) = (px & 0xff00ff00) | (r << 16) | b
              i += 1
            }
          case 0 => // predictor inverse (sequential scan)
            val bw = (dataW + (1 << bits) - 1) >> bits
            var i = 0
            while (i < data.length) {
              val x = i % dataW
              val y = i / dataW
              val mode = (aux((y >> bits) * bw + (x >> bits)) >> 8) & 0xff
              data(i) = addPixels(data(i), predict(mode, data, i, dataW))
              i += 1
            }
        }
      }
      Vp8lImage(w, h, data)
    } catch { case _: Exception => null }
  }

  /** Σ over pixels of (alpha + red + green + blue); null when the blob
    * has no decodable VP8L payload. */
  def vp8lPixelSum(p: Array[Byte]): java.lang.Long = {
    val img = vp8lDecode(p)
    if (img == null) return null
    var s = 0L
    var i = 0
    while (i < img.argb.length) {
      val px = img.argb(i)
      s += ((px >>> 24) & 0xff) + ((px >> 16) & 0xff) +
        ((px >> 8) & 0xff) + (px & 0xff)
      i += 1
    }
    s
  }
}
