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

  // ---- VP8L encode (fixture-grade, from the same spec) ---------------------

  /** Encoder options — each flag routes pixels through one decode path so
    * WebPSpec's round-trips cover the whole decoder. Transform stream
    * order when combined: subtract-green, color transform, predictor
    * (palette is exclusive of the other transforms). */
  final case class Vp8lEncodeOpts(
      subtractGreen: Boolean = false,
      predictor: Boolean = false, predictorBits: Int = 4,
      colorTransform: Boolean = false, colorBits: Int = 4,
      palette: Boolean = false,
      cacheBits: Int = 0,
      lz77: Boolean = false,
      metaBits: Int = 0)

  /** Length-limited canonical Huffman code lengths (limit <= 15): plain
    * Huffman then clamp + Kraft repair (lengthen the longest sub-limit
    * code until Kraft(sum) <= 1 — incomplete codes are fine, the decoder
    * only ever sees codes we actually emit). */
  private def huffmanLengths(freq: Array[Long], limit: Int): Array[Int] = {
    val n = freq.length
    val lengths = new Array[Int](n)
    val used = (0 until n).filter(freq(_) > 0)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    // Huffman tree via two-queue merge on symbols sorted by weight
    final class Node(val w: Long, val sym: Int, val l: Node, val r: Node)
    val leaves = used.map(s => new Node(freq(s), s, null, null))
      .sortBy(_.w).toBuffer
    val merged = scala.collection.mutable.Queue.empty[Node]
    def popMin(): Node =
      if (leaves.nonEmpty && (merged.isEmpty || leaves.head.w <= merged.head.w))
        leaves.remove(0)
      else merged.dequeue()
    var remaining = used.size
    while (remaining > 1) {
      val a = popMin(); val b = popMin()
      merged.enqueue(new Node(a.w + b.w, -1, a, b))
      remaining -= 1
    }
    def depth(nd: Node, d: Int): Unit =
      if (nd.sym >= 0) lengths(nd.sym) = math.max(1, d)
      else { depth(nd.l, d + 1); depth(nd.r, d + 1) }
    depth(popMin(), 0)
    // clamp + repair
    var kraft = 0L
    used.foreach { s =>
      if (lengths(s) > limit) lengths(s) = limit
      kraft += 1L << (limit - lengths(s))
    }
    while (kraft > (1L << limit)) {
      // lengthen the deepest code still below the limit
      var pick = -1
      used.foreach(s => if (lengths(s) < limit &&
        (pick < 0 || lengths(s) > lengths(pick))) pick = s)
      kraft -= 1L << (limit - lengths(pick) - 1)
      lengths(pick) += 1
    }
    lengths
  }

  /** Canonical code table (encoder twin of [[PrefixCode]]): codes are
    * written MSB-first (the decoder walks bits into the high end). A
    * table with <= 1 used symbol writes ZERO bits per symbol. */
  private final class CodeTable(val lengths: Array[Int]) {
    val codes = new Array[Int](lengths.length)
    private var nUsed = 0
    locally {
      val blCount = new Array[Int](16)
      lengths.foreach(l => if (l > 0) { blCount(l) += 1; nUsed += 1 })
      val nextCode = new Array[Int](16)
      var code = 0
      var l = 1
      while (l <= 15) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { codes(s) = nextCode(lengths(s)); nextCode(lengths(s)) += 1 }
        s += 1
      }
    }
    def write(bw: BitWriter, sym: Int): Unit = {
      if (nUsed <= 1) return
      val len = lengths(sym)
      require(len > 0, s"symbol $sym has no code")
      var i = len - 1
      while (i >= 0) { bw.writeBits((codes(sym) >> i) & 1, 1); i -= 1 }
    }
  }

  /** Emit one prefix code (simple form when <= 2 used symbols all < 256,
    * else normal form with a code-length code and 17/18 zero runs). */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): CodeTable = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.isEmpty) { // trivial: simple form, single symbol 0
      bw.writeBits(1, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
      bw.writeBits(0, 1)
      return new CodeTable(lengths)
    }
    if (used.size <= 2 && used.forall(_ < 256) &&
      used.forall(lengths(_) == 1)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.size - 1, 1)
      val s0 = used.head
      val first8 = s0 > 1
      bw.writeBits(if (first8) 1 else 0, 1)
      bw.writeBits(s0, if (first8) 8 else 1)
      if (used.size == 2) bw.writeBits(used(1), 8)
      return new CodeTable(lengths)
    }
    bw.writeBits(0, 1) // normal form
    // RLE the length array into cl symbols (literal 0-15, 17/18 zero runs)
    val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) == 0) {
        var z = 0
        while (i + z < lengths.length && lengths(i + z) == 0) z += 1
        var left = z
        while (left > 0) {
          if (left >= 11) { val take = math.min(left, 138)
            toks += ((18, take - 11, 7)); left -= take }
          else if (left >= 3) { toks += ((17, left - 3, 3)); left = 0 }
          else { toks += ((0, 0, 0)); left -= 1 }
        }
        i += z
      } else { toks += ((lengths(i), 0, 0)); i += 1 }
    }
    val clFreq = new Array[Long](19)
    toks.foreach(t => clFreq(t._1) += 1)
    val clLengths = huffmanLengths(clFreq, 7)
    var lastUsed = 0
    var k = 0
    while (k < 19) { if (clLengths(CodeLengthOrder(k)) > 0) lastUsed = k; k += 1 }
    val numCodeLengths = math.max(4, lastUsed + 1)
    bw.writeBits(numCodeLengths - 4, 4)
    k = 0
    while (k < numCodeLengths) {
      bw.writeBits(clLengths(CodeLengthOrder(k)), 3)
      k += 1
    }
    bw.writeBits(0, 1) // no max_symbol cap: every symbol is coded
    val clTable = new CodeTable(clLengths)
    toks.foreach { case (sym, extra, eb) =>
      clTable.write(bw, sym)
      if (eb > 0) bw.writeBits(extra, eb)
    }
    new CodeTable(lengths)
  }

  /** One pixel token: literal, LZ77 copy, or color-cache reference. */
  private sealed trait Tok
  private final case class TLit(px: Int) extends Tok
  private final case class TCopy(len: Int, dist: Int) extends Tok
  private final case class TCache(idx: Int) extends Tok

  /** Tokenize a pixel array mirroring the decoder's cache/copy state
    * machine exactly (copies insert every covered pixel into the cache;
    * cache hits read only). Greedy: prefer the longer of a dist-1 run and
    * a dist-w row copy when >= 3; then a cache hit; else a literal. */
  private def tokenize(pixels: Array[Int], w: Int, cacheBits: Int,
      lz77: Boolean): Array[Tok] = {
    val n = pixels.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    var i = 0
    while (i < n) {
      var emitted = false
      if (lz77 && i >= 1) {
        def runLen(dist: Int): Int = {
          if (dist > i) return 0
          var l = 0
          while (i + l < n && l < 4096 && pixels(i + l) == pixels(i + l - dist)) l += 1
          l
        }
        val r1 = runLen(1)
        val rw = if (w > 1) runLen(w) else 0
        val best = math.max(r1, rw)
        if (best >= 3) {
          val dist = if (rw >= r1) w else 1
          val len = math.max(if (rw >= r1) rw else r1, 3)
          out += TCopy(len, dist)
          if (cache != null) {
            var k = 0
            while (k < len) {
              val px = pixels(i + k)
              cache(cacheKey(px, cacheBits)) = px
              k += 1
            }
          }
          i += len
          emitted = true
        }
      }
      if (!emitted) {
        val px = pixels(i)
        if (cache != null && cache(cacheKey(px, cacheBits)) == px && i > 0) {
          out += TCache(cacheKey(px, cacheBits))
        } else {
          out += TLit(px)
          if (cache != null) cache(cacheKey(px, cacheBits)) = px
        }
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one spatially-coded image (encoder twin of
    * [[decodeImageStream]]). Sub-streams (transforms, meta image,
    * palette) call with level0=false: no meta-group bit is written. */
  private def encodeImageStream(bw: BitWriter, pixels: Array[Int], w: Int,
      h: Int, level0: Boolean, cacheBits: Int = 0, lz77: Boolean = false,
      metaBits: Int = 0): Unit = {
    // color cache
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    // meta prefix groups: checkerboard of 2 groups over metaBits blocks
    var metaImage: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (level0) {
      if (metaBits >= 2) {
        bw.writeBits(1, 1)
        bw.writeBits(metaBits - 2, 3)
        metaW = (w + (1 << metaBits) - 1) >> metaBits
        val metaH = (h + (1 << metaBits) - 1) >> metaBits
        metaImage = Array.tabulate(metaW * metaH) { j =>
          (j % metaW + j / metaW) & 1
        }
        // the decoder derives nGroups from the meta image's max — mirror
        // it so a single-block meta image degrades to one group
        nGroups = metaImage.max + 1
        val metaPixels = metaImage.map(g => 0xff000000 | (g << 8))
        encodeImageStream(bw, metaPixels, metaW, metaH, level0 = false)
      } else bw.writeBits(0, 1)
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenAlphabet = 256 + 24 + cacheSize
    def groupOf(i: Int): Int =
      if (metaImage == null) 0
      else metaImage(((i / w) >> metaBits) * metaW + ((i % w) >> metaBits))
    // pass 1: tokens + per-group histograms
    val toks = tokenize(pixels, w, cacheBits, lz77)
    val gF = Array.fill(nGroups)(new Array[Long](greenAlphabet))
    val rF = Array.fill(nGroups)(new Array[Long](256))
    val bF = Array.fill(nGroups)(new Array[Long](256))
    val aF = Array.fill(nGroups)(new Array[Long](256))
    val dF = Array.fill(nGroups)(new Array[Long](40))
    var pos = 0
    toks.foreach {
      case TLit(px) =>
        val g = groupOf(pos)
        gF(g)((px >> 8) & 0xff) += 1
        rF(g)((px >> 16) & 0xff) += 1
        bF(g)(px & 0xff) += 1
        aF(g)((px >>> 24) & 0xff) += 1
        pos += 1
      case TCopy(len, dist) =>
        val g = groupOf(pos)
        gF(g)(256 + prefixEncode(len)._1) += 1
        dF(g)(prefixEncode(dist + 120)._1) += 1
        pos += len
      case TCache(idx) =>
        gF(groupOf(pos))(256 + 24 + idx) += 1
        pos += 1
    }
    // pass 2: write code tables then the token stream
    val tables = (0 until nGroups).map { g =>
      Array(writePrefixCode(bw, huffmanLengths(gF(g), 15)),
        writePrefixCode(bw, huffmanLengths(rF(g), 15)),
        writePrefixCode(bw, huffmanLengths(bF(g), 15)),
        writePrefixCode(bw, huffmanLengths(aF(g), 15)),
        writePrefixCode(bw, huffmanLengths(dF(g), 15)))
    }
    pos = 0
    toks.foreach {
      case TLit(px) =>
        val t = tables(groupOf(pos))
        t(0).write(bw, (px >> 8) & 0xff)
        t(1).write(bw, (px >> 16) & 0xff)
        t(2).write(bw, px & 0xff)
        t(3).write(bw, (px >>> 24) & 0xff)
        pos += 1
      case TCopy(len, dist) =>
        val t = tables(groupOf(pos))
        val (lc, le, lb) = prefixEncode(len)
        t(0).write(bw, 256 + lc)
        if (lb > 0) bw.writeBits(le, lb)
        val (dc, de, db) = prefixEncode(dist + 120)
        t(4).write(bw, dc)
        if (db > 0) bw.writeBits(de, db)
        pos += len
      case TCache(idx) =>
        tables(groupOf(pos))(0).write(bw, 256 + 24 + idx)
        pos += 1
    }
  }

  private def subPixels(a: Int, b: Int): Int = {
    var r = 0
    var sh = 0
    while (sh < 32) {
      r |= (((a >>> sh) - (b >>> sh)) & 0xff) << sh
      sh += 8
    }
    r
  }

  /** From-spec VP8L encoder producing a complete RIFF/WebP file that
    * [[vp8lDecode]] round-trips losslessly. Fixture-grade: the option
    * set exists to exercise every decode path (the JpegArith validation
    * pattern), not to compress well. */
  def writeWebpLossless(width: Int, height: Int, argb: Array[Int],
      opts: Vp8lEncodeOpts = Vp8lEncodeOpts()): Array[Byte] = {
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384,
      s"dims out of VP8L range: ${width}x$height")
    require(argb.length == width * height, "pixel count mismatch")
    require(!opts.palette ||
      !(opts.subtractGreen || opts.predictor || opts.colorTransform),
      "palette is exclusive of the arithmetic transforms")
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(width - 1, 14)
    bw.writeBits(height - 1, 14)
    bw.writeBits(if (argb.exists(p => (p >>> 24) != 0xff)) 1 else 0, 1)
    bw.writeBits(0, 3) // version
    var data = argb.clone()
    var xsize = width
    if (opts.palette) {
      val distinct = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      data.foreach(px => if (!distinct.contains(px)) distinct(px) = distinct.size)
      val ctSize = distinct.size
      require(ctSize <= 256, s"palette needs <= 256 colors: $ctSize")
      bw.writeBits(1, 1); bw.writeBits(3, 2) // transform: color indexing
      bw.writeBits(ctSize - 1, 8)
      val palette = distinct.keys.toArray
      val deltas = Array.tabulate(ctSize)(i =>
        if (i == 0) palette(0) else subPixels(palette(i), palette(i - 1)))
      encodeImageStream(bw, deltas, ctSize, 1, level0 = false)
      val widthBits =
        if (ctSize <= 2) 3 else if (ctSize <= 4) 2
        else if (ctSize <= 16) 1 else 0
      val bpp = 8 >> widthBits
      val perByte = 1 << widthBits
      xsize = (width + perByte - 1) >> widthBits
      val packed = new Array[Int](xsize * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val idx = distinct(data(y * width + x))
          val j = y * xsize + (x >> widthBits)
          packed(j) |= idx << ((x & (perByte - 1)) * bpp) << 8
          x += 1
        }
        y += 1
      }
      var j = 0
      while (j < packed.length) { packed(j) |= 0xff000000; j += 1 }
      data = packed
    }
    if (opts.subtractGreen) {
      bw.writeBits(1, 1); bw.writeBits(2, 2)
      var i = 0
      while (i < data.length) {
        val px = data(i)
        val g = (px >> 8) & 0xff
        val r = (((px >> 16) & 0xff) - g) & 0xff
        val b = ((px & 0xff) - g) & 0xff
        data(i) = (px & 0xff00ff00.toInt) | (r << 16) | b
        i += 1
      }
    }
    if (opts.colorTransform) {
      val bits = opts.colorBits
      require(bits >= 2 && bits <= 9, s"colorBits in [2,9]: $bits")
      bw.writeBits(1, 1); bw.writeBits(1, 2)
      bw.writeBits(bits - 2, 3)
      val bwd = (xsize + (1 << bits) - 1) >> bits
      val bhd = (height + (1 << bits) - 1) >> bits
      val elems = Array.tabulate(bwd * bhd) { j =>
        val r2b = (j * 7 + 3) & 0xff
        val g2b = (j * 13 + 5) & 0xff
        val g2r = (j * 29 + 11) & 0xff
        0xff000000 | (r2b << 16) | (g2b << 8) | g2r
      }
      encodeImageStream(bw, elems, bwd, bhd, level0 = false)
      var i = 0
      while (i < data.length) {
        val x = i % xsize
        val y = i / xsize
        val cte = elems((y >> bits) * bwd + (x >> bits))
        val r2b = (cte >> 16) & 0xff
        val g2b = (cte >> 8) & 0xff
        val g2r = cte & 0xff
        val px = data(i)
        val g = (px >> 8) & 0xff
        val origR = (px >> 16) & 0xff
        val r = (origR - colorDelta(g2r, g)) & 0xff
        val b = ((px & 0xff) - colorDelta(g2b, g) - colorDelta(r2b, origR)) & 0xff
        data(i) = (px & 0xff00ff00.toInt) | (r << 16) | b
        i += 1
      }
    }
    if (opts.predictor) {
      val bits = opts.predictorBits
      require(bits >= 2 && bits <= 9, s"predictorBits in [2,9]: $bits")
      bw.writeBits(1, 1); bw.writeBits(0, 2)
      bw.writeBits(bits - 2, 3)
      val bwd = (xsize + (1 << bits) - 1) >> bits
      val bhd = (height + (1 << bits) - 1) >> bits
      val modes = Array.tabulate(bwd * bhd)(j => (j % 14))
      val modeImg = modes.map(m => 0xff000000 | (m << 8))
      encodeImageStream(bw, modeImg, bwd, bhd, level0 = false)
      val orig = data // predictions read RECONSTRUCTED = original pixels
      val res = new Array[Int](data.length)
      var i = 0
      while (i < data.length) {
        val x = i % xsize
        val y = i / xsize
        val mode = modes((y >> bits) * bwd + (x >> bits))
        res(i) = subPixels(orig(i), predict(mode, orig, i, xsize))
        i += 1
      }
      data = res
    }
    bw.writeBits(0, 1) // end of transforms
    encodeImageStream(bw, data, xsize, height, level0 = true,
      cacheBits = opts.cacheBits, lz77 = opts.lz77, metaBits = opts.metaBits)
    val payload = bw.bytes
    // RIFF wrap
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    out.write("RIFF".getBytes("US-ASCII"))
    val chunkLen = payload.length + (payload.length & 1)
    w32(4 + 8 + chunkLen)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    w32(payload.length)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
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
