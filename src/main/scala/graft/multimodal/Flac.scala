package graft.multimodal

/** FLAC frame decode + from-spec fixture encoder (RFC 9639 / the public
  * FLAC format specification). Real audio corpora ship FLAC, not PCM WAV —
  * this surfaces their PCM to [[AudioLib]]'s fingerprint/spectrum/RMS
  * features, closing the audio-dedup format gap.
  *
  * Decoder coverage: STREAMINFO + metadata walk, frame headers (all block
  * size / sample rate / sample size encodings, UTF-8-coded frame/sample
  * numbers, CRC-8 verified), subframe types CONSTANT / VERBATIM / FIXED
  * (orders 0-4) / LPC (orders 1-32), wasted bits, Rice / Rice2 residual
  * partitions with escape codes, stereo decorrelation (left/side,
  * right/side, mid/side), CRC-16 verified per frame. Corrupt tails yield
  * the frames decoded so far (the crawl posture); header/CRC violations
  * before the first frame reject loudly (null).
  *
  * Encoder (fixture twin, independent bit-writer): CONSTANT detection,
  * FIXED orders 0-2 with per-subframe best-order and brute-force Rice
  * parameter selection, and variant knobs ([[EncodeOpts]]: LPC subframes,
  * Rice2 coding, multi-partition residuals, escape partitions, wasted
  * bits, mid/side) so round-trips exercise EVERY decoder branch. FLAC is
  * lossless, so `decode(encode(x)) == x` exactly — the [[JpegArith]]
  * validation pattern.
  */
object Flac extends Serializable {

  /** Decoded stream: per-channel sample planes (not interleaved). */
  final case class Audio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Array[Int]])

  // ---- CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0)
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit reader (MSB-first, the FLAC bit order) -------------------------
  private final class BitReader(val b: Array[Byte]) {
    var bytePos = 0
    var bitPos = 0
    def readBit(): Int = {
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** Null for non-FLAC/undecodable headers; a corrupt tail yields the
    * complete frames decoded before it. */
  def decode(payload: Array[Byte]): Audio = {
    try decodeOrNull(payload)
    catch { case _: Exception => null }
  }

  private def decodeOrNull(p: Array[Byte]): Audio = {
    if (p == null || p.length < 42) return null
    if (!(p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C')) return null
    // metadata block walk; STREAMINFO is mandatory and first
    var o = 4
    var last = false
    var rate = 0; var chans = 0; var bits = 0; var total = 0L
    var first = true
    while (!last && o + 4 <= p.length) {
      last = (p(o) & 0x80) != 0
      val typ = p(o) & 0x7f
      val len = ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
      if (o + 4 + len > p.length) return null
      if (first) {
        if (typ != 0 || len < 34) return null
        val d = o + 4
        rate = ((p(d + 10) & 0xff) << 12) | ((p(d + 11) & 0xff) << 4) |
          ((p(d + 12) & 0xff) >> 4)
        chans = (((p(d + 12) & 0xff) >> 1) & 0x7) + 1
        bits = (((p(d + 12) & 1) << 4) | ((p(d + 13) & 0xff) >> 4)) + 1
        total = ((p(d + 13) & 0x0fL) << 32) | ((p(d + 14) & 0xffL) << 24) |
          ((p(d + 15) & 0xffL) << 16) | ((p(d + 16) & 0xffL) << 8) |
          (p(d + 17) & 0xffL)
        first = false
      }
      o += 4 + len
    }
    if (first || rate <= 0 || chans < 1) return null
    val out = Array.fill(chans)(new scala.collection.mutable.ArrayBuilder.ofInt)
    var got = 0L
    var pos = o
    var ok = true
    while (ok && pos + 5 < p.length && (total == 0 || got < total)) {
      // a corrupt frame (or cut tail) stops the walk but keeps everything
      // decoded before it — the crawl posture
      val n = try decodeFrame(p, pos, rate, bits, chans, out)
              catch { case _: Exception => -1L }
      if (n < 0) ok = false
      else { got += (n >> 32); pos = (n & 0xffffffffL).toInt }
    }
    if (got == 0) return null
    Audio(rate, chans, bits, out.map(_.result()))
  }

  /** One frame at `pos`; returns (samplesDecoded << 32) | nextPos, or -1
    * on any violation (sync, CRC, bounds). */
  private def decodeFrame(p: Array[Byte], pos: Int, siRate: Int, siBits: Int,
      siChans: Int, out: Array[scala.collection.mutable.ArrayBuilder.ofInt]): Long = {
    if ((p(pos) & 0xff) != 0xff || (p(pos + 1) & 0xfc) != 0xf8) return -1
    val br = new BitReader(p)
    br.bytePos = pos
    br.readBits(14) // sync
    br.readBit() // reserved
    br.readBit() // blocking strategy
    val bsBits = br.readBits(4).toInt
    val srBits = br.readBits(4).toInt
    val chAssign = br.readBits(4).toInt
    val ssBits = br.readBits(3).toInt
    br.readBit() // reserved
    // UTF-8-style coded frame/sample number (up to 36 bits, 7 bytes)
    val lead = br.readBits(8).toInt
    var cont = 0
    if (lead >= 0x80) {
      var m = 0x40
      while ((lead & m) != 0) { cont += 1; m >>= 1 }
      if (cont < 1 || cont > 6) return -1
      var i = 0
      while (i < cont) { if ((br.readBits(8).toInt & 0xc0) != 0x80) return -1; i += 1 }
    }
    val blockSize = bsBits match {
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8).toInt + 1
      case 7 => br.readBits(16).toInt + 1
      case n if n >= 8 => 256 << (n - 8)
      case _ => return -1
    }
    srBits match {
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => return -1
      case _ => () // table or from STREAMINFO — the stream value governs
    }
    val bps = ssBits match {
      case 0 => siBits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return -1
    }
    val nCh = if (chAssign < 8) chAssign + 1 else 2
    if (nCh != siChans) return -1
    // header CRC-8 covers sync through the last header byte
    val crcPos = br.bytePos
    if (br.bitPos != 0) return -1 // header is byte-aligned by construction
    if (crc8(p, pos, crcPos) != (p(crcPos) & 0xff)) return -1
    br.bytePos = crcPos + 1
    // subframes
    val ch = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      val extra = chAssign match {
        case 8 => if (c == 1) 1 else 0 // left/side: side has +1 bit
        case 9 => if (c == 0) 1 else 0 // right/side: side first
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      ch(c) = decodeSubframe(br, blockSize, bps + extra)
      if (ch(c) == null) return -1
      c += 1
    }
    br.alignByte()
    // frame CRC-16 covers everything from the sync byte
    val c16 = crc16(p, pos, br.bytePos)
    if (br.bytePos + 2 > p.length) return -1
    val fileC16 = ((p(br.bytePos) & 0xff) << 8) | (p(br.bytePos + 1) & 0xff)
    if (c16 != fileC16) return -1
    // undo stereo decorrelation
    chAssign match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { ch(1)(i) = ch(0)(i) - ch(1)(i); i += 1 }
      case 9 => // right/side: left = right + side (side stored first)
        var i = 0
        while (i < blockSize) {
          val side = ch(0)(i)
          ch(0)(i) = ch(1)(i) + side
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = ch(1)(i)
          var mid = ch(0)(i)
          mid = (mid << 1) | (side & 1)
          ch(0)(i) = (mid + side) >> 1
          ch(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    var k = 0
    while (k < nCh) { out(k) ++= ch(k); k += 1 }
    ((blockSize.toLong) << 32) | (br.bytePos + 2)
  }

  private def decodeSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    if (br.readBit() != 0) return null // padding bit must be 0
    val typ = br.readBits(6).toInt
    var wasted = 0
    if (br.readBit() == 1) wasted = 1 + br.readUnary()
    val eb = bps - wasted
    if (eb <= 0 || eb > 32) return null
    val s = new Array[Int](blockSize)
    if (typ == 0) { // CONSTANT
      val v = br.readSigned(eb)
      java.util.Arrays.fill(s, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = br.readSigned(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      var i = 0
      while (i < order) { s(i) = br.readSigned(eb); i += 1 }
      if (!readResidual(br, blockSize, order, s)) return null
      restoreFixed(s, order, blockSize)
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1f) + 1
      var i = 0
      while (i < order) { s(i) = br.readSigned(eb); i += 1 }
      val precision = br.readBits(4).toInt + 1
      if (precision == 16) return null // 0b1111 is invalid
      val shift = br.readSigned(5)
      if (shift < 0) return null
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      if (!readResidual(br, blockSize, order, s)) return null
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
        s(i) += (acc >> shift).toInt
        i += 1
      }
    } else return null
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) <<= wasted; i += 1 }
    }
    s
  }

  private def restoreFixed(s: Array[Int], order: Int, n: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 => while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 => while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
      case 4 => while (i < n) {
        s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4); i += 1
      }
      case _ => ()
    }
  }

  /** Rice/Rice2-partitioned residual into s[order..blockSize). */
  private def readResidual(br: BitReader, blockSize: Int, order: Int,
      s: Array[Int]): Boolean = {
    val method = br.readBits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = br.readBits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) return false
    var idx = order
    var part = 0
    while (part < parts) {
      val n = (blockSize >> po) - (if (part == 0) order else 0)
      if (n < 0) return false
      val param = br.readBits(pBits).toInt
      if (param == escape) {
        val raw = br.readBits(5).toInt
        var i = 0
        while (i < n) { s(idx) = br.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = br.readUnary()
          val r = if (param > 0) br.readBits(param) else 0L
          val u = (q.toLong << param) | r
          s(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    true
  }

  // ======================= fixture encoder ================================

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nb += 1
      if (nb == 8) { bos.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def align(): Unit = while (nb != 0) writeBit(0)
    def toBytes: Array[Byte] = { align(); bos.toByteArray }
  }

  /** Encoder variants — each knob routes the stream through a different
    * decoder branch so round-trip tests cover them all:
    * `lpc` emits LPC order-2 subframes (coefs [2,-1], shift 0 — the
    * fixed-order-2 polynomial, so residuals stay identical); `rice2`
    * uses the 5-bit-parameter coding method; `partitionOrder` splits the
    * residual into 2^po Rice partitions; `escape` forces raw-bits escape
    * partitions; `wasted` shifts out common trailing zero bits. */
  final case class EncodeOpts(lpc: Boolean = false, rice2: Boolean = false,
      partitionOrder: Int = 0, escape: Boolean = false, wasted: Boolean = false)

  /** Encode per-channel planes losslessly: CONSTANT where flat, else the
    * best FIXED order 0-2 (or LPC under opts) with a brute-force Rice
    * parameter. `midSide` exercises stereo decorrelation (2 channels
    * only). Block size fixed except the final partial block. */
  def encode(sampleRate: Int, bits: Int, channels: Array[Array[Int]],
      blockSize: Int = 4096, midSide: Boolean = false,
      opts: EncodeOpts = EncodeOpts()): Array[Byte] = {
    val nCh = channels.length
    require(nCh >= 1 && nCh <= 8, s"channels: $nCh")
    require(bits >= 4 && bits <= 24, s"bits: $bits")
    require(blockSize >= 16 && blockSize <= 32768, s"blockSize: $blockSize")
    require(channels.forall(_.length == channels(0).length), "plane lengths")
    require(!midSide || nCh == 2, "midSide needs exactly 2 channels")
    val total = channels(0).length.toLong
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (34 bytes), the only metadata block
    val si = new Array[Byte](38)
    si(0) = 0x80.toByte // last | type 0
    si(3) = 34
    val lastBlock = if (total % blockSize == 0) blockSize else (total % blockSize).toInt
    val minB = math.min(blockSize, if (total == 0) blockSize else lastBlock)
    si(4) = (minB >> 8).toByte; si(5) = (minB & 0xff).toByte
    si(6) = (blockSize >> 8).toByte; si(7) = (blockSize & 0xff).toByte
    // min/max frame size 0 = unknown (bytes 8..13)
    si(14) = (sampleRate >> 12).toByte
    si(15) = ((sampleRate >> 4) & 0xff).toByte
    si(16) = (((sampleRate & 0xf) << 4) | ((nCh - 1) << 1) |
      ((bits - 1) >> 4)).toByte
    si(17) = ((((bits - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toByte
    si(18) = ((total >> 24) & 0xff).toByte
    si(19) = ((total >> 16) & 0xff).toByte
    si(20) = ((total >> 8) & 0xff).toByte
    si(21) = (total & 0xff).toByte
    // md5 (bytes 22..37 of the block) left 0 = unknown
    out.write(si)
    var off = 0
    var frameNo = 0L
    while (off < total) {
      val n = math.min(blockSize.toLong, total - off).toInt
      out.write(encodeFrame(sampleRate, bits, channels, off, n, frameNo,
        midSide, opts))
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  private def encodeFrame(rate: Int, bits: Int, channels: Array[Array[Int]],
      off: Int, n: Int, frameNo: Long, midSide: Boolean,
      opts: EncodeOpts): Array[Byte] = {
    val nCh = channels.length
    val bw = new BitWriter
    bw.writeBits(0x3ffe, 14) // sync
    bw.writeBit(0) // reserved
    bw.writeBit(0) // fixed blocking
    bw.writeBits(7, 4) // block size: explicit 16-bit
    bw.writeBits(0, 4) // sample rate: from STREAMINFO
    val chAssign = if (midSide) 10 else nCh - 1
    bw.writeBits(chAssign, 4)
    val ssBits = bits match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case _ => 0 // from STREAMINFO
    }
    bw.writeBits(ssBits, 3)
    bw.writeBit(0) // reserved
    // UTF-8-coded frame number
    writeUtf8Coded(bw, frameNo)
    bw.writeBits((n - 1).toLong, 16)
    val header = bw.toBytes // align is a no-op: header is byte-aligned
    val withCrc8 = java.util.Arrays.copyOf(header, header.length + 1)
    withCrc8(header.length) = crc8(header, 0, header.length).toByte
    // subframes
    val body = new BitWriter
    if (midSide) {
      val mid = new Array[Int](n)
      val side = new Array[Int](n)
      var i = 0
      while (i < n) {
        val l = channels(0)(off + i)
        val r = channels(1)(off + i)
        mid(i) = (l + r) >> 1
        side(i) = l - r
        i += 1
      }
      writeSubframe(body, mid, bits, opts)
      writeSubframe(body, side, bits + 1, opts)
    } else {
      var c = 0
      while (c < nCh) {
        val plane = new Array[Int](n)
        System.arraycopy(channels(c), off, plane, 0, n)
        writeSubframe(body, plane, bits, opts)
        c += 1
      }
    }
    val bodyBytes = body.toBytes
    val frame = new Array[Byte](withCrc8.length + bodyBytes.length + 2)
    System.arraycopy(withCrc8, 0, frame, 0, withCrc8.length)
    System.arraycopy(bodyBytes, 0, frame, withCrc8.length, bodyBytes.length)
    val c16 = crc16(frame, 0, frame.length - 2)
    frame(frame.length - 2) = (c16 >> 8).toByte
    frame(frame.length - 1) = (c16 & 0xff).toByte
    frame
  }

  private def writeUtf8Coded(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.writeBits(v, 8)
    else if (v < 0x800) {
      bw.writeBits(0xc0L | (v >> 6), 8)
      bw.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      // fixture frames never exceed 2^11 — wider forms unneeded
      bw.writeBits(0xe0L | (v >> 12), 8)
      bw.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      bw.writeBits(0x80L | (v & 0x3f), 8)
    }
  }

  private def writeSubframe(bw: BitWriter, sIn: Array[Int], bps: Int,
      opts: EncodeOpts): Unit = {
    val n = sIn.length
    bw.writeBit(0) // padding
    var allEq = true
    var i = 1
    while (allEq && i < n) { allEq = sIn(i) == sIn(0); i += 1 }
    if (allEq) {
      bw.writeBits(0, 6) // CONSTANT
      bw.writeBit(0) // no wasted bits
      bw.writeBits(sIn(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // wasted bits: shift out trailing zero bits common to every sample
    var wasted = 0
    if (opts.wasted) {
      var w = 32
      var j = 0
      while (j < n && w > 0) {
        if (sIn(j) != 0)
          w = math.min(w, java.lang.Integer.numberOfTrailingZeros(sIn(j)))
        j += 1
      }
      if (w > 0 && w < 32 && w < bps - 1) wasted = w
    }
    val s = if (wasted == 0) sIn else sIn.map(_ >> wasted)
    val eb = bps - wasted
    // predictor: LPC order 2 (coefs [2,-1], shift 0 — the fixed-order-2
    // polynomial) under opts.lpc, else best FIXED order 0..2
    def resid(order: Int): Array[Int] = {
      val r = new Array[Int](n - order)
      var i = order
      while (i < n) {
        r(i - order) = order match {
          case 0 => s(i)
          case 1 => s(i) - s(i - 1)
          case _ => s(i) - 2 * s(i - 1) + s(i - 2)
        }
        i += 1
      }
      r
    }
    var order = 0
    var res: Array[Int] = null
    if (opts.lpc && n > 2) {
      order = 2
      res = resid(2)
      bw.writeBits(0x20L | (order - 1), 6) // LPC, order 2
    } else {
      var bestCost = Long.MaxValue
      var o = 0
      while (o <= 2 && o < n) {
        val r = resid(o)
        var c = 0L
        var j = 0
        while (j < r.length) { c += math.abs(r(j).toLong); j += 1 }
        if (c < bestCost) { bestCost = c; order = o; res = r }
        o += 1
      }
      bw.writeBits(0x08L | order, 6) // FIXED
    }
    if (wasted == 0) bw.writeBit(0)
    else { bw.writeBit(1); bw.writeUnary(wasted - 1) }
    var w = 0
    while (w < order) {
      bw.writeBits(s(w).toLong & ((1L << eb) - 1), eb)
      w += 1
    }
    if (opts.lpc && order == 2) {
      bw.writeBits(3, 4) // precision-1 = 3 → 4-bit coefficients
      bw.writeBits(0, 5) // shift 0
      bw.writeBits(2L & 0xf, 4) // coef[0] = 2
      bw.writeBits((-1L) & 0xf, 4) // coef[1] = -1
    }
    writeResidual(bw, res, n, order, opts)
  }

  private def writeResidual(bw: BitWriter, res: Array[Int], blockSize: Int,
      order: Int, opts: EncodeOpts): Unit = {
    val pBits = if (opts.rice2) 5 else 4
    val escapeCode = if (opts.rice2) 31 else 15
    val maxParam = escapeCode - 1
    // partition order: honored only when the split divides evenly and the
    // first partition keeps at least one sample
    var po = opts.partitionOrder
    while (po > 0 && (blockSize % (1 << po) != 0 ||
      (blockSize >> po) - order < 1)) po -= 1
    bw.writeBits(if (opts.rice2) 1L else 0L, 2)
    bw.writeBits(po.toLong, 4)
    val parts = 1 << po
    val zz = res.map(v => (v.toLong << 1) ^ (v.toLong >> 63))
    var idx = 0
    var part = 0
    while (part < parts) {
      val m = (blockSize >> po) - (if (part == 0) order else 0)
      if (opts.escape) {
        // raw-bits escape: the widest signed width this partition needs
        var need = 1
        var j = 0
        while (j < m) {
          val v = res(idx + j)
          var b = 64 - java.lang.Long.numberOfLeadingZeros(
            if (v < 0) ~v.toLong else v.toLong) + 1
          if (b < 1) b = 1
          if (b > need) need = b.toInt
          j += 1
        }
        require(need <= 31, s"escape width: $need")
        bw.writeBits(escapeCode.toLong, pBits)
        bw.writeBits(need.toLong, 5)
        j = 0
        while (j < m) {
          bw.writeBits(res(idx + j).toLong & ((1L << need) - 1), need)
          j += 1
        }
      } else {
        // brute-force the cheapest Rice parameter for this partition
        var bestP = 0
        var bestBits = Long.MaxValue
        var p = 0
        while (p <= math.min(maxParam, 30)) {
          var cost = 0L
          var j = 0
          while (j < m && cost < bestBits) {
            cost += (zz(idx + j) >>> p) + 1 + p
            j += 1
          }
          if (cost < bestBits) { bestBits = cost; bestP = p }
          p += 1
        }
        bw.writeBits(bestP.toLong, pBits)
        var j = 0
        while (j < m) {
          bw.writeUnary((zz(idx + j) >>> bestP).toInt)
          if (bestP > 0) bw.writeBits(zz(idx + j) & ((1L << bestP) - 1), bestP)
          j += 1
        }
      }
      idx += m
      part += 1
    }
  }
}
