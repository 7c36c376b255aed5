package graft.multimodal

/** Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder + §F.1.4.4 / §F.2
  * sequential DCT statistical models) — the entropy layer `jpegtran
  * -arithmetic` recompression produces, the last common web-crawl decode
  * gap after baseline + progressive Huffman ([[JpegCodec]]).
  *
  * Scope: sequential DCT (SOF9) and progressive DCT (SOF10, "SOFa" —
  * spectral selection + successive approximation per §G.2), 8-bit, 1 or 3
  * components at 1x1 sampling, DAC conditioning tables (defaults L=0 /
  * U=1 / Kx=5 per §F.1.4.4.1.4), restart intervals (sequential: flush +
  * RSTm + full statistics/prediction reset per §F.1.4), subsampled
  * chroma (4:2:0/4:2:2 — the sampling jpegtran preserves when
  * recompressing web JPEGs), and 12-bit grayscale SOF9 ([[decode12]],
  * surfacing through [[Jpeg12]]'s expressions).
  * The dequantize + IDCT +
  * plane path is [[JpegCodec]]'s own, so the two entropy layers share one
  * reconstruction.
  *
  * The probability state machine is Table D.3 of the public spec (113
  * adaptive states + the fixed ~0.5 state used for AC signs); DC/AC
  * decision trees follow Figures F.20-F.24 (decode) and F.4-F.7 (encode).
  * VALIDATION BOUNDARY: no decoder in this container reads arithmetic
  * JPEGs (the JDK's ImageIO does not), so — like the FileGDB fixture
  * writers — correctness rests on the spec transcription plus the
  * entropy layer's provable losslessness: MultimodalSpec round-trips
  * authored coefficient blocks encoder→decoder coefficient-exact and
  * pins flat-block pixel exactness and adaptive-compression sanity.
  */
object JpegArith {

  // Table D.3: (Qe, nextLPS, nextMPS, switch). Entry 113 is the
  // non-adapting fixed state (Qe ~ 0.5, self-transitions) for AC signs.
  private val QE = Array(
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F,
    0x0036, 0x001A, 0x000D, 0x0006, 0x0003, 0x0001, 0x5A7F, 0x3F25,
    0x2CF2, 0x207C, 0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C,
    0x0406, 0x0303, 0x0240, 0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A,
    0x0068, 0x004E, 0x003B, 0x002C, 0x5AE1, 0x484C, 0x3A0D, 0x2EF1,
    0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177, 0x0E74, 0x0BFB, 0x09F8,
    0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363, 0x02D4, 0x025C,
    0x01F8, 0x01A4, 0x0160, 0x0125, 0x00F6, 0x00CB, 0x00AB, 0x008F,
    0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40,
    0x5832, 0x4D1C, 0x438E, 0x3BDD, 0x34EE, 0x2EAE, 0x299A, 0x2516,
    0x5570, 0x4CA9, 0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8,
    0x4F46, 0x47E5, 0x41CF, 0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639,
    0x415E, 0x5627, 0x50E7, 0x4B85, 0x5597, 0x504F, 0x5A10, 0x5522,
    0x59EB, 0x5A1D)
  private val NLPS = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111,
    110, 112, 112, 113)
  private val NMPS = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107,
    111, 109, 111, 113)
  private val SWITCH = Array(
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0,
    1, 0)

  // a statistics bin: (mps << 7) | stateIndex, all zero-initialized
  private final val FixedBin = 113 // non-adapting ~0.5 state

  /** QM decoder per §F.2.2.1 / Annex D — the c-unshifted, ct-scaled
    * register form; at EOD or a marker the byte stream feeds zeros. */
  private final class Dec(data: Array[Byte], start: Int) {
    private var pos = start
    private var marker = false
    /** Current read position — used by the restart handler to scan
      * forward for the RSTm marker (entropy bytes never contain
      * 0xFF + high-bit thanks to bit stuffing, so the scan is safe). */
    def position: Int = pos
    private var c = 0L
    private var a = 0L
    private var ct = -16 // forces two initial byte loads

    private def nextByte(): Int = {
      if (marker || pos >= data.length) return 0
      var b = data(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        var b2 = if (pos < data.length) data(pos) & 0xff else -1
        while (b2 == 0xff) { pos += 1; b2 = if (pos < data.length) data(pos) & 0xff else -1 }
        if (b2 == 0x00) pos += 1 // stuffed zero: datum is 0xFF
        else { marker = true; b = 0 } // marker (EOI/...): feed zeros
      }
      b
    }

    def decode(bins: Array[Int], idx: Int): Int = {
      while (a < 0x8000L) {
        ct -= 1
        if (ct < 0) {
          c = (c << 8) | nextByte()
          ct += 8
          if (ct < 0) {
            ct += 1
            // two initial bytes loaded: A leaves the loop at 0x10000, the
            // full INITDEC interval (doubled by the shift below)
            if (ct == 0) a = 0x8000L
          }
        }
        a <<= 1
      }
      val sv = bins(idx)
      var st = sv & 0x7f
      var mps = (sv >> 7) & 1
      val qe = QE(st).toLong
      a -= qe
      var d = 0
      val scaled = a << ct
      if (c < scaled) {
        if (a < 0x8000L) {
          if (a < qe) {
            d = 1 - mps
            if (SWITCH(st) == 1) mps = 1 - mps
            st = NLPS(st)
          } else { d = mps; st = NMPS(st) }
          bins(idx) = (mps << 7) | st
        } else d = mps
      } else {
        c -= scaled
        if (a < qe) { d = mps; st = NMPS(st) }
        else {
          d = 1 - mps
          if (SWITCH(st) == 1) mps = 1 - mps
          st = NLPS(st)
        }
        a = qe
        bins(idx) = (mps << 7) | st
      }
      d
    }
  }

  /** QM encoder per §F.1.4.4 / Annex D with byte stuffing (0xFF → 0x00)
    * and carry propagation over stacked 0xFF bytes. */
  private final class Enc(out: java.io.ByteArrayOutputStream) {
    private var c = 0L
    private var a = 0x10000L
    private var ct = 11
    private var buffer = -1 // pending output byte (carry target)
    private var sc = 0L     // stacked 0xFF bytes
    private var zc = 0L     // pending 0x00 bytes

    private def emit(b: Int): Unit = out.write(b & 0xff)
    private def emitZeros(): Unit = { while (zc > 0) { emit(0); zc -= 1 } }

    private def byteOut(): Unit = {
      val temp = (c >> 19).toInt
      if (temp > 0xff) { // carry into the pending byte and stacked 0xFFs
        if (buffer >= 0) {
          emitZeros()
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0x00)
        }
        zc += sc; sc = 0 // carried 0xFF bytes become 0x00
        buffer = temp & 0xff
      } else if (temp == 0xff) {
        sc += 1 // stack: a later carry may still ripple through
      } else {
        if (buffer == 0) zc += 1
        else if (buffer >= 0) { emitZeros(); emit(buffer) }
        if (sc > 0) {
          emitZeros()
          while (sc > 0) { emit(0xff); emit(0x00); sc -= 1 }
        }
        buffer = temp
      }
      c &= 0x7ffffL
      ct += 8
    }

    private def renorm(): Unit = {
      while (a < 0x8000L) {
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
      }
    }

    def encode(bins: Array[Int], idx: Int, bit: Int): Unit = {
      val sv = bins(idx)
      var st = sv & 0x7f
      var mps = (sv >> 7) & 1
      val qe = QE(st).toLong
      a -= qe
      if (bit != mps) {
        if (a >= qe) { c += a; a = qe } // LPS takes the top interval
        if (SWITCH(st) == 1) mps = 1 - mps
        st = NLPS(st)
        bins(idx) = (mps << 7) | st
        renorm()
      } else {
        if (a >= 0x8000L) return // short MPS path: no renorm, no adapt
        if (a < qe) { c += a; a = qe } // conditional exchange
        st = NMPS(st)
        bins(idx) = (mps << 7) | st
        renorm()
      }
    }

    /** §D.1.8 termination: pick the in-interval code point with the most
      * trailing zeros, flush pending bytes, drop trailing zero bytes (the
      * decoder synthesizes zeros at the marker). */
    def finish(): Unit = {
      val temp0 = (a - 1 + c) & 0xffff0000L
      c = if (temp0 < c) temp0 + 0x8000L else temp0
      c <<= ct
      if ((c & 0xf8000000L) != 0) { // final carry
        if (buffer >= 0) {
          emitZeros()
          emit(buffer + 1)
          if (buffer + 1 == 0xff) emit(0x00)
        }
        zc += sc; sc = 0
      } else {
        if (buffer == 0) zc += 1
        else if (buffer >= 0) { emitZeros(); emit(buffer) }
        if (sc > 0) {
          emitZeros()
          while (sc > 0) { emit(0xff); emit(0x00); sc -= 1 }
        }
      }
      if ((c & 0x7fff800L) != 0) {
        emitZeros()
        val b1 = ((c >> 19) & 0xff).toInt
        emit(b1)
        if (b1 == 0xff) emit(0x00)
        if ((c & 0x7f800L) != 0) {
          val b2 = ((c >> 11) & 0xff).toInt
          emit(b2)
          if (b2 == 0xff) emit(0x00)
        }
      }
    }
  }

  // ---------------------------------------------------- statistical models

  /** DC diff decode per Figure F.20-F.24 (context layout: 5 classification
    * contexts x 4 bins, X bins at 20, M bin at each X + 14). Returns the
    * diff and updates the per-component context classification. */
  private def decodeDcDiff(dec: Dec, stats: Array[Int], ctx: Array[Int],
      ci: Int, lHalf: Int, uHalf: Int): Int = {
    val base = ctx(ci)
    if (dec.decode(stats, base) == 0) { ctx(ci) = 0; return 0 }
    val sign = dec.decode(stats, base + 1)
    var st = base + 2 + sign
    var m = dec.decode(stats, st)
    if (m != 0) {
      st = 20
      while (dec.decode(stats, st) != 0) {
        m <<= 1
        if (m == 0x8000) throw new IllegalStateException("dc magnitude overflow")
        st += 1
      }
    }
    ctx(ci) =
      if (m < lHalf) 0
      else if (m > uHalf) 12 + sign * 4
      else 4 + sign * 4
    var v = m
    st += 14
    while ({ m >>= 1; m != 0 }) if (dec.decode(stats, st) != 0) v |= m
    v += 1
    if (sign == 1) -v else v
  }

  private def encodeDcDiff(enc: Enc, stats: Array[Int], ctx: Array[Int],
      ci: Int, lHalf: Int, uHalf: Int, diff: Int): Unit = {
    val base = ctx(ci)
    if (diff == 0) { enc.encode(stats, base, 0); ctx(ci) = 0; return }
    enc.encode(stats, base, 1)
    val sign = if (diff < 0) 1 else 0
    val v = math.abs(diff)
    enc.encode(stats, base + 1, sign)
    var st = base + 2 + sign
    val vm = v - 1
    var m = 0
    if (vm == 0) enc.encode(stats, st, 0)
    else {
      enc.encode(stats, st, 1)
      m = 1
      st = 20
      while ((m << 1) <= vm) {
        enc.encode(stats, st, 1)
        m <<= 1
        st += 1
      }
      enc.encode(stats, st, 0)
    }
    ctx(ci) =
      if (m < lHalf) 0
      else if (m > uHalf) 12 + sign * 4
      else 4 + sign * 4
    st += 14
    var mm = m
    while ({ mm >>= 1; mm != 0 }) enc.encode(stats, st, if ((vm & mm) != 0) 1 else 0)
  }

  /** AC band decode per Figure F.20-F.24 into `coef` (zigzag order,
    * positions 1..63). Per-k bins at 3(k-1): EOB, zero/nonzero, X1; shared
    * magnitude sets at 189 (k <= Kx) and 217; AC signs use the fixed bin. */
  private def decodeAcBand(dec: Dec, stats: Array[Int], fixed: Array[Int],
      kx: Int, coef: Array[Int]): Unit = {
    var k = 1
    var done = false
    while (!done && k <= 63) {
      var st = 3 * (k - 1)
      if (dec.decode(stats, st) != 0) done = true // EOB
      else {
        while (dec.decode(stats, st + 1) == 0) {
          st += 3; k += 1
          if (k > 63) throw new IllegalStateException("ac run overflow")
        }
        val sign = dec.decode(fixed, 0)
        st += 2
        var m = dec.decode(stats, st)
        if (m != 0 && dec.decode(stats, st) != 0) {
          m <<= 1
          st = if (k <= kx) 189 else 217
          while (dec.decode(stats, st) != 0) {
            m <<= 1
            if (m == 0x8000) throw new IllegalStateException("ac magnitude overflow")
            st += 1
          }
        }
        var v = m
        st += 14
        while ({ m >>= 1; m != 0 }) if (dec.decode(stats, st) != 0) v |= m
        v += 1
        coef(k) = if (sign == 1) -v else v
        k += 1
      }
    }
  }

  private def encodeAcBand(enc: Enc, stats: Array[Int], fixed: Array[Int],
      kx: Int, coef: Array[Int]): Unit = {
    var ke = 63
    while (ke > 0 && coef(ke) == 0) ke -= 1
    var k = 1
    while (k <= ke) {
      var st = 3 * (k - 1)
      enc.encode(stats, st, 0) // not EOB yet
      while (coef(k) == 0) { enc.encode(stats, st + 1, 0); st += 3; k += 1 }
      enc.encode(stats, st + 1, 1)
      val v0 = coef(k)
      val sign = if (v0 < 0) 1 else 0
      val v = math.abs(v0)
      enc.encode(fixed, 0, sign)
      st += 2
      val vm = v - 1
      var m = 0
      if (vm == 0) enc.encode(stats, st, 0)
      else {
        enc.encode(stats, st, 1)
        m = 1
        if (vm == 1) enc.encode(stats, st, 0)
        else {
          enc.encode(stats, st, 1)
          m = 2
          st = if (k <= kx) 189 else 217
          while ((m << 1) <= vm) { enc.encode(stats, st, 1); m <<= 1; st += 1 }
          enc.encode(stats, st, 0)
        }
      }
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) enc.encode(stats, st, if ((vm & mm) != 0) 1 else 0)
      k += 1
    }
    if (ke < 63) enc.encode(stats, 3 * (k - 1), 1) // EOB
  }

  // ------------------------------------------------------------- decoding

  /** SOF9 decode with [[JpegCodec]]'s return shape; null outside scope. */
  private[multimodal] def decodePlanes(p: Array[Byte], wantChroma: Boolean)
      : (JpegCodec.Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    try {
      val quant = new Array[Array[Int]](4)
      val dcL = Array.fill(4)(0)
      val dcU = Array.fill(4)(1)
      val acK = Array.fill(4)(5)
      var width = 0; var height = 0
      var comps: Array[(Int, Int, Int, Int)] = null
      var compSel: Array[(Int, Int)] = null
      var restartInterval = 0
      var pos = 2
      var scanStart = -1
      while (scanStart < 0 && pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
        else {
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          marker match {
            case 0xc9 =>
              if ((p(seg) & 0xff) != 8) return null // 12-bit: unsupported
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              val n = p(seg + 5) & 0xff
              if (n != 1 && n != 3) return null
              comps = Array.tabulate(n) { i =>
                val o = seg + 6 + i * 3
                ((p(o) & 0xff), (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f,
                  p(o + 2) & 0xff)
              }
              // any sampling factors (4:2:0/4:2:2/4:4:4 — jpegtran keeps
              // the source's sampling when recompressing to arithmetic)
              if (comps.exists(c => c._2 < 1 || c._2 > 4 || c._3 < 1 || c._3 > 4))
                return null
            case 0xdb =>
              var o = seg
              while (o < pos + 2 + len) {
                if (((p(o) & 0xff) >> 4) != 0) return null
                quant(p(o) & 0x0f) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
                o += 65
              }
            case 0xcc => // DAC: arithmetic conditioning
              var o = seg
              while (o + 1 < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val v = p(o + 1) & 0xff
                if (cls == 0) {
                  dcL(id) = v & 0x0f
                  dcU(id) = v >> 4
                  if (dcU(id) < dcL(id) || dcU(id) > 15) return null
                } else {
                  acK(id) = v
                  if (v < 1 || v > 63) return null
                }
                o += 2
              }
            case 0xdd =>
              restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
            case 0xda =>
              val ns = p(seg) & 0xff
              if (comps == null || ns != comps.length) return null
              compSel = Array.tabulate(ns) { i =>
                val o = seg + 1 + i * 2
                ((p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f)
              }
              scanStart = pos + 2 + len
            case _ => ()
          }
          pos += 2 + len
        }
      }
      if (scanStart < 0 || width <= 0 || height <= 0) return null
      if (width.toLong * height > 64L * 1024 * 1024) return null

      val maxH = comps.map(_._2).max
      val maxV = comps.map(_._3).max
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      val planeW = comps.map(c => mcusX * 8 * c._2)
      val planeH = comps.map(c => mcusY * 8 * c._3)
      val planes = Array.tabulate(comps.length) { ci =>
        if (ci == 0 || wantChroma) new Array[Byte](planeW(ci) * planeH(ci))
        else null
      }
      var dec = new Dec(p, scanStart)
      val dcStats = Array.fill(4)(new Array[Int](64))
      val acStats = Array.fill(4)(new Array[Int](256))
      val fixed = Array(FixedBin)
      val dcCtx = new Array[Int](comps.length)
      val dcPred = new Array[Int](comps.length)
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var mcu = 0
      var restartsToGo = restartInterval
      var rstIdx = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        // restart boundary (T.81 F.1.4/F.2.3): the encoder flushed and
        // emitted RSTm; scan to it, verify the modulo-8 index, then
        // reinitialize the decoder, statistics, and DC predictions
        if (restartInterval > 0 && restartsToGo == 0) {
          // the decoder reads ahead; if it already consumed the marker's
          // 0xFF (marker-detected state), position sits one past it —
          // back up two bytes so the scan can't skip to the NEXT marker
          var np = math.max(scanStart, dec.position - 2)
          while (np + 1 < p.length &&
            !((p(np) & 0xff) == 0xff && (p(np + 1) & 0xf8) == 0xd0)) np += 1
          if (np + 1 >= p.length || (p(np + 1) & 0x07) != rstIdx)
            throw new IllegalStateException("restart marker mismatch")
          dec = new Dec(p, np + 2)
          dcStats.foreach(java.util.Arrays.fill(_, 0))
          acStats.foreach(java.util.Arrays.fill(_, 0))
          java.util.Arrays.fill(dcCtx, 0)
          java.util.Arrays.fill(dcPred, 0)
          rstIdx = (rstIdx + 1) & 7
          restartsToGo = restartInterval
        }
        if (restartInterval > 0) restartsToGo -= 1
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var ci = 0
        while (ci < comps.length) {
          val (_, hS, vS, qsel) = comps(ci)
          val (dcSel, acSel) = (compSel(ci)._1, compSel(ci)._2)
          val q = quant(qsel)
          var by = 0
          while (by < vS) {
            var bx = 0
            while (bx < hS) {
              java.util.Arrays.fill(coef, 0)
              dcPred(ci) += decodeDcDiff(dec, dcStats(dcSel), dcCtx, ci,
                (1 << dcL(dcSel)) >> 1, (1 << dcU(dcSel)) >> 1)
              coef(0) = dcPred(ci)
              decodeAcBand(dec, acStats(acSel), fixed, acK(acSel), coef)
              if (ci == 0 || wantChroma) {
                java.util.Arrays.fill(block, 0)
                var k = 0
                while (k < 64) {
                  block(JpegCodec.zigzag(k)) = coef(k) * q(k)
                  k += 1
                }
                JpegCodec.writeBlock(block, tmp, planes(ci), planeW(ci),
                  (mx * hS + bx) * 8, (my * vS + by) * 8)
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      JpegCodec.finishPlanes(width, height, comps, maxH, maxV, planes, planeW)
    } catch { case _: Exception => null }
  }

  // ------------------------------------------------------------- encoding

  /** Author a grayscale SOF9 stream from QUANTIZED zigzag coefficient
    * blocks (row-major 8x8 block order, each 64 ints) — the fixture/sink
    * twin of [[decodePlanes]]. Entropy coding is lossless, so decode
    * recovers these exact coefficients. */
  def writeGray(width: Int, height: Int, qtable: Array[Int],
      coefBlocks: Seq[Array[Int]], restartInterval: Int = 0): Array[Byte] = {
    require(qtable.length == 64, "quant table is 64 entries")
    require(restartInterval >= 0, s"restartInterval: $restartInterval")
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(coefBlocks.length == bx * by,
      s"need ${bx * by} coefficient blocks, got ${coefBlocks.length}")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8) // SOI
    u16(0xffdb); u16(2 + 65); u8(0) // DQT, table 0, 8-bit
    qtable.foreach(u8)
    u16(0xffc9); u16(2 + 6 + 3); u8(8) // SOF9
    u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1, qtable 0
    if (restartInterval > 0) { u16(0xffdd); u16(4); u16(restartInterval) }
    u16(0xffda); u16(2 + 1 + 2 + 3); u8(1) // SOS
    u8(1); u8(0x00) // component 1, DC cond 0 / AC cond 0
    u8(0); u8(63); u8(0) // Ss, Se, Ah/Al (sequential full band)
    var enc = new Enc(out)
    var dcStats = new Array[Int](64)
    var acStats = new Array[Int](256)
    val fixed = Array(FixedBin)
    val dcCtx = new Array[Int](1)
    var pred = 0
    var sinceRestart = 0
    var rstIdx = 0
    coefBlocks.foreach { coef =>
      require(coef.length == 64, "each block is 64 zigzag coefficients")
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        // flush, emit RSTm, reset coder + statistics + DC prediction
        enc.finish()
        u16(0xffd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        enc = new Enc(out)
        dcStats = new Array[Int](64)
        acStats = new Array[Int](256)
        dcCtx(0) = 0
        pred = 0
        sinceRestart = 0
      }
      encodeDcDiff(enc, dcStats, dcCtx, 0, (1 << 0) >> 1, (1 << 1) >> 1,
        coef(0) - pred)
      pred = coef(0)
      encodeAcBand(enc, acStats, fixed, 5, coef)
      sinceRestart += 1
    }
    enc.finish()
    u16(0xffd9) // EOI
    out.toByteArray
  }

  /** Author a multi-component SOF9 stream with per-component sampling
    * factors (the 4:2:0 web shape) from quantized zigzag blocks —
    * `coefBlocks(ci)` holds component ci's blocks in MCU-walk order
    * (per MCU: v·h blocks row-major). Component 0 uses DC/AC conditioning
    * tables 0, the rest table 1 (the conventional luma/chroma split). */
  def writeSampled(width: Int, height: Int, qtable: Array[Int],
      sampling: Seq[(Int, Int)], coefBlocks: Seq[Seq[Array[Int]]],
      restartInterval: Int = 0): Array[Byte] = {
    require(qtable.length == 64, "quant table is 64 entries")
    require(sampling.nonEmpty && sampling.length == coefBlocks.length)
    val maxH = sampling.map(_._1).max
    val maxV = sampling.map(_._2).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    sampling.zip(coefBlocks).foreach { case ((h, v), blocks) =>
      require(blocks.length == mcusX * mcusY * h * v,
        s"component needs ${mcusX * mcusY * h * v} blocks, got ${blocks.length}")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 65); u8(0)
    qtable.foreach(u8)
    u16(0xffc9); u16(2 + 6 + 3 * sampling.length); u8(8)
    u16(height); u16(width); u8(sampling.length)
    sampling.zipWithIndex.foreach { case ((h, v), i) =>
      u8(i + 1); u8((h << 4) | v); u8(0)
    }
    if (restartInterval > 0) { u16(0xffdd); u16(4); u16(restartInterval) }
    u16(0xffda); u16(2 + 1 + 2 * sampling.length + 3); u8(sampling.length)
    sampling.indices.foreach { i =>
      u8(i + 1); u8(if (i == 0) 0x00 else 0x11)
    }
    u8(0); u8(63); u8(0)
    var enc = new Enc(out)
    var dcStats = Array.fill(2)(new Array[Int](64))
    var acStats = Array.fill(2)(new Array[Int](256))
    val fixed = Array(FixedBin)
    val dcCtx = new Array[Int](sampling.length)
    val pred = new Array[Int](sampling.length)
    val cursor = new Array[Int](sampling.length)
    var sinceRestart = 0
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        enc.finish()
        u16(0xffd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        enc = new Enc(out)
        dcStats = Array.fill(2)(new Array[Int](64))
        acStats = Array.fill(2)(new Array[Int](256))
        java.util.Arrays.fill(dcCtx, 0)
        java.util.Arrays.fill(pred, 0)
        sinceRestart = 0
      }
      var ci = 0
      while (ci < sampling.length) {
        val (h, v) = sampling(ci)
        val tbl = if (ci == 0) 0 else 1
        var b = 0
        while (b < h * v) {
          val coef = coefBlocks(ci)(cursor(ci))
          require(coef.length == 64, "each block is 64 zigzag coefficients")
          cursor(ci) += 1
          encodeDcDiff(enc, dcStats(tbl), dcCtx, ci, (1 << 0) >> 1,
            (1 << 1) >> 1, coef(0) - pred(ci))
          pred(ci) = coef(0)
          encodeAcBand(enc, acStats(tbl), fixed, 5, coef)
          b += 1
        }
        ci += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    enc.finish()
    u16(0xffd9)
    out.toByteArray
  }

  // ------------------------------------------------ 12-bit SOF9 (gray)

  /** 12-bit sequential arithmetic (SOF9 with precision 12), grayscale —
    * the arithmetic twin of [[Jpeg12]]'s SOF1 path and the LAST
    * T.81 precision/entropy combination. Same statistical models as the
    * 8-bit path (the magnitude trees already span 15 bins), 16-bit DQT
    * entries accepted, restart intervals supported. Returns [[Jpeg12]]'s
    * Frame12 surface so the `jpeg12_*` expressions accept both entropy
    * layers. */
  private[multimodal] def decode12(p: Array[Byte]): Jpeg12.Frame12 = {
    try {
      val quant = new Array[Array[Int]](4)
      val dcL = Array.fill(4)(0)
      val dcU = Array.fill(4)(1)
      val acK = Array.fill(4)(5)
      var width = 0; var height = 0
      var restartInterval = 0
      var dcSel = 0; var acSel = 0
      var qsel = 0
      var pos = 2
      var scanStart = -1
      while (scanStart < 0 && pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
        else {
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          marker match {
            case 0xc9 =>
              if ((p(seg) & 0xff) != 12) return null
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              if ((p(seg + 5) & 0xff) != 1) return null // grayscale scope
              if ((p(seg + 7) & 0xff) != 0x11) return null // 1x1
              qsel = p(seg + 8) & 0x0f
            case 0xdb =>
              var o = seg
              while (o < pos + 2 + len) {
                val prec = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                if (prec == 0) {
                  quant(id) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
                  o += 65
                } else {
                  quant(id) = Array.tabulate(64)(k =>
                    ((p(o + 1 + 2 * k) & 0xff) << 8) | (p(o + 2 + 2 * k) & 0xff))
                  o += 129
                }
              }
            case 0xcc =>
              var o = seg
              while (o + 1 < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val v = p(o + 1) & 0xff
                if (cls == 0) { dcL(id) = v & 0x0f; dcU(id) = v >> 4 }
                else acK(id) = v
                o += 2
              }
            case 0xdd =>
              restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
            case 0xda =>
              if ((p(seg) & 0xff) != 1) return null
              dcSel = (p(seg + 2) & 0xff) >> 4
              acSel = p(seg + 2) & 0x0f
              scanStart = pos + 2 + len
            case _ => ()
          }
          pos += 2 + len
        }
      }
      if (scanStart < 0 || width <= 0 || height <= 0) return null
      if (width.toLong * height > 64L * 1024 * 1024) return null
      val q = quant(qsel)
      if (q == null) return null
      val mcusX = (width + 7) / 8
      val mcusY = (height + 7) / 8
      val planeW = mcusX * 8
      val plane = new Array[Int](planeW * mcusY * 8)
      var dec = new Dec(p, scanStart)
      var dcStats = new Array[Int](64)
      var acStats = new Array[Int](256)
      val fixed = Array(FixedBin)
      val dcCtx = new Array[Int](1)
      var pred = 0
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var restartsToGo = restartInterval
      var rstIdx = 0
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && restartsToGo == 0) {
          var np = math.max(scanStart, dec.position - 2)
          while (np + 1 < p.length &&
            !((p(np) & 0xff) == 0xff && (p(np + 1) & 0xf8) == 0xd0)) np += 1
          if (np + 1 >= p.length || (p(np + 1) & 0x07) != rstIdx)
            throw new IllegalStateException("restart marker mismatch")
          dec = new Dec(p, np + 2)
          dcStats = new Array[Int](64)
          acStats = new Array[Int](256)
          dcCtx(0) = 0
          pred = 0
          rstIdx = (rstIdx + 1) & 7
          restartsToGo = restartInterval
        }
        if (restartInterval > 0) restartsToGo -= 1
        java.util.Arrays.fill(coef, 0)
        pred += decodeDcDiff(dec, dcStats, dcCtx, 0,
          (1 << dcL(dcSel)) >> 1, (1 << dcU(dcSel)) >> 1)
        coef(0) = pred
        decodeAcBand(dec, acStats, fixed, acK(acSel), coef)
        java.util.Arrays.fill(block, 0)
        var k = 0
        while (k < 64) {
          block(JpegCodec.zigzag(k)) = coef(k) * q(k)
          k += 1
        }
        JpegCodec.idct8x8(block, tmp)
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val v = math.round(tmp(yy * 8 + xx) + 2048).toInt
            plane((my * 8 + yy) * planeW + mx * 8 + xx) =
              if (v < 0) 0 else if (v > 4095) 4095 else v
            xx += 1
          }
          yy += 1
        }
        mcu += 1
      }
      val outP = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(plane, y * planeW, outP, y * width, width)
        y += 1
      }
      Jpeg12.Frame12(width, height, 12, outP)
    } catch { case _: Exception => null }
  }

  /** Author a 12-bit grayscale SOF9 stream (16-bit DQT, precision 12) from
    * quantized zigzag coefficient blocks — [[decode12]]'s fixture twin. */
  def writeGray12(width: Int, height: Int, qtable: Array[Int],
      coefBlocks: Seq[Array[Int]], restartInterval: Int = 0): Array[Byte] = {
    require(qtable.length == 64, "quant table is 64 entries")
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(coefBlocks.length == bx * by,
      s"need ${bx * by} coefficient blocks, got ${coefBlocks.length}")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 1 + 128); u8(0x10) // DQT prec 1 (16-bit), table 0
    qtable.foreach(u16)
    u16(0xffc9); u16(2 + 6 + 3); u8(12) // SOF9, precision 12
    u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    if (restartInterval > 0) { u16(0xffdd); u16(4); u16(restartInterval) }
    u16(0xffda); u16(2 + 1 + 2 + 3); u8(1)
    u8(1); u8(0x00)
    u8(0); u8(63); u8(0)
    var enc = new Enc(out)
    var dcStats = new Array[Int](64)
    var acStats = new Array[Int](256)
    val fixed = Array(FixedBin)
    val dcCtx = new Array[Int](1)
    var pred = 0
    var sinceRestart = 0
    var rstIdx = 0
    coefBlocks.foreach { coef =>
      require(coef.length == 64, "each block is 64 zigzag coefficients")
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        enc.finish()
        u16(0xffd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        enc = new Enc(out)
        dcStats = new Array[Int](64)
        acStats = new Array[Int](256)
        dcCtx(0) = 0
        pred = 0
        sinceRestart = 0
      }
      encodeDcDiff(enc, dcStats, dcCtx, 0, (1 << 0) >> 1, (1 << 1) >> 1,
        coef(0) - pred)
      pred = coef(0)
      encodeAcBand(enc, acStats, fixed, 5, coef)
      sinceRestart += 1
    }
    enc.finish()
    u16(0xffd9)
    out.toByteArray
  }

  // ----------------------------------------- progressive (SOF10 / "SOFa")

  /** AC first scan (T.81 §G.2 / Figure G.x): the sequential band decode
    * restricted to [ss, se] with decoded values scaled up by the point
    * transform `al`. Statistics layout is decodeAcBand's. */
  private def decodeAcFirst(dec: Dec, stats: Array[Int], fixed: Array[Int],
      kx: Int, coef: Array[Int], ss: Int, se: Int, al: Int): Unit = {
    var k = ss
    var done = false
    while (!done && k <= se) {
      var st = 3 * (k - 1)
      if (dec.decode(stats, st) != 0) done = true // EOB
      else {
        while (dec.decode(stats, st + 1) == 0) {
          st += 3; k += 1
          if (k > se) throw new IllegalStateException("ac run overflow")
        }
        val sign = dec.decode(fixed, 0)
        st += 2
        var m = dec.decode(stats, st)
        if (m != 0 && dec.decode(stats, st) != 0) {
          m <<= 1
          st = if (k <= kx) 189 else 217
          while (dec.decode(stats, st) != 0) {
            m <<= 1
            if (m == 0x8000) throw new IllegalStateException("ac magnitude overflow")
            st += 1
          }
        }
        var v = m
        st += 14
        while ({ m >>= 1; m != 0 }) if (dec.decode(stats, st) != 0) v |= m
        v += 1
        coef(k) = (if (sign == 1) -v else v) << al
        k += 1
      }
    }
  }

  /** AC successive-approximation refinement (§G.2): correction bits for
    * previously-nonzero coefficients at st+2, newly-nonzero decisions at
    * st+1 with the fixed-bin sign, EOB decision only past the previous
    * stage's end-of-block index. */
  private def decodeAcRefine(dec: Dec, stats: Array[Int], fixed: Array[Int],
      coef: Array[Int], ss: Int, se: Int, al: Int): Unit = {
    val p1 = 1 << al
    val m1 = -1 << al
    var kex = se
    while (kex > 0 && coef(kex) == 0) kex -= 1
    var k = ss
    var eob = false
    while (!eob && k <= se) {
      var st = 3 * (k - 1)
      if (k > kex && dec.decode(stats, st) != 0) eob = true
      else {
        var inner = true
        while (inner) {
          if (coef(k) != 0) {
            if (dec.decode(stats, st + 2) != 0)
              coef(k) += (if (coef(k) < 0) m1 else p1)
            inner = false
          } else if (dec.decode(stats, st + 1) != 0) {
            coef(k) = if (dec.decode(fixed, 0) != 0) m1 else p1
            inner = false
          } else {
            st += 3; k += 1
            if (k > se) throw new IllegalStateException("ac refine overflow")
          }
        }
        k += 1
      }
    }
  }

  /** SOF10 (progressive DCT, arithmetic entropy coding) decode with
    * [[JpegCodec]]'s return shape. Coefficients accumulate across scans
    * (DC first/refine, AC first/refine per §G.2); statistics reset at
    * every scan start; the next scan's marker is found as the first
    * 0xFF byte followed by a high-bit byte (arithmetic bit stuffing
    * keeps entropy bytes after 0xFF below 0x80). Same scope bounds as
    * [[decodePlanes]]: 8-bit, 1x1 sampling, 1 or 3 components, no
    * restart intervals. */
  private[multimodal] def decodeProgressivePlanes(p: Array[Byte],
      wantChroma: Boolean)
      : (JpegCodec.Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    try {
      val quant = new Array[Array[Int]](4)
      val dcL = Array.fill(4)(0)
      val dcU = Array.fill(4)(1)
      val acK = Array.fill(4)(5)
      var width = 0; var height = 0
      var comps: Array[(Int, Int, Int, Int)] = null
      var coefs: Array[Array[Array[Int]]] = null // comp -> block -> 64 zigzag
      var mcusX = 0; var mcusY = 0
      val dcPred = new Array[Int](4)
      var pos = 2
      var eoi = false
      while (!eoi && pos + 2 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8) pos += 2
        else if (marker == 0xd9) eoi = true
        else {
          if (pos + 4 > p.length) return null
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          marker match {
            case 0xca =>
              if ((p(seg) & 0xff) != 8) return null // 12-bit: unsupported
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              if (width <= 0 || height <= 0 ||
                width.toLong * height > 64L * 1024 * 1024) return null
              val n = p(seg + 5) & 0xff
              if (n != 1 && n != 3) return null
              comps = Array.tabulate(n) { i =>
                val o = seg + 6 + i * 3
                ((p(o) & 0xff), (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f,
                  p(o + 2) & 0xff)
              }
              if (comps.exists(c => c._2 != 1 || c._3 != 1)) return null
              mcusX = (width + 7) / 8
              mcusY = (height + 7) / 8
              coefs = Array.fill(n, mcusX * mcusY)(new Array[Int](64))
            case 0xdb =>
              var o = seg
              while (o < pos + 2 + len) {
                if (((p(o) & 0xff) >> 4) != 0) return null
                quant(p(o) & 0x0f) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
                o += 65
              }
            case 0xcc =>
              var o = seg
              while (o + 1 < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val v = p(o + 1) & 0xff
                if (cls == 0) {
                  dcL(id) = v & 0x0f
                  dcU(id) = v >> 4
                  if (dcU(id) < dcL(id) || dcU(id) > 15) return null
                } else {
                  acK(id) = v
                  if (v < 1 || v > 63) return null
                }
                o += 2
              }
            case 0xdd =>
              if ((((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)) != 0)
                return null // restarts: out of scope, loud
            case 0xda =>
              if (comps == null) return null
              val ns = p(seg) & 0xff
              val sel = Array.tabulate(ns) { i =>
                val o = seg + 1 + i * 2
                (p(o) & 0xff, (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f)
              }
              val o2 = seg + 1 + ns * 2
              val ss = p(o2) & 0xff
              val se = p(o2 + 1) & 0xff
              val ah = (p(o2 + 2) & 0xff) >> 4
              val al = p(o2 + 2) & 0x0f
              if (ss > 63 || se > 63 || se < ss) return null
              if (ss > 0 && ns != 1) return null // AC scans: one component
              // map scan component ids to frame component indices
              val cidx = sel.map { case (id, _, _) =>
                val ix = comps.indexWhere(_._1 == id)
                if (ix < 0) return null
                ix
              }
              val scanStart = pos + 2 + len
              val dec = new Dec(p, scanStart)
              val dcStats = Array.fill(4)(new Array[Int](64))
              val acStats = Array.fill(4)(new Array[Int](256))
              val fixed = Array(FixedBin)
              if (ss == 0) {
                if (se != 0) return null // DC scans carry only coefficient 0
                if (ah == 0) {
                  val dcCtx = new Array[Int](ns)
                  java.util.Arrays.fill(dcPred, 0)
                  var mcu = 0
                  val nMcus = mcusX * mcusY
                  while (mcu < nMcus) {
                    var i = 0
                    while (i < ns) {
                      val dcSel = sel(i)._2
                      dcPred(i) += decodeDcDiff(dec, dcStats(dcSel), dcCtx, i,
                        (1 << dcL(dcSel)) >> 1, (1 << dcU(dcSel)) >> 1)
                      coefs(cidx(i))(mcu)(0) = dcPred(i) << al
                      i += 1
                    }
                    mcu += 1
                  }
                } else {
                  var mcu = 0
                  val nMcus = mcusX * mcusY
                  while (mcu < nMcus) {
                    var i = 0
                    while (i < ns) {
                      if (dec.decode(fixed, 0) != 0)
                        coefs(cidx(i))(mcu)(0) |= (1 << al)
                      i += 1
                    }
                    mcu += 1
                  }
                }
              } else {
                val acSel = sel(0)._3
                val blocks = coefs(cidx(0))
                var b = 0
                while (b < blocks.length) {
                  if (ah == 0)
                    decodeAcFirst(dec, acStats(acSel), fixed, acK(acSel),
                      blocks(b), ss, se, al)
                  else
                    decodeAcRefine(dec, acStats(acSel), fixed,
                      blocks(b), ss, se, al)
                  b += 1
                }
              }
              // next marker: first 0xFF followed by a high-bit byte
              var np = scanStart
              while (np + 1 < p.length &&
                !((p(np) & 0xff) == 0xff && (p(np + 1) & 0x80) != 0)) np += 1
              pos = np
            case _ => ()
          }
          if (marker != 0xda) pos += 2 + len
        }
      }
      if (coefs == null || width <= 0) return null
      // reconstruct: dequantize + IDCT through JpegCodec's shared path
      val planes = Array.tabulate(comps.length) { ci =>
        if (ci == 0 || wantChroma) new Array[Byte](mcusX * 8 * mcusY * 8)
        else null
      }
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        if (ci == 0 || wantChroma) {
          val q = quant(comps(ci)._4)
          if (q == null) return null
          var b = 0
          while (b < coefs(ci).length) {
            val coef = coefs(ci)(b)
            java.util.Arrays.fill(block, 0)
            var k = 0
            while (k < 64) {
              block(JpegCodec.zigzag(k)) = coef(k) * q(k)
              k += 1
            }
            JpegCodec.writeBlock(block, tmp, planes(ci), mcusX * 8,
              (b % mcusX) * 8, (b / mcusX) * 8)
            b += 1
          }
        }
        ci += 1
      }
      JpegCodec.finishPlanes(width, height, comps, 1, 1, planes,
        Array.fill(comps.length)(mcusX * 8))
    } catch { case _: Exception => null }
  }

  /** Author a grayscale SOF10 progressive-arithmetic stream from QUANTIZED
    * zigzag coefficient blocks and a scan script `(ss, se, ah, al)` — the
    * fixture/sink twin of [[decodeProgressivePlanes]]. A complete script
    * (every coefficient reaching al = 0) makes the entropy layer fully
    * lossless: decode recovers the exact coefficients. */
  def writeGrayProgressive(width: Int, height: Int, qtable: Array[Int],
      coefBlocks: Seq[Array[Int]],
      scans: Seq[(Int, Int, Int, Int)]): Array[Byte] = {
    require(qtable.length == 64, "quant table is 64 entries")
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(coefBlocks.length == bx * by,
      s"need ${bx * by} coefficient blocks, got ${coefBlocks.length}")
    require(scans.nonEmpty, "at least one scan")
    scans.foreach { case (ss, se, ah, al) =>
      require(ss >= 0 && se <= 63 && ss <= se, s"band [$ss,$se]")
      require((ss == 0) == (se == 0), "DC scans are exactly [0,0]")
      require(ah == 0 || ah == al + 1, s"successive approximation: ah=$ah al=$al")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 65); u8(0)
    qtable.foreach(u8)
    u16(0xffca); u16(2 + 6 + 3); u8(8) // SOF10
    u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    val fixed = Array(FixedBin)
    scans.foreach { case (ss, se, ah, al) =>
      u16(0xffda); u16(2 + 1 + 2 + 3); u8(1)
      u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
      val enc = new Enc(out)
      val dcStats = new Array[Int](64)
      val acStats = new Array[Int](256)
      if (ss == 0) {
        if (ah == 0) {
          val dcCtx = new Array[Int](1)
          var pred = 0
          coefBlocks.foreach { coef =>
            val scaled = coef(0) >> al
            encodeDcDiff(enc, dcStats, dcCtx, 0, (1 << 0) >> 1, (1 << 1) >> 1,
              scaled - pred)
            pred = scaled
          }
        } else {
          coefBlocks.foreach { coef =>
            enc.encode(fixed, 0, (coef(0) >> al) & 1)
          }
        }
      } else {
        coefBlocks.foreach { coef =>
          if (ah == 0) encodeAcFirst(enc, acStats, fixed, 5, coef, ss, se, al)
          else encodeAcRefine(enc, acStats, fixed, coef, ss, se, ah, al)
        }
      }
      enc.finish()
    }
    u16(0xffd9)
    out.toByteArray
  }

  private def encodeAcFirst(enc: Enc, stats: Array[Int], fixed: Array[Int],
      kx: Int, coef: Array[Int], ss: Int, se: Int, al: Int): Unit = {
    def mag(k: Int): Int = math.abs(coef(k)) >> al
    var ke = se
    while (ke >= ss && mag(ke) == 0) ke -= 1
    var k = ss
    while (k <= ke) {
      var st = 3 * (k - 1)
      enc.encode(stats, st, 0) // not EOB yet
      while (mag(k) == 0) { enc.encode(stats, st + 1, 0); st += 3; k += 1 }
      enc.encode(stats, st + 1, 1)
      val sign = if (coef(k) < 0) 1 else 0
      val v = mag(k)
      enc.encode(fixed, 0, sign)
      st += 2
      val vm = v - 1
      var m = 0
      if (vm == 0) enc.encode(stats, st, 0)
      else {
        enc.encode(stats, st, 1)
        m = 1
        if (vm == 1) enc.encode(stats, st, 0)
        else {
          enc.encode(stats, st, 1)
          m = 2
          st = if (k <= kx) 189 else 217
          while ((m << 1) <= vm) { enc.encode(stats, st, 1); m <<= 1; st += 1 }
          enc.encode(stats, st, 0)
        }
      }
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) enc.encode(stats, st, if ((vm & mm) != 0) 1 else 0)
      k += 1
    }
    if (ke < se) enc.encode(stats, 3 * (math.max(k, ss) - 1), 1) // EOB
  }

  private def encodeAcRefine(enc: Enc, stats: Array[Int], fixed: Array[Int],
      coef: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
    def magAl(k: Int): Int = math.abs(coef(k)) >> al
    def magAh(k: Int): Int = math.abs(coef(k)) >> ah
    var ke = se
    while (ke >= ss && magAl(ke) == 0) ke -= 1
    var kex = se
    while (kex >= ss && magAh(kex) == 0) kex -= 1
    if (kex < ss) kex = 0
    var k = ss
    var done = false
    while (!done && k <= se) {
      var st = 3 * (k - 1)
      if (k > kex) {
        if (k > ke) { enc.encode(stats, st, 1); done = true } // EOB
        else enc.encode(stats, st, 0)
      }
      if (!done) {
        var inner = true
        while (inner) {
          if (magAh(k) != 0) { // previously nonzero: correction bit
            enc.encode(stats, st + 2, magAl(k) & 1)
            inner = false
          } else if (magAl(k) != 0) { // newly nonzero this stage
            enc.encode(stats, st + 1, 1)
            enc.encode(fixed, 0, if (coef(k) < 0) 1 else 0)
            inner = false
          } else {
            enc.encode(stats, st + 1, 0)
            st += 3; k += 1
          }
        }
        k += 1
      }
    }
  }
}
