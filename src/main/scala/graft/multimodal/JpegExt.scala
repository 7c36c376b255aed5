package graft.multimodal

/** Lossless JPEG (ITU-T T.81 Annex H, SOF3) and 12-bit extended
  * sequential DCT (SOF1) — the last two Huffman-family decode gaps after
  * baseline/progressive ([[JpegCodec]]) and arithmetic ([[JpegArith]]).
  * SOF3 is what DNG/raw and DICOM medical stacks ship; 12-bit SOF1 is the
  * high-bit-depth variant of the same sequential DCT pipeline.
  *
  * Scope, lossless: predictors 1-7 (H.1.2.1), point transform Pt,
  * precision 2-16, 1-4 components at 1x1 sampling (the universal layout
  * in the wild — raw formats carve sensor planes into separate 1x1
  * scans), restart intervals (predictors reset to the H.2.4 defaults).
  * Subsampled lossless components return null loudly.
  *
  * Scope, 12-bit: SOF1 grayscale/3-component with the baseline MCU walk,
  * 8- or 16-bit DQT entries (prec 0/1), level shift 2^(P-1) and clamp to
  * [0, 2^P-1] per F.1.1.3. Output samples are ints, not bytes.
  *
  * VALIDATION BOUNDARY: the JDK's ImageIO reads neither SOF3 nor 12-bit
  * streams, so — like [[JpegArith]] — correctness rests on the spec
  * transcription plus provable losslessness: MultimodalSpec round-trips
  * authored sample planes encoder→decoder sample-exact across every
  * predictor, precision, and point transform, which exercises the same
  * prediction arithmetic a conformant encoder feeds.
  */
object JpegLossless extends Serializable {

  /** Decoded lossless frame: `samples(ci)(y*width + x)`, already shifted
    * back by the point transform (`<< Pt`). */
  final case class Frame(width: Int, height: Int, precision: Int,
      samples: Array[Array[Int]])

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  def decode(p: Array[Byte]): Frame = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return null
    try {
      val dcTabs = new Array[JpegCodec.Huff](4)
      var width = 0; var height = 0; var precision = 0
      var nComp = 0
      var compTab: Array[Int] = null // DC table per scan component
      var predictor = 0; var pt = 0
      var restartInterval = 0
      var pos = 2
      var scanStart = -1
      while (scanStart < 0 && pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          pos += 2
        } else {
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          marker match {
            case 0xc3 => // SOF3 lossless sequential
              precision = p(seg) & 0xff
              if (precision < 2 || precision > 16) return null
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              nComp = p(seg + 5) & 0xff
              if (nComp < 1 || nComp > 4) return null
              var i = 0
              while (i < nComp) {
                // 1x1 sampling only: subsampled lossless is out of scope
                if ((p(seg + 7 + i * 3) & 0xff) != 0x11) return null
                i += 1
              }
            case 0xc4 => // DHT (lossless uses DC-class tables)
              var o = seg
              while (o < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xff)
                val nv = bits.sum
                val vals = Array.tabulate(nv)(k => p(o + 17 + k) & 0xff)
                if (cls == 0) dcTabs(id) = new JpegCodec.Huff(bits, vals)
                o += 17 + nv
              }
            case 0xdd =>
              restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
            case 0xda => // SOS: Ss = predictor, Al = point transform
              val ns = p(seg) & 0xff
              if (nComp == 0 || ns != nComp) return null
              compTab = Array.tabulate(ns)(i => (p(seg + 2 + i * 2) & 0xff) >> 4)
              predictor = p(seg + 1 + ns * 2) & 0xff
              pt = p(seg + 3 + ns * 2) & 0x0f
              if (predictor < 1 || predictor > 7) return null
              scanStart = pos + 2 + len
            case 0xc0 | 0xc1 | 0xc2 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return null // not a lossless frame
            case _ => ()
          }
          pos += 2 + len
        }
      }
      if (scanStart < 0 || width <= 0 || height <= 0) return null
      if (width.toLong * height > 64L * 1024 * 1024) return null
      val planes = Array.fill(nComp)(new Array[Int](width * height))
      val br = new JpegCodec.BitReader(p, scanStart)
      val defaultPred = 1 << (precision - pt - 1)
      var mcu = 0 // one sample position across components
      // fresh(ci): this component's next sample starts a restart interval
      var fresh = true
      val nMcus = width * height
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          fresh = true
        }
        val y = mcu / width
        val x = mcu % width
        var ci = 0
        while (ci < nComp) {
          val plane = planes(ci)
          val pred =
            if (fresh) defaultPred
            else if (y == 0) plane(x - 1) // first line: Ra
            else if (x == 0) plane((y - 1) * width) // line start: Rb
            else {
              val ra = plane(y * width + x - 1)
              val rb = plane((y - 1) * width + x)
              val rc = plane((y - 1) * width + x - 1)
              predictor match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case 7 => (ra + rb) >> 1
              }
            }
          val t = dcTabs(compTab(ci)).decode(br)
          if (t > 16) return null
          val diff = if (t == 16) 32768 else extend(br.bits(t), t)
          plane(y * width + x) = (pred + diff) & 0xffff
          ci += 1
        }
        fresh = false
        mcu += 1
      }
      if (pt > 0) {
        var ci = 0
        while (ci < nComp) {
          val plane = planes(ci)
          var i = 0
          while (i < plane.length) { plane(i) <<= pt; i += 1 }
          ci += 1
        }
      }
      Frame(width, height, precision, planes)
    } catch { case _: Exception => null }
  }

  /** Adapter for [[JpegCodec]]'s baseline plane contract: an 8-bit
    * lossless frame surfaces through the same `jpeg_luma_*` accessors as
    * the DCT family. Non-8-bit frames use the lossless accessors. */
  private[multimodal] def asPlanes(p: Array[Byte], wantChroma: Boolean)
      : (JpegCodec.Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    val f = decode(p)
    if (f == null || f.precision != 8 ||
      (f.samples.length != 1 && f.samples.length != 3)) return null
    val planes = f.samples.map { s =>
      val b = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) {
        val v = s(i)
        b(i) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        i += 1
      }
      b
    }
    val luma = JpegCodec.Luma(f.width, f.height, planes(0))
    (luma, planes.map(b => (b, f.width, 1, 1)))
  }

  // SQL-facing accessors (null-safe boxed returns, see MediaExpressions)
  def width(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.width)
  }
  def height(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.height)
  }
  def precisionOf(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.precision)
  }
  /** Sum of every sample across all components (the oracle-friendly
    * aggregate for closed-form fixtures). */
  def sampleSum(p: Array[Byte]): java.lang.Long = {
    val f = decode(p)
    if (f == null) return null
    var s = 0L
    f.samples.foreach { pl => var i = 0; while (i < pl.length) { s += pl(i); i += 1 } }
    Long.box(s)
  }

  // ---- fixture writer --------------------------------------------------

  /** Author a conformant SOF3 stream from sample planes. The encoder runs
    * the same prediction the decoder does, so decode∘encode is
    * sample-exact whenever samples fit `precision` bits and are multiples
    * of `1 << pt` (the point transform drops low bits by construction). */
  def write(width: Int, height: Int, precision: Int, predictor: Int,
      pt: Int, planes: Array[Array[Int]],
      restartInterval: Int = 0): Array[Byte] = {
    require(planes.nonEmpty && planes.length <= 4, "1-4 components")
    require(planes.forall(_.length == width * height), "plane size")
    require(predictor >= 1 && predictor <= 7, s"predictor 1-7: $predictor")
    require(precision >= 2 && precision <= 16 && pt >= 0 && pt < precision)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    // one DC table, symbols 0..16: lengths L2 x3, L3..L16 x1 each
    val bits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1)
    val vals = Array.tabulate(17)(identity)
    u16(0xffc4); u16(2 + 1 + 16 + vals.length); u8(0x00)
    bits.foreach(u8); vals.foreach(u8)
    if (restartInterval > 0) { u16(0xffdd); u16(4); u16(restartInterval) }
    u16(0xffc3); u16(2 + 6 + planes.length * 3); u8(precision)
    u16(height); u16(width); u8(planes.length)
    planes.indices.foreach { i => u8(i + 1); u8(0x11); u8(0) }
    u16(0xffda); u16(2 + 1 + planes.length * 2 + 3); u8(planes.length)
    planes.indices.foreach { i => u8(i + 1); u8(0x00) }
    u8(predictor); u8(0); u8(pt) // Ss = predictor, Se = 0, Ah/Al = 0/pt
    // canonical codes for the table above
    val codes = new Array[(Int, Int)](17) // (code, len) per symbol
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) { codes(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
        code <<= 1; l += 1
      }
    }
    var acc = 0L; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nAcc += n
      while (nAcc >= 8) {
        val b = ((acc >> (nAcc - 8)) & 0xff).toInt
        u8(b); if (b == 0xff) u8(0x00)
        nAcc -= 8
      }
    }
    def flushByte(): Unit =
      if (nAcc > 0) { putBits(0xff, 8 - nAcc) } // pad with 1s to byte edge
    val defaultPred = 1 << (precision - pt - 1)
    var rstIdx = 0
    var mcu = 0
    var fresh = true
    val nMcus = width * height
    // encode against the point-transformed reconstruction
    val rec = planes.map(pl => pl.map(_ >> pt))
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        flushByte()
        u16(0xffd0 + (rstIdx & 7)); rstIdx += 1
        fresh = true
      }
      val y = mcu / width
      val x = mcu % width
      var ci = 0
      while (ci < planes.length) {
        val plane = rec(ci)
        val pred =
          if (fresh) defaultPred
          else if (y == 0) plane(x - 1)
          else if (x == 0) plane((y - 1) * width)
          else {
            val ra = plane(y * width + x - 1)
            val rb = plane((y - 1) * width + x)
            val rc = plane((y - 1) * width + x - 1)
            predictor match {
              case 1 => ra
              case 2 => rb
              case 3 => rc
              case 4 => ra + rb - rc
              case 5 => ra + ((rb - rc) >> 1)
              case 6 => rb + ((ra - rc) >> 1)
              case 7 => (ra + rb) >> 1
            }
          }
        // modulo-65536 diff mapped to [-32768, 32767]; -32768 ≡ 32768 is
        // the t=16 no-extra-bits symbol (H.1.2.1)
        val diff0 = (plane(y * width + x) - pred) & 0xffff
        val diff = if (diff0 >= 32768) diff0 - 65536 else diff0
        if (diff == -32768) {
          val (c, l) = codes(16); putBits(c, l)
        } else {
          val mag = math.abs(diff)
          var t = 0
          while ((1 << t) <= mag) t += 1
          val (c, l) = codes(t); putBits(c, l)
          if (t > 0) putBits(if (diff < 0) diff - 1 else diff, t)
        }
        ci += 1
      }
      fresh = false
      mcu += 1
    }
    flushByte()
    u16(0xffd9)
    out.toByteArray
  }
}

/** 12-bit extended sequential DCT (SOF1): the baseline MCU walk with
  * deeper samples — level shift 2^(P-1), clamp [0, 2^P-1], int planes,
  * 16-bit DQT entries accepted. Grayscale and 3-component 1x1. */
object Jpeg12 extends Serializable {

  final case class Frame12(width: Int, height: Int, precision: Int,
      plane: Array[Int]) // component 0, cropped to frame size

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  def decode(p: Array[Byte]): Frame12 = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return null
    try {
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[JpegCodec.Huff](4)
      val acTabs = new Array[JpegCodec.Huff](4)
      var width = 0; var height = 0; var precision = 0
      var comps: Array[(Int, Int, Int, Int)] = null
      var restartInterval = 0
      var pos = 2
      var scanStart = -1
      var compSel: Array[(Int, Int)] = null
      while (scanStart < 0 && pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          pos += 2
        } else {
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          marker match {
            case 0xc1 => // SOF1 extended sequential
              precision = p(seg) & 0xff
              if (precision != 8 && precision != 12) return null
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              val n = p(seg + 5) & 0xff
              if (n != 1 && n != 3) return null
              comps = Array.tabulate(n) { i =>
                val o = seg + 6 + i * 3
                ((p(o) & 0xff), (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f,
                  p(o + 2) & 0xff)
              }
              // 1x1 only: the high-bit-depth streams this targets are
              // never chroma-subsampled (they are mostly grayscale)
              if (!comps.forall(c => c._2 == 1 && c._3 == 1)) return null
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
            case 0xc4 =>
              var o = seg
              while (o < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xff)
                val nv = bits.sum
                val vals = Array.tabulate(nv)(k => p(o + 17 + k) & 0xff)
                val h = new JpegCodec.Huff(bits, vals)
                if (cls == 0) dcTabs(id) = h else acTabs(id) = h
                o += 17 + nv
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
            case 0xc9 => // 12-bit arithmetic twin: JpegArith's QM path
              return JpegArith.decode12(p)
            case 0xc0 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return null
            case _ => ()
          }
          pos += 2 + len
        }
      }
      if (scanStart < 0 || width <= 0 || height <= 0) return null
      if (width.toLong * height > 64L * 1024 * 1024) return null
      val mcusX = (width + 7) / 8
      val mcusY = (height + 7) / 8
      val planeW = mcusX * 8
      val plane = new Array[Int](planeW * mcusY * 8)
      val levelShift = 1 << (precision - 1)
      val maxVal = (1 << precision) - 1
      val br = new JpegCodec.BitReader(p, scanStart)
      val dcPred = new Array[Int](comps.length)
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(dcPred, 0)
        }
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var ci = 0
        while (ci < comps.length) {
          val qsel = comps(ci)._4
          val (dcSel, acSel) = (compSel(ci)._1, compSel(ci)._2)
          val q = quant(qsel)
          java.util.Arrays.fill(block, 0)
          val t = dcTabs(dcSel).decode(br)
          dcPred(ci) += extend(br.bits(t), t)
          block(0) = dcPred(ci) * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acTabs(acSel).decode(br)
            val r = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 else eob = true
            } else {
              k += r
              if (k > 63) return null
              block(JpegCodec.zigzag(k)) = extend(br.bits(sz), sz) * q(k)
              k += 1
            }
          }
          if (ci == 0) {
            JpegCodec.idct8x8(block, tmp)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(tmp(yy * 8 + xx) + levelShift).toInt
                plane((my * 8 + yy) * planeW + mx * 8 + xx) =
                  if (v < 0) 0 else if (v > maxVal) maxVal else v
                xx += 1
              }
              yy += 1
            }
          }
          ci += 1
        }
        mcu += 1
      }
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(plane, y * planeW, out, y * width, width)
        y += 1
      }
      Frame12(width, height, precision, out)
    } catch { case _: Exception => null }
  }

  def width(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.width)
  }
  def height(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.height)
  }
  def precisionOf(p: Array[Byte]): java.lang.Integer = {
    val f = decode(p); if (f == null) null else Int.box(f.precision)
  }
  def sampleSum(p: Array[Byte]): java.lang.Long = {
    val f = decode(p)
    if (f == null) return null
    var s = 0L; var i = 0
    while (i < f.plane.length) { s += f.plane(i); i += 1 }
    Long.box(s)
  }

  /** Author a grayscale SOF1 stream from zigzag coefficient blocks with a
    * 16-bit-entry DQT (prec 1). DC-only flat blocks give closed-form
    * pixels: value = round(c0*q0/8) + 2^(P-1), exact when 8 | c0*q0. */
  def writeGray(width: Int, height: Int, precision: Int, qtable: Array[Int],
      coefBlocks: Seq[Array[Int]]): Array[Byte] = {
    require(qtable.length == 64 && (precision == 8 || precision == 12))
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(coefBlocks.length == bx * by,
      s"need ${bx * by} blocks, got ${coefBlocks.length}")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8)
    u16(0xffdb); u16(2 + 1 + 128); u8(0x10) // prec 1, table 0
    qtable.foreach(u16)
    // DC table: symbols 0..16 (diff categories); AC table: EOB + 15 sizes
    val dcBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1)
    val dcVals = Array.tabulate(17)(identity)
    u16(0xffc4); u16(2 + 1 + 16 + dcVals.length); u8(0x00)
    dcBits.foreach(u8); dcVals.foreach(u8)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00) // EOB only: fixtures are DC-only
    u16(0xffc4); u16(2 + 1 + 16 + acVals.length); u8(0x10)
    acBits.foreach(u8); acVals.foreach(u8)
    u16(0xffc1); u16(2 + 6 + 3); u8(precision)
    u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    u16(0xffda); u16(2 + 1 + 2 + 3); u8(1)
    u8(1); u8(0x00)
    u8(0); u8(63); u8(0)
    val dcCodes = new Array[(Int, Int)](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < dcBits(l - 1)) {
          dcCodes(dcVals(k)) = (code, l); code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
    }
    val eobCode = (0, 2) // single symbol at length 2: code 00
    var acc = 0L; var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nAcc += n
      while (nAcc >= 8) {
        val b = ((acc >> (nAcc - 8)) & 0xff).toInt
        u8(b); if (b == 0xff) u8(0x00)
        nAcc -= 8
      }
    }
    var pred = 0
    coefBlocks.foreach { coef =>
      require(coef.length == 64 && coef.drop(1).forall(_ == 0),
        "DC-only fixture blocks")
      val diff = coef(0) - pred
      pred = coef(0)
      val mag = math.abs(diff)
      var t = 0
      while ((1 << t) <= mag) t += 1
      val (c, l) = dcCodes(t); putBits(c, l)
      if (t > 0) putBits(if (diff < 0) diff - 1 else diff, t)
      putBits(eobCode._1, eobCode._2)
    }
    if (nAcc > 0) putBits(0xff, 8 - nAcc)
    u16(0xffd9)
    out.toByteArray
  }
}
