package graft.multimodal

/** Zero-dependency baseline-JPEG decoder from the public ITU-T T.81 spec:
  * marker parse (DQT/SOF0/DHT/SOS/DRI), canonical Huffman entropy decode,
  * dequantize + zigzag + separable float IDCT, level shift. `decodeLuma`
  * reconstructs only the luma plane (the multimodal feature extractors run
  * on luminance; chroma blocks advance the bitstream without IDCT);
  * `decodeRgb` IDCTs every component and converts JFIF YCbCr to RGB with
  * nearest-neighbor chroma upsampling.
  *
  * Scope: baseline sequential DCT (SOF0) and progressive DCT (SOF2, T.81
  * G.2: spectral selection + successive approximation, DC and AC first +
  * refinement scans with EOB runs), 8-bit precision, 1 or 3 components,
  * any sampling factors, restart intervals; sequential ARITHMETIC (SOF9)
  * routes to [[JpegArith]] (QM-coder, 1x1 sampling). Lossless,
  * arithmetic-progressive, and 12-bit return null — honestly unsupported.
  * JPEG's IDCT is not bit-exact across decoders (T.81 Annex A tolerance),
  * so equality checks against other decoders carry a ±2 tolerance, pinned
  * in MultimodalSpec.
  */
object JpegCodec extends Serializable {

  final case class Luma(width: Int, height: Int, pixels: Array[Byte])

  private[graft] val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private[multimodal] final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical code tables: mincode/maxcode/valptr per length (T.81 F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
        code = (code << 1) | br.bit()
        l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }
  }

  private[multimodal] final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) throw new IllegalStateException("eof")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val m = if (pos < data.length) data(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed
          else if (m >= 0xd0 && m <= 0xd7) {
            // restart marker mid-read: should be consumed at MCU boundary
            throw new IllegalStateException("unexpected RST")
          } else {
            // EOI or other marker: treat as padding 1s (T.81 allows)
            pos -= 1
            b = 0xff
            cur = b; nBits = 8
            nBits -= 1
            return (cur >> nBits) & 1
          }
        }
        cur = b
        nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to byte and consume a restart marker. */
    def restart(): Unit = {
      nBits = 0
      // scan for FFDn (skip any pad bytes)
      while (pos + 1 < data.length &&
        !((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) >= 0xd0 &&
          (data(pos + 1) & 0xff) <= 0xd7)) pos += 1
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode the luma plane; null for anything but clean baseline input. */
  def decodeLuma(p: Array[Byte]): Luma = {
    val d = decodePlanes(p, wantChroma = false)
    if (d == null) null else d._1
  }

  /** Decode to RGB (JFIF YCbCr → RGB with nearest-neighbor chroma
    * upsampling; grayscale JPEGs replicate the luma). Null for non-baseline
    * input. Note: decoders using filtered chroma upsampling (libjpeg
    * "fancy" mode) can differ by tens of units on chroma edges —
    * flat-chroma content agrees within the IDCT tolerance. */
  def decodeRgb(p: Array[Byte]): PngCodec.Image = {
    val d = decodePlanes(p, wantChroma = true)
    if (d == null) return null
    val (luma, planes) = d
    val w = luma.width; val h = luma.height
    val out = new Array[Byte](w * h * 3)
    if (planes.length < 3) {
      var i = 0
      while (i < w * h) {
        out(i * 3) = luma.pixels(i); out(i * 3 + 1) = luma.pixels(i)
        out(i * 3 + 2) = luma.pixels(i)
        i += 1
      }
    } else {
      val (cbP, cbW, cbSx, cbSy) = planes(1)
      val (crP, crW, crSx, crSy) = planes(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = luma.pixels(y * w + x) & 0xff
          val cb = (cbP((y / cbSy) * cbW + x / cbSx) & 0xff) - 128
          val cr = (crP((y / crSy) * crW + x / crSx) & 0xff) - 128
          def clamp(v: Double): Byte = {
            val i = math.round(v).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          val o = (y * w + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    PngCodec.Image(w, h, 3, out)
  }

  /** Core baseline decode. Returns the cropped luma plane plus, when
    * `wantChroma`, every component's padded plane as
    * (pixels, planeWidth, xSubsample, ySubsample). */
  private def decodePlanes(p: Array[Byte], wantChroma: Boolean)
      : (Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    if (p == null || p.length < 4 ||
      (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return null
    try {
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var width = 0; var height = 0
      // per component: (id, h, v, qsel); scan selectors (dcSel, acSel)
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
            case 0xc0 => // SOF0 baseline
              if ((p(seg) & 0xff) != 8) return null // 12-bit unsupported
              height = ((p(seg + 1) & 0xff) << 8) | (p(seg + 2) & 0xff)
              width = ((p(seg + 3) & 0xff) << 8) | (p(seg + 4) & 0xff)
              val n = p(seg + 5) & 0xff
              if (n != 1 && n != 3) return null
              comps = Array.tabulate(n) { i =>
                val o = seg + 6 + i * 3
                ((p(o) & 0xff), (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f,
                  p(o + 2) & 0xff)
              }
            case 0xc2 => // progressive: multi-scan coefficient path
              return decodeProgressivePlanes(p, wantChroma)
            case 0xc9 => // sequential DCT, arithmetic entropy coding
              return JpegArith.decodePlanes(p, wantChroma)
            case 0xca => // progressive DCT, arithmetic entropy coding
              return JpegArith.decodeProgressivePlanes(p, wantChroma)
            case 0xc3 => // lossless sequential: 8-bit frames adapt here
              return JpegLossless.asPlanes(p, wantChroma)
            case 0xc1 | 0xc5 | 0xc6 | 0xc7 |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return null // extended(8-bit here) / hierarchical: unsupported
            case 0xdb => // DQT (possibly several tables per segment)
              var o = seg
              while (o < pos + 2 + len) {
                val prec = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                if (prec != 0) return null // 16-bit tables: not baseline
                quant(id) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
                o += 65
              }
            case 0xc4 => // DHT
              var o = seg
              while (o < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xff)
                val nv = bits.sum
                val vals = Array.tabulate(nv)(k => p(o + 17 + k) & 0xff)
                val h = new Huff(bits, vals)
                if (cls == 0) dcTabs(id) = h else acTabs(id) = h
                o += 17 + nv
              }
            case 0xdd => // DRI
              restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
            case 0xda => // SOS
              val ns = p(seg) & 0xff
              if (comps == null || ns != comps.length) return null
              compSel = Array.tabulate(ns) { i =>
                val o = seg + 1 + i * 2
                ((p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f)
              }
              scanStart = pos + 2 + len
            case _ => () // APPn / COM / others skipped
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
      // one padded plane per decoded component (luma always; chroma when
      // the caller wants color)
      val planeW = comps.map(c => mcusX * 8 * c._2)
      val planeH = comps.map(c => mcusY * 8 * c._3)
      val planes = Array.tabulate(comps.length) { ci =>
        if (ci == 0 || wantChroma) new Array[Byte](planeW(ci) * planeH(ci))
        else null
      }
      val br = new BitReader(p, scanStart)
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
          val (_, h, v, qsel) = comps(ci)
          val (dcSel, acSel) = (compSel(ci)._1, compSel(ci)._2)
          val q = quant(qsel)
          var by = 0
          while (by < v) {
            var bx = 0
            while (bx < h) {
              // entropy-decode one block
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
                  block(zigzag(k)) = extend(br.bits(sz), sz) * q(k)
                  k += 1
                }
              }
              if (ci == 0 || wantChroma) {
                // undecoded components just advanced the bitstream
                writeBlock(block, tmp, planes(ci), planeW(ci),
                  (mx * h + bx) * 8, (my * v + by) * 8)
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      finishPlanes(width, height, comps, maxH, maxV, planes, planeW)
    } catch { case _: Exception => null }
  }

  /** IDCT one dequantized block and write it (level-shifted, clamped) into
    * the padded component plane at pixel offset (ox, oy). */
  private[graft] def writeBlock(block: Array[Int], tmp: Array[Double],
      plane: Array[Byte], pw: Int, ox: Int, oy: Int): Unit = {
    idct8x8(block, tmp)
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val sVal = math.round(tmp(yy * 8 + xx) + 128.0).toInt
        plane((oy + yy) * pw + ox + xx) =
          (if (sVal < 0) 0 else if (sVal > 255) 255 else sVal).toByte
        xx += 1
      }
      yy += 1
    }
  }

  /** Crop the MCU-padded luma plane to frame size and package plane
    * metadata. Luma sampled below the frame max (chroma-supersampled
    * JPEGs, e.g. Y 1x1 with Cb/Cr 2x2) would report dimensions smaller
    * than the SOF frame — honestly unsupported, null. */
  private[multimodal] def finishPlanes(width: Int, height: Int,
      comps: Array[(Int, Int, Int, Int)], maxH: Int, maxV: Int,
      planes: Array[Array[Byte]], planeW: Array[Int])
      : (Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    if (maxH / comps(0)._2 != 1 || maxV / comps(0)._3 != 1) return null
    val lumaW = planeW(0)
    val out = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      System.arraycopy(planes(0), y * lumaW, out, y * width, width)
      y += 1
    }
    val planeMeta = Array.tabulate(comps.length) { ci =>
      (planes(ci), planeW(ci), maxH / comps(ci)._2, maxV / comps(ci)._3)
    }
    (Luma(width, height, out), planeMeta)
  }

  /** Progressive (SOF2) decode: coefficients accumulate across scans in
    * per-component buffers (natural order), then one dequantize + IDCT
    * pass reconstructs the planes. Scan semantics per T.81 G.2: DC first
    * scans carry point-transformed diffs (<< Al), DC refinement appends
    * one bit; AC scans are single-component with a spectral band [Ss, Se],
    * first scans use EOBRUN run-length coding, refinement scans interleave
    * correction bits for already-nonzero coefficients. */
  private def decodeProgressivePlanes(p: Array[Byte], wantChroma: Boolean)
      : (Luma, Array[(Array[Byte], Int, Int, Int)]) = {
    try {
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var width = 0; var height = 0
      var comps: Array[(Int, Int, Int, Int)] = null
      var restartInterval = 0
      var maxH = 1; var maxV = 1
      var mcusX = 0; var mcusY = 0
      // per component: full (interleave-padded) block grid and the tighter
      // non-interleaved grid a single-component scan walks (T.81 A.2.2)
      var coefs: Array[Array[Int]] = null
      var gridW: Array[Int] = null
      var soloW: Array[Int] = null
      var soloH: Array[Int] = null
      var pos = 2
      var eoi = false
      while (!eoi && pos + 2 <= p.length) {
        if ((p(pos) & 0xff) != 0xff) return null
        val marker = p(pos + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) pos += 2
        else if (marker == 0xd9) eoi = true
        else {
          if (pos + 4 > p.length) return null
          val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
          val seg = pos + 4
          var nextPos = pos + 2 + len
          marker match {
            case 0xc2 =>
              if ((p(seg) & 0xff) != 8) return null
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
              maxH = comps.map(_._2).max
              maxV = comps.map(_._3).max
              mcusX = (width + 8 * maxH - 1) / (8 * maxH)
              mcusY = (height + 8 * maxV - 1) / (8 * maxV)
              gridW = comps.map(c => mcusX * c._2)
              soloW = comps.map(c => ((width * c._2 + maxH - 1) / maxH + 7) / 8)
              soloH = comps.map(c => ((height * c._3 + maxV - 1) / maxV + 7) / 8)
              coefs = comps.map(c => new Array[Int](mcusX * c._2 * mcusY * c._3 * 64))
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return null // a second frame / non-progressive SOF: reject
            case 0xdb =>
              var o = seg
              while (o < pos + 2 + len) {
                val prec = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                if (prec != 0) return null
                quant(id) = Array.tabulate(64)(k => p(o + 1 + k) & 0xff)
                o += 65
              }
            case 0xc4 =>
              var o = seg
              while (o < pos + 2 + len) {
                val cls = (p(o) & 0xff) >> 4
                val id = p(o) & 0x0f
                val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xff)
                val nv = bits.sum
                val vals = Array.tabulate(nv)(k => p(o + 17 + k) & 0xff)
                val h = new Huff(bits, vals)
                if (cls == 0) dcTabs(id) = h else acTabs(id) = h
                o += 17 + nv
              }
            case 0xdd =>
              restartInterval = ((p(seg) & 0xff) << 8) | (p(seg + 1) & 0xff)
            case 0xda =>
              if (comps == null) return null
              val ns = p(seg) & 0xff
              val scanCi = new Array[Int](ns)
              val scanDc = new Array[Int](ns)
              val scanAc = new Array[Int](ns)
              var i = 0
              while (i < ns) {
                val o = seg + 1 + i * 2
                val id = p(o) & 0xff
                val ci = comps.indexWhere(_._1 == id)
                if (ci < 0) return null
                scanCi(i) = ci
                scanDc(i) = (p(o + 1) & 0xff) >> 4
                scanAc(i) = p(o + 1) & 0x0f
                i += 1
              }
              val ss = p(seg + 1 + ns * 2) & 0xff
              val se = p(seg + 2 + ns * 2) & 0xff
              val ahal = p(seg + 3 + ns * 2) & 0xff
              val ah = ahal >> 4
              val al = ahal & 0x0f
              if (ss > 63 || se > 63 || se < ss) return null
              if (ss == 0 && se != 0) return null // DC scans are DC-only in SOF2
              if (ss > 0 && ns != 1) return null  // AC scans: one component
              val br = new BitReader(p, pos + 2 + len)
              decodeProgressiveScan(br, p, comps, coefs, gridW, soloW, soloH,
                mcusX, mcusY, scanCi, scanDc, scanAc, dcTabs, acTabs,
                ss, se, ah, al, restartInterval)
              // scan data ends at the next non-RST, non-stuffed marker
              var q = br.pos
              while (q + 1 < p.length &&
                !((p(q) & 0xff) == 0xff && (p(q + 1) & 0xff) != 0x00 &&
                  !((p(q + 1) & 0xff) >= 0xd0 && (p(q + 1) & 0xff) <= 0xd7)))
                q += 1
              nextPos = q
            case _ => ()
          }
          pos = nextPos
        }
      }
      if (coefs == null) return null
      // reconstruct: dequantize + IDCT every block of every wanted plane
      val planeW = comps.map(c => mcusX * 8 * c._2)
      val planes = Array.tabulate(comps.length) { ci =>
        if (ci == 0 || wantChroma)
          new Array[Byte](planeW(ci) * mcusY * 8 * comps(ci)._3)
        else null
      }
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        if (planes(ci) != null) {
          val q = quant(comps(ci)._4)
          if (q == null) return null
          val co = coefs(ci)
          val bw = gridW(ci)
          val bh = mcusY * comps(ci)._3
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              val off = (by * bw + bx) * 64
              var k = 0
              while (k < 64) {
                block(zigzag(k)) = co(off + zigzag(k)) * q(k)
                k += 1
              }
              writeBlock(block, tmp, planes(ci), planeW(ci), bx * 8, by * 8)
              bx += 1
            }
            by += 1
          }
        }
        ci += 1
      }
      finishPlanes(width, height, comps, maxH, maxV, planes, planeW)
    } catch { case _: Exception => null }
  }

  /** Entropy-decode one progressive scan into the coefficient buffers. */
  private def decodeProgressiveScan(br: BitReader, p: Array[Byte],
      comps: Array[(Int, Int, Int, Int)], coefs: Array[Array[Int]],
      gridW: Array[Int], soloW: Array[Int], soloH: Array[Int],
      mcusX: Int, mcusY: Int,
      scanCi: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Unit = {
    var eobrun = 0
    val dcPred = new Array[Int](comps.length)

    def acFirst(co: Array[Int], off: Int, tab: Huff): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = tab.decode(br)
        val r = rs >> 4
        val sz = rs & 0x0f
        if (sz == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            return
          }
          k += 16
        } else {
          k += r
          if (k > se) throw new IllegalStateException("AC run past band")
          co(off + zigzag(k)) = extend(br.bits(sz), sz) << al
          k += 1
        }
      }
    }

    def acRefine(co: Array[Int], off: Int, tab: Huff): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(z: Int): Unit =
        if (co(z) != 0 && br.bit() == 1 && (co(z) & p1) == 0)
          co(z) += (if (co(z) >= 0) p1 else m1)
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = tab.decode(br)
          var r = rs >> 4
          val sz = rs & 0x0f
          var newVal = 0
          if (sz == 0) {
            if (r < 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              atEob = true
            }
            // r == 15: sixteen zero-history coefficients, no new value
          } else {
            // refinement scans only ever introduce magnitude-1 coefficients
            if (sz != 1) throw new IllegalStateException("bad AC refine size")
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!atEob) {
            var placed = false
            while (k <= se && !placed) {
              val z = off + zigzag(k)
              if (co(z) != 0) correct(z)
              else if (r == 0) { if (newVal != 0) co(z) = newVal; placed = true }
              else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // end-of-band: the rest of this block carries correction bits only
        while (k <= se) { correct(off + zigzag(k)); k += 1 }
        eobrun -= 1
      }
    }

    def decodeBlockDc(si: Int, co: Array[Int], off: Int): Unit = {
      if (ah == 0) {
        val tab = dcTabs(scanDc(si))
        val t = tab.decode(br)
        dcPred(scanCi(si)) += extend(br.bits(t), t)
        co(off) = dcPred(scanCi(si)) << al
      } else if (br.bit() == 1) co(off) |= 1 << al
    }

    if (ss == 0 && scanCi.length > 1) {
      // interleaved DC scan: MCU walk over every component's h×v blocks
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var si = 0
        while (si < scanCi.length) {
          val ci = scanCi(si)
          val (_, h, v, _) = comps(ci)
          var by = 0
          while (by < v) {
            var bx = 0
            while (bx < h) {
              val off = ((my * v + by) * gridW(ci) + mx * h + bx) * 64
              decodeBlockDc(si, coefs(ci), off)
              bx += 1
            }
            by += 1
          }
          si += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan (every AC scan; DC scans of 1-comp frames):
      // raster walk over the component's own (non-interleaved) block grid
      val ci = scanCi(0)
      val bw = soloW(ci)
      val nBlk = bw * soloH(ci)
      val co = coefs(ci)
      var blk = 0
      while (blk < nBlk) {
        if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }
        val off = ((blk / bw) * gridW(ci) + blk % bw) * 64
        if (ss == 0) decodeBlockDc(0, co, off)
        else if (ah == 0) acFirst(co, off, acTabs(scanAc(0)))
        else acRefine(co, off, acTabs(scanAc(0)))
        blk += 1
      }
    }
  }

  /** Separable 2D inverse DCT (T.81 A.3.3 reference definition). */
  private[multimodal] def idct8x8(in: Array[Int], out: Array[Double]): Unit = {
    // rows then columns with the orthonormal DCT-III
    val row = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          acc += cu * in(y * 8 + u) * math.cos((2 * x + 1) * u * math.Pi / 16.0)
          u += 1
        }
        row(y * 8 + x) = acc / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          acc += cv * row(v * 8 + x) * math.cos((2 * yy + 1) * v * math.Pi / 16.0)
          v += 1
        }
        out(yy * 8 + x) = acc / 2.0
        yy += 1
      }
      x += 1
    }
  }

  // --- scalar accessors (SQL expression backends; null = not decodable) --
  def lumaWidth(p: Array[Byte]): java.lang.Integer = {
    val l = decodeLuma(p); if (l == null) null else Integer.valueOf(l.width)
  }
  def lumaHeight(p: Array[Byte]): java.lang.Integer = {
    val l = decodeLuma(p); if (l == null) null else Integer.valueOf(l.height)
  }
  def lumaSum(p: Array[Byte]): java.lang.Long = {
    val l = decodeLuma(p)
    if (l == null) null
    else {
      var s = 0L; var i = 0
      while (i < l.pixels.length) { s += l.pixels(i) & 0xff; i += 1 }
      java.lang.Long.valueOf(s)
    }
  }
}
