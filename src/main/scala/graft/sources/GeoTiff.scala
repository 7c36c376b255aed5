package graft.sources

/** From-spec GeoTIFF codec (TIFF 6.0 + BigTIFF + OGC GeoTIFF 1.1, all
  * public specs): classic and BigTIFF (version 43: 8-byte counts/offsets,
  * LONG8 types — the container large rasters actually ship in) headers,
  * multi-IFD chains (COG-style overview levels / multi-page files,
  * addressable per level), IFD walk, GeoKey directory → EPSG + affine
  * geotransform, and real pixel decode for the raster layouts an
  * analytics pipeline meets in practice —
  * strip or tile organization, none/LZW/Deflate compression (LZW per TIFF
  * 6.0 §13 with the early-change rule; Deflate via the zlib the JDK
  * ships), horizontal-differencing predictor 2 and the TIFF Technical
  * Note 3 floating-point predictor 3, chunky AND planar (config 2,
  * plane-major segment order) band layouts, and uint8/16/32, int8/16/32,
  * float32/64 samples in either byte order.
  * JPEG-in-TIFF (compression 7 per TIFF Tech Note 2, with the JPEGTables
  * splice, and the whole-image old-style 6 interchange form) decodes
  * through the from-spec [[graft.multimodal.JpegCodec]]. Anything outside
  * that envelope (planar JPEG, fragmented old-style JPEG, predictor/format
  * mismatches) returns null — the same loud-reject posture as the other
  * from-spec decoders (FileGdb, GeoPackage, JpegCodec).
  *
  * Reference surface anchor: the reference pipeline reprojects and loads
  * raster-derived footprints via GDAL (`East-Asia-Building-Footprints.md`);
  * GeoTIFF is GDAL's lingua-franca raster container, so consuming it
  * in-engine removes a shell-out the same way the CRS registry removed
  * `ogr2ogr` (see `geom/CrsTransform.scala`).
  */
object GeoTiff {

  /** Raster + georeferencing metadata. `epsg` 0 = no GeoKey directory;
    * `pixelScaleX/Y` and `originX/Y` are 0 when untagged. */
  case class Meta(width: Int, height: Int, bands: Int, bitsPerSample: Int,
      sampleFormat: Int, compression: Int, tiled: Boolean, epsg: Int,
      modelType: Int, pixelScaleX: Double, pixelScaleY: Double,
      originX: Double, originY: Double)

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u8(o: Int): Int = b(o) & 0xff
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def f64(o: Int): Double = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val idx = if (le) o + 7 - i else o + i
        v = (v << 8) | (b(idx) & 0xffL)
        i += 1
      }
      java.lang.Double.longBitsToDouble(v)
    }
    def u64(o: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val idx = if (le) o + 7 - i else o + i
        v = (v << 8) | (b(idx) & 0xffL)
        i += 1
      }
      v
    }
  }

  private case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)

  // TIFF 6.0 types plus the BigTIFF LONG8/SLONG8/IFD8 trio (16/17/18)
  private val TypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1,
    7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8, 16 -> 8, 17 -> 8,
    18 -> 8)

  /** `big`: BigTIFF (version 43) — 8-byte counts/offsets, 8-byte inline
    * value fields. */
  private final class Ifd(r: Reader, entries: Map[Int, Entry], big: Boolean) {
    private val inlineSz = if (big) 8 else 4
    def has(tag: Int): Boolean = entries.contains(tag)
    private def base(e: Entry, total: Long): Int =
      if (total <= inlineSz) e.valOff
      else if (big) r.u64(e.valOff).toInt
      else r.u32(e.valOff).toInt
    /** Integer values of a BYTE/SHORT/LONG/LONG8-typed tag. */
    def longs(tag: Int): Array[Long] = entries.get(tag) match {
      case None => Array.empty
      case Some(e) =>
        val sz = TypeSize.getOrElse(e.typ, 0)
        if (sz == 0 || e.count > Int.MaxValue) return Array.empty
        val b0 = base(e, sz.toLong * e.count)
        Array.tabulate(e.count.toInt) { i =>
          e.typ match {
            case 1 | 6 | 7 => r.u8(b0 + i).toLong
            case 3 | 8 => r.u16(b0 + i * 2).toLong
            case 4 | 9 => r.u32(b0 + i * 4)
            case 16 | 17 | 18 => r.u64(b0 + i * 8)
            case _ => 0L
          }
        }
    }
    def long1(tag: Int, dflt: Long): Long = {
      val v = longs(tag)
      if (v.isEmpty) dflt else v(0)
    }
    def doubles(tag: Int): Array[Double] = entries.get(tag) match {
      case None => Array.empty
      case Some(e) if e.typ == 12 =>
        val b0 = base(e, e.count * 8)
        Array.tabulate(e.count.toInt)(i => r.f64(b0 + i * 8))
      case _ => Array.empty
    }
  }

  /** Parse the `index`-th IFD of the chain (classic or BigTIFF); null when
    * the header is alien or the chain is shorter than `index + 1`. */
  private def parseIfdAt(bytes: Array[Byte], index: Int): (Reader, Ifd) = {
    if (bytes.length < 8) return null
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return null
    val r = new Reader(bytes, le)
    val version = r.u16(2)
    val big = version == 43
    if (version != 42 && !big) return null
    if (big && (bytes.length < 16 || r.u16(4) != 8 || r.u16(6) != 0)) return null
    var ifdOff = if (big) r.u64(8) else r.u32(4)
    val entrySz = if (big) 20 else 12
    val headSz = if (big) 8 else 2
    var level = 0
    while (true) {
      if (ifdOff < 8 || ifdOff + headSz > bytes.length) return null
      val n = (if (big) r.u64(ifdOff.toInt) else r.u16(ifdOff.toInt).toLong).toInt
      if (n < 0 || ifdOff + headSz + n.toLong * entrySz + (if (big) 8 else 4) >
        bytes.length) return null
      if (level == index) {
        val entries = (0 until n).map { i =>
          val o = ifdOff.toInt + headSz + i * entrySz
          val tag = r.u16(o)
          val count = if (big) r.u64(o + 4) else r.u32(o + 4)
          tag -> Entry(tag, r.u16(o + 2), count, o + (if (big) 12 else 8))
        }.toMap
        return (r, new Ifd(r, entries, big))
      }
      val nextOff = ifdOff.toInt + headSz + n * entrySz
      ifdOff = if (big) r.u64(nextOff) else r.u32(nextOff)
      if (ifdOff == 0) return null // chain ended before `index`
      level += 1
    }
    null
  }

  private def parseIfd(bytes: Array[Byte]): (Reader, Ifd) = parseIfdAt(bytes, 0)

  /** Number of IFDs in the chain (overview/page count); 0 for non-TIFF. */
  def ifdCount(bytes: Array[Byte]): Int = {
    var n = 0
    while (parseIfdAt(bytes, n) != null) n += 1
    n
  }

  /** Parse raster + geo metadata; null for non-TIFF bytes. */
  def readMeta(bytes: Array[Byte]): Meta = readMeta(bytes, 0)

  /** Metadata of the `level`-th IFD — overview levels in a COG-style
    * chain, pages in a multi-page TIFF. */
  def readMeta(bytes: Array[Byte], level: Int): Meta = {
    val parsed = parseIfdAt(bytes, level)
    if (parsed == null) return null
    val (r, ifd) = parsed
    val w = ifd.long1(256, 0).toInt
    val h = ifd.long1(257, 0).toInt
    if (w <= 0 || h <= 0) return null
    val bands = ifd.long1(277, 1).toInt
    val bps = ifd.long1(258, 1).toInt
    val fmt = ifd.long1(339, 1).toInt
    val comp = ifd.long1(259, 1).toInt
    val tiled = ifd.has(322)
    // GeoKey directory: shorts (KeyDirectoryVersion, KeyRevision, Minor,
    // NumberOfKeys, then per key: KeyID, TIFFTagLocation, Count, ValueOffset)
    var epsg = 0
    var modelType = 0
    val gk = ifd.longs(34735)
    if (gk.length >= 4) {
      val nk = gk(3).toInt
      var i = 0
      while (i < nk && 4 + i * 4 + 3 < gk.length) {
        val keyId = gk(4 + i * 4).toInt
        val loc = gk(4 + i * 4 + 1).toInt
        val v = gk(4 + i * 4 + 3).toInt
        if (loc == 0) keyId match {
          case 1024 => modelType = v
          case 3072 => epsg = v // ProjectedCRSGeoKey
          case 2048 => if (epsg == 0) epsg = v // GeodeticCRSGeoKey
          case _ =>
        }
        i += 1
      }
    }
    val scale = ifd.doubles(33550)
    val tie = ifd.doubles(33922)
    Meta(w, h, bands, bps, fmt, comp, tiled, epsg, modelType,
      if (scale.length >= 2) scale(0) else 0.0,
      if (scale.length >= 2) scale(1) else 0.0,
      if (tie.length >= 6) tie(3) else 0.0,
      if (tie.length >= 6) tie(4) else 0.0)
  }

  /** TIFF 6.0 §13 LZW decode: MSB-first variable-width codes (9→12 bits),
    * ClearCode 256 / EOI 257, and the EARLY-CHANGE rule as implemented by
    * the ecosystem (libtiff, JDK ImageIO): BOTH sides widen when the next
    * free slot reaches 511/1023/2047 — one entry before the power of two.
    * (Verified empirically against a JDK-ImageIO-authored stream: widening
    * the decoder one entry earlier desynchronizes at code 254.) Returns
    * null on any inconsistency (bad code, short output). */
  private def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outN = 0
    val nBits = data.length * 8
    var bitPos = 0
    var codeSize = 9
    val table = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { table(i) = Array(i.toByte); i += 1 }
    var next = 258
    var prev: Array[Byte] = null
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return 257 // ran out: treat as EOI
      var v = 0
      var k = 0
      while (k < codeSize) {
        val b = bitPos + k
        v = (v << 1) | ((data(b >> 3) >> (7 - (b & 7))) & 1)
        k += 1
      }
      bitPos += codeSize
      v
    }
    def emit(s: Array[Byte]): Boolean = {
      if (outN + s.length > expected) return false
      System.arraycopy(s, 0, out, outN, s.length)
      outN += s.length
      true
    }
    def addEntry(s: Array[Byte]): Unit =
      if (next < 4096) {
        table(next) = s
        next += 1
        if ((next == 511 || next == 1023 || next == 2047) && codeSize < 12)
          codeSize += 1
      }
    var done = false
    while (!done) {
      val code = readCode()
      if (code == 257) done = true
      else if (code == 256) {
        java.util.Arrays.fill(table.asInstanceOf[Array[AnyRef]], 258, 4096, null)
        next = 258
        codeSize = 9
        val first = readCode()
        if (first == 257) done = true
        else if (first > 255) return null
        else { if (!emit(table(first))) return null; prev = table(first) }
      } else {
        if (prev == null) return null
        val entry =
          if (code < next && table(code) != null) table(code)
          else if (code == next) prev :+ prev(0)
          else return null
        if (!emit(entry)) return null
        addEntry(prev :+ entry(0))
        prev = entry
      }
      if (outN == expected) done = true
    }
    if (outN == expected) out else null
  }

  /** TIFF 6.0 §13 LZW encode, width transitions mirroring the decoder's
    * convention above (encoder widens at next-slot 512/1024/2048 — the
    * decoder, one table entry behind, at 511/1023/2047; cross-validated
    * against JDK ImageIO both directions). Table keyed by (prefix code,
    * next byte); Clear emitted at start and at slot 4094 per the spec;
    * EOI terminates. */
  private[sources] def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = 9
    def putCode(c: Int): Unit = {
      bitBuf = (bitBuf << codeSize) | (c & ((1 << codeSize) - 1))
      bitCnt += codeSize
      while (bitCnt >= 8) {
        bos.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val map = new java.util.HashMap[Integer, Integer]()
    var next = 258
    def key(prefix: Int, b: Byte): Integer =
      Integer.valueOf((prefix << 8) | (b & 0xff))
    putCode(256)
    var omega = -1
    var i = 0
    while (i < raw.length) {
      val k = raw(i)
      if (omega < 0) omega = k & 0xff
      else {
        val cand = map.get(key(omega, k))
        if (cand != null) omega = cand.intValue
        else {
          putCode(omega)
          map.put(key(omega, k), Integer.valueOf(next))
          next += 1
          // the decoder is one table entry behind: it widens at 511/1023/
          // 2047, so the encoder's own transition sits one later
          if ((next == 512 || next == 1024 || next == 2048) && codeSize < 12)
            codeSize += 1
          if (next == 4094) { // spec: restart the dictionary before overflow
            putCode(256)
            map.clear()
            next = 258
            codeSize = 9
          }
          omega = k & 0xff
        }
      }
      i += 1
    }
    if (omega >= 0) putCode(omega)
    putCode(257)
    if (bitCnt > 0) bos.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    bos.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var n = 0
    while (n < expected && !inf.finished()) {
      val got = inf.inflate(out, n, expected - n)
      if (got == 0 && inf.needsInput()) { inf.end(); return null }
      n += got
    }
    inf.end()
    if (n == expected) out else null
  }

  /** Decode every sample as Double, row-major, bands interleaved
    * (chunky). Null when the layout is outside the supported envelope or
    * the payload is inconsistent with its own directory. */
  def readSamples(bytes: Array[Byte]): Array[Double] = readSamples(bytes, 0)

  /** Samples of the `level`-th IFD (overview level / page). */
  def readSamples(bytes: Array[Byte], level: Int): Array[Double] = {
    val parsed = parseIfdAt(bytes, level)
    if (parsed == null) return null
    val (r, ifd) = parsed
    val meta = readMeta(bytes, level)
    if (meta == null) return null
    import meta._
    val comp = compression
    if (comp == 6 || comp == 7) return readSamplesJpeg(bytes, r, ifd, meta)
    if (comp != 1 && comp != 5 && comp != 8 && comp != 32946) return null
    val planar = ifd.long1(284, 1).toInt
    if (planar != 1 && planar != 2) return null
    val predictor = ifd.long1(317, 1).toInt
    if (predictor != 1 && predictor != 2 && predictor != 3) return null
    if (predictor == 2 && sampleFormat == 3) return null // int predictor on floats
    if (predictor == 3 && sampleFormat != 3) return null // float predictor on ints
    val okType = (sampleFormat, bitsPerSample) match {
      case (1 | 2, 8 | 16 | 32) => true
      case (3, 32 | 64) => true
      case _ => false
    }
    if (!okType) return null
    val bytesPer = bitsPerSample / 8
    val le = bytes(0) == 'I'
    val out = new Array[Double](width * height * bands)

    // a decoded block of `bw` x `bh` pixels laid at raster position (x0, y0),
    // carrying `nb` of the raster's bands starting at band `bandLo`
    // (nb = bands for chunky; nb = 1 per plane for planar config 2)
    def place(block: Array[Byte], x0: Int, y0: Int, bw: Int, bh: Int,
        bandLo: Int, nb: Int): Boolean = {
      if (block == null) return false
      val rowBytes = bw * nb * bytesPer
      if (block.length < rowBytes * math.min(bh, height - y0)) return false
      var yy = 0
      while (yy < bh && y0 + yy < height) {
        val ro = yy * rowBytes
        if (predictor == 2) { // horizontal differencing, per band, in-place
          var x = 1
          while (x < bw) {
            var c = 0
            while (c < nb) {
              val cur = ro + (x * nb + c) * bytesPer
              val prev = ro + ((x - 1) * nb + c) * bytesPer
              bitsPerSample match {
                case 8 => block(cur) = ((block(cur) + block(prev)) & 0xff).toByte
                case 16 =>
                  val v = (readInt(block, cur, 2, le) + readInt(block, prev, 2, le)) & 0xffff
                  writeInt(block, cur, 2, le, v.toInt)
                case 32 =>
                  val v = readInt(block, cur, 4, le) + readInt(block, prev, 4, le)
                  writeInt(block, cur, 4, le, v.toInt)
                case _ => return false
              }
              c += 1
            }
            x += 1
          }
        } else if (predictor == 3) {
          // TIFF Technical Note 3 floating-point horizontal differencing:
          // byte-wise delta accumulation with stride = samples-per-pixel,
          // then the row's MSB-first byte planes reassemble into
          // file-byte-order samples.
          var k = ro + nb
          val end = ro + rowBytes
          while (k < end) {
            block(k) = ((block(k) + block(k - nb)) & 0xff).toByte
            k += 1
          }
          val wcount = bw * nb
          val tmp = java.util.Arrays.copyOfRange(block, ro, end)
          var i = 0
          while (i < wcount) {
            var j = 0
            while (j < bytesPer) {
              val plane = if (le) bytesPer - 1 - j else j
              block(ro + i * bytesPer + j) = tmp(plane * wcount + i)
              j += 1
            }
            i += 1
          }
        }
        var x = 0
        while (x < bw && x0 + x < width) {
          var c = 0
          while (c < nb) {
            val so = ro + (x * nb + c) * bytesPer
            val v: Double = (sampleFormat, bitsPerSample) match {
              case (1, _) =>
                (readInt(block, so, bytesPer, le) & ((1L << bitsPerSample) - 1)).toDouble
              case (2, 8) => block(so).toDouble
              case (2, 16) => readInt(block, so, 2, le).toShort.toDouble
              case (2, 32) => readInt(block, so, 4, le).toInt.toDouble
              case (3, 32) => java.lang.Float.intBitsToFloat(readInt(block, so, 4, le).toInt).toDouble
              case (3, 64) =>
                var v2 = 0L
                var i = 0
                while (i < 8) { v2 = (v2 << 8) | (block(if (le) so + 7 - i else so + i) & 0xffL); i += 1 }
                java.lang.Double.longBitsToDouble(v2)
              case _ => return false
            }
            out((y0 + yy) * width * bands + (x0 + x) * bands + (bandLo + c)) = v
            c += 1
          }
          x += 1
        }
        yy += 1
      }
      true
    }

    def segment(off: Long, len: Long, rawLen: Int): Array[Byte] = {
      if (off < 0 || len < 0 || off + len > bytes.length) return null
      if (comp == 1) {
        if (len < rawLen) return null
        java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + rawLen)
      } else if (comp == 5)
        lzwDecode(java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt), rawLen)
      else inflate(java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt), rawLen)
    }

    // planar config 2 stores one segment set per band, plane-major
    // (TIFF 6.0 §14: all strips/tiles of band 0, then band 1, ...)
    val planes = if (planar == 2) bands else 1
    val nbInBlock = if (planar == 2) 1 else bands

    if (tiled) {
      val tw = ifd.long1(322, 0).toInt
      val th = ifd.long1(323, 0).toInt
      if (tw <= 0 || th <= 0) return null
      val offs = ifd.longs(324)
      val lens = ifd.longs(325)
      val tilesAcross = (width + tw - 1) / tw
      val tilesDown = (height + th - 1) / th
      val perPlane = tilesAcross * tilesDown
      if (offs.length < perPlane * planes || lens.length < offs.length) return null
      val rawLen = tw * th * nbInBlock * bytesPer
      var p = 0
      while (p < planes) {
        var t = 0
        while (t < perPlane) {
          val block = segment(offs(p * perPlane + t), lens(p * perPlane + t), rawLen)
          if (!place(block, (t % tilesAcross) * tw, (t / tilesAcross) * th,
              tw, th, if (planar == 2) p else 0, nbInBlock))
            return null
          t += 1
        }
        p += 1
      }
    } else {
      val rps = math.min(ifd.long1(278, 0xffffffffL), height.toLong).toInt
      if (rps <= 0) return null
      val offs = ifd.longs(273)
      val lens = ifd.longs(279)
      val nStrips = (height + rps - 1) / rps
      if (offs.length < nStrips * planes || lens.length < nStrips * planes) return null
      var p = 0
      while (p < planes) {
        var s = 0
        while (s < nStrips) {
          val rows = math.min(rps, height - s * rps)
          val block = segment(offs(p * nStrips + s), lens(p * nStrips + s),
            width * rows * nbInBlock * bytesPer)
          if (!place(block, 0, s * rps, width, rows,
              if (planar == 2) p else 0, nbInBlock)) return null
          s += 1
        }
        p += 1
      }
    }
    out
  }

  /** JPEG-in-TIFF decode (the round-6 out-of-scope tail closed): routes
    * each segment through the from-spec [[graft.multimodal.JpegCodec]] —
    * the two public-spec codecs compose.
    *
    *  - compression 7 (TIFF Tech Note 2, "new-style"): every strip/tile is
    *    a self-contained JPEG stream, optionally with its DQT/DHT tables
    *    factored into the JPEGTables tag (347: SOI + table segments + EOI),
    *    which are spliced back in after each segment's SOI before decoding.
    *  - compression 6 ("old-style", deprecated): only the common
    *    whole-image interchange form (tags 513/514 pointing at one complete
    *    JFIF stream) — the fragmented old-style layouts are null, loudly.
    *
    * 8-bit only (JpegCodec scope); 1 band decodes the luma plane, 3 bands
    * through the YCbCr→RGB path (photometric 6). Per T.81 the IDCT is not
    * bit-exact across decoders — callers comparing against another decoder
    * carry MultimodalSpec's ±2 tolerance; flat (DC-only) blocks whose
    * quantized DC round-trips exactly decode exactly. */
  private def readSamplesJpeg(bytes: Array[Byte], r: Reader, ifd: Ifd,
      meta: Meta): Array[Double] = {
    import meta._
    if (sampleFormat != 1) return null
    // 8-bit rides the DCT family; 12/16-bit ride lossless SOF3 (the
    // DNG/raw shape) or, for 12-bit gray, extended-sequential SOF1
    if (bitsPerSample != 8 && bitsPerSample != 12 && bitsPerSample != 16)
      return null
    if (bands != 1 && bands != 3) return null
    if (ifd.long1(284, 1) != 1) return null // planar not supported
    val photometric = ifd.long1(262, if (bands >= 3) 6 else 1).toInt
    val out = new Array[Double](width * height * bands)

    // decoded JPEG → chunky block at (x0, y0); cropped like place()
    def placeJpeg(jpeg: Array[Byte], x0: Int, y0: Int): Boolean = {
      if (jpeg == null) return false
      // lossless first: no color transform (SOF3 components are stored
      // planes — RGB stays RGB, raw stays raw), any supported precision
      val lf = graft.multimodal.JpegLossless.decode(jpeg)
      if (lf != null) {
        if (lf.precision != bitsPerSample || lf.samples.length != bands)
          return false
        var yy = 0
        while (yy < lf.height && y0 + yy < height) {
          var x = 0
          while (x < lf.width && x0 + x < width) {
            var c = 0
            while (c < bands) {
              out((y0 + yy) * width * bands + (x0 + x) * bands + c) =
                lf.samples(c)(yy * lf.width + x).toDouble
              c += 1
            }
            x += 1
          }
          yy += 1
        }
        return true
      }
      if (bitsPerSample == 12) { // 12-bit DCT: SOF1 grayscale
        if (bands != 1) return false
        val f = graft.multimodal.Jpeg12.decode(jpeg)
        if (f == null) return false
        var yy = 0
        while (yy < f.height && y0 + yy < height) {
          var x = 0
          while (x < f.width && x0 + x < width) {
            out((y0 + yy) * width + x0 + x) = f.plane(yy * f.width + x).toDouble
            x += 1
          }
          yy += 1
        }
        return true
      }
      if (bitsPerSample != 8) return false
      if (bands == 3 && photometric != 6) return false // DCT RGB: out of scope
      val (bw, bh, px) =
        if (bands == 1) {
          val l = graft.multimodal.JpegCodec.decodeLuma(jpeg)
          if (l == null) return false
          (l.width, l.height, l.pixels)
        } else {
          val img = graft.multimodal.JpegCodec.decodeRgb(jpeg)
          if (img == null) return false
          (img.width, img.height, img.pixels)
        }
      var yy = 0
      while (yy < bh && y0 + yy < height) {
        var x = 0
        while (x < bw && x0 + x < width) {
          var c = 0
          while (c < bands) {
            out((y0 + yy) * width * bands + (x0 + x) * bands + c) =
              (px((yy * bw + x) * bands + c) & 0xff).toDouble
            c += 1
          }
          x += 1
        }
        yy += 1
      }
      true
    }

    def segmentBytes(off: Long, len: Long): Array[Byte] = {
      if (off < 0 || len < 2 || off + len > bytes.length) return null
      java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
    }

    if (compression == 6) {
      val off = ifd.long1(513, -1)
      val len = ifd.long1(514, -1)
      if (off < 0 || len <= 0) return null // fragmented old-style: unsupported
      if (placeJpeg(segmentBytes(off, len), 0, 0)) out else null
    } else {
      // JPEGTables (347): SOI + DQT/DHT/... + EOI. Splice its inner
      // segments after each strip/tile's SOI (Tech Note 2 merge rule).
      val tables: Array[Byte] =
        if (!ifd.has(347)) null
        else {
          val e = ifd.longs(347).map(_.toByte)
          if (e.length < 4 || (e(0) & 0xff) != 0xff || (e(1) & 0xff) != 0xd8) null
          else e
        }
      def merged(seg: Array[Byte]): Array[Byte] = {
        if (seg.length < 2 || (seg(0) & 0xff) != 0xff || (seg(1) & 0xff) != 0xd8)
          return null
        if (tables == null) return seg
        val outB = new Array[Byte](tables.length - 4 + seg.length)
        outB(0) = 0xff.toByte; outB(1) = 0xd8.toByte
        System.arraycopy(tables, 2, outB, 2, tables.length - 4) // drop SOI+EOI
        System.arraycopy(seg, 2, outB, tables.length - 2, seg.length - 2)
        outB
      }
      if (tiled) {
        val tw = ifd.long1(322, 0).toInt
        val th = ifd.long1(323, 0).toInt
        if (tw <= 0 || th <= 0) return null
        val offs = ifd.longs(324)
        val lens = ifd.longs(325)
        val tilesAcross = (width + tw - 1) / tw
        val tilesDown = (height + th - 1) / th
        if (offs.length < tilesAcross * tilesDown || lens.length < offs.length) return null
        var t = 0
        while (t < tilesAcross * tilesDown) {
          val seg = segmentBytes(offs(t), lens(t))
          if (seg == null) return null
          if (!placeJpeg(merged(seg), (t % tilesAcross) * tw, (t / tilesAcross) * th))
            return null
          t += 1
        }
        out
      } else {
        val rps = math.min(ifd.long1(278, 0xffffffffL), height.toLong).toInt
        if (rps <= 0) return null
        val offs = ifd.longs(273)
        val lens = ifd.longs(279)
        val nStrips = (height + rps - 1) / rps
        if (offs.length < nStrips || lens.length < nStrips) return null
        var s = 0
        while (s < nStrips) {
          val seg = segmentBytes(offs(s), lens(s))
          if (seg == null) return null
          if (!placeJpeg(merged(seg), 0, s * rps)) return null
          s += 1
        }
        out
      }
    }
  }

  private def readInt(b: Array[Byte], o: Int, n: Int, le: Boolean): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(if (le) o + n - 1 - i else o + i) & 0xffL); i += 1 }
    v
  }
  private def writeInt(b: Array[Byte], o: Int, n: Int, le: Boolean, v: Int): Unit = {
    var i = 0
    while (i < n) {
      b(if (le) o + i else o + n - 1 - i) = ((v >>> (8 * i)) & 0xff).toByte
      i += 1
    }
  }

  /** Per-band stats over the decoded raster: (n, min, max, sum) for
    * `band` (0-based). Null payload/band → null. */
  def bandStats(bytes: Array[Byte], band: Int): Array[Double] =
    bandStats(bytes, band, 0)

  /** Band stats of the `level`-th IFD — reading an overview level instead
    * of the full-resolution raster is the COG trick that lets a 100 TB
    * raster lake answer decimated queries at a fraction of the decode. */
  def bandStats(bytes: Array[Byte], band: Int, level: Int): Array[Double] = {
    val meta = readMeta(bytes, level)
    if (meta == null || band < 0 || band >= meta.bands) return null
    val s = readSamples(bytes, level)
    if (s == null) return null
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var sum = 0.0
    var n = 0L
    var i = band
    while (i < s.length) {
      val v = s(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      n += 1
      i += meta.bands
    }
    Array(n.toDouble, mn, mx, sum)
  }

  // --------------------------------------------------------------- writer
  /** Assemble a JPEG-compressed TIFF from PRE-ENCODED JPEG streams (little-
    * endian, 8-bit, `bands` 1 or 3): the [[readSamplesJpeg]] fixture/sink
    * twin. Layout variants:
    *  - `tileSize > 0`: new-style tiled (compression 7), one JPEG per tile;
    *  - `tileSize == 0, oldStyle = false`: new-style, one full-image JPEG
    *    in a single strip;
    *  - `oldStyle = true`: compression 6 with the whole-image
    *    JPEGInterchangeFormat (513/514) tags.
    * `factorTables = true` splits DQT/DHT segments out of every block into
    * a shared JPEGTables (347) tag — the Tech Note 2 factored form. */
  def writeJpeg(width: Int, height: Int, bands: Int, blocks: Seq[Array[Byte]],
      tileSize: Int = 0, oldStyle: Boolean = false, factorTables: Boolean = false,
      epsg: Int = 0, pixelScale: (Double, Double) = (0.0, 0.0),
      origin: (Double, Double) = (0.0, 0.0), precision: Int = 8): Array[Byte] = {
    require(bands == 1 || bands == 3, s"bands must be 1 or 3: $bands")
    require(precision == 8 || precision == 12 || precision == 16,
      s"precision 8/12/16: $precision")
    require(!(oldStyle && tileSize > 0), "old-style JPEG is whole-image only")
    require(!(oldStyle && factorTables), "old-style JPEG has no JPEGTables")
    if (tileSize > 0) {
      val ta = (width + tileSize - 1) / tileSize
      val td = (height + tileSize - 1) / tileSize
      require(blocks.length == ta * td,
        s"need $ta*$td tiles, got ${blocks.length}")
    } else require(blocks.length == 1, "strip/old-style form takes one stream")

    // optionally factor DQT (FFDB) / DHT (FFC4) segments into a shared
    // tables stream; the per-block remainder keeps everything else
    def splitTables(jpeg: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val tabs = new java.io.ByteArrayOutputStream()
      val rest = new java.io.ByteArrayOutputStream()
      tabs.write(0xff); tabs.write(0xd8)
      rest.write(0xff); rest.write(0xd8)
      var p = 2
      var inScan = false
      while (p < jpeg.length) {
        if (!inScan && (jpeg(p) & 0xff) == 0xff && p + 1 < jpeg.length) {
          val m = jpeg(p + 1) & 0xff
          if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
            rest.write(jpeg, p, 2); p += 2
          } else if (m == 0xd9) { rest.write(jpeg, p, 2); p += 2 }
          else {
            val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
            val segEnd = p + 2 + len
            if (m == 0xdb || m == 0xc4) tabs.write(jpeg, p, 2 + len)
            else rest.write(jpeg, p, 2 + len)
            if (m == 0xda) inScan = true // entropy data follows SOS header
            p = segEnd
          }
        } else { rest.write(jpeg, p, 1); p += 1 }
      }
      tabs.write(0xff); tabs.write(0xd9)
      (tabs.toByteArray, rest.toByteArray)
    }
    val (tables, outBlocks) =
      if (!factorTables) (null, blocks)
      else {
        val split = blocks.map(splitTables)
        (split.head._1, split.map(_._2))
      }

    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      var i = 0; while (i < 4) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def w64d(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0; while (i < 8) { bos.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    bos.write('I'); bos.write('I'); w16(42); w32(8)

    case class T(tag: Int, typ: Int, count: Long, inline: Option[Long],
        size: Int, emit: () => Unit)
    val geo = epsg != 0
    val geoKeys: Array[Int] =
      if (!geo) Array.empty
      else {
        val projected = epsg >= 2000 && epsg != 4326 && epsg < 30000 || epsg >= 32000
        Array(1, 1, 0, 2, 1024, 0, 1, if (projected) 1 else 2,
          if (projected) 3072 else 2048, 0, 1, epsg)
      }
    val tiled = tileSize > 0
    val blockOffsets = new Array[Long](outBlocks.length)
    var tags = scala.collection.mutable.ArrayBuffer[T]()
    def inlineT(tag: Int, typ: Int, v: Long): Unit =
      tags += T(tag, typ, 1, Some(v), 0, null)
    inlineT(256, 4, width)
    inlineT(257, 4, height)
    if (bands == 1) inlineT(258, 3, precision)
    else tags += T(258, 3, bands, None, bands * 2,
      () => (0 until bands).foreach(_ => w16(precision)))
    inlineT(259, 3, if (oldStyle) 6 else 7)
    // lossless-family JPEG (SOF3/7/11/15) carries untransformed component
    // planes, so 3-band lossless blocks are RGB (photometric 2); tagging
    // them YCbCr (6) would make conformant readers apply a YCbCr->RGB
    // conversion and decode wrong colors. Reserve 6 for the DCT family.
    val losslessJpeg = {
      val b = blocks.head
      var i = 2; var found = false
      while (!found && i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m == 0xc3 || m == 0xc7 || m == 0xcb || m == 0xcf) found = true
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i += 2
        else if (m == 0xda) i = b.length
        else i += 2 + (((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff))
      }
      found
    }
    inlineT(262, 3,
      if (bands == 3 && precision == 8 && !losslessJpeg) 6
      else if (bands == 3) 2 else 1)
    inlineT(277, 3, bands)
    if (oldStyle) {
      tags += T(513, 4, 1, None, 4, () => w32(blockOffsets(0)))
      inlineT(514, 4, outBlocks.head.length)
      inlineT(278, 4, height)
    } else if (tiled) {
      inlineT(322, 4, tileSize)
      inlineT(323, 4, tileSize)
      if (outBlocks.length == 1) {
        tags += T(324, 4, 1, None, 4, () => w32(blockOffsets(0)))
        inlineT(325, 4, outBlocks.head.length)
      } else {
        tags += T(324, 4, outBlocks.length, None, outBlocks.length * 4,
          () => blockOffsets.foreach(w32))
        tags += T(325, 4, outBlocks.length, None, outBlocks.length * 4,
          () => outBlocks.foreach(b => w32(b.length)))
      }
    } else {
      inlineT(278, 4, height)
      tags += T(273, 4, 1, None, 4, () => w32(blockOffsets(0)))
      inlineT(279, 4, outBlocks.head.length)
    }
    if (tables != null)
      tags += T(347, 7, tables.length, None, tables.length,
        () => tables.foreach(b => bos.write(b & 0xff)))
    if (geo) {
      tags += T(33550, 12, 3, None, 24,
        () => { w64d(pixelScale._1); w64d(pixelScale._2); w64d(0.0) })
      tags += T(33922, 12, 6, None, 48, () => {
        w64d(0.0); w64d(0.0); w64d(0.0)
        w64d(origin._1); w64d(origin._2); w64d(0.0)
      })
      tags += T(34735, 3, geoKeys.length, None, geoKeys.length * 2,
        () => geoKeys.foreach(w16))
    }
    val sorted = tags.sortBy(_.tag)
    var dataOff = 8 + 2 + sorted.length * 12 + 4
    val valueOffsets = sorted.map { t =>
      if (t.inline.isDefined || t.size <= 4) 0L
      else { val o = dataOff; dataOff += t.size; o.toLong }
    }
    var blockStart = dataOff
    outBlocks.zipWithIndex.foreach { case (b, i) =>
      blockOffsets(i) = blockStart; blockStart += b.length
    }
    w16(sorted.length)
    sorted.zip(valueOffsets).foreach { case (t, vo) =>
      w16(t.tag); w16(t.typ); w32(t.count)
      t.inline match {
        case Some(v) => if (t.typ == 3) { w16(v.toInt); w16(0) } else w32(v)
        case None =>
          if (t.size <= 4) {
            val before = bos.size()
            t.emit()
            var pad = 4 - (bos.size() - before)
            while (pad > 0) { bos.write(0); pad -= 1 }
          } else w32(vo)
      }
    }
    w32(0)
    sorted.zip(valueOffsets).filter(_._2 != 0L).foreach(_._1.emit())
    require(bos.size() == dataOff, s"jpeg writer layout drift: ${bos.size()} vs $dataOff")
    outBlocks.foreach(bos.write)
    bos.toByteArray
  }

  /** Minimal single-IFD GeoTIFF writer for fixtures and sinks: chunky or
    * planar band layout, strip or tile organization, none/LZW/Deflate
    * compression, optional horizontal predictor (2 for ints, TechNote-3
    * float predictor 3 for floats), either byte order, and the GeoKey /
    * pixel-scale / tiepoint trio. Samples are caller-typed doubles. */
  def write(width: Int, height: Int, bands: Int, bitsPerSample: Int,
      sampleFormat: Int, samples: Array[Double], littleEndian: Boolean = true,
      deflate: Boolean = false, tileSize: Int = 0, predictor: Int = 1,
      epsg: Int = 0, pixelScale: (Double, Double) = (0.0, 0.0),
      origin: (Double, Double) = (0.0, 0.0), lzw: Boolean = false,
      planar: Boolean = false, bigTiff: Boolean = false): Array[Byte] = {
    require(!(deflate && lzw), "pick one compression")
    require(samples.length == width * height * bands, "sample count mismatch")
    require(Set(8, 16, 32).contains(bitsPerSample) || (sampleFormat == 3 &&
      Set(32, 64).contains(bitsPerSample)), "unsupported type")
    require(predictor != 2 || sampleFormat != 3, "predictor 2 is for ints")
    require(predictor != 3 || sampleFormat == 3, "predictor 3 is for floats")
    val bytesPer = bitsPerSample / 8
    val le = littleEndian

    // one block carries `nb` bands starting at `bandLo` (all bands for
    // chunky; a single plane's band for planar config 2)
    def encodeBlock(x0: Int, y0: Int, bw: Int, bh: Int, bandLo: Int,
        nb: Int): Array[Byte] = {
      val raw = new Array[Byte](bw * bh * nb * bytesPer)
      var yy = 0
      while (yy < bh) {
        var xx = 0
        while (xx < bw) {
          var c = 0
          while (c < nb) {
            val o = ((yy * bw + xx) * nb + c) * bytesPer
            val x = x0 + xx
            val y = y0 + yy
            val v = if (x < width && y < height)
              samples((y * width + x) * bands + bandLo + c) else 0.0
            (sampleFormat, bitsPerSample) match {
              case (3, 32) =>
                writeInt(raw, o, 4, le, java.lang.Float.floatToIntBits(v.toFloat))
              case (3, 64) =>
                val bits = java.lang.Double.doubleToLongBits(v)
                var i = 0
                while (i < 8) {
                  raw(if (le) o + i else o + 7 - i) = ((bits >>> (8 * i)) & 0xff).toByte
                  i += 1
                }
              case _ => writeInt(raw, o, bytesPer, le, v.toLong.toInt)
            }
            c += 1
          }
          xx += 1
        }
        yy += 1
      }
      if (predictor == 2) {
        var yy2 = 0
        while (yy2 < bh) {
          val ro = yy2 * bw * nb * bytesPer
          var x = bw - 1
          while (x >= 1) {
            var c = 0
            while (c < nb) {
              val cur = ro + (x * nb + c) * bytesPer
              val prev = ro + ((x - 1) * nb + c) * bytesPer
              val d = (readInt(raw, cur, bytesPer, le) - readInt(raw, prev, bytesPer, le)).toInt
              writeInt(raw, cur, bytesPer, le, d)
              c += 1
            }
            x -= 1
          }
          yy2 += 1
        }
      } else if (predictor == 3) {
        // TechNote-3 encode twin: split each row into MSB-first byte
        // planes, then byte-wise difference with stride = samples/pixel
        val rowBytes = bw * nb * bytesPer
        val wcount = bw * nb
        var yy2 = 0
        while (yy2 < bh) {
          val ro = yy2 * rowBytes
          val tmp = new Array[Byte](rowBytes)
          var i = 0
          while (i < wcount) {
            var j = 0
            while (j < bytesPer) {
              val plane = if (le) bytesPer - 1 - j else j
              tmp(plane * wcount + i) = raw(ro + i * bytesPer + j)
              j += 1
            }
            i += 1
          }
          var k = rowBytes - 1
          while (k >= nb) {
            tmp(k) = ((tmp(k) - tmp(k - nb)) & 0xff).toByte
            k -= 1
          }
          System.arraycopy(tmp, 0, raw, ro, rowBytes)
          yy2 += 1
        }
      }
      if (lzw) lzwEncode(raw)
      else if (!deflate) raw
      else {
        val dfl = new java.util.zip.Deflater()
        dfl.setInput(raw)
        dfl.finish()
        val buf = new Array[Byte](raw.length + 64)
        val n = dfl.deflate(buf)
        require(dfl.finished(), "deflate buffer too small")
        dfl.end()
        java.util.Arrays.copyOf(buf, n)
      }
    }

    val tiled = tileSize > 0
    val planeRange = if (planar) 0 until bands else Seq(0)
    val nbPerBlock = if (planar) 1 else bands
    val blocks = if (tiled) {
      val ta = (width + tileSize - 1) / tileSize
      val td = (height + tileSize - 1) / tileSize
      for (p <- planeRange; t <- 0 until ta * td) yield
        encodeBlock((t % ta) * tileSize, (t / ta) * tileSize, tileSize,
          tileSize, p, nbPerBlock)
    } else planeRange.map(p => encodeBlock(0, 0, width, height, p, nbPerBlock))

    // assemble: header + IFD + value arrays + blocks
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      else { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { var i = 0; while (i < 4) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
      else { var i = 3; while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 } }
    def w64d(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      if (le) { var i = 0; while (i < 8) { bos.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 } }
      else { var i = 7; while (i >= 0) { bos.write(((bits >>> (8 * i)) & 0xff).toInt); i -= 1 } }
    }
    def w64(v: Long): Unit =
      if (le) { var i = 0; while (i < 8) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
      else { var i = 7; while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 } }
    // classic: 12-byte entries, 4-byte value fields; BigTIFF (version 43):
    // 20-byte entries, 8-byte counts/offsets/value fields
    val inlineField = if (bigTiff) 8 else 4
    val entrySz = if (bigTiff) 20 else 12
    bos.write(if (le) 'I' else 'M'); bos.write(if (le) 'I' else 'M')
    if (bigTiff) { w16(43); w16(8); w16(0); w64(16) }
    else { w16(42); w32(8) }

    case class Tag(tag: Int, typ: Int, count: Long, inline: Option[Long],
        deferred: Option[() => Unit], deferredSize: Int)
    val geo = epsg != 0
    val geoKeys: Array[Int] =
      if (!geo) Array.empty
      else {
        val projected = epsg >= 2000 && epsg != 4326 && epsg < 30000 || epsg >= 32000
        val model = if (projected) 1 else 2
        val crsKey = if (projected) 3072 else 2048
        Array(1, 1, 0, 2, 1024, 0, 1, model, crsKey, 0, 1, epsg)
      }
    val bpsArr = Array.fill(bands)(bitsPerSample)
    var tags = scala.collection.mutable.ArrayBuffer[Tag]()
    def inlineTag(tag: Int, typ: Int, v: Long, count: Long = 1): Tag =
      Tag(tag, typ, count, Some(v), None, 0)
    tags += inlineTag(256, 4, width)
    tags += inlineTag(257, 4, height)
    if (bands == 1) tags += inlineTag(258, 3, bitsPerSample)
    tags += inlineTag(259, 3, if (lzw) 5 else if (deflate) 8 else 1)
    tags += inlineTag(262, 3, if (bands >= 3) 2 else 1)
    tags += inlineTag(277, 3, bands)
    if (planar) tags += inlineTag(284, 3, 2)
    if (predictor == 2 || predictor == 3) tags += inlineTag(317, 3, predictor)
    if (sampleFormat != 1) tags += inlineTag(339, 3, sampleFormat)
    if (!tiled) tags += inlineTag(278, 4, height)
    // deferred (out-of-line) arrays
    def deferredTag(tag: Int, typ: Int, count: Long, size: Int, wr: () => Unit): Unit =
      tags += Tag(tag, typ, count, None, Some(wr), size)
    if (bands > 1)
      deferredTag(258, 3, bands, bands * 2, () => bpsArr.foreach(w16))
    val offTag = if (tiled) 324 else 273
    val lenTag = if (tiled) 325 else 279
    // block offsets: LONG classic, LONG8 in BigTIFF (the format's point)
    val offTyp = if (bigTiff) 16 else 4
    val offSz = if (bigTiff) 8 else 4
    def wOff(v: Long): Unit = if (bigTiff) w64(v) else w32(v)
    val blockOffsets = new Array[Long](blocks.length)
    if (blocks.length == 1) {
      tags += Tag(offTag, offTyp, 1, None, Some(() => wOff(blockOffsets(0))), offSz)
      tags += inlineTag(lenTag, 4, blocks.head.length)
    } else {
      tags += Tag(offTag, offTyp, blocks.length, None,
        Some(() => blockOffsets.foreach(wOff)), blocks.length * offSz)
      tags += Tag(lenTag, 4, blocks.length, None,
        Some(() => blocks.foreach(bl => w32(bl.length))), blocks.length * 4)
    }
    if (tiled) {
      tags += inlineTag(322, 4, tileSize)
      tags += inlineTag(323, 4, tileSize)
    }
    if (geo) {
      deferredTag(33550, 12, 3, 24,
        () => { w64d(pixelScale._1); w64d(pixelScale._2); w64d(0.0) })
      deferredTag(33922, 12, 6, 48, () => {
        w64d(0.0); w64d(0.0); w64d(0.0)
        w64d(origin._1); w64d(origin._2); w64d(0.0)
      })
      deferredTag(34735, 3, geoKeys.length, geoKeys.length * 2,
        () => geoKeys.foreach(w16))
    }
    val sorted = tags.sortBy(_.tag)
    val ifdStart = if (bigTiff) 16 else 8
    val ifdSize = (if (bigTiff) 8 else 2) + sorted.length * entrySz +
      (if (bigTiff) 8 else 4)
    var dataOff = ifdStart + ifdSize
    val valueOffsets = sorted.map { t =>
      t.inline match {
        case Some(_) => 0L
        case None =>
          val inlineFits = t.deferredSize <= inlineField
          if (inlineFits) 0L
          else { val o = dataOff; dataOff += t.deferredSize; o.toLong }
      }
    }
    var blockStart = dataOff
    blocks.zipWithIndex.foreach { case (bl, i) =>
      blockOffsets(i) = blockStart
      blockStart += bl.length
    }
    // emit IFD
    if (bigTiff) w64(sorted.length) else w16(sorted.length)
    sorted.zip(valueOffsets).foreach { case (t, vo) =>
      w16(t.tag); w16(t.typ)
      if (bigTiff) w64(t.count) else w32(t.count)
      def pad(from: Int): Unit = {
        var p = inlineField - (bos.size() - from)
        while (p > 0) { bos.write(0); p -= 1 }
      }
      t.inline match {
        case Some(v) =>
          // inline value: left-justified in the value field per spec
          val before = bos.size()
          t.typ match {
            case 3 => w16(v.toInt)
            case 16 => w64(v)
            case _ => w32(v)
          }
          pad(before)
        case None =>
          if (t.deferredSize <= inlineField) {
            val before = bos.size()
            t.deferred.get.apply()
            pad(before)
          } else if (bigTiff) w64(vo) else w32(vo)
      }
    }
    if (bigTiff) w64(0) else w32(0) // no next IFD
    // emit deferred arrays in offset order
    sorted.zip(valueOffsets).filter(_._2 != 0L).foreach(_._1.deferred.get.apply())
    require(bos.size() == dataOff, s"writer layout drift: ${bos.size()} vs $dataOff")
    blocks.foreach(bos.write)
    bos.toByteArray
  }
}
