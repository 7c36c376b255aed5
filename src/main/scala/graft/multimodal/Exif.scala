package graft.multimodal

/** EXIF metadata for JPEG payloads: the APP1 "Exif" segment is a TIFF
  * (CIPA DC-008 / TIFF 6.0) whose IFD0 carries camera make/model,
  * orientation and timestamps — the fields an image-dedup or
  * provenance-filter pipeline reads before ever decoding pixels
  * (orientation alone decides whether a dHash needs a rotate).
  *
  * From-spec implementation: JPEG marker walk (ITU-T T.81 §B) to APP1,
  * then an endian-aware TIFF IFD walk — both byte orders (II/MM), inline
  * and offset-area values, ExifIFD (0x8769) chained for
  * DateTimeOriginal. Null-on-garbage discipline throughout: any
  * truncation, bad magic, or out-of-bounds offset yields an empty meta,
  * never a throw (the decoder-robustness contract of `multimodal/`).
  *
  * Scale shape: per-row kernel over the binary column — no shuffle.
  */
object Exif {

  case class ExifMeta(make: String, model: String, orientation: Int,
      datetime: String, dt_original: String)

  private val Empty = ExifMeta(null, null, 0, null, null)

  def parse(jpeg: Array[Byte]): ExifMeta = try {
    if (jpeg.length < 4 || (jpeg(0) & 0xff) != 0xff ||
      (jpeg(1) & 0xff) != 0xd8) return Empty
    var i = 2
    while (i + 4 <= jpeg.length) {
      if ((jpeg(i) & 0xff) != 0xff) return Empty
      val marker = jpeg(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return Empty // EOI / SOS
      val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > jpeg.length) return Empty
      if (marker == 0xe1 && len >= 8 + 6 &&
        jpeg(i + 4) == 'E' && jpeg(i + 5) == 'x' && jpeg(i + 6) == 'i' &&
        jpeg(i + 7) == 'f' && jpeg(i + 8) == 0 && jpeg(i + 9) == 0) {
        return parseTiff(jpeg, i + 10, i + 2 + len)
      }
      i += 2 + len
    }
    Empty
  } catch { case _: Throwable => Empty }

  private def parseTiff(b: Array[Byte], base: Int, end: Int): ExifMeta = {
    if (base + 8 > end) return Empty
    val le =
      if (b(base) == 'I' && b(base + 1) == 'I') true
      else if (b(base) == 'M' && b(base + 1) == 'M') false
      else return Empty
    def u16(o: Int): Int =
      if (o + 2 > end) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > end) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(base + 2) != 42) return Empty
    var make: String = null; var model: String = null
    var orient = 0; var dt: String = null; var dtOrig: String = null
    var exifIfd = -1L

    def ascii(count: Long, valOff: Int): String = {
      if (count <= 0 || count > 65536) return null
      val off = if (count <= 4) valOff else base + u32(valOff).toInt
      if (off < base || off + count > end) return null
      var n = count.toInt
      while (n > 0 && b(off + n - 1) == 0) n -= 1 // strip trailing NULs
      new String(b, off, n, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def walk(ifdOff: Long, isExifIfd: Boolean): Unit = {
      val o0 = base + ifdOff.toInt
      val n = u16(o0)
      if (n < 0 || n > 512) return
      var e = 0
      while (e < n) {
        val eo = o0 + 2 + e * 12
        val tag = u16(eo)
        val typ = u16(eo + 2)
        val cnt = u32(eo + 4)
        (tag, isExifIfd) match {
          case (0x010f, false) if typ == 2 => make = ascii(cnt, eo + 8)
          case (0x0110, false) if typ == 2 => model = ascii(cnt, eo + 8)
          case (0x0112, false) if typ == 3 => orient = u16(eo + 8)
          case (0x0132, false) if typ == 2 => dt = ascii(cnt, eo + 8)
          case (0x8769, false) if typ == 4 => exifIfd = u32(eo + 8)
          case (0x9003, true) if typ == 2 => dtOrig = ascii(cnt, eo + 8)
          case _ =>
        }
        e += 1
      }
    }
    val ifd0 = u32(base + 4)
    if (ifd0 < 0 || base + ifd0 + 2 > end) return Empty
    walk(ifd0, isExifIfd = false)
    if (exifIfd > 0 && base + exifIfd + 2 <= end)
      walk(exifIfd, isExifIfd = true)
    ExifMeta(make, model, orient, dt, dtOrig)
  }

  /** Authored fixture: a minimal JPEG (SOI + APP1/Exif + EOI) whose TIFF
    * carries IFD0 {Make, Model, Orientation, DateTime, ExifIFD*} and an
    * ExifIFD {DateTimeOriginal}, in either byte order. Strings are
    * NUL-terminated per spec; >4-byte values live in the offset area. */
  def writeExifJpeg(make: String, model: String, orientation: Int,
      datetime: String, dtOriginal: String,
      littleEndian: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16be(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    // --- TIFF body built first (offsets are TIFF-relative) ---
    val tiff = new java.io.ByteArrayOutputStream()
    def t16(v: Int): Unit =
      if (littleEndian) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def t32(v: Long): Unit =
      if (littleEndian) { tiff.write((v & 0xff).toInt)
        tiff.write(((v >> 8) & 0xff).toInt)
        tiff.write(((v >> 16) & 0xff).toInt)
        tiff.write(((v >> 24) & 0xff).toInt) }
      else { tiff.write(((v >> 24) & 0xff).toInt)
        tiff.write(((v >> 16) & 0xff).toInt)
        tiff.write(((v >> 8) & 0xff).toInt)
        tiff.write((v & 0xff).toInt) }
    val mk = make.getBytes("US-ASCII") :+ 0.toByte
    val md = model.getBytes("US-ASCII") :+ 0.toByte
    val dt = datetime.getBytes("US-ASCII") :+ 0.toByte
    val dto = dtOriginal.getBytes("US-ASCII") :+ 0.toByte
    // layout: header(8) IFD0(2 + 5*12 + 4) exifIFD(2 + 1*12 + 4) data...
    val ifd0Off = 8L
    val exifOff = ifd0Off + 2 + 5 * 12 + 4
    val dataOff = exifOff + 2 + 1 * 12 + 4
    var cur = dataOff
    val mkOff = cur; if (mk.length > 4) cur += mk.length
    val mdOff = cur; if (md.length > 4) cur += md.length
    val dtOff = cur; if (dt.length > 4) cur += dt.length
    val dtoOff = cur
    // header
    if (littleEndian) { tiff.write('I'); tiff.write('I') }
    else { tiff.write('M'); tiff.write('M') }
    t16(42); t32(ifd0Off)
    def asciiEntry(tag: Int, bytes: Array[Byte], off: Long): Unit = {
      t16(tag); t16(2); t32(bytes.length.toLong)
      if (bytes.length <= 4) {
        bytes.foreach(x => tiff.write(x & 0xff))
        (bytes.length until 4).foreach(_ => tiff.write(0))
      } else t32(off)
    }
    // IFD0 (tags ascending per spec)
    t16(5)
    asciiEntry(0x010f, mk, mkOff)
    asciiEntry(0x0110, md, mdOff)
    t16(0x0112); t16(3); t32(1)
    t16(orientation); t16(0) // SHORT value padded to 4 bytes
    asciiEntry(0x0132, dt, dtOff)
    t16(0x8769); t16(4); t32(1); t32(exifOff)
    t32(0) // next IFD
    // ExifIFD
    t16(1)
    asciiEntry(0x9003, dto, dtoOff)
    t32(0)
    // data area (only >4-byte strings land here, in offset order)
    Seq(mk, md, dt, dto).foreach { s =>
      if (s.length > 4) s.foreach(x => tiff.write(x & 0xff))
    }
    // --- wrap in JPEG ---
    val body = tiff.toByteArray
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe1) // APP1
    w16be(2 + 6 + body.length)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(body)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
