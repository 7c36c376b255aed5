package graft.sources

/** TAR and ZIP enumeration/extraction from the public specs — the
  * containers code and document datasets actually ship in (source
  * tarballs, dataset zips). Both parsers are per-blob kernels with the
  * crawl posture: corrupt tails yield the entries parsed so far.
  *
  *  - TAR (POSIX ustar): 512-byte headers — name at 0 (100 B,
  *    NUL-padded), size at 124 (12 B octal), typeflag at 156; data padded
  *    to 512. Long names via the ustar prefix field (345, 155 B).
  *  - ZIP (APPNOTE.TXT): walk LOCAL file headers (PK\x03\x04) — name and
  *    sizes from each header, payload stored (method 0) or deflated
  *    (method 8, raw `Inflater`). Data-descriptor entries (bit 3: sizes
  *    deferred) are skipped honestly — they need the central directory of
  *    a seekable file, not a streamed blob.
  */
object Archives extends Serializable {

  /** One archive member: path, uncompressed size, and content (null when
    * the member is a directory or could not be extracted). */
  final case class Entry(path: String, size: Long, content: Array[Byte])

  // ---- TAR --------------------------------------------------------------

  def tarEntries(blobIn: Array[Byte]): Array[Entry] = {
    // .tar.gz / .tar.zst / .tar.xz / .tar.bz2 / .tar.lz4 unwrap first
    val blob =
      try Codecs.decompress(blobIn)
      catch { case _: Exception => return Array.empty }
    if (blob == null || blob.length < 512) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    try {
      while (pos + 512 <= blob.length) {
        if (blob(pos) == 0) return out.toArray // end-of-archive zero block
        val name0 = cstr(blob, pos, 100)
        val prefix = if (isUstar(blob, pos)) cstr(blob, pos + 345, 155) else ""
        val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
        val size = java.lang.Long.parseLong(
          cstr(blob, pos + 124, 12).trim, 8)
        val typeflag = blob(pos + 156).toChar
        val dataStart = pos + 512
        if (size < 0 || dataStart + size > blob.length) return out.toArray
        val content =
          if (typeflag == '0' || typeflag == 0.toChar)
            java.util.Arrays.copyOfRange(blob, dataStart, (dataStart + size).toInt)
          else null // directories, links, extensions: enumerated, not extracted
        out += Entry(name, size, content)
        pos = dataStart + (((size + 511) / 512) * 512).toInt
      }
      out.toArray
    } catch { case _: Exception => out.toArray }
  }

  private def isUstar(b: Array[Byte], base: Int): Boolean =
    b(base + 257) == 'u' && b(base + 258) == 's' && b(base + 259) == 't' &&
      b(base + 260) == 'a' && b(base + 261) == 'r'

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val max = off + len
    while (e < max && b(e) != 0) e += 1
    new String(b, off, e - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** From-spec ustar writer for fixtures: (path, bytes) members. */
  def writeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (path, data) =>
      val h = new Array[Byte](512)
      val nameB = path.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(nameB.length <= 100, s"fixture name too long: $path")
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val pad = "0" * (len - 1 - s.length) + s
        System.arraycopy(pad.getBytes, 0, h, off, len - 1)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8) // uid/gid
      oct(data.length, 124, 12)
      oct(0, 136, 12) // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
      h(156) = '0'
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(263) = '0'; h(264) = '0'
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy(csPad.getBytes, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  // ---- ZIP --------------------------------------------------------------

  /** ZIP entries. Strategy: prefer the CENTRAL DIRECTORY (found via the
    * end-of-central-directory record in the final 64 KB) — it carries
    * authoritative sizes even for data-descriptor entries, which is how
    * real-world streamed zips (java's ZipOutputStream with DEFLATED, most
    * zip tools) are written. A blob whose tail is cut falls back to the
    * local-header walk, which recovers every entry with in-header sizes
    * (bit 3 clear) before the corruption point. */
  def zipEntries(blob: Array[Byte]): Array[Entry] = {
    if (blob == null || blob.length < 22) return Array.empty
    try {
      val viaCd = zipViaCentralDirectory(blob)
      if (viaCd != null) viaCd else zipViaLocalWalk(blob)
    } catch { case _: Exception => zipViaLocalWalk(blob) }
  }

  private def zipViaCentralDirectory(blob: Array[Byte]): Array[Entry] = {
    // EOCD signature scan from the end (covers trailing comments)
    var e = blob.length - 22
    val floor = math.max(0, blob.length - 22 - 65535)
    while (e >= floor && u32(blob, e) != 0x06054b50L) e -= 1
    if (e < floor) return null
    var n: Long = u16(blob, e + 10)
    var cdOff: Long = u32(blob, e + 16)
    // ZIP64 (APPNOTE 4.3.14-15): a maxed EOCD field defers to the zip64
    // EOCD record, found through its 20-byte locator sitting immediately
    // before the EOCD. Archives >4 GB or >65,535 entries — routine at
    // dataset scale — are unreadable without this.
    if (n == 0xffff || cdOff == 0xffffffffL) {
      val loc = e - 20
      if (loc >= 0 && u32(blob, loc) == 0x07064b50L) {
        val z64 = u64(blob, loc + 8)
        if (z64 >= 0 && z64 + 56 <= blob.length &&
          u32(blob, z64.toInt) == 0x06064b50L) {
          n = u64(blob, z64.toInt + 32)
          cdOff = u64(blob, z64.toInt + 48)
        }
      }
    }
    if (cdOff < 0 || cdOff + 46 > blob.length) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = cdOff.toInt
    var i = 0L
    while (i < n) {
      if (pos + 46 > blob.length || u32(blob, pos) != 0x02014b50L)
        return out.toArray
      val method = u16(blob, pos + 10)
      var csize = u32(blob, pos + 20)
      var usize = u32(blob, pos + 24)
      val nameLen = u16(blob, pos + 28)
      val extraLen = u16(blob, pos + 30)
      val commentLen = u16(blob, pos + 32)
      var lho = u32(blob, pos + 42)
      // ZIP64 extended info (extra id 0x0001): 8-byte fields present only
      // for the maxed 32-bit values, in usize, csize, lho order
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL) {
        var x = pos + 46 + nameLen
        val xEnd = math.min(x + extraLen, blob.length)
        var found = false
        while (!found && x + 4 <= xEnd) {
          val id = u16(blob, x)
          val sz = u16(blob, x + 2)
          if (id == 0x0001) {
            var f = x + 4
            val fEnd = math.min(x + 4 + sz, xEnd)
            if (usize == 0xffffffffL && f + 8 <= fEnd) { usize = u64(blob, f); f += 8 }
            if (csize == 0xffffffffL && f + 8 <= fEnd) { csize = u64(blob, f); f += 8 }
            if (lho == 0xffffffffL && f + 8 <= fEnd) { lho = u64(blob, f) }
            found = true
          } else x += 4 + sz
        }
      }
      val name = new String(blob, pos + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header gives the true data offset (its name/extra lengths
      // can differ from the central directory's)
      var content: Array[Byte] = null
      if (!name.endsWith("/") && lho + 30 <= blob.length &&
        u32(blob, lho.toInt) == 0x04034b50L) {
        val lNameLen = u16(blob, lho.toInt + 26)
        val lExtraLen = u16(blob, lho.toInt + 28)
        val dataStart = lho + 30 + lNameLen + lExtraLen
        if (dataStart + csize <= blob.length) {
          val raw = java.util.Arrays.copyOfRange(blob, dataStart.toInt,
            (dataStart + csize).toInt)
          content =
            if (method == 0) raw
            else if (method == 8) inflateRaw(raw, usize.toInt)
            else null
        }
      }
      out += Entry(name, usize, content)
      pos += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.toArray
  }

  private def zipViaLocalWalk(blob: Array[Byte]): Array[Entry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    try {
      while (pos + 30 <= blob.length &&
        u32(blob, pos) == 0x04034b50L) {
        val flags = u16(blob, pos + 6)
        val method = u16(blob, pos + 8)
        val csize = u32(blob, pos + 18)
        val usize = u32(blob, pos + 22)
        val nameLen = u16(blob, pos + 26)
        val extraLen = u16(blob, pos + 28)
        val name = new String(blob, pos + 30, nameLen,
          java.nio.charset.StandardCharsets.UTF_8)
        val dataStart = pos + 30 + nameLen + extraLen
        if ((flags & 0x8) != 0) return out.toArray // streamed sizes: honest stop
        if (dataStart + csize > blob.length) return out.toArray
        val raw = java.util.Arrays.copyOfRange(blob, dataStart,
          (dataStart + csize).toInt)
        val content: Array[Byte] =
          if (name.endsWith("/")) null
          else if (method == 0) raw
          else if (method == 8) inflateRaw(raw, usize.toInt)
          else null // other methods: enumerated, not extracted
        out += Entry(name, usize, content)
        pos = (dataStart + csize).toInt
      }
      out.toArray
    } catch { case _: Exception => out.toArray }
  }

  private def inflateRaw(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return null
        off += n
      }
      if (off == expected) out else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)
}
