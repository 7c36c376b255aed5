package graft.multimodal

/** Zero-dependency GIF87a/89a decoder (first frame) from the public GIF
  * specification: logical screen descriptor, global/local color tables,
  * variable-width LZW decompression of the index stream, optional
  * interlaced row order, GCE transparency ignored (first frame's RGB is
  * returned as-is). Completes the raster surface next to PngCodec /
  * JpegCodec / decodeBmp.
  */
object GifCodec extends Serializable {

  /** Decode the first image of a GIF to RGB; null when not decodable. */
  def decode(p: Array[Byte]): PngCodec.Image = {
    if (p == null || p.length < 13) return null
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    try {
      def u16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      var pos = 6
      pos += 4 // logical screen w/h (frame uses its own descriptor)
      val packed = p(pos) & 0xff
      pos += 3 // packed + bg color + aspect
      var globalTable: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        globalTable = java.util.Arrays.copyOfRange(p, pos, pos + n * 3)
        pos += n * 3
      }
      // walk blocks to the first image descriptor
      while (pos < p.length) {
        (p(pos) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            pos += 2
            while ((p(pos) & 0xff) != 0) pos += 1 + (p(pos) & 0xff)
            pos += 1
          case 0x2c => // image descriptor
            val left = u16(pos + 1); val top = u16(pos + 3)
            val w = u16(pos + 5); val h = u16(pos + 7)
            val ip = p(pos + 9) & 0xff
            pos += 10
            if (w <= 0 || h <= 0 || left != 0 || top != 0 ||
              w.toLong * h * 3 > 256L * 1024 * 1024) return null
            var table = globalTable
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              table = java.util.Arrays.copyOfRange(p, pos, pos + n * 3)
              pos += n * 3
            }
            if (table == null) return null
            val interlaced = (ip & 0x40) != 0
            val minCode = p(pos) & 0xff
            pos += 1
            // concatenate the LZW sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while ((p(pos) & 0xff) != 0) {
              val n = p(pos) & 0xff
              data.write(p, pos + 1, n)
              pos += 1 + n
            }
            val indices = lzw(data.toByteArray, minCode, w * h)
            if (indices == null) return null
            val out = new Array[Byte](w * h * 3)
            // interlace passes: rows 0,8.. then 4,8.. then 2,4.. then 1,2..
            val rowOrder: Seq[Int] =
              if (!interlaced) 0 until h
              else (0 until h by 8) ++ (4 until h by 8) ++
                (2 until h by 4) ++ (1 until h by 2)
            var src = 0
            rowOrder.foreach { y =>
              var x = 0
              while (x < w) {
                val idx = indices(src) & 0xff
                if (idx * 3 + 2 >= table.length) return null
                val d = (y * w + x) * 3
                out(d) = table(idx * 3)
                out(d + 1) = table(idx * 3 + 1)
                out(d + 2) = table(idx * 3 + 2)
                src += 1
                x += 1
              }
            }
            return PngCodec.Image(w, h, 3, out)
          case 0x3b => return null // trailer before any image
          case _ => return null
        }
      }
      null
    } catch { case _: Exception => null }
  }

  /** GIF-variant LZW: variable code width from minCode+1 up to 12 bits,
    * clear/eoi codes, codes packed LSB-first. Returns exactly `expect`
    * indices or null. */
  private def lzw(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    if (minCode < 2 || minCode > 11) return null
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](expect)
    var outPos = 0
    // dictionary: prefix pointer + appended byte; entries below clear are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var pos = 0
    val stack = new Array[Byte](4096)
    while (outPos < expect) {
      while (nBits < width) {
        if (pos >= data.length) return null
        acc |= (data(pos) & 0xffL) << nBits
        nBits += 8
        pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outPos == expect) out else null
      } else {
        if (code > next || (code == next && prev < 0)) return null
        var sp = 0
        var cur = if (code == next) {
          // KwKwK case: emit prev + first(prev)
          var c = prev
          while (c >= clear) c = prefix(c) // find first byte
          stack(sp) = c.toByte; sp += 1
          prev
        } else code
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        val first = cur.toByte
        stack(sp) = first; sp += 1
        // pop the stack into the output
        while (sp > 0) {
          sp -= 1
          if (outPos < expect) { out(outPos) = stack(sp); outPos += 1 }
        }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }
}
