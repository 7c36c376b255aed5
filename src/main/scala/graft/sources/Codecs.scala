package graft.sources

/** Transparent blob decompression for container sources ([[Warc]],
  * [[Archives]]): dataset distributions wrap the same tar/WARC bytes in
  * gzip, zstd, xz, lz4, or bzip2 depending on who published them, and a
  * crawl pipeline should not care. Magic-sniffed; every codec comes from
  * a library ALREADY on Spark's own classpath (java.util.zip, zstd-jni,
  * xz, lz4-java, commons-compress) — no new dependency.
  *
  * `maxOut` caps decompression bombs: a blob that inflates past the cap
  * throws (callers translate to their loud-null/empty posture) instead of
  * taking an executor down with it.
  */
object Codecs extends Serializable {

  /** Codec name by magic: "gzip" | "zstd" | "xz" | "lz4" | "bzip2" |
    * "none" (no known magic). */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 6) return "none"
    def u(i: Int) = b(i) & 0xff
    if (u(0) == 0x1f && u(1) == 0x8b) "gzip"
    else if (u(0) == 0x28 && u(1) == 0xb5 && u(2) == 0x2f && u(3) == 0xfd) "zstd"
    else if (u(0) == 0xfd && u(1) == 0x37 && u(2) == 0x7a && u(3) == 0x58 &&
      u(4) == 0x5a && u(5) == 0x00) "xz"
    else if (u(0) == 0x04 && u(1) == 0x22 && u(2) == 0x4d && u(3) == 0x18) "lz4"
    else if (u(0) == 'B' && u(1) == 'Z' && u(2) == 'h' &&
      u(3) >= '1' && u(3) <= '9') "bzip2"
    else "none"
  }

  /** Decompress a known-magic blob (pass-through for "none"). Gzip and
    * zstd consume CONCATENATED members/frames — the per-record layout
    * WARC conventionally uses. Throws on corrupt input or past `maxOut`. */
  def decompress(b: Array[Byte], maxOut: Long = 1L << 30): Array[Byte] = {
    val codec = sniff(b)
    if (codec == "none") return b
    val bis = new java.io.ByteArrayInputStream(b)
    val in: java.io.InputStream = codec match {
      case "gzip" => new java.util.zip.GZIPInputStream(bis, 1 << 16)
      case "zstd" =>
        val z = new com.github.luben.zstd.ZstdInputStream(bis)
        z.setContinuous(true) // concatenated frames, the WARC layout
        z
      case "xz" => new org.tukaani.xz.XZInputStream(bis)
      case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(bis)
      case "bzip2" =>
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(bis, true)
      case _ => bis
    }
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(b.length.toLong * 4, 1L << 20).toInt)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) {
        if (out.size.toLong + n > maxOut)
          throw new java.io.IOException(s"decompressed past $maxOut bytes")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  // ---- fixture writers (tests/gates author one blob per codec) ----------

  def compress(b: Array[Byte], codec: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out: java.io.OutputStream = codec match {
      case "gzip" => new java.util.zip.GZIPOutputStream(bos)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(bos)
      case "xz" => new org.tukaani.xz.XZOutputStream(bos,
        new org.tukaani.xz.LZMA2Options())
      case "lz4" => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case "bzip2" =>
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
      case _ => throw new IllegalArgumentException(s"codec: $codec")
    }
    out.write(b)
    out.close()
    bos.toByteArray
  }
}
