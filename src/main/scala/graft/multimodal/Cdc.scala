package graft.multimodal

/** Content-defined chunking (FastCDC, Xia et al., USENIX ATC 2016):
  * boundaries follow CONTENT (a Gear rolling hash hitting a zero mask),
  * not offsets — so inserting bytes near the front of a file shifts every
  * chunk's position but leaves most chunks' CONTENT (and therefore their
  * hashes) intact. That is what makes binary-level dedup of near-identical
  * blobs (re-tarred archives, re-saved PDFs, appended logs) work where
  * fixed-size blocks would re-hash everything after the edit.
  *
  * Normalized chunking per the paper: a stricter mask (`bits+2` zero bits)
  * before the average size discourages tiny chunks, a looser one
  * (`bits-2`) after it discourages oversized ones; `minSize`/`maxSize`
  * are hard bounds. The Gear table derives from splitmix64 on a fixed
  * seed — public arithmetic, deterministic everywhere.
  *
  * Chunk identity is FNV-1a 64 over the chunk's bytes (content hash,
  * independent of the boundary hash), so equal content ⇒ equal chunk
  * hash regardless of position.
  */
object Cdc extends Serializable {

  /** One chunk: byte offset, length, FNV-1a 64 content hash. */
  final case class Chunk(offset: Int, length: Int, hash: Long)

  private val gear: Array[Long] = {
    var x = 0x9e3779b97f4a7c15L // fixed public seed
    Array.fill(256) {
      // splitmix64 step
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  private def fnv1a(data: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (data(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Chunk `data` with FastCDC normalized cut-points. Requirements:
    * `minSize >= 16`, `avgSize` a power of two ≥ 4·minSize is NOT
    * required (the paper's normalization just needs min < avg < max). */
  def chunks(data: Array[Byte], minSize: Int = 64, avgSize: Int = 256,
      maxSize: Int = 1024): Array[Chunk] = {
    require(minSize >= 1 && minSize < avgSize && avgSize < maxSize,
      s"need min < avg < max: $minSize $avgSize $maxSize")
    if (data == null || data.isEmpty) return Array.empty
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(avgSize.toLong)
    val maskS = (1L << (bits + 2)) - 1 // strict: before avg
    val maskL = (1L << math.max(1, bits - 2)) - 1 // loose: after avg
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var start = 0
    while (start < data.length) {
      val remaining = data.length - start
      val end =
        if (remaining <= minSize) start + remaining
        else {
          val hardEnd = start + math.min(remaining, maxSize)
          val normal = start + math.min(remaining, avgSize)
          var h = 0L
          var i = start + minSize
          var cut = -1
          while (cut < 0 && i < hardEnd) {
            h = (h << 1) + gear(data(i) & 0xff)
            val mask = if (i < normal) maskS else maskL
            if ((h & mask) == 0L) cut = i + 1
            i += 1
          }
          if (cut < 0) hardEnd else cut
        }
      out += Chunk(start, end - start, fnv1a(data, start, end - start))
      start = end
    }
    out.toArray
  }

  // SQL-facing accessors (default parameters baked; the Scala API above
  // takes explicit sizes)
  def nChunks(p: Array[Byte]): java.lang.Integer =
    if (p == null) null else Int.box(chunks(p).length)

  /** md5 hex of the concatenated chunk-hash longs (16-hex each, in chunk
    * order) — a whole-blob content fingerprint that is STABLE under
    * chunk-preserving edits only when all chunks match, i.e. an
    * exact-content identity usable for planted-twin contracts. */
  def fingerprint(p: Array[Byte]): String = {
    if (p == null) return null
    val sb = new java.lang.StringBuilder
    chunks(p).foreach(c => sb.append(f"${c.hash}%016x"))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .map(b => f"$b%02x").mkString
  }
}
