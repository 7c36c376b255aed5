package graft.sources

/** WARC (Web ARChive, ISO 28500 — the format Common Crawl ships in) from
  * the public spec: version line, CRLF-terminated named headers, a
  * Content-Length payload block, CRLF CRLF record separator. Response
  * records additionally carry an HTTP/1.x message whose status line,
  * headers, and entity body are split out — the entity body is the web
  * page a text pipeline actually wants.
  *
  * Compression: WARC files are conventionally one gzip MEMBER PER RECORD,
  * concatenated; gzip and zstd readers consume concatenated members/frames
  * natively, so `parse` transparently handles `.warc`, `.warc.gz`, and any
  * other [[Codecs]]-sniffed wrapping (zstd/xz/lz4/bzip2) alike.
  *
  * Scale shape: parsing is a per-blob kernel (expression/mapPartitions
  * over binary payloads — one task per archive segment, the Common Crawl
  * layout); nothing here touches Spark. Malformed input returns the
  * records parsed so far — an archive with a corrupt tail still yields
  * its good prefix, the posture crawl processing needs. */
object Warc extends Serializable {

  /** One WARC record. For `warcType == "response"`, `httpStatus` /
    * `httpContentType` / `body` describe the embedded HTTP message
    * (entity body only); for other types `body` is the raw block and
    * httpStatus is 0. */
  final case class WarcRecord(warcType: String, targetUri: String,
      contentLength: Long, httpStatus: Int, httpContentType: String,
      body: Array[Byte])

  /** Parse a `.warc` / `.warc.gz` / `.warc.zst` (any [[Codecs]] magic)
    * blob into its records. */
  def parse(blob: Array[Byte]): Array[WarcRecord] = {
    if (blob == null || blob.length < 4) return Array.empty
    val data =
      try Codecs.decompress(blob)
      catch { case _: Exception => return Array.empty }
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    try {
      while (pos < data.length) {
        // skip inter-record CRLFs
        while (pos < data.length &&
          (data(pos) == '\r' || data(pos) == '\n')) pos += 1
        if (pos >= data.length) return out.toArray
        val (version, p1) = readLine(data, pos)
        if (!version.startsWith("WARC/")) return out.toArray
        pos = p1
        var warcType = ""; var uri = ""; var clen = -1L
        var line = ""
        var cont = true
        while (cont) {
          val (l, np) = readLine(data, pos)
          pos = np; line = l
          if (l.isEmpty) cont = false
          else {
            val c = l.indexOf(':')
            if (c > 0) {
              val k = l.substring(0, c).trim.toLowerCase
              val v = l.substring(c + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" => clen = v.toLong
                case _ => ()
              }
            }
          }
        }
        if (clen < 0 || pos + clen > data.length) return out.toArray
        val block = java.util.Arrays.copyOfRange(data, pos, (pos + clen).toInt)
        pos = (pos + clen).toInt
        if (warcType == "response" && startsWithHttp(block)) {
          val (status, ctype, body) = splitHttp(block)
          out += WarcRecord(warcType, uri, clen, status, ctype, body)
        } else out += WarcRecord(warcType, uri, clen, 0, "", block)
      }
      out.toArray
    } catch { case _: Exception => out.toArray }
  }

  private def readLine(d: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i < d.length && d(i) != '\n') i += 1
    val end = if (i > from && d(i - 1) == '\r') i - 1 else i
    (new String(d, from, end - from,
      java.nio.charset.StandardCharsets.UTF_8),
      math.min(i + 1, d.length))
  }

  private def startsWithHttp(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 'H' && b(1) == 'T' && b(2) == 'T' && b(3) == 'P'

  private def splitHttp(b: Array[Byte]): (Int, String, Array[Byte]) = {
    val (statusLine, p0) = readLine(b, 0)
    val status = statusLine.split(" ").lift(1).flatMap(s =>
      scala.util.Try(s.toInt).toOption).getOrElse(0)
    var pos = p0
    var ctype = ""
    var cont = true
    while (cont && pos < b.length) {
      val (l, np) = readLine(b, pos)
      pos = np
      if (l.isEmpty) cont = false
      else {
        val c = l.indexOf(':')
        if (c > 0 && l.substring(0, c).trim.equalsIgnoreCase("content-type"))
          ctype = l.substring(c + 1).trim
      }
    }
    (status, ctype, java.util.Arrays.copyOfRange(b, pos, b.length))
  }

  // SQL accessors
  def recordCount(blob: Array[Byte]): java.lang.Integer =
    Int.box(parse(blob).length)

  // ---- fixture writer ---------------------------------------------------

  /** Author a WARC blob: (type, uri, httpStatus, contentType, body) per
    * record; response records wrap the body in an HTTP/1.1 message.
    * `gzipPerRecord` emits the conventional one-member-per-record form. */
  def write(records: Seq[(String, String, Int, String, Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (wtype, uri, status, ctype, body) =>
      val block: Array[Byte] =
        if (wtype == "response") {
          val head = s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n"
          head.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ body
        } else body
      val rec = new java.io.ByteArrayOutputStream()
      val hdr = s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        s"Content-Length: ${block.length}\r\n\r\n"
      rec.write(hdr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      rec.write(block)
      rec.write("\r\n\r\n".getBytes)
      if (gzipPerRecord) {
        val gz = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(rec.toByteArray); g.close()
        out.write(gz.toByteArray)
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }
}
