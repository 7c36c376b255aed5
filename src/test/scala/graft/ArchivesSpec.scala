package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Archives

class ArchivesSpec extends AnyFunSuite {

  test("tar: round-trip, padding, terminator; system tar reads our output") {
    val members = Seq(
      ("a.txt", "hello".getBytes),
      ("dir/deeper/file.bin", Array.tabulate(700)(i => (i % 251).toByte)),
      ("empty", Array.empty[Byte]))
    val tar = Archives.writeTar(members)
    val es = Archives.tarEntries(tar)
    assert(es.map(_.path).toSeq == members.map(_._1))
    assert(es.map(_.size).toSeq == members.map(_._2.length.toLong))
    es.zip(members).foreach { case (e, (_, b)) =>
      assert(java.util.Arrays.equals(e.content, b))
    }
    // independent reader: the system tar (skip silently if absent)
    val tarBin = new java.io.File("/usr/bin/tar")
    if (tarBin.exists) {
      val f = java.io.File.createTempFile("graft", ".tar")
      java.nio.file.Files.write(f.toPath, tar)
      val out = new StringBuilder
      val rc = scala.sys.process.Process(Seq("/usr/bin/tar", "-tf", f.getPath))
        .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      assert(rc == 0, s"system tar rejected our ustar output:\n$out")
      assert(out.toString.split("\n").toSeq == members.map(_._1),
        s"system tar listing differs:\n$out")
      f.delete()
    }
  }

  test("zip: JDK-written stored + hand-authored deflated entries extract") {
    // stored via the real ZipOutputStream
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val body = "zip content body".getBytes
    val e = new java.util.zip.ZipEntry("x/y.txt")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(body.length)
    val crc = new java.util.zip.CRC32(); crc.update(body); e.setCrc(crc.getValue)
    z.putNextEntry(e); z.write(body); z.closeEntry(); z.close()
    val stored = Archives.zipEntries(bos.toByteArray)
    assert(stored.length == 1 && stored(0).path == "x/y.txt" &&
      new String(stored(0).content) == "zip content body")
    // deflated with sizes in the local header (bit 3 clear): author by hand
    val raw = ("deflate me " * 20).getBytes
    val defl = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](4096)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val name = "d.txt".getBytes
    val h = java.nio.ByteBuffer.allocate(30 + name.length + defl.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    h.putInt(0x04034b50); h.putShort(20); h.putShort(0); h.putShort(8)
    h.putShort(0); h.putShort(0); h.putInt(0) // time/date/crc (unchecked)
    h.putInt(defl.length); h.putInt(raw.length)
    h.putShort(name.length.toShort); h.putShort(0)
    h.put(name); h.put(defl)
    val ds = Archives.zipEntries(h.array())
    assert(ds.length == 1 && java.util.Arrays.equals(ds(0).content, raw),
      s"deflated extract: ${ds.toSeq.map(_.path)}")
  }

  test("zip: DEFLATED via real ZipOutputStream (data descriptors) extracts") {
    // the common real-world form: streamed DEFLATED entries whose sizes
    // live only in data descriptors + the central directory
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val bodies = Seq("first entry body " * 10, "second!").map(_.getBytes)
    bodies.zipWithIndex.foreach { case (b, i) =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"f$i.txt"))
      z.write(b); z.closeEntry()
    }
    z.close()
    val es = Archives.zipEntries(bos.toByteArray)
    assert(es.length == 2, s"got ${es.map(_.path).toSeq}")
    es.zip(bodies).foreach { case (e, b) =>
      assert(java.util.Arrays.equals(e.content, b), e.path)
    }
    // a cut tail (no central directory) falls back to the local walk:
    // bit-3 entries stop honestly, nothing throws
    val cut = bos.toByteArray.take(bos.size - 30)
    Archives.zipEntries(cut)
  }

  test("corrupt tails and junk yield parsed prefixes, never throw") {
    val tar = Archives.writeTar(Seq(("a", "xx".getBytes), ("b", "yy".getBytes)))
    (1 until 20).foreach { i =>
      val cut = tar.take(math.max(1, tar.length * i / 20))
      Archives.tarEntries(cut) // must not throw
    }
    Archives.tarEntries(Array.fill(2000)('j'.toByte)) // must not throw
    assert(Archives.zipEntries("PK no real header".getBytes).isEmpty)
    assert(Archives.tarEntries(null).isEmpty && Archives.zipEntries(null).isEmpty)
  }

  test("codecs: every wrapping round-trips; tar/warc read them transparently") {
    import graft.sources.{Codecs, Warc}
    val body = Array.tabulate(5000)(i => (i * 31 % 251).toByte)
    for (c <- Seq("gzip", "zstd", "xz", "lz4", "bzip2")) {
      val z = Codecs.compress(body, c)
      assert(Codecs.sniff(z) == c, s"sniff($c)")
      assert(java.util.Arrays.equals(Codecs.decompress(z), body), c)
    }
    assert(Codecs.sniff(body) == "none")
    assert(Codecs.decompress(body) eq body) // pass-through, no copy
    // tar.zst through tarEntries
    val tar = Archives.writeTar(Seq(("a.txt", "hello".getBytes)))
    val es = Archives.tarEntries(Codecs.compress(tar, "zstd"))
    assert(es.length == 1 && new String(es(0).content) == "hello")
    // warc.xz through Warc.parse
    val warc = Warc.write(Seq(("response", "http://x/p", 200, "text/plain",
      "w body".getBytes)))
    val recs = Warc.parse(Codecs.compress(warc, "xz"))
    assert(recs.exists(r => r.warcType == "response" &&
      new String(r.body) == "w body"))
    // the decompression-bomb cap throws instead of inflating
    val bomb = Codecs.compress(new Array[Byte](1 << 20), "gzip")
    intercept[java.io.IOException](Codecs.decompress(bomb, maxOut = 1000))
    // corrupt compressed tails still yield empty, never throw, via callers
    val cut = java.util.Arrays.copyOf(Codecs.compress(tar, "xz"), 20)
    Archives.tarEntries(cut) // no-throw contract
  }

  test("zip64: JDK-forced (>65535 entries) archive reads every entry") {
    // past 65,535 entries the JDK writes a zip64 EOCD record + locator and
    // maxes the EOCD count field — without the zip64 path the reader sees
    // 65,535 of 70,000
    val n = 70000
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    (0 until n).foreach { i =>
      val b = s"c$i".getBytes
      val e = new java.util.zip.ZipEntry(f"e$i%06d")
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(b.length)
      val crc = new java.util.zip.CRC32(); crc.update(b)
      e.setCrc(crc.getValue)
      z.putNextEntry(e); z.write(b); z.closeEntry()
    }
    z.close()
    val es = Archives.zipEntries(bos.toByteArray)
    assert(es.length == n, s"zip64 count: ${es.length}")
    for (i <- Seq(0, 1, 65534, 65535, 65536, n - 1)) {
      assert(es(i).path == f"e$i%06d")
      assert(new String(es(i).content) == s"c$i", es(i).path)
    }
  }

  test("zip64: per-entry extended-info extra field (maxed 32-bit CD sizes)") {
    // hand-authored from APPNOTE 4.5.3: one STORED member whose central
    // directory sizes and local-header offset are all 0xFFFFFFFF, the real
    // values living in a zip64 extra field (usize, csize, lho order)
    val body = "zip64 extra body".getBytes
    val name = "x.bin".getBytes
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w64(v: Long): Unit = (0 until 8).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    // local header (true sizes — the reader takes data offsets from here)
    w32(0x04034b50L); w16(20); w16(0); w16(0); w16(0); w16(0); w32(0)
    w32(body.length); w32(body.length); w16(name.length); w16(0)
    out.write(name); out.write(body)
    val cdStart = out.size
    // central directory entry with maxed fields + zip64 extra (id 0x0001)
    w32(0x02014b50L); w16(45); w16(45); w16(0); w16(0); w16(0); w16(0); w32(0)
    w32(0xffffffffL); w32(0xffffffffL) // csize, usize -> deferred
    w16(name.length); w16(4 + 24); w16(0); w16(0); w16(0); w32(0)
    w32(0xffffffffL) // local header offset -> deferred
    out.write(name)
    w16(0x0001); w16(24); w64(body.length); w64(body.length); w64(0L) // usize, csize, lho
    val cdLen = out.size - cdStart
    // EOCD with maxed count/offset + zip64 EOCD record + locator
    val z64Start = out.size
    w32(0x06064b50L); w64(44); w16(45); w16(45); w32(0); w32(0)
    w64(1); w64(1); w64(cdLen); w64(cdStart)
    w32(0x07064b50L); w32(0); w64(z64Start); w32(1)
    w32(0x06054b50L); w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0)
    val es = Archives.zipEntries(out.toByteArray)
    assert(es.length == 1, s"zip64 extra entries: ${es.length}")
    assert(es(0).path == "x.bin" && es(0).size == body.length)
    assert(java.util.Arrays.equals(es(0).content, body), "zip64 extra content")
  }
}
