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
}
