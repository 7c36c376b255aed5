package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {

  private def mk(gzip: Boolean) = Warc.write(Seq(
    ("warcinfo", "", 0, "", "software: test".getBytes),
    ("response", "http://a.com/", 200, "text/html",
      "<html>hello</html>".getBytes),
    ("request", "http://a.com/", 0, "", "GET / HTTP/1.1".getBytes),
    ("response", "http://b.com/x", 404, "text/plain", "nope".getBytes)),
    gzipPerRecord = gzip)

  test("round-trip: plain and gzip-per-record forms parse identically") {
    for (gz <- Seq(false, true)) {
      val rs = Warc.parse(mk(gz))
      assert(rs.length == 4, s"gz=$gz got ${rs.length}")
      assert(rs.map(_.warcType).toSeq ==
        Seq("warcinfo", "response", "request", "response"))
      assert(new String(rs(1).body) == "<html>hello</html>")
      assert(rs(1).httpStatus == 200 && rs(1).httpContentType == "text/html")
      assert(rs(3).httpStatus == 404 && new String(rs(3).body) == "nope")
      // non-response records carry the raw block, status 0
      assert(rs(2).httpStatus == 0 &&
        new String(rs(2).body) == "GET / HTTP/1.1")
      assert(rs(1).targetUri == "http://a.com/")
    }
  }

  test("corrupt tail yields the good prefix; garbage yields empty") {
    val whole = mk(false)
    // cut inside the LAST record's payload: first records must survive
    val cut = whole.take(whole.length - 6)
    val rs = Warc.parse(cut)
    assert(rs.length >= 2 && rs.map(_.warcType).take(2).toSeq ==
      Seq("warcinfo", "response"))
    assert(Warc.parse("not a warc at all".getBytes).isEmpty)
    assert(Warc.parse(Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2)).isEmpty)
    assert(Warc.parse(null).isEmpty)
    // truncation sweep never throws
    (1 until 20).foreach(i => Warc.parse(whole.take(whole.length * i / 20)))
  }

  test("binary bodies survive byte-exact (no charset mangling)") {
    val body = Array.tabulate(512)(i => ((i * 31) % 256).toByte)
    val rs = Warc.parse(Warc.write(Seq(
      ("response", "http://bin.com/", 200, "application/octet-stream", body)),
      gzipPerRecord = true))
    assert(rs.length == 1 && java.util.Arrays.equals(rs(0).body, body))
  }
}
