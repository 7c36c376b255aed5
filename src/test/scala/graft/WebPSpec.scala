package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.WebP
import graft.multimodal.WebP.Vp8lEncodeOpts

/** VP8L round-trips (encode then decode must be the identity — proving
  * both sides against RFC 9649 §3), chunk-walk metadata on all three
  * container flavors, and never-throw fuzz. */
class WebPSpec extends AnyFunSuite {

  private def image(w: Int, h: Int, seed: Long,
      colors: Int = 0): Array[Int] = Array.tabulate(w * h) { i =>
    var z = seed * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 31)) * 0x94d049bb133111ebL
    z ^= z >>> 29
    if (colors > 0) {
      // palette-friendly: a small fixed set of colors
      val pal = Array.tabulate(colors)(k =>
        0xff000000 | (k * 37 % 256 << 16) | (k * 91 % 256 << 8) | (k * 53 % 256))
      pal((z & 0x7fffffff).toInt % colors)
    } else 0xff000000 | (z & 0xffffff).toInt
  }

  private def roundTrip(w: Int, h: Int, px: Array[Int],
      opts: Vp8lEncodeOpts, tag: String): Unit = {
    val bytes = WebP.writeWebpLossless(w, h, px, opts)
    val dec = WebP.vp8lDecode(bytes)
    assert(dec != null, s"$tag: decode failed")
    assert(dec.width == w && dec.height == h, s"$tag: dims ${dec.width}x${dec.height}")
    assert(java.util.Arrays.equals(dec.argb, px), s"$tag: pixels differ")
    val m = WebP.webpMeta(bytes)
    assert(m != null && m.format == "lossless" && m.width == w && m.height == h, s"$tag: meta $m")
  }

  test("round-trip: plain literals, no transforms") {
    roundTrip(13, 7, image(13, 7, 1), Vp8lEncodeOpts(), "plain")
    roundTrip(1, 1, Array(0xff123456), Vp8lEncodeOpts(), "1x1")
    roundTrip(64, 1, image(64, 1, 2), Vp8lEncodeOpts(), "row")
    roundTrip(1, 64, image(1, 64, 3), Vp8lEncodeOpts(), "col")
  }

  test("round-trip: subtract-green") {
    roundTrip(24, 16, image(24, 16, 4), Vp8lEncodeOpts(subtractGreen = true), "sg")
  }

  test("round-trip: predictor blocks, all 14 modes") {
    // predictorBits=2 → 4x4 blocks → a 32x24 image walks modes 0..13
    roundTrip(32, 24, image(32, 24, 5),
      Vp8lEncodeOpts(predictor = true, predictorBits = 2), "pred2")
    roundTrip(17, 9, image(17, 9, 6),
      Vp8lEncodeOpts(predictor = true, predictorBits = 3), "pred3")
  }

  test("round-trip: color transform blocks") {
    roundTrip(20, 12, image(20, 12, 7),
      Vp8lEncodeOpts(colorTransform = true, colorBits = 2), "ct")
  }

  test("round-trip: stacked subtract-green + color transform + predictor") {
    roundTrip(33, 21, image(33, 21, 8),
      Vp8lEncodeOpts(subtractGreen = true, colorTransform = true,
        colorBits = 3, predictor = true, predictorBits = 2), "stack")
  }

  test("round-trip: palette packing at every widthBits tier") {
    // 2 colors → 8 px/byte, 4 → 4, 16 → 2, 200 → 1
    for ((nc, tag) <- Seq((2, "pal2"), (4, "pal4"), (13, "pal13"), (200, "pal200")))
      roundTrip(25, 10, image(25, 10, 100 + nc, colors = nc),
        Vp8lEncodeOpts(palette = true), tag)
  }

  test("round-trip: color cache + LZ77 copies") {
    // vertical stripes: dist-1 runs and dist-w row copies both fire
    val w = 40; val h = 30
    val px = Array.tabulate(w * h)(i => 0xff000000 | ((i % w / 5) * 0x203040))
    roundTrip(w, h, px, Vp8lEncodeOpts(lz77 = true), "lz")
    roundTrip(w, h, px, Vp8lEncodeOpts(cacheBits = 4), "cache")
    roundTrip(w, h, px, Vp8lEncodeOpts(cacheBits = 6, lz77 = true), "lz+cache")
    roundTrip(w, h, image(w, h, 9), Vp8lEncodeOpts(cacheBits = 8, lz77 = true), "noise+both")
  }

  test("round-trip: meta prefix groups") {
    roundTrip(40, 24, image(40, 24, 10), Vp8lEncodeOpts(metaBits = 3), "meta3")
    roundTrip(40, 24, image(40, 24, 11),
      Vp8lEncodeOpts(metaBits = 2, cacheBits = 4, lz77 = true), "meta+cache+lz")
    // single-block meta image degrades to one group
    roundTrip(4, 4, image(4, 4, 12), Vp8lEncodeOpts(metaBits = 4), "meta1blk")
  }

  test("round-trip: alpha channel survives") {
    val px = Array.tabulate(12 * 8)(i => ((i * 17 % 256) << 24) | (i * 73 % 0xffffff))
    roundTrip(12, 8, px, Vp8lEncodeOpts(subtractGreen = true), "alpha")
  }

  test("webpMeta: lossy VP8 and extended VP8X containers") {
    // hand-built lossy container: VP8 chunk with the 0x9d012a sync code
    def riff(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
      val body = chunks.map { case (tag, d) => 8 + d.length + (d.length & 1) }.sum
      out.write("RIFF".getBytes("US-ASCII")); w32(4 + body)
      out.write("WEBP".getBytes("US-ASCII"))
      chunks.foreach { case (tag, d) =>
        out.write(tag.getBytes("US-ASCII")); w32(d.length); out.write(d)
        if ((d.length & 1) == 1) out.write(0)
      }
      out.toByteArray
    }
    val vp8 = new Array[Byte](12)
    vp8(3) = 0x9d.toByte; vp8(4) = 0x01; vp8(5) = 0x2a
    vp8(6) = 320.toByte; vp8(7) = (320 >> 8).toByte // 14-bit width
    vp8(8) = 240.toByte; vp8(9) = (240 >> 8).toByte
    val lossy = WebP.webpMeta(riff(Seq(("VP8 ", vp8))))
    assert(lossy.format == "lossy" && lossy.width == 320 && lossy.height == 240, s"$lossy")
    // VP8X: flags byte (alpha 0x10, anim 0x02), 24-bit canvas minus one
    val vp8x = new Array[Byte](10)
    vp8x(0) = (0x10 | 0x02).toByte
    val cw = 1024 - 1; val ch = 768 - 1
    vp8x(4) = (cw & 0xff).toByte; vp8x(5) = ((cw >> 8) & 0xff).toByte; vp8x(6) = ((cw >> 16) & 0xff).toByte
    vp8x(7) = (ch & 0xff).toByte; vp8x(8) = ((ch >> 8) & 0xff).toByte; vp8x(9) = ((ch >> 16) & 0xff).toByte
    val ext = WebP.webpMeta(riff(Seq(("VP8X", vp8x), ("ANIM", new Array[Byte](6)))))
    assert(ext.format == "extended" && ext.width == 1024 && ext.height == 768, s"$ext")
    assert(ext.has_alpha && ext.has_anim, s"$ext")
    assert(ext.n_chunks == 2, s"$ext")
  }

  test("null-on-garbage: truncation, bad magic, byte fuzz never throws") {
    val good = WebP.writeWebpLossless(16, 12, image(16, 12, 20),
      Vp8lEncodeOpts(subtractGreen = true, cacheBits = 4, lz77 = true))
    assert(WebP.webpMeta(null) == null)
    assert(WebP.webpMeta(Array[Byte](1, 2, 3)) == null)
    assert(WebP.vp8lDecode(Array[Byte]()) == null)
    val bad = good.clone(); bad(8) = 'X'.toByte
    assert(WebP.webpMeta(bad) == null && WebP.vp8lDecode(bad) == null)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      WebP.webpMeta(mut); WebP.vp8lDecode(mut); WebP.vp8lPixelSum(mut)
      val cut = mut.take(rnd.nextInt(mut.length))
      WebP.webpMeta(cut); WebP.vp8lDecode(cut)
    }
  }

  test("pixel sum matches a direct fold") {
    val px = image(10, 10, 30)
    val bytes = WebP.writeWebpLossless(10, 10, px)
    val expect = px.map(p => ((p >>> 24) & 0xff) + ((p >> 16) & 0xff) +
      ((p >> 8) & 0xff) + (p & 0xff)).map(_.toLong).sum
    assert(WebP.vp8lPixelSum(bytes) == expect)
  }
}
