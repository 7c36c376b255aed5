package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GeoTiff

/** GeoTIFF codec spec. The decode direction is proven against the JDK's
  * ImageIO TIFF plugin (an independent from-spec encoder — nothing
  * round-trips through our own writer), the writer against our reader
  * for the layouts ImageIO won't author (tiles, predictor, float64,
  * GeoKeys), and the reject envelope against mangled payloads. */
class GeoTiffSpec extends AnyFunSuite {

  private def imageIoTiff(img: java.awt.image.BufferedImage,
      deflate: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    if (deflate) {
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("Deflate")
    }
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  test("decodes ImageIO-authored gray u8 / u16 / RGB, plain and Deflate") {
    import java.awt.image.BufferedImage
    val w = 19; val h = 11
    // gray u8
    val g8 = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g8.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    // gray u16
    val g16 = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, (x * 701 + y * 1303) % 65536)
    // RGB
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, ((x * 5) % 256 << 16) | ((y * 9) % 256 << 8) | ((x + y) % 256))
    for {
      (img, bands, bits) <- Seq((g8, 1, 8), (g16, 1, 16), (rgb, 3, 8))
      deflate <- Seq(false, true)
    } {
      val bytes = imageIoTiff(img, deflate)
      val meta = GeoTiff.readMeta(bytes)
      assert(meta != null, s"bands=$bands bits=$bits deflate=$deflate meta")
      assert(meta.width == w && meta.height == h)
      assert(meta.bands == bands && meta.bitsPerSample == bits)
      val s = GeoTiff.readSamples(bytes)
      assert(s != null, s"bands=$bands bits=$bits deflate=$deflate decode")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until bands) {
        val expect = img.getRaster.getSample(x, y, c)
        assert(s((y * w + x) * bands + c) == expect,
          s"($x,$y,$c) bands=$bands bits=$bits deflate=$deflate")
      }
    }
  }

  test("writer round-trip: endianness x compression x layout x type x predictor") {
    val w = 21; val h = 13
    def px(i: Int): Double = (i * 37 % 251).toDouble
    for {
      le <- Seq(true, false)
      deflate <- Seq(false, true)
      tile <- Seq(0, 16)
      (fmt, bits) <- Seq((1, 8), (1, 16), (1, 32), (2, 16), (3, 32), (3, 64))
      pred <- if (fmt == 3 || deflate == false) Seq(1) else Seq(1, 2)
    } {
      val samples = Array.tabulate(w * h)(px)
      val bytes = GeoTiff.write(w, h, 1, bits, fmt, samples, littleEndian = le,
        deflate = deflate, tileSize = tile, predictor = pred)
      val meta = GeoTiff.readMeta(bytes)
      val tag = s"le=$le deflate=$deflate tile=$tile fmt=$fmt bits=$bits pred=$pred"
      assert(meta != null && meta.width == w && meta.height == h, tag)
      assert(meta.tiled == (tile > 0), tag)
      val got = GeoTiff.readSamples(bytes)
      assert(got != null, tag)
      assert(got.toSeq == samples.toSeq, tag)
    }
  }

  test("multi-band writer round-trip and band stats") {
    val w = 9; val h = 6; val bands = 3
    val samples = Array.tabulate(w * h * bands)(i => ((i * 11) % 97).toDouble)
    val bytes = GeoTiff.write(w, h, bands, 16, 1, samples, deflate = true,
      predictor = 2)
    val got = GeoTiff.readSamples(bytes)
    assert(got != null && got.toSeq == samples.toSeq)
    for (b <- 0 until bands) {
      val vals = samples.indices.filter(_ % bands == b).map(samples)
      val st = GeoTiff.bandStats(bytes, b)
      assert(st(0) == vals.length && st(1) == vals.min && st(2) == vals.max &&
        st(3) == vals.sum)
    }
    assert(GeoTiff.bandStats(bytes, 3) == null)
  }

  test("GeoKeys: EPSG, model type, pixel scale, tiepoint origin") {
    val samples = Array.tabulate(16)(_.toDouble)
    // projected (UTM 33N) and geographic (WGS84) taggings
    val utm = GeoTiff.write(4, 4, 1, 16, 1, samples, epsg = 32633,
      pixelScale = (10.0, 10.0), origin = (500000.0, 4649776.0))
    val m1 = GeoTiff.readMeta(utm)
    assert(m1.epsg == 32633 && m1.modelType == 1)
    assert(m1.pixelScaleX == 10.0 && m1.originX == 500000.0 &&
      m1.originY == 4649776.0)
    val wgs = GeoTiff.write(4, 4, 1, 16, 1, samples, epsg = 4326,
      pixelScale = (0.1, 0.1), origin = (139.5, 35.5))
    val m2 = GeoTiff.readMeta(wgs)
    assert(m2.epsg == 4326 && m2.modelType == 2)
    assert(m2.pixelScaleY == 0.1 && m2.originX == 139.5)
    // untagged file carries zeros, not nulls
    val plain = GeoTiff.write(4, 4, 1, 16, 1, samples)
    val m3 = GeoTiff.readMeta(plain)
    assert(m3.epsg == 0 && m3.pixelScaleX == 0.0)
  }

  test("loud rejects: non-TIFF, truncated, unsupported layouts") {
    assert(GeoTiff.readMeta("not a tiff at all".getBytes) == null)
    assert(GeoTiff.readMeta(Array[Byte](
      'I', 'I', 42, 0)) == null)
    val ok = GeoTiff.write(8, 8, 1, 16, 1, Array.tabulate(64)(_.toDouble))
    assert(GeoTiff.readSamples(ok) != null)
    // truncate mid-pixel-data: meta still parses, samples reject
    val cut = java.util.Arrays.copyOf(ok, ok.length - 40)
    assert(GeoTiff.readMeta(cut) != null)
    assert(GeoTiff.readSamples(cut) == null)
    // unsupported compression id (LZW=5) rejects in readSamples
    val lzw = ok.clone()
    // compression tag value: find tag 259 in IFD and overwrite its value
    var o = 8 + 2
    var found = false
    val n = (lzw(8) & 0xff) | ((lzw(9) & 0xff) << 8)
    for (i <- 0 until n if !found) {
      val off = 10 + i * 12
      val tag = (lzw(off) & 0xff) | ((lzw(off + 1) & 0xff) << 8)
      if (tag == 259) { lzw(off + 8) = 5; found = true }
    }
    assert(found)
    assert(GeoTiff.readMeta(lzw).compression == 5)
    assert(GeoTiff.readSamples(lzw) == null)
  }
}
