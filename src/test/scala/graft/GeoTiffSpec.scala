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
      comp <- Seq("none", "deflate", "lzw")
      tile <- Seq(0, 16)
      (fmt, bits) <- Seq((1, 8), (1, 16), (1, 32), (2, 16), (3, 32), (3, 64))
      pred <- if (fmt == 3 || comp == "none") Seq(1) else Seq(1, 2)
    } {
      val samples = Array.tabulate(w * h)(px)
      val bytes = GeoTiff.write(w, h, 1, bits, fmt, samples, littleEndian = le,
        deflate = comp == "deflate", lzw = comp == "lzw", tileSize = tile,
        predictor = pred)
      val meta = GeoTiff.readMeta(bytes)
      val tag = s"le=$le comp=$comp tile=$tile fmt=$fmt bits=$bits pred=$pred"
      assert(meta != null && meta.width == w && meta.height == h, tag)
      assert(meta.tiled == (tile > 0), tag)
      assert(meta.compression == (comp match {
        case "none" => 1; case "lzw" => 5; case _ => 8 }), tag)
      val got = GeoTiff.readSamples(bytes)
      assert(got != null, tag)
      assert(got.toSeq == samples.toSeq, tag)
    }
  }

  test("planar config 2 and float predictor 3: full round-trip matrix") {
    val w = 21; val h = 13; val bands = 3
    def px(i: Int): Double = ((i * 37 % 251).toDouble - 90.0) / 8.0
    for {
      le <- Seq(true, false)
      comp <- Seq("none", "deflate", "lzw")
      tile <- Seq(0, 16)
      (fmt, bits, pred) <- Seq((1, 16, 2), (3, 32, 3), (3, 64, 3), (1, 8, 1))
    } {
      val samples = Array.tabulate(w * h * bands)(px).map(v =>
        if (fmt == 1) math.abs(v.toLong % 250).toDouble else v)
      val bytes = GeoTiff.write(w, h, bands, bits, fmt, samples,
        littleEndian = le, deflate = comp == "deflate", lzw = comp == "lzw",
        tileSize = tile, predictor = pred, planar = true)
      val tag = s"le=$le comp=$comp tile=$tile fmt=$fmt bits=$bits pred=$pred"
      val meta = GeoTiff.readMeta(bytes)
      assert(meta != null && meta.bands == bands, tag)
      val got = GeoTiff.readSamples(bytes)
      assert(got != null, tag)
      assert(got.toSeq == samples.toSeq, tag)
    }
    // chunky float predictor too (predictor 3 without planar)
    for (le <- Seq(true, false); tile <- Seq(0, 16)) {
      val samples = Array.tabulate(w * h * bands)(i => px(i) * 1.5)
      val bytes = GeoTiff.write(w, h, bands, 32, 3, samples, littleEndian = le,
        deflate = true, tileSize = tile, predictor = 3)
      assert(GeoTiff.readSamples(bytes).toSeq == samples.toSeq,
        s"chunky pred3 le=$le tile=$tile")
    }
  }

  test("float predictor 3: on-disk bytes match a hand-derived TechNote-3 row") {
    // one row, three float32 samples, little-endian file. TechNote 3:
    // split into MSB-first byte planes, then byte-difference with
    // stride = samples/pixel (1 band here). Re-derived independently.
    val vals = Array(1.5, -2.25, 100.0)
    val bytes = GeoTiff.write(3, 1, 1, 32, 3, vals, predictor = 3)
    val beBytes = vals.flatMap { v =>
      val b = java.lang.Float.floatToIntBits(v.toFloat)
      Array(((b >> 24) & 0xff).toByte, ((b >> 16) & 0xff).toByte,
        ((b >> 8) & 0xff).toByte, (b & 0xff).toByte)
    }
    val planes = Array.tabulate(12)(k => beBytes((k % 3) * 4 + k / 3))
    val expect = planes.zipWithIndex.map { case (b, k) =>
      if (k == 0) b else ((b - planes(k - 1)) & 0xff).toByte
    }
    assert(bytes.takeRight(12).toSeq == expect.toSeq)
    assert(GeoTiff.readSamples(bytes).toSeq == vals.toSeq)
  }

  test("predictor/format mismatches and planar JPEG reject loudly") {
    def patchTag(b: Array[Byte], tag: Int, v: Int): Array[Byte] = {
      val out = b.clone()
      val n = (out(8) & 0xff) | ((out(9) & 0xff) << 8)
      var found = false
      for (i <- 0 until n if !found) {
        val off = 10 + i * 12
        val t = (out(off) & 0xff) | ((out(off + 1) & 0xff) << 8)
        if (t == tag) { out(off + 8) = v.toByte; found = true }
      }
      assert(found, s"tag $tag not present to patch")
      out
    }
    // predictor 3 stamped onto integer samples: reject
    val ints = GeoTiff.write(8, 8, 1, 16, 1, Array.tabulate(64)(_.toDouble),
      deflate = true, predictor = 2)
    assert(GeoTiff.readSamples(patchTag(ints, 317, 3)) == null)
    // predictor 2 stamped onto float samples: reject
    val flts = GeoTiff.write(8, 8, 1, 32, 3,
      Array.tabulate(64)(_ * 0.5), deflate = true, predictor = 3)
    assert(GeoTiff.readSamples(patchTag(flts, 317, 2)) == null)
    // writer refuses the same mismatches up front
    intercept[IllegalArgumentException] {
      GeoTiff.write(4, 4, 1, 16, 1, Array.tabulate(16)(_.toDouble), predictor = 3)
    }
    intercept[IllegalArgumentException] {
      GeoTiff.write(4, 4, 1, 32, 3, Array.tabulate(16)(_.toDouble), predictor = 2)
    }
  }

  test("BigTIFF: full round-trip matrix, header fields, classic equivalence") {
    val w = 21; val h = 13
    def px(i: Int): Double = (i * 37 % 251).toDouble
    for {
      le <- Seq(true, false)
      comp <- Seq("none", "deflate", "lzw")
      tile <- Seq(0, 16)
      (fmt, bits, pred, pl) <- Seq((1, 16, 2, false), (3, 32, 3, true), (1, 8, 1, false))
    } {
      val bands = if (pl) 3 else 1
      val samples = Array.tabulate(w * h * bands)(px)
      val bytes = GeoTiff.write(w, h, bands, bits, fmt, samples,
        littleEndian = le, deflate = comp == "deflate", lzw = comp == "lzw",
        tileSize = tile, predictor = pred, planar = pl, bigTiff = true)
      val tag = s"big le=$le comp=$comp tile=$tile fmt=$fmt pred=$pred pl=$pl"
      assert((bytes(2) == 43 && le) || (bytes(3) == 43 && !le), tag) // version
      val meta = GeoTiff.readMeta(bytes)
      assert(meta != null && meta.width == w && meta.bands == bands, tag)
      val got = GeoTiff.readSamples(bytes)
      assert(got != null && got.toSeq == samples.toSeq, tag)
    }
    // classic and BigTIFF encodings of the same raster decode identically
    val s = Array.tabulate(64)(_.toDouble)
    val classic = GeoTiff.write(8, 8, 1, 16, 1, s, epsg = 32633,
      pixelScale = (10.0, 10.0), origin = (500000.0, 0.0))
    val big = GeoTiff.write(8, 8, 1, 16, 1, s, epsg = 32633,
      pixelScale = (10.0, 10.0), origin = (500000.0, 0.0), bigTiff = true)
    assert(GeoTiff.readSamples(big).toSeq == GeoTiff.readSamples(classic).toSeq)
    val mb = GeoTiff.readMeta(big)
    assert(mb.epsg == 32633 && mb.originX == 500000.0 && mb.pixelScaleX == 10.0)
    // truncated BigTIFF headers reject
    assert(GeoTiff.readMeta(java.util.Arrays.copyOf(big, 12)) == null)
    val badOffSz = big.clone(); badOffSz(4) = 4 // offset size must be 8
    assert(GeoTiff.readMeta(badOffSz) == null)
  }

  test("multi-IFD chain: ImageIO-authored pages read per level") {
    // ImageIO writes multi-page TIFFs (writeToSequence) — an independent
    // encoder for the COG-style overview-chain layout
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    for (level <- 0 until 3) {
      val lw = 16 >> level; val lh = 12 >> level
      val img = new java.awt.image.BufferedImage(lw, lh,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until lh; x <- 0 until lw)
        img.getRaster.setSample(x, y, 0, (x * 5 + y * 11 + level * 7) % 251)
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    wr.endWriteSequence(); ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    assert(GeoTiff.ifdCount(bytes) == 3)
    for (level <- 0 until 3) {
      val lw = 16 >> level; val lh = 12 >> level
      val m = GeoTiff.readMeta(bytes, level)
      assert(m.width == lw && m.height == lh, s"level $level")
      val s = GeoTiff.readSamples(bytes, level)
      for (y <- 0 until lh; x <- 0 until lw)
        assert(s(y * lw + x) == ((x * 5 + y * 11 + level * 7) % 251).toDouble,
          s"level $level ($x,$y)")
      val st = GeoTiff.bandStats(bytes, 0, level)
      assert(st(0) == lw * lh, s"level $level stats")
    }
    assert(GeoTiff.readMeta(bytes, 3) == null) // past the chain end
  }

  test("LZW: ImageIO-authored stream decodes; width growth + dict reset") {
    // ImageIO writes LZW with horizontal predictor choices of its own —
    // an independent encoder implementation cross-checks ours
    val w = 40; val h = 25
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 31) % 251)
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    assert(GeoTiff.readMeta(bytes).compression == 5)
    val got = GeoTiff.readSamples(bytes)
    assert(got != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(got(y * w + x) == ((x * 7 + y * 31) % 251).toDouble, s"($x,$y)")

    // large pseudo-random raster: the dictionary climbs through the 9->12
    // bit widths and past the 4094 restart — round-trip must stay exact
    val rnd = new scala.util.Random(42)
    val big = Array.fill(300 * 300)(rnd.nextInt(256).toDouble)
    val enc = GeoTiff.write(300, 300, 1, 8, 1, big, lzw = true)
    assert(GeoTiff.readSamples(enc).toSeq == big.toSeq)
    // and a highly repetitive raster (the LZW-friendly case) round-trips
    val rep = Array.tabulate(300 * 300)(i => ((i / 100) % 7).toDouble)
    val enc2 = GeoTiff.write(300, 300, 1, 8, 1, rep, lzw = true)
    assert(enc2.length < rep.length / 4, s"lzw should compress: ${enc2.length}")
    assert(GeoTiff.readSamples(enc2).toSeq == rep.toSeq)
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
    // compression 7 now routes to the JPEG path, which rejects this
    // payload loudly (16-bit samples / non-JPEG bytes), not mis-decodes
    val jpg = ok.clone()
    // compression tag value: find tag 259 in IFD and overwrite its value
    var found = false
    val n = (jpg(8) & 0xff) | ((jpg(9) & 0xff) << 8)
    for (i <- 0 until n if !found) {
      val off = 10 + i * 12
      val tag = (jpg(off) & 0xff) | ((jpg(off + 1) & 0xff) << 8)
      if (tag == 259) { jpg(off + 8) = 7; found = true }
    }
    assert(found)
    assert(GeoTiff.readMeta(jpg).compression == 7)
    assert(GeoTiff.readSamples(jpg) == null)
    // compression id 5 with a garbage payload rejects instead of mis-decoding
    val badLzw = ok.clone()
    var f2 = false
    for (i <- 0 until n if !f2) {
      val off = 10 + i * 12
      val tag = (badLzw(off) & 0xff) | ((badLzw(off + 1) & 0xff) << 8)
      if (tag == 259) { badLzw(off + 8) = 5; f2 = true }
    }
    assert(GeoTiff.readSamples(badLzw) == null)
  }

  // ---- JPEG-in-TIFF (compression 6/7 through JpegCodec) ----

  /** Encode a gray BufferedImage region as baseline JPEG via ImageIO. */
  private def jpegGray(w: Int, h: Int, px: (Int, Int) => Int,
      quality: Float = 0.9f): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(x, y))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  // flat 8x8 blocks: DC-only, quantization-exact at any common table
  private def flatBlocks(id: Int)(x: Int, y: Int): Int =
    120 + 2 * (((x / 8) + (y / 8) + id) % 8)

  test("JPEG-in-TIFF: new-style strip, flat blocks decode exactly") {
    val (w, h) = (32, 16)
    val tiff = GeoTiff.writeJpeg(w, h, 1,
      Seq(jpegGray(w, h, flatBlocks(3))), epsg = 4326,
      pixelScale = (0.1, 0.1), origin = (10.0, 20.0))
    val m = GeoTiff.readMeta(tiff)
    assert(m.compression == 7 && m.epsg == 4326 && m.width == w)
    val s = GeoTiff.readSamples(tiff)
    assert(s != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(s(y * w + x) == flatBlocks(3)(x, y).toDouble, s"($x,$y)")
  }

  test("JPEG-in-TIFF: tiled with factored JPEGTables decodes exactly; crop works") {
    val (w, h, ts) = (24, 16, 16) // 2x1 tiles, second tile cropped to 8 cols
    val tiles = for (ty <- 0 until 1; tx <- 0 until 2) yield
      jpegGray(ts, ts, (x, y) => flatBlocks(5)(tx * ts + x, ty * ts + y))
    val tiff = GeoTiff.writeJpeg(w, h, 1, tiles, tileSize = ts,
      factorTables = true)
    // the factored form really did strip tables from the tile streams
    val m = GeoTiff.readMeta(tiff)
    assert(m.tiled && m.compression == 7)
    val s = GeoTiff.readSamples(tiff)
    assert(s != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(s(y * w + x) == flatBlocks(5)(x, y).toDouble, s"($x,$y)")
  }

  test("lossless-JPEG-in-TIFF: 16-bit tiles sample-exact (the DNG shape)") {
    import graft.multimodal.JpegLossless
    val (w, h, ts) = (24, 16, 16)
    def px(x: Int, y: Int): Int = (x * 2311 + y * 7919) % 65536
    val tiles = for (ty <- 0 until 1; tx <- 0 until 2) yield {
      val plane = Array.tabulate(ts * ts)(i =>
        px(tx * ts + i % ts, ty * ts + i / ts))
      JpegLossless.write(ts, ts, 16, 4, 0, Array(plane))
    }
    val tiff = GeoTiff.writeJpeg(w, h, 1, tiles, tileSize = ts, precision = 16)
    val m = GeoTiff.readMeta(tiff)
    assert(m.compression == 7 && m.bitsPerSample == 16)
    val s = GeoTiff.readSamples(tiff)
    assert(s != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(s(y * w + x) == px(x, y).toDouble, s"($x,$y)")
    // 3-band 8-bit lossless: RGB stays RGB (no YCbCr transform applied)
    val rgb = Array.tabulate(3)(c =>
      Array.tabulate(8 * 8)(i => (i * 3 + c * 40) % 256))
    val t3 = GeoTiff.writeJpeg(8, 8, 3,
      Seq(JpegLossless.write(8, 8, 8, 1, 0, rgb)))
    val s3 = GeoTiff.readSamples(t3)
    assert(s3 != null)
    for (i <- 0 until 64; c <- 0 until 3)
      assert(s3(i * 3 + c) == rgb(c)(i).toDouble, s"band $c px $i")
  }

  test("12-bit-SOF1-in-TIFF: DC-only strip decodes to the closed form") {
    import graft.multimodal.Jpeg12
    val (w, h) = (16, 8)
    val q = Array.fill(64)(8)
    val blocks = (0 until 2).map { i =>
      val c = new Array[Int](64); c(0) = 300 * i - 150; c
    }
    val tiff = GeoTiff.writeJpeg(w, h, 1,
      Seq(Jpeg12.writeGray(w, h, 12, q, blocks)), precision = 12)
    assert(GeoTiff.readMeta(tiff).bitsPerSample == 12)
    val s = GeoTiff.readSamples(tiff)
    assert(s != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(s(y * w + x) == (300 * (x / 8) - 150 + 2048).toDouble, s"($x,$y)")
  }

  test("JPEG-in-TIFF: old-style 6 interchange form decodes exactly") {
    val (w, h) = (16, 24)
    val tiff = GeoTiff.writeJpeg(w, h, 1, Seq(jpegGray(w, h, flatBlocks(1))),
      oldStyle = true)
    assert(GeoTiff.readMeta(tiff).compression == 6)
    val s = GeoTiff.readSamples(tiff)
    assert(s != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(s(y * w + x) == flatBlocks(1)(x, y).toDouble, s"($x,$y)")
  }

  test("JPEG-in-TIFF: non-flat content matches ImageIO's own decode within ±2") {
    val (w, h) = (40, 24)
    def px(x: Int, y: Int): Int = (x * 7 + y * 13 + (x * y) % 31) % 256
    val jpeg = jpegGray(w, h, px)
    val tiff = GeoTiff.writeJpeg(w, h, 1, Seq(jpeg))
    val ours = GeoTiff.readSamples(tiff)
    assert(ours != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    for (y <- 0 until h; x <- 0 until w) {
      val want = ref.getRaster.getSample(x, y, 0)
      assert(math.abs(ours(y * w + x) - want) <= 2.0, s"($x,$y): ${ours(y * w + x)} vs $want")
    }
  }

  test("JPEG-in-TIFF loud rejects: fragmented old-style, bad payloads") {
    val (w, h) = (16, 16)
    val good = GeoTiff.writeJpeg(w, h, 1, Seq(jpegGray(w, h, flatBlocks(0))))
    assert(GeoTiff.readSamples(good) != null)
    // corrupt the JPEG payload: decode must null, not throw
    val bad = good.clone()
    java.util.Arrays.fill(bad, bad.length - 40, bad.length, 0x55.toByte)
    assert(GeoTiff.readSamples(bad) == null)
  }
}
