package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, PngCodec}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def payloads() =
    (0 until 40).map(i => (i.toLong, Array.fill[Byte](100 + i * 7)((i % 251).toByte)))
      .toDF("id", "payload")

  test("withMeta attaches deterministic decoded metadata") {
    val rows = Multimodal.withMeta(spark, payloads())
    val collected = rows.collect()
    assert(collected.length == 40)
    assert(collected.forall(r => r.meta.n_bytes == r.payload.length))
    assert(collected.forall(r => r.meta.width >= 64 && r.meta.height >= 64))
    // deterministic: same payload → same meta
    val again = Multimodal.withMeta(spark, payloads()).collect()
    assert(collected.map(_.meta).toSeq == again.map(_.meta).toSeq)
  }

  test("extractFeatures: partition-batched histograms sum to payload length") {
    val feats = Multimodal.extractFeatures(
      Multimodal.withMeta(spark, payloads()).repartition(3))
    val ok = feats.collect().forall(f => f.histogram.sum == 100 + f.id * 7)
    assert(ok)
  }

  test("frameSample: n frames per payload, bytes partition the payload") {
    val frames = Multimodal.frameSample(Multimodal.withMeta(spark, payloads()), 4)
    val byId = frames.collect().groupBy(_.id)
    assert(byId.size == 40)
    byId.foreach { case (id, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.map(_.frame_payload.length).sum == 100 + id * 7)
    }
  }

  test("HeaderDecoder parses real container headers; stub only for unknown") {
    import java.nio.{ByteBuffer, ByteOrder}
    // PNG: signature + IHDR length/type + width/height (big-endian)
    val png = ByteBuffer.allocate(33)
    png.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    png.putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
    // GIF89a with LE dims
    val gif = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    gif.put("GIF89a".getBytes).putShort(320.toShort).putShort(200.toShort)
    // BMP: "BM", header, LE dims at 18/22 (negative height = top-down)
    val bmp = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put(0, 'B'.toByte); bmp.put(1, 'M'.toByte)
    bmp.putInt(18, 800); bmp.putInt(22, -600)
    // WAV: RIFF/WAVE + fmt chunk with channels at 22, rate at 24
    val wav = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    wav.put(0, "RIFF".getBytes, 0, 4); wav.put(8, "WAVEfmt ".getBytes, 0, 8)
    wav.putShort(20, 1.toShort) // format code: PCM
    wav.putShort(22, 2.toShort); wav.putInt(24, 44100)
    // JPEG: SOI, APP0 segment, SOF0 with height 240 width 320
    val jpg = ByteBuffer.allocate(32)
    jpg.put(Array(0xff, 0xd8).map(_.toByte))
    jpg.put(Array(0xff, 0xe0).map(_.toByte)); jpg.putShort(4.toShort); jpg.putShort(0.toShort)
    jpg.put(Array(0xff, 0xc0).map(_.toByte)); jpg.putShort(8.toShort)
    jpg.put(8.toByte); jpg.putShort(240.toShort); jpg.putShort(320.toShort)
    val d = Multimodal.HeaderDecoder
    assert(d.decode(png.array()) == Multimodal.MediaMeta("image/png", 33, 640, 480))
    assert(d.decode(gif.array()) == Multimodal.MediaMeta("image/gif", 13, 320, 200))
    assert(d.decode(bmp.array()) == Multimodal.MediaMeta("image/bmp", 30, 800, 600))
    assert(d.decode(wav.array()) ==
      Multimodal.MediaMeta("audio/wav", 44, 44100, 2, 0L, 44100, 2, "pcm"))
    assert(d.decode(jpg.array()) == Multimodal.MediaMeta("image/jpeg", 32, 320, 240))
    val unknown = Array.fill[Byte](64)(0x42)
    assert(d.decode(unknown) == Multimodal.StubDecoder.decode(unknown))
  }

  test("WAV duration from a real JDK-authored file (RIFF chunk walk)") {
    // 1.5 s of 8 kHz mono PCM through javax.sound — an independent
    // encoder writing real fmt/data chunks, not our fixed-offset fixture
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val samples = new Array[Byte](2 * 12000) // 12000 frames = 1.5 s
    for (i <- samples.indices) samples(i) = (i * 13 % 251).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 12000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.HeaderDecoder.decode(bos.toByteArray)
    assert(meta.mime == "audio/wav" && meta.codec == "pcm", meta)
    assert(meta.sample_rate == 8000 && meta.channels == 1, meta)
    assert(meta.duration_ms == 1500, s"duration ${meta.duration_ms}")
  }

  test("arithmetic JPEG: entropy layer is lossless — coefficient-exact round trip") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // deterministic mixed-content quantized coefficient blocks: varied DC
    // walk + sparse ACs across small/large magnitudes, runs, and both
    // shared-magnitude bin sets (k <= 5 and k > 5)
    val q = Array.fill(64)(1) // q=1: coefficients ARE the dequantized values
    val (w, h) = (32, 24)
    val blocks = (0 until 12).map { b =>
      val c = new Array[Int](64)
      c(0) = (b * 37 % 50) - 25 + 100 // DC walks both signs of diff
      c(1) = if (b % 2 == 0) 3 else -3
      c(4) = if (b % 3 == 0) 1 else 0
      c(7) = if (b % 4 == 1) -17 else 0 // k > Kx=5 magnitude set
      c(20) = if (b % 5 == 2) 260 else 0 // multi-bit magnitude
      c(63) = if (b % 6 == 3) -1 else 0 // EOB at the very end
      c
    }
    val jpeg = JpegArith.writeGray(w, h, q, blocks)
    val luma = JpegCodec.decodeLuma(jpeg)
    assert(luma != null, "arithmetic stream must decode")
    assert(luma.width == w && luma.height == h)
    // expected pixels: the same dequant+IDCT path over the source blocks
    // (the entropy layer must hand the IDENTICAL coefficients to it)
    val expected = new Array[Byte](32 * 24)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    val plane = new Array[Byte](32 * 24)
    blocks.zipWithIndex.foreach { case (c, i) =>
      java.util.Arrays.fill(blk, 0)
      (0 until 64).foreach(k => blk(JpegCodec.zigzag(k)) = c(k) * q(k))
      JpegCodec.writeBlock(blk, tmp, plane, 32, (i % 4) * 8, (i / 4) * 8)
    }
    System.arraycopy(plane, 0, expected, 0, expected.length)
    assert(java.util.Arrays.equals(luma.pixels, expected),
      "arithmetic decode must be pixel-identical to the direct IDCT of the source coefficients")
  }

  test("arithmetic JPEG: flat blocks decode exactly; adaptation compresses") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // flat 8x8 blocks: DC-only, exact through quantization (q=16 divides
    // the level-shifted DC) — decoded pixels equal the source values
    val q = Array.fill(64)(16)
    val (w, h) = (48, 32)
    val bx = w / 8
    def vOf(i: Int): Int = 120 + 2 * ((i * 5) % 8)
    val blocks = (0 until bx * (h / 8)).map { i =>
      val c = new Array[Int](64)
      c(0) = 8 * (vOf(i) - 128) / 16
      c
    }
    val jpeg = JpegArith.writeGray(w, h, q, blocks)
    val luma = JpegCodec.decodeLuma(jpeg)
    assert(luma != null)
    for (y <- 0 until h; x <- 0 until w) {
      val want = vOf((y / 8) * bx + x / 8)
      assert((luma.pixels(y * w + x) & 0xff) == want, s"($x,$y)")
    }
    // adaptation sanity: 24 near-identical blocks entropy-code far below
    // 1 bit per pixel — a broken state machine would not converge
    val entropyBytes = jpeg.length - 100 // headers ~90 bytes
    assert(entropyBytes < w * h / 8, s"adaptive coding too large: $entropyBytes bytes")
  }

  test("progressive-arithmetic JPEG (SOF10): scan ladders decode pixel-identical to SOF9") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // mixed-content blocks exercising DC sign walks, both AC magnitude
    // bin sets, long runs, band boundaries, and low bits that only a
    // complete successive-approximation ladder recovers
    val q = Array.fill(64)(1)
    val (w, h) = (32, 24)
    val blocks = (0 until 12).map { b =>
      val c = new Array[Int](64)
      c(0) = (b * 37 % 50) - 25 + 101 // odd values: DC refine bit matters
      c(1) = if (b % 2 == 0) 3 else -5
      c(4) = if (b % 3 == 0) 1 else 0
      c(5) = if (b % 4 == 2) 7 else 0 // band-edge coefficient
      c(6) = if (b % 4 == 0) -2 else 0
      c(7) = if (b % 4 == 1) -17 else 0
      c(20) = if (b % 5 == 2) 261 else 0
      c(63) = if (b % 6 == 3) -1 else 0
      c
    }
    // the reference pixels: the SEQUENTIAL arithmetic stream of the same
    // coefficients (shared dequant+IDCT path — identical coefficients
    // must give identical bytes)
    val seq = JpegCodec.decodeLuma(JpegArith.writeGray(w, h, q, blocks))
    assert(seq != null)
    val scripts = Seq(
      // pure spectral selection, no successive approximation
      Seq((0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)),
      // full SA ladder: DC and two AC bands refined down to al = 0
      Seq((0, 0, 0, 2), (1, 5, 0, 2), (6, 63, 0, 2),
        (0, 0, 2, 1), (1, 5, 2, 1), (6, 63, 2, 1),
        (0, 0, 1, 0), (1, 5, 1, 0), (6, 63, 1, 0)),
      // single full-band AC scan after a DC ladder
      Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0)))
    scripts.zipWithIndex.foreach { case (script, si) =>
      val prog = JpegArith.writeGrayProgressive(w, h, q, blocks, script)
      assert(prog.sliding(2).exists(sq =>
        (sq(0) & 0xff) == 0xff && (sq(1) & 0xff) == 0xca),
        "fixture must be a true SOF10 stream")
      val luma = JpegCodec.decodeLuma(prog)
      assert(luma != null, s"script $si must decode")
      assert(luma.width == w && luma.height == h)
      assert(java.util.Arrays.equals(luma.pixels, seq.pixels),
        s"script $si must be pixel-identical to the sequential decode")
    }
  }

  test("progressive-arithmetic JPEG: incomplete ladder differs; corrupt tails null-safe") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // q=8 amplifies the missing low bit to 8 dequantized units so the
    // IDCT difference survives byte rounding
    val q = Array.fill(64)(8)
    val blocks = (0 until 2).map { b =>
      val c = new Array[Int](64)
      c(0) = 13 + b; c(3) = 9; c(10) = -13
      c
    }
    val full = JpegArith.writeGrayProgressive(8 * 2, 8, q, blocks,
      Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 1), (1, 63, 1, 0)))
    val coarse = JpegArith.writeGrayProgressive(8 * 2, 8, q, blocks,
      Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 1))) // AC stops at al=1
    val lf = JpegCodec.decodeLuma(full)
    val lc = JpegCodec.decodeLuma(coarse)
    assert(lf != null && lc != null)
    assert(!java.util.Arrays.equals(lf.pixels, lc.pixels),
      "dropping the last refinement scan must change the image")
    // truncation anywhere must never throw
    (1 until full.length by 7).foreach { cut =>
      JpegCodec.decodeLuma(java.util.Arrays.copyOf(full, cut))
    }
  }

  test("arithmetic JPEG: the byte-plane surface rejects 12-bit; truncation is safe") {
    import graft.multimodal.{JpegArith, JpegCodec}
    val q = Array.fill(64)(1)
    val good = JpegArith.writeGray(8, 8, q, Seq(new Array[Int](64)))
    assert(JpegCodec.decodeLuma(good) != null)
    // precision byte 12 in SOF9
    val p12 = good.clone()
    val sofAt = { var i = 2; while (!((p12(i) & 0xff) == 0xff && (p12(i + 1) & 0xff) == 0xc9)) i += 1; i }
    p12(sofAt + 4) = 12
    assert(JpegCodec.decodeLuma(p12) == null)
    // truncated entropy data must not throw
    assert(JpegCodec.decodeLuma(java.util.Arrays.copyOf(good, good.length - 4)) != null ||
      JpegCodec.decodeLuma(java.util.Arrays.copyOf(good, good.length - 4)) == null) // no-throw contract
    // a DRI whose interval never triggers (8 > 1 MCU) decodes unchanged
    val withDri = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(good, 0, 2)
      bos.write(Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 8)) // DRI len 4, interval 8
      bos.write(good, 2, good.length - 2)
      bos.toByteArray
    }
    assert(JpegCodec.decodeLuma(withDri) != null)
  }

  test("4:2:0 arithmetic JPEG: subsampled MCU walk decodes exactly") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // 32x16 at 2x2/1x1/1x1 → 2 MCUs: 8 luma + 2 Cb + 2 Cr blocks. Luma is
    // mixed content; chroma is zero (neutral 128), so with flat chroma the
    // RGB conversion must return the luma value exactly on every pixel.
    val q = Array.fill(64)(1)
    val (w, h) = (32, 16)
    val luma = (0 until 8).map { b =>
      val c = new Array[Int](64)
      c(0) = (b * 29 % 60) - 30 + 64
      c(3) = if (b % 2 == 0) 7 else -9
      c(17) = if (b % 3 == 1) 130 else 0
      c
    }
    val zeroC = (0 until 2).map(_ => new Array[Int](64))
    val jpg = JpegArith.writeSampled(w, h, q,
      Seq((2, 2), (1, 1), (1, 1)), Seq(luma, zeroC, zeroC))
    val lout = JpegCodec.decodeLuma(jpg)
    assert(lout != null && lout.width == w && lout.height == h,
      "4:2:0 arithmetic must decode")
    // expected luma: direct IDCT with the MCU placement ((mx*2+bx, by))
    val expected = new Array[Byte](w * h)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    luma.zipWithIndex.foreach { case (c, i) =>
      val mcu = i / 4
      val bx = i % 2
      val by = (i % 4) / 2
      java.util.Arrays.fill(blk, 0)
      (0 until 64).foreach(k => blk(JpegCodec.zigzag(k)) = c(k))
      JpegCodec.writeBlock(blk, tmp, expected, w, (mcu * 2 + bx) * 8, by * 8)
    }
    assert(java.util.Arrays.equals(lout.pixels, expected),
      "subsampled arithmetic luma must match the direct IDCT placement")
    // flat neutral chroma: RGB == luma on every pixel
    val rgb = JpegCodec.decodeRgb(jpg)
    assert(rgb != null, "RGB path must handle 4:2:0 arithmetic")
    (0 until w * h).foreach { i =>
      val y = expected(i) & 0xff
      assert((rgb.pixels(3 * i) & 0xff) == y &&
        (rgb.pixels(3 * i + 1) & 0xff) == y &&
        (rgb.pixels(3 * i + 2) & 0xff) == y, s"pixel $i")
    }
    // restart interval at the MCU granularity round-trips identically
    val rst = JpegCodec.decodeLuma(JpegArith.writeSampled(w, h, q,
      Seq((2, 2), (1, 1), (1, 1)), Seq(luma, zeroC, zeroC), restartInterval = 1))
    assert(rst != null && java.util.Arrays.equals(rst.pixels, expected),
      "4:2:0 restart stream must decode identically")
    // 4:2:2 (2x1) also walks correctly
    val jpg422 = JpegArith.writeSampled(w, h, q, Seq((2, 1), (1, 1), (1, 1)),
      Seq(luma, (0 until 4).map(_ => new Array[Int](64)),
        (0 until 4).map(_ => new Array[Int](64))))
    val l422 = JpegCodec.decodeLuma(jpg422)
    assert(l422 != null && l422.width == w && l422.height == h)
  }

  test("12-bit arithmetic JPEG (SOF9 p12): exact vs the SOF1 Huffman twin") {
    import graft.multimodal.{Jpeg12, JpegArith}
    // DC-only blocks with 16-bit quant entries: closed-form pixels
    // value = round(c0*q0/8) + 2048, exact when 8 | c0*q0 — and the
    // SAME coefficients through the SOF1 Huffman path must give the
    // IDENTICAL plane (shared IDCT, both entropy layers lossless)
    val q = Array.fill(64)(1)
    q(0) = 400 // 16-bit DQT entry range
    val (w, h) = (24, 16)
    val blocks = (0 until 6).map { i =>
      val c = new Array[Int](64)
      c(0) = (i - 3) * 2 // c0*q0 = ±800k range, 8 | 800
      c(5) = if (i % 2 == 0) 321 else 0 // 12-bit-scale AC magnitude
      c(40) = if (i % 3 == 1) -1500 else 0
      c
    }
    val arith = Jpeg12.decode(JpegArith.writeGray12(w, h, q, blocks))
    assert(arith != null && arith.precision == 12, "12-bit arithmetic decodes")
    assert(arith.width == w && arith.height == h)
    val huff = Jpeg12.decode(Jpeg12.writeGray(w, h, 12, q,
      blocks.map { c => val d = new Array[Int](64); d(0) = c(0); d }))
    // DC-only comparison (the SOF1 fixture writer is DC-only): rebuild the
    // arithmetic stream DC-only too and compare planes exactly
    val arithDc = Jpeg12.decode(JpegArith.writeGray12(w, h, q,
      blocks.map { c => val d = new Array[Int](64); d(0) = c(0); d }))
    assert(java.util.Arrays.equals(arithDc.plane, huff.plane),
      "12-bit arithmetic DC plane must equal the SOF1 Huffman twin")
    // full blocks: spot-check the closed-form flat regions are exact
    (0 until 6).foreach { i =>
      if (i % 2 != 0 && i % 3 != 1) { // truly DC-only block
        val v = math.round((i - 3) * 2 * 400 / 8.0).toInt + 2048
        val px = arith.plane((i % 3) * 8 + (i / 3) * 8 * w)
        assert(px == v, s"block $i corner: $px vs $v")
      }
    }
    // restart intervals work at 12-bit too
    val rst = Jpeg12.decode(JpegArith.writeGray12(w, h, q, blocks,
      restartInterval = 2))
    assert(rst != null && java.util.Arrays.equals(rst.plane, arith.plane),
      "12-bit restart stream must decode identically")
    // jpeg12 expression entry points accept the arithmetic stream
    assert(Jpeg12.precisionOf(JpegArith.writeGray12(w, h, q, blocks)) == 12)
    assert(Jpeg12.sampleSum(JpegArith.writeGray12(w, h, q, blocks)) ==
      arith.plane.map(_.toLong).sum)
  }

  test("arithmetic JPEG: restart intervals — flush/RSTm/reset round-trips exactly") {
    import graft.multimodal.{JpegArith, JpegCodec}
    // mixed-content blocks; interval 3 over 12 MCUs → 3 restarts with
    // full statistics + DC-prediction resets at each boundary
    val q = Array.fill(64)(1)
    val (w, h) = (32, 24)
    val blocks = (0 until 12).map { b =>
      val c = new Array[Int](64)
      c(0) = (b * 37 % 50) - 25 + 100
      c(1) = if (b % 2 == 0) 3 else -3
      c(20) = if (b % 5 == 2) 260 else 0
      c
    }
    val plain = JpegCodec.decodeLuma(JpegArith.writeGray(w, h, q, blocks))
    val withRst = JpegArith.writeGray(w, h, q, blocks, restartInterval = 3)
    // the stream really contains RST0..RST2 markers
    val rsts = withRst.sliding(2).count(sq =>
      (sq(0) & 0xff) == 0xff && (sq(1) & 0xff) >= 0xd0 && (sq(1) & 0xff) <= 0xd7)
    assert(rsts == 3, s"expected 3 restart markers, found $rsts")
    val luma = JpegCodec.decodeLuma(withRst)
    assert(luma != null, "restart stream must decode")
    assert(java.util.Arrays.equals(luma.pixels, plain.pixels),
      "restart decode must be pixel-identical to the unrestarted stream")
    // a wrong restart index (RST0 corrupted to RST5) rejects loudly
    val bad = withRst.clone()
    var i = 0
    while (!((bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd0)) i += 1
    bad(i + 1) = 0xd5.toByte
    assert(JpegCodec.decodeLuma(bad) == null, "restart index mismatch must null")
    // interval 1 (restart after every MCU) also round-trips
    val one = JpegCodec.decodeLuma(
      JpegArith.writeGray(w, h, q, blocks, restartInterval = 1))
    assert(one != null && java.util.Arrays.equals(one.pixels, plain.pixels))
  }

  test("MP4 trak/stsd walk: per-track codec, dims, audio rate/channels, both tkhd/mdhd versions") {
    import Multimodal.{TrackSpec, writeMp4, mp4Tracks}
    // trackId 2 → v0 layouts; trackId 7 → v1 layouts
    val p = writeMp4(1000, 60000, Seq(
      TrackSpec(2, "vide", "avc1", width = 1920, height = 1080,
        mediaTimescale = 90000, mediaDuration = 90000L * 42),
      TrackSpec(7, "soun", "mp4a", sampleRate = 48000, channels = 2,
        mediaTimescale = 48000, mediaDuration = 48000L * 61)))
    // the container-level decode still works on the track-bearing stream
    val meta = Multimodal.HeaderDecoder.decode(p)
    assert(meta.mime == "video/mp4" && meta.duration_ms == 60000, meta)
    val ts = mp4Tracks(p)
    assert(ts.length == 2, ts.mkString(","))
    val v = ts(0)
    assert(v.track_id == 2 && v.handler == "vide" && v.codec == "avc1", v)
    assert(v.width == 1920 && v.height == 1080 && v.duration_ms == 42000, v)
    val a = ts(1)
    assert(a.track_id == 7 && a.handler == "soun" && a.codec == "mp4a", a)
    assert(a.sample_rate == 48000 && a.channels == 2 && a.duration_ms == 61000, a)
    // v1 video + v0 audio (swapped parities) also parse
    val p2 = writeMp4(1000, 1000, Seq(
      TrackSpec(3, "vide", "hev1", width = 640, height = 480,
        mediaTimescale = 1000, mediaDuration = 5000),
      TrackSpec(4, "soun", "mp4a", sampleRate = 8000, channels = 1,
        mediaTimescale = 8000, mediaDuration = 16000)))
    val ts2 = mp4Tracks(p2)
    assert(ts2.length == 2 && ts2(0).codec == "hev1" && ts2(0).width == 640, ts2.mkString(","))
    assert(ts2(1).sample_rate == 8000 && ts2(1).channels == 1 && ts2(1).duration_ms == 2000)
    // track-free (mvhd-only) streams and garbage yield no tracks, no throw
    assert(mp4Tracks(Multimodal.writeMp4Header(600, 3600, 0)).isEmpty)
    assert(mp4Tracks("not a movie".getBytes).isEmpty)
    assert(mp4Tracks(java.util.Arrays.copyOf(p, 40)).isEmpty)
  }

  test("MP4 (ISO-BMFF) mvhd duration: both version layouts; FLAC STREAMINFO fields") {
    val d = Multimodal.HeaderDecoder
    val v0 = d.decode(Multimodal.writeMp4Header(600, 3600, version = 0))
    assert(v0.mime == "video/mp4" && v0.codec == "mp42" && v0.n_bytes == 136, v0)
    assert(v0.duration_ms == 6000, s"v0 duration ${v0.duration_ms}")
    val v1 = d.decode(Multimodal.writeMp4Header(90000, 90000L * 7300, version = 1))
    assert(v1.duration_ms == 7300L * 1000 && v1.n_bytes == 148, v1)
    // truncated / garbage-sized boxes must not loop or throw
    val cut = java.util.Arrays.copyOf(Multimodal.writeMp4Header(600, 3600, 0), 24)
    assert(d.decode(cut).mime == "video/mp4")
    val flac = d.decode(Multimodal.writeFlacHeader(44100, 2, 44100L * 185))
    assert(flac.mime == "audio/flac" && flac.codec == "flac", flac)
    assert(flac.sample_rate == 44100 && flac.channels == 2 &&
      flac.duration_ms == 185000, flac)
    // 36-bit total-sample field: top nibble lives in byte 21
    val big = d.decode(Multimodal.writeFlacHeader(48000, 1, (5L << 32) | 123L))
    assert(big.duration_ms == ((5L << 32) | 123L) * 1000 / 48000, big)
    // a FLAC whose first block is not STREAMINFO falls back to the stub
    val wrong = Multimodal.writeFlacHeader(48000, 1, 1)
    wrong(4) = 0x84.toByte // type 4 (VORBIS_COMMENT) first: not spec-legal
    assert(d.decode(wrong).mime == "application/octet-stream")
  }

  test("MP3 frame header: ID3 skip, both version tables, CBR duration") {
    val d = Multimodal.HeaderDecoder
    // MPEG1 Layer III, 128 kbps (idx 9), 44100 Hz (idx 0), stereo, ID3 pad
    val v1 = d.decode(Multimodal.writeMp3(37, v1 = true, brIdx = 9,
      srIdx = 0, mono = false, audioBytes = 16000))
    assert(v1.mime == "audio/mpeg" && v1.codec == "mp3", v1)
    assert(v1.sample_rate == 44100 && v1.channels == 2, v1)
    assert(v1.duration_ms == 16000L * 8 / 128, v1) // 1000 ms
    assert(v1.n_bytes == 10 + 37 + 16000, v1)
    // MPEG2 table: idx 9 is 80 kbps; 16 kHz (idx 2); mono; no ID3 pad
    val v2 = d.decode(Multimodal.writeMp3(0, v1 = false, brIdx = 9,
      srIdx = 2, mono = true, audioBytes = 10000))
    assert(v2.sample_rate == 16000 && v2.channels == 1, v2)
    assert(v2.duration_ms == 10000L * 8 / 80, v2)
    // raw sync with no ID3 prefix also parses
    val raw = java.util.Arrays.copyOfRange(
      Multimodal.writeMp3(0, v1 = true, brIdx = 9, srIdx = 0,
        mono = false, audioBytes = 4000), 10, 10 + 4000)
    val r = d.decode(raw)
    assert(r.mime == "audio/mpeg" && r.duration_ms == 4000L * 8 / 128, r)
    // free-format (idx 0) and Layer I reject to the stub, not garbage
    val free = raw.clone(); free(2) = 0 // bitrate idx 0
    assert(d.decode(free).mime == "application/octet-stream")
    val layer1 = raw.clone(); layer1(1) = 0xff.toByte // layer bits 11 = I
    assert(d.decode(layer1).mime == "application/octet-stream")
    // ID3 whose declared size overruns the payload falls back to the stub
    val overrun = Multimodal.writeMp3(100, v1 = true, brIdx = 9, srIdx = 0,
      mono = false, audioBytes = 100)
    val cut = java.util.Arrays.copyOf(overrun, 60)
    assert(d.decode(cut).mime == "application/octet-stream")
  }

  test("resizeMeta caps dimensions preserving aspect") {
    val resized = Multimodal.resizeMeta(Multimodal.withMeta(spark, payloads()), 128)
    assert(resized.collect().forall(r =>
      r.meta.width <= 128 && r.meta.height <= 128 && r.meta.width >= 1))
  }

  // ---- PNG pixel codec (round 4: real decode via JDK zlib) ----

  private def testImage(w: Int, h: Int, ch: Int, seed: Int): PngCodec.Image = {
    val px = Array.tabulate[Byte](w * h * ch)(i => ((seed * 31 + i * 7) % 256).toByte)
    PngCodec.Image(w, h, ch, px)
  }

  test("PngCodec round-trips every filter mode and color type exactly") {
    for (ch <- Seq(1, 2, 3, 4); filterMode <- -1 to 4) {
      val img = testImage(13, 9, ch, seed = ch * 10 + filterMode + 5)
      val decoded = PngCodec.decode(PngCodec.encode(img, filterMode))
      assert(decoded != null, s"ch=$ch filter=$filterMode must decode")
      assert(decoded.width == 13 && decoded.height == 9 && decoded.channels == ch)
      assert(java.util.Arrays.equals(decoded.pixels, img.pixels),
        s"pixels must round-trip exactly (ch=$ch filter=$filterMode)")
    }
  }

  test("PngCodec agrees with the JDK's own PNG codec both directions") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // ours → ImageIO: the cycling-filter encode must be readable by a
    // fully independent decoder, pixel-exact
    val img = testImage(17, 11, 3, seed = 42)
    val viaJdk = ImageIO.read(new java.io.ByteArrayInputStream(PngCodec.encode(img)))
    assert(viaJdk.getWidth == 17 && viaJdk.getHeight == 11)
    for (y <- 0 until 11; x <- 0 until 17) {
      val base = (y * 17 + x) * 3
      val expected = ((img.pixels(base) & 0xff) << 16) |
        ((img.pixels(base + 1) & 0xff) << 8) | (img.pixels(base + 2) & 0xff)
      assert((viaJdk.getRGB(x, y) & 0xffffff) == expected, s"pixel ($x,$y)")
    }
    // ImageIO → ours: decode a PNG we did not write
    val bi = new BufferedImage(8, 6, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 6; x <- 0 until 8) bi.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8) | 0x33)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(bi, "png", bos)
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours != null && ours.width == 8 && ours.height == 6 && ours.channels == 3)
    for (y <- 0 until 6; x <- 0 until 8) {
      val base = (y * 8 + x) * 3
      assert((ours.pixels(base) & 0xff) == x * 30 && (ours.pixels(base + 1) & 0xff) == y * 40 &&
        (ours.pixels(base + 2) & 0xff) == 0x33, s"pixel ($x,$y)")
    }
  }

  test("PngCodec rejects corruption and unsupported variants honestly") {
    val good = PngCodec.encode(testImage(10, 10, 1, seed = 7))
    assert(PngCodec.decode(good) != null)
    // CRC corruption: flip one IDAT byte
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(PngCodec.decode(corrupt) == null, "CRC mismatch must reject")
    assert(PngCodec.decode(good.take(30)) == null, "truncated must reject")
    assert(PngCodec.decode("not a png at all".getBytes) == null)
    // palette PNG (color type 3): decodes as of round 5 (expanded to RGB)
    import java.awt.image.BufferedImage
    val indexed = new BufferedImage(5, 5, BufferedImage.TYPE_BYTE_INDEXED)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(indexed, "png", bos)
    val pal = PngCodec.decode(bos.toByteArray)
    assert(pal != null && pal.channels == 3 && pal.pixels.forall(_ == 0))
  }

  test("palette PNG expands through PLTE to ImageIO's exact colors") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 9, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, java.awt.Color.HSBtoRGB((x * 9 + y) / 144f, 0.8f, 0.9f))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours != null && ours.channels == 3, String.valueOf(ours))
    for (y <- 0 until 9; x <- 0 until 16) {
      val rgb = img.getRGB(x, y)
      val o = (y * 16 + x) * 3
      assert((ours.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == (rgb & 0xff), s"($x,$y)")
    }
  }

  test("1-bit PNG scales to 0/255 and matches ImageIO") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(19, 7, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 7; x <- 0 until 19)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours != null && ours.channels == 1, String.valueOf(ours))
    for (y <- 0 until 7; x <- 0 until 19) {
      val expect = if ((x + y) % 2 == 0) 255 else 0
      assert((ours.pixels(y * 19 + x) & 0xff) == expect, s"($x,$y)")
    }
  }

  test("16-bit grayscale PNG takes the high byte (ImageIO raster >> 8)") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(33, 5, BufferedImage.TYPE_USHORT_GRAY)
    val r = img.getRaster
    for (y <- 0 until 5; x <- 0 until 33)
      r.setSample(x, y, 0, (x * 1999 + y * 13007) % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ours = PngCodec.decode(bos.toByteArray)
    assert(ours != null && ours.channels == 1, String.valueOf(ours))
    for (y <- 0 until 5; x <- 0 until 33)
      assert((ours.pixels(y * 33 + x) & 0xff) == (r.getSample(x, y, 0) >> 8),
        s"($x,$y)")
  }

  test("Adam7 interlaced PNG de-interlaces to ImageIO's exact pixels") {
    import java.awt.image.BufferedImage
    // odd dims exercise the empty/partial pass edge cases
    val img = new BufferedImage(21, 13, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 13; x <- 0 until 21)
      img.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 19) % 256 << 8) | ((x * y) % 256))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    assert((bytes(8 + 8 + 12) & 0xff) == 1, "fixture must actually be interlaced")
    val ours = PngCodec.decode(bytes)
    assert(ours != null && ours.channels == 3, String.valueOf(ours))
    for (y <- 0 until 13; x <- 0 until 21) {
      val rgb = img.getRGB(x, y)
      val o = (y * 21 + x) * 3
      assert((ours.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == (rgb & 0xff), s"($x,$y)")
    }
  }

  test("png_width/png_height/png_pixel_sum work from SQL") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val img = testImage(7, 5, 1, seed = 11)
    val expectedSum = img.pixels.map(p => (p & 0xff).toLong).sum
    Seq((1L, PngCodec.encode(img)), (2L, "nope".getBytes))
      .toDF("id", "payload").createOrReplaceTempView("media")
    val rows = spark.sql(
      """SELECT id, png_width(payload) w, png_height(payload) h,
         png_pixel_sum(payload) s FROM media ORDER BY id""").collect()
    assert(rows(0).getInt(1) == 7 && rows(0).getInt(2) == 5 &&
      rows(0).getLong(3) == expectedSum)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }

  test("pngPixelStats: real sums for PNGs, one schema for mixed corpora") {
    import spark.implicits._
    val img1 = testImage(6, 4, 1, seed = 3) // sum computable
    val expectedSum = img1.pixels.map(_ & 0xff).map(_.toLong).sum
    val rows = Seq(
      (1L, PngCodec.encode(img1)),
      (2L, "plain text payload".getBytes)).toDF("id", "payload")
    val stats = Multimodal.pngPixelStats(Multimodal.withMeta(spark, rows))
      .collect().map(s => s.id -> s).toMap
    assert(stats(1L).decoded && stats(1L).n_pixels == 24 &&
      stats(1L).sum_pixels == expectedSum && stats(1L).channels == 1)
    assert(!stats(2L).decoded && stats(2L).sum_pixels == 0L)
  }

  test("baseline JPEG grayscale: luma within ±2 of ImageIO's decode") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(40, 25, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 25; x <- 0 until 40) {
      val g = (128 + 100 * math.sin(x * 0.4) * math.cos(y * 0.3)).toInt
      img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, g)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val ours = graft.multimodal.JpegCodec.decodeLuma(bos.toByteArray)
    assert(ours != null && ours.width == 40 && ours.height == 25, String.valueOf(ours))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    var maxDiff = 0
    for (y <- 0 until 25; x <- 0 until 40) {
      val d = math.abs((ours.pixels(y * 40 + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2, s"IDCTs disagree beyond T.81 tolerance: $maxDiff")
  }

  test("baseline JPEG color (4:2:0): luma matches Y recomputed from ImageIO RGB") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) % 256 << 16) | ((y * 11) % 256 << 8) | ((x + y) * 5 % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val ours = graft.multimodal.JpegCodec.decodeLuma(bos.toByteArray)
    assert(ours != null, "color baseline must decode")
    // ImageIO's default writer may pick 4:2:0 or 4:4:4; either way our luma
    // plane covers the full frame (luma has the max sampling factor)
    assert(ours.width == 32 && ours.height == 24, s"${ours.width}x${ours.height}")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    var off = 0; var n = 0
    for (y <- 0 until 24; x <- 0 until 32) {
      val rgb = ref.getRGB(x, y)
      val yRef = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      val d = math.abs((ours.pixels(y * 32 + x) & 0xff) - yRef)
      if (d > 3) off += 1
      n += 1
    }
    assert(off == 0, s"$off/$n luma pixels off by more than 3")
  }

  private def encodeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  test("progressive JPEG grayscale: luma within ±2 of ImageIO's decode") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(41, 27, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 27; x <- 0 until 41) {
      val g = (128 + 100 * math.sin(x * 0.37) * math.cos(y * 0.29)).toInt
      img.getRaster.setSample(x, y, 0, math.max(0, math.min(255, g)))
    }
    val bytes = encodeProgressive(img)
    // confirm the fixture really is SOF2 (ImageIO writes a true progressive
    // scan script in MODE_DEFAULT), not a silently-baseline re-encode
    assert(bytes.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2),
      "fixture must contain an SOF2 marker")
    val ours = graft.multimodal.JpegCodec.decodeLuma(bytes)
    assert(ours != null && ours.width == 41 && ours.height == 27, String.valueOf(ours))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until 27; x <- 0 until 41) {
      val d = math.abs((ours.pixels(y * 41 + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2, s"progressive decode off by $maxDiff vs ImageIO")
  }

  test("progressive JPEG color: RGB within tolerance of ImageIO on flat-chroma content") {
    import java.awt.image.BufferedImage
    // grayscale content through a 3-channel container: chroma is flat, so
    // chroma-upsampling-filter differences between decoders vanish and the
    // comparison reduces to the shared T.81 IDCT tolerance
    val img = new BufferedImage(34, 22, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 22; x <- 0 until 34) {
      val g = math.max(0, math.min(255,
        (128 + 90 * math.sin((x + 2 * y) * 0.21)).toInt))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bytes = encodeProgressive(img)
    assert(bytes.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2))
    val ours = graft.multimodal.JpegCodec.decodeRgb(bytes)
    assert(ours != null && ours.width == 34 && ours.height == 22, String.valueOf(ours))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until 22; x <- 0 until 34; c <- 0 until 3) {
      val refC = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours.pixels((y * 34 + x) * 3 + c) & 0xff) - refC)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 4, s"progressive color decode off by $maxDiff vs ImageIO")
  }

  test("JPEG malformed-input rejection") {
    assert(graft.multimodal.JpegCodec.decodeLuma("nope".getBytes) == null)
    assert(graft.multimodal.JpegCodec.decodeLuma(null) == null)
    // truncated progressive stream: null, never a throw or a wild decode
    import java.awt.image.BufferedImage
    val img = new BufferedImage(24, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    val whole = encodeProgressive(img)
    val cut = java.util.Arrays.copyOf(whole, whole.length / 3)
    val lu = graft.multimodal.JpegCodec.decodeLuma(cut)
    assert(lu == null || (lu.width == 24 && lu.height == 24),
      "truncated stream: null or a frame-sized partial decode, never garbage dims")
  }

  test("uncompressed BMP decodes to ImageIO's exact pixels (24-bit, bottom-up)") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(13, 6, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 6; x <- 0 until 13)
      img.setRGB(x, y, ((x * 19) % 256 << 16) | ((y * 41) % 256 << 8) | ((x * y * 7) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val ours = PngCodec.decodeBmp(bos.toByteArray)
    assert(ours != null && ours.channels == 3 && ours.width == 13 && ours.height == 6,
      String.valueOf(ours))
    for (y <- 0 until 6; x <- 0 until 13) {
      val rgb = img.getRGB(x, y)
      val o = (y * 13 + x) * 3
      assert((ours.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == (rgb & 0xff), s"($x,$y)")
    }
    assert(PngCodec.decodeBmp("BMnope".getBytes) == null)
    assert(PngCodec.decodeBmp(null) == null)
  }

  test("GIF decodes through LZW to ImageIO's exact colors (incl. interlace)") {
    import java.awt.image.BufferedImage
    // indexed content with enough variety to exercise dictionary growth
    val img = new BufferedImage(37, 23, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 23; x <- 0 until 37)
      img.setRGB(x, y, java.awt.Color.HSBtoRGB((x * 23 + y * 5) / 851f, 0.7f, 0.95f))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val ours = graft.multimodal.GifCodec.decode(bos.toByteArray)
    assert(ours != null && ours.channels == 3 && ours.width == 37 && ours.height == 23,
      String.valueOf(ours))
    for (y <- 0 until 23; x <- 0 until 37) {
      val rgb = img.getRGB(x, y)
      val o = (y * 37 + x) * 3
      assert((ours.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (ours.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (ours.pixels(o + 2) & 0xff) == (rgb & 0xff), s"($x,$y)")
    }
    assert(graft.multimodal.GifCodec.decode("GIF89a".getBytes) == null)
    assert(graft.multimodal.GifCodec.decode(null) == null)
  }

  test("JPEG RGB decode: grayscale-content color JPEG matches ImageIO within tolerance") {
    import java.awt.image.BufferedImage
    // RGB image with R=G=B content: chroma planes are flat 128, so any
    // chroma upsampling strategy agrees and RGB must match within the
    // IDCT tolerance
    val img = new BufferedImage(24, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 24) {
      val g = math.max(0, math.min(255, (96 + 5 * x + 3 * y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val ours = graft.multimodal.JpegCodec.decodeRgb(bos.toByteArray)
    assert(ours != null && ours.channels == 3 && ours.width == 24, String.valueOf(ours))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 24; c <- 0 until 3) {
      val rc = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours.pixels((y * 24 + x) * 3 + c) & 0xff) - rc)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 3, s"flat-chroma RGB disagrees: $maxDiff")
    // colorful content: channel ordering sanity within a loose band (chroma
    // upsampling strategies legitimately differ on edges)
    val col = new BufferedImage(24, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 24)
      col.setRGB(x, y, (math.min(255, x * 10) << 16) | (math.min(255, y * 12) << 8) | 60)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(col, "jpg", bos2)
    val ours2 = graft.multimodal.JpegCodec.decodeRgb(bos2.toByteArray)
    val ref2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos2.toByteArray))
    var worst = 0
    for (y <- 2 until 14; x <- 2 until 22; c <- 0 until 3) {
      val rc = (ref2.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours2.pixels((y * 24 + x) * 3 + c) & 0xff) - rc)
      worst = math.max(worst, d)
    }
    assert(worst <= 32, s"color RGB wildly off (channel swap?): $worst")
    // grayscale JPEG replicates luma into all three channels
    val g1 = new BufferedImage(9, 9, BufferedImage.TYPE_BYTE_GRAY)
    val bos3 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(g1, "jpg", bos3)
    val og = graft.multimodal.JpegCodec.decodeRgb(bos3.toByteArray)
    assert(og != null && og.channels == 3)
  }

  test("image dHash: format-independent, brightness-invariant, JPEG-robust") {
    import graft.multimodal.ImageHash
    def gray(w: Int, h: Int, f: (Int, Int) => Int, fmt: String): Array[Byte] = {
      // 24-bit carrier for BMP (ImageIO writes gray BMPs as 8-bit palette,
      // which decodeBmp honestly rejects); gray carrier otherwise
      val img =
        if (fmt == "bmp") new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        else new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        if (fmt == "bmp") { val v = f(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v) }
        else img.getRaster.setSample(x, y, 0, f(x, y))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // smooth structured content: block gradient
    def f(x: Int, y: Int): Int = 40 + (x / 6) * 20 + (y / 6) * 5
    val hPng = ImageHash.dhash(gray(36, 24, f, "png"))
    val hBmp = ImageHash.dhash(gray(36, 24, f, "bmp"))
    assert(hPng != null && hPng == hBmp, "lossless formats agree exactly")
    // the SAME content through lossy JPEG stays within a few bits
    val hJpg = ImageHash.dhash(gray(36, 24, f, "jpg"))
    assert(hJpg != null &&
      ImageHash.hamming(hPng, hJpg) <= 6,
      s"JPEG drift: ${ImageHash.hamming(hPng, hJpg)}")
    // brightness shift: identical
    assert(hPng == ImageHash.dhash(gray(36, 24, (x, y) => f(x, y) + 15, "png")))
    // inverted gradient: far away
    val hInv = ImageHash.dhash(gray(36, 24, (x, y) => 240 - f(x, y), "png"))
    assert(ImageHash.hamming(hPng, hInv) >= 20)
    // undecodable bytes
    assert(ImageHash.dhash(Array[Byte](1, 2, 3, 4)) == null)
  }

  test("FastCDC: determinism, bounds, and edit locality") {
    import graft.multimodal.Cdc
    val rnd = new scala.util.Random(31)
    val data = Array.fill(20000)(rnd.nextInt(256).toByte)
    val a = Cdc.chunks(data)
    val b = Cdc.chunks(data)
    assert(a.toSeq == b.toSeq, "deterministic")
    // cover the whole input contiguously, respect hard bounds
    assert(a.head.offset == 0 && a.map(_.length).sum == data.length)
    a.sliding(2).foreach { case Array(x, y) =>
      assert(y.offset == x.offset + x.length)
    case _ => }
    a.dropRight(1).foreach(c => assert(c.length >= 64 && c.length <= 1024,
      s"bounds: ${c.length}"))
    // edit locality: insert one byte near the front; most chunk HASHES
    // survive even though every offset after the edit shifts
    val edited = (data.take(100) :+ 0x55.toByte) ++ data.drop(100)
    val ae = Cdc.chunks(edited)
    val shared = a.map(_.hash).toSet.intersect(ae.map(_.hash).toSet).size
    assert(shared >= a.length * 2 / 3,
      s"CDC must localize the edit: $shared of ${a.length} chunks survive")
    // a fixed-size chunker would lose everything after offset 100:
    val fixedShared = data.grouped(256).map(_.toSeq).toSet
      .intersect(edited.grouped(256).map(_.toSeq).toSet).size
    assert(shared > fixedShared, "CDC must beat fixed-size blocks")
    // content-pure hashing: same bytes at different positions, same hash
    assert(Cdc.chunks(data.slice(a(2).offset, a(2).offset + a(2).length))
      .map(_.hash).headOption.isDefined)
    // empty + tiny inputs
    assert(Cdc.chunks(Array.empty[Byte]).isEmpty)
    val tiny = Cdc.chunks(Array[Byte](1, 2, 3))
    assert(tiny.length == 1 && tiny(0).length == 3)
    intercept[IllegalArgumentException](Cdc.chunks(data, 100, 50, 200))
  }

  test("mp4Keyframes: stts expansion, stss subset, absent-stss = all sync") {
    import graft.multimodal.Multimodal.{KeySample, TrackSpec, mp4Keyframes, writeMp4}
    val v = TrackSpec(3, "vide", "avc1", width = 320, height = 240,
      mediaTimescale = 600, mediaDuration = 2400,
      sttsRuns = Seq((4, 100), (2, 400)), sizes = Seq(10, 20, 30, 40, 50, 60),
      sync = Seq(1, 5))
    val ks = mp4Keyframes(writeMp4(600, 2400, Seq(v)))
    // sample 1 -> t=0; sample 5 -> 4*100 + 0*400 = 400 units = 666 ms
    assert(ks.toSeq == Seq(
      KeySample(3, 1, 0, 0, 10), KeySample(3, 5, 400, 666, 50)), ks.toSeq)
    // absent stss: every sample is a sync sample
    val all = TrackSpec(4, "vide", "avc1", mediaTimescale = 1000,
      sttsRuns = Seq((3, 500)), sizes = Seq(7, 8, 9))
    val ka = mp4Keyframes(writeMp4(1000, 1500, Seq(all)))
    assert(ka.map(_.sample_no).toSeq == Seq(1, 2, 3) &&
      ka.map(_.time_ms).toSeq == Seq(0, 500, 1000) &&
      ka.map(_.size).toSeq == Seq(7, 8, 9), ka.toSeq)
    // a track with no sample tables contributes nothing; non-BMFF is empty
    val bare = TrackSpec(5, "soun", "mp4a", sampleRate = 8000, channels = 1)
    assert(mp4Keyframes(writeMp4(1000, 1000, Seq(bare))).isEmpty)
    assert(mp4Keyframes(Array[Byte](1, 2, 3)).isEmpty)
    // out-of-range stss sample numbers are dropped, in-range kept
    val oob = TrackSpec(6, "vide", "avc1", mediaTimescale = 1000,
      sttsRuns = Seq((2, 100)), sizes = Seq(1, 2), sync = Seq(2, 9))
    assert(mp4Keyframes(writeMp4(1000, 200, Seq(oob))).map(_.sample_no).toSeq
      == Seq(2))
  }

  test("lossless JPEG: decode∘encode sample-exact over predictors/precisions") {
    import graft.multimodal.JpegLossless
    val rnd = new scala.util.Random(11)
    for (precision <- Seq(8, 12, 16); predictor <- 1 to 7) {
      val w = 13; val h = 9
      val maxV = (1 << precision) - 1
      val plane = Array.fill(w * h)(rnd.nextInt(maxV + 1))
      val bytes = JpegLossless.write(w, h, precision, predictor, 0,
        Array(plane))
      val f = JpegLossless.decode(bytes)
      assert(f != null, s"p=$precision pred=$predictor must decode")
      assert(f.width == w && f.height == h && f.precision == precision)
      assert(f.samples(0).sameElements(plane),
        s"p=$precision pred=$predictor not lossless")
    }
  }

  test("lossless JPEG: multi-component, point transform, restarts") {
    import graft.multimodal.JpegLossless
    val rnd = new scala.util.Random(12)
    val w = 10; val h = 6
    // 3 components, 12-bit, predictor 4 (Ra+Rb-Rc)
    val planes = Array.fill(3)(Array.fill(w * h)(rnd.nextInt(4096)))
    val f3 = JpegLossless.decode(JpegLossless.write(w, h, 12, 4, 0, planes))
    assert(f3 != null && f3.samples.length == 3)
    (0 until 3).foreach(ci => assert(f3.samples(ci).sameElements(planes(ci))))
    // point transform pt=2: samples multiples of 4 survive exactly
    val pt = Array.fill(w * h)(rnd.nextInt(1024) * 4)
    val fp = JpegLossless.decode(JpegLossless.write(w, h, 12, 1, 2, Array(pt)))
    assert(fp != null && fp.samples(0).sameElements(pt), "pt=2 exact")
    // restart interval mid-rows
    val r = Array.fill(w * h)(rnd.nextInt(256))
    val fr = JpegLossless.decode(
      JpegLossless.write(w, h, 8, 7, 0, Array(r), restartInterval = 17))
    assert(fr != null && fr.samples(0).sameElements(r), "restart-interval exact")
    // 8-bit lossless joins the jpeg_luma_* path
    val luma = graft.multimodal.JpegCodec.decodeLuma(
      JpegLossless.write(w, h, 8, 1, 0, Array(r)))
    assert(luma != null && luma.width == w &&
      luma.pixels.map(_ & 0xff).sameElements(r), "SOF3 via decodeLuma")
  }

  test("12-bit SOF1: DC-only closed form, 16-bit DQT, marker honesty") {
    import graft.multimodal.Jpeg12
    val q = Array.fill(64)(8) // q0=8 -> pixel = c0 + 2048 exactly
    val blocks = (0 until 6).map { i =>
      val c = new Array[Int](64); c(0) = 100 * i - 200; c
    }
    val bytes = Jpeg12.writeGray(24, 16, 12, q, blocks)
    val f = Jpeg12.decode(bytes)
    assert(f != null && f.width == 24 && f.height == 16 && f.precision == 12)
    // every 8x8 block is flat at c0*8/8 + 2048 = c0 + 2048
    for (by <- 0 until 2; bx <- 0 until 3) {
      val expect = 100 * (by * 3 + bx) - 200 + 2048
      for (yy <- 0 until 8; xx <- 0 until 8)
        assert(f.plane((by * 8 + yy) * 24 + bx * 8 + xx) == expect,
          s"block ($bx,$by) expected $expect")
    }
    val sum = graft.multimodal.Jpeg12.sampleSum(bytes)
    val closed = (0 until 6).map(i => (100 * i - 200 + 2048).toLong * 64).sum
    assert(sum == closed, s"closed-form sum: $sum vs $closed")
    // values past 12 bits clamp
    val hot = (0 until 6).map { i => val c = new Array[Int](64); c(0) = 3000; c }
    val fh = Jpeg12.decode(Jpeg12.writeGray(24, 16, 12, q, hot))
    assert(fh.plane.forall(_ == 4095), "clamp to 2^12-1")
    // the baseline decoder must NOT claim SOF1 streams
    assert(graft.multimodal.JpegCodec.decodeLuma(bytes) == null)
  }
}
