package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Exif

class ExifSpec extends AnyFunSuite {

  test("roundtrip: both byte orders, inline and offset-area strings") {
    for (le <- Seq(true, false)) {
      val b = Exif.writeExifJpeg("NikonCorp", "D850", 6,
        "2024:05:01 12:00:00", "2024:04:30 08:30:15", littleEndian = le)
      val m = Exif.parse(b)
      assert(m.make == "NikonCorp" && m.model == "D850", s"le=$le: $m")
      assert(m.orientation == 6)
      assert(m.datetime == "2024:05:01 12:00:00")
      assert(m.dt_original == "2024:04:30 08:30:15")
      // short strings ride inline in the 4-byte value field
      val s = Exif.parse(Exif.writeExifJpeg("abc", "x", 1,
        "t", "yy", littleEndian = le))
      assert(s.make == "abc" && s.model == "x" &&
        s.datetime == "t" && s.dt_original == "yy")
    }
  }

  test("null-on-garbage: truncation, bad magic, non-exif app1, fuzz") {
    val good = Exif.writeExifJpeg("A", "B", 1, "c", "d", littleEndian = true)
    assert(Exif.parse(Array[Byte]()) == Exif.parse(Array[Byte](1, 2, 3)))
    assert(Exif.parse(good.take(6)).make == null)
    // flip the TIFF magic
    val bad = good.clone(); bad(12) = 'X'.toByte
    assert(Exif.parse(bad).make == null)
    // plain JPEG without APP1 parses to empty, never throws
    assert(Exif.parse(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
      .orientation == 0)
    // byte-level fuzz must never throw
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Exif.parse(mut)
      Exif.parse(mut.take(rnd.nextInt(mut.length)))
    }
  }

  test("orientation range and exif ifd chaining") {
    for (o <- 1 to 8) {
      val m = Exif.parse(Exif.writeExifJpeg("M", "N", o,
        "2024:01:01 00:00:00", "2020:01:01 00:00:00", littleEndian = o % 2 == 0))
      assert(m.orientation == o)
      assert(m.dt_original.startsWith("2020"))
    }
  }
}
