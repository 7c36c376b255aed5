package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileGdb, FileGdbCodec}

/** Minimal FileGDB (.gdbtable) decoder: round-trip through the fixture
  * writer, largest-table layer selection, and corrupt-input termination —
  * the same contracts the shapefile decoder carries. */
class FileGdbSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpGdb(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("gdbspec")

  test("point table round-trips attributes and scaled-varint coordinates") {
    val rows = Seq(
      (Seq[Any](42.0, "alpha"), 116.5, 39.25),
      (Seq[Any](-7.0, "beta"), -179.5, -89.75),
      (Seq[Any](0.0, ""), 0.5, 0.25))
    val bytes = FileGdbCodec.writePointTable(Seq("score" -> 3, "name" -> 4), rows)
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 3)
    decoded.zip(rows).zipWithIndex.foreach { case (((no, attrs, wkb), (vals, x, y)), i) =>
      assert(no == i + 1)
      assert(attrs("OBJECTID") == (i + 1).toString)
      assert(attrs("score").toDouble == vals.head.asInstanceOf[Double])
      assert(attrs("name") == vals(1))
      val p = graft.geom.GeomLib.readOrNull(wkb)
      assert(p.getCoordinate.x == x, s"x must round-trip exactly via xyscale 1e9")
      assert(p.getCoordinate.y == y)
    }
  }

  test("int32 fields and many rows decode") {
    val rows = (1 to 500).map(i => (Seq[Any](i, s"t${i % 3}"), i * 0.5 - 100.0, i * 0.25 - 50.0))
    val bytes = FileGdbCodec.writePointTable(Seq("k" -> 1, "tag" -> 4), rows)
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 500)
    assert(decoded.map(_._2("k").toInt).sum == (1 to 500).sum)
  }

  test("readLargest picks the biggest table and reads it distributed") {
    val dir = tmpGdb()
    val big = FileGdbCodec.writePointTable(Seq("v" -> 3),
      (1 to 100).map(i => (Seq[Any](i.toDouble), i * 1.0, i * 0.5)))
    val small = FileGdbCodec.writePointTable(Seq("v" -> 3),
      Seq((Seq[Any](9.0), 1.0, 1.0)))
    java.nio.file.Files.write(dir.resolve("a00000004.gdbtable"), big)
    java.nio.file.Files.write(dir.resolve("a00000001.gdbtable"), small)
    val df = FileGdb.readLargest(spark, dir.toString)
    assert(df.count() == 100)
    val s = df.agg(sum(element_at(col("attrs"), "v").cast("double"))).head().getDouble(0)
    assert(s == (1 to 100).sum.toDouble)
  }

  test("corrupt length prefix terminates the scan, keeping decoded rows") {
    val rows = (1 to 10).map(i => (Seq[Any](i.toDouble), i * 1.0, i * 1.0))
    val bytes = FileGdbCodec.writePointTable(Seq("v" -> 3), rows)
    // find the start of row blobs and wreck the 4th row's length prefix
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fieldOff = bb.getLong(32)
    var pos = fieldOff + 4 + bb.getInt(fieldOff.toInt)
    (0 until 3).foreach { _ => pos += 4 + bb.getInt(pos.toInt) }
    bb.putInt(pos.toInt, -12) // negative blob length
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 3, s"decode up to the corruption then stop: ${decoded.length}")
  }

  test("garbage and truncated input decode to empty, never throw") {
    assert(FileGdbCodec.decode(Array.emptyByteArray).isEmpty)
    assert(FileGdbCodec.decode(Array.fill[Byte](100)(0x5a)).isEmpty)
    val ok = FileGdbCodec.writePointTable(Seq("v" -> 3), Seq((Seq[Any](1.0), 2.0, 3.0)))
    assert(FileGdbCodec.decode(ok.take(60)).isEmpty)
  }
}
