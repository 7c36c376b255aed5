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

  test("signed varints round-trip across magnitudes and signs") {
    val vals = Seq(0L, 1L, -1L, 63L, -63L, 64L, -64L, 8191L, -8192L,
      1L << 40, -(1L << 40), Long.MaxValue / 2, -(Long.MaxValue / 2))
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach(v => FileGdbCodec.writeVarint(out, v))
    val bb = java.nio.ByteBuffer.wrap(out.toByteArray)
    vals.foreach(v => assert(FileGdbCodec.readVarint(bb) == v, s"varint $v"))
  }

  test("polygon ribbon round-trips: shell + hole, exact area and vertices") {
    // 10x10 CW shell with a 2x2 CCW hole — ESRI orientation
    val shell = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    val bytes = FileGdbCodec.writeShapeTable(Seq("v" -> 3), 5,
      Seq((Seq[Any](1.0), Seq(shell, hole))))
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 1)
    val g = graft.geom.GeomLib.readOrNull(decoded.head._3)
    assert(g != null && g.getGeometryType == "Polygon")
    assert(g.getArea == 96.0, s"area ${g.getArea}") // 100 - 4, exact
    assert(g.getNumPoints == 10)
    assert(g.asInstanceOf[org.locationtech.jts.geom.Polygon].getNumInteriorRing == 1)
  }

  test("multi-part polyline ribbon with negative deltas round-trips") {
    val a = Seq((5.0, 5.0), (-3.0, 2.0), (-3.0, -4.0)) // crosses origin, negative deltas
    val b = Seq((100.0, -50.0), (101.0, -49.0))
    val bytes = FileGdbCodec.writeShapeTable(Seq("v" -> 3), 3,
      Seq((Seq[Any](1.0), Seq(a, b))))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
    assert(g != null && g.getGeometryType == "MultiLineString")
    assert(g.getNumGeometries == 2)
    val l0 = g.getGeometryN(0)
    assert(l0.getCoordinates.map(c => (c.x, c.y)).toSeq == a)
    assert(g.getGeometryN(1).getCoordinates.map(c => (c.x, c.y)).toSeq == b)
  }

  test("multipoint ribbon round-trips, incl. negative deltas and Z skip") {
    val pts1 = Seq((10.0, 5.0), (9.5, 5.5), (-3.25, -7.75)) // negative deltas
    val pts2 = Seq((0.125, 0.0625))                          // single point
    val bytes = FileGdbCodec.writeMultipointTable(Seq("tag" -> 4),
      Seq((Seq[Any]("a"), pts1), (Seq[Any]("b"), pts2)), trailingBytes = 6)
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 2)
    val g1 = graft.geom.GeomLib.readOrNull(decoded(0)._3)
    assert(g1.getGeometryType == "MultiPoint" && g1.getNumGeometries == 3)
    val got = (0 until 3).map { i =>
      val c = g1.getGeometryN(i).getCoordinate; (c.x, c.y)
    }
    assert(got == pts1, s"exact round-trip via xyscale 1e9: $got")
    val g2 = graft.geom.GeomLib.readOrNull(decoded(1)._3)
    assert(g2.getGeometryType == "MultiPoint" && g2.getNumGeometries == 1)
    assert(decoded.map(_._2("tag")) == Seq("a", "b"))
  }

  test("Z/M trailing streams are skipped via the record length prefix") {
    // shape code 19 = polygonZ; the 16 trailing bytes play the z-stream
    val shell = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
    val bytes = FileGdbCodec.writeShapeTable(Seq("v" -> 3), 19,
      Seq((Seq[Any](2.0), Seq(shell)), (Seq[Any](3.0), Seq(shell.map { case (x, y) => (x + 10, y) }))),
      trailingBytes = 16)
    val decoded = FileGdbCodec.decode(bytes)
    assert(decoded.length == 2, "both rows decode despite trailing z bytes")
    decoded.foreach { case (_, _, wkb) =>
      val g = graft.geom.GeomLib.readOrNull(wkb)
      assert(g != null && g.getArea == 16.0)
    }
  }

  test("general polygon (51) decodes; the curves modifier bails to null") {
    val shell = Seq((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0))
    val plain = FileGdbCodec.writeShapeTable(Seq("v" -> 3), 51,
      Seq((Seq[Any](1.0), Seq(shell))))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(plain).head._3)
    assert(g != null && g.getArea == 4.0)
    // curve flag 0x20000000 on the type varuint → honest null, not mis-parse
    val curved = FileGdbCodec.writeShapeTable(Seq("v" -> 3), 0x20000000 | 51,
      Seq((Seq[Any](1.0), Seq(shell))))
    val rows = FileGdbCodec.decode(curved)
    assert(rows.length == 1 && rows.head._3 == null)
  }

  test("garbage and truncated input decode to empty, never throw") {
    assert(FileGdbCodec.decode(Array.emptyByteArray).isEmpty)
    assert(FileGdbCodec.decode(Array.fill[Byte](100)(0x5a)).isEmpty)
    val ok = FileGdbCodec.writePointTable(Seq("v" -> 3), Seq((Seq[Any](1.0), 2.0, 3.0)))
    assert(FileGdbCodec.decode(ok.take(60)).isEmpty)
  }

  test(".gdbtablx round-trips row offsets and cuts monotone splits") {
    val rows = (1 to 100).map(i => (Seq[Any](i.toDouble, "s" * (i % 17)), i * 1.0, i * 0.5))
    val table = FileGdbCodec.writePointTable(Seq("v" -> 3, "pad" -> 4), rows)
    val tablx = FileGdbCodec.writeTablx(table)
    val offs = FileGdbCodec.parseTablx(tablx).get
    assert(offs.length == 100)
    // offsets must point at each row's length prefix: manual walk agrees
    val bb = java.nio.ByteBuffer.wrap(table).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fieldOff = bb.getLong(32)
    var pos = fieldOff + 4 + bb.getInt(fieldOff.toInt)
    offs.foreach { o =>
      assert(o == pos)
      pos += 4 + bb.getInt(pos.toInt)
    }
    val splits = FileGdbCodec.splitRanges(tablx, 30)
    assert(splits.length == 4)
    assert(splits.map(_._2).sum == 100)
    assert(splits.head._1 == 1 && splits.last._1 == 91)
    assert(splits.last._4 == -1L, "last split reads to EOF")
    assert(splits.sliding(2).forall { case Seq(a, b) => a._4 == b._3 },
      "consecutive splits tile the byte range")
    // variable-width entries: re-encode at width 4 and 6 parse identically
    Seq(4, 6).foreach { w =>
      val out = java.nio.ByteBuffer.allocate(16 + 1024 * w)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.putInt(3); out.putInt(1); out.putInt(100); out.putInt(w)
      offs.foreach { v => (0 until w).foreach(b => out.put(((v >> (8 * b)) & 0xff).toByte)) }
      assert(FileGdbCodec.parseTablx(out.array()).get.toSeq == offs.toSeq, s"width $w")
    }
  }

  test("splitRanges rejects sparse and non-monotonic indexes") {
    val rows = (1 to 10).map(i => (Seq[Any](i.toDouble), i * 1.0, i * 1.0))
    val tablx = FileGdbCodec.writeTablx(FileGdbCodec.writePointTable(Seq("v" -> 3), rows))
    assert(FileGdbCodec.splitRanges(tablx, 4).nonEmpty)
    // swap two offsets (entries are 5 bytes from byte 16) → reject
    val bad = tablx.clone()
    val a = bad.slice(16, 21); System.arraycopy(bad, 21, bad, 16, 5)
    System.arraycopy(a, 0, bad, 21, 5)
    assert(FileGdbCodec.splitRanges(bad, 4).isEmpty)
    // zero first offset (deleted row) → reject
    val zeroed = tablx.clone()
    (16 until 21).foreach(i => zeroed(i) = 0)
    assert(FileGdbCodec.splitRanges(zeroed, 4).isEmpty)
    // sparse header (fewer blocks than rows claim) → parseTablx None
    val sparse = tablx.clone()
    val sb = java.nio.ByteBuffer.wrap(sparse).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.putInt(8, 2000) // 2000 rows > 1 block × 1024
    assert(FileGdbCodec.parseTablx(sparse).isEmpty)
  }

  test("readLargestSplit ≡ readLargest across split sizes, incl. fallback") {
    val dir = tmpGdb()
    val shell = (x: Double, y: Double) => Seq(
      (x - 0.5, y - 0.5), (x - 0.5, y + 0.5), (x + 0.5, y + 0.5),
      (x + 0.5, y - 0.5), (x - 0.5, y - 0.5))
    val rows = (1 to 137).map(i =>
      (Seq[Any](i.toDouble, s"tag${i % 5}"), Seq(shell(i * 2.0, i * 1.0))))
    val table = FileGdbCodec.writeShapeTable(Seq("v" -> 3, "tag" -> 4), 5, rows)
    java.nio.file.Files.write(dir.resolve("a00000007.gdbtable"), table)
    java.nio.file.Files.write(dir.resolve("a00000007.gdbtablx"),
      FileGdbCodec.writeTablx(table))
    import graft.functions.GraftFunctions.{st_area, st_xmin}
    def proj(df: org.apache.spark.sql.DataFrame) = df.select(
      col("row_no"), element_at(col("attrs"), "v").as("v"),
      element_at(col("attrs"), "tag").as("tag"),
      st_area(col("geom")).as("area"), st_xmin(col("geom")).as("xmin"))
    val whole = proj(FileGdb.readLargest(spark, dir.toString))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int])
    Seq(10, 137, 1000).foreach { mrs =>
      val split = proj(FileGdb.readLargestSplit(spark, dir.toString, mrs))
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int])
      assert(split.toSeq == whole.toSeq, s"maxRowsPerSplit=$mrs")
    }
    // no .gdbtablx sidecar → silent fallback to the whole-file path
    val dir2 = tmpGdb()
    java.nio.file.Files.write(dir2.resolve("a00000007.gdbtable"), table)
    val fb = FileGdb.readLargestSplit(spark, dir2.toString, 10)
    assert(fb.count() == 137)
  }

  test("circular-arc curve densifies onto the circle; sweep direction honored") {
    // polyline (0,0) -> (2,0) with a CCW arc centered at (1,0): starting at
    // the circle's west point, counter-clockwise sweeps the LOWER
    // semicircle, radius 1. Densified at <=5 deg per step -> >=36 segments,
    // every interior vertex exactly on the circle.
    val bytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0x8)))))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
    assert(g != null && g.getGeometryType == "LineString")
    assert(g.getNumPoints >= 36, s"densified points ${g.getNumPoints}")
    val cs = g.getCoordinates
    cs.foreach { c =>
      assert(math.abs(math.hypot(c.x - 1.0, c.y - 0.0) - 1.0) < 1e-9, c.toString)
      assert(c.y <= 1e-9, s"CCW from the west point sweeps the lower half: $c")
    }
    assert(g.getLength > math.Pi - 0.01 && g.getLength < math.Pi + 0.001,
      s"semicircle length ${g.getLength}")
    // CW (bits=0) over the same endpoints sweeps the UPPER semicircle
    val cw = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0)))))
    val gcw = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(cw).head._3)
    gcw.getCoordinates.foreach(c => assert(c.y >= -1e-9, s"CW arc above: $c"))
  }

  test("curves with Z and M streams decode; unresolvable M forms null loudly") {
    // same CCW semicircle as above, but the record carries a Z delta
    // stream between the XY ribbon and the arc descriptor, and the layer
    // header declares Z (presence byte 4 + zorigin/zscale/ztolerance) —
    // both must be walked or the descriptor bytes misalign
    val zBytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0x8)))),
      withZ = true)
    val gz = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(zBytes).head._3)
    assert(gz != null && gz.getGeometryType == "LineString", String.valueOf(gz))
    assert(gz.getNumPoints >= 36, s"densified points ${gz.getNumPoints}")
    gz.getCoordinates.foreach { c =>
      assert(math.abs(math.hypot(c.x - 1.0, c.y) - 1.0) < 1e-9, c.toString)
      assert(c.y <= 1e-9, s"CCW from the west point sweeps the lower half: $c")
    }
    // attributes around the 3D-declared layer still decode (field-header
    // z origin/scale/tolerance skipping — misalignment would break this)
    assert(FileGdbCodec.decode(zBytes).head._2("v") == "1.0")
    // curves + M (round 7): the M stream's form (full per-vertex deltas vs
    // the all-NaN short forms) is resolved by record-length validation —
    // every authored form must decode to the SAME arc geometry
    val mRow = Seq((Seq[Any](2.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
      Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0x8))))
    val noM = FileGdbCodec.decode(FileGdbCodec.writeCurveShapeTable(
      Seq("v" -> 3), polygon = false, mRow)).head._3
    assert(noM != null)
    for (form <- Seq("full", "absent", "one")) {
      val mBytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3),
        polygon = false, mRow, withM = true, mForm = form)
      val got = FileGdbCodec.decode(mBytes).head._3
      assert(got != null, s"curve+M ($form) must decode")
      assert(java.util.Arrays.equals(got, noM),
        s"curve+M ($form) must match the no-M geometry")
    }
    // curve + M + Z together: Z walked, M validated, same geometry
    val zmBytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3),
      polygon = false, mRow, withZ = true, withM = true, mForm = "full")
    assert(java.util.Arrays.equals(FileGdbCodec.decode(zmBytes).head._3, noM))
    // an M stream whose length fits NO candidate form (extra varints shift
    // the descriptors off every attempted offset): null, never a
    // misaligned guess
    val extra = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3),
      polygon = false, mRow, withM = true, mForm = "full", extraMVarints = 2)
    assert(FileGdbCodec.decode(extra).head._3 == null,
      "misaligned M stream must null loudly")
  }

  test("curved polygon: circle-ish square has the right area; line-bit arc stays straight") {
    // square shell with all four edges bulged outward by CCW arcs around the
    // square center -> a full circle of radius sqrt(2): area ~ 2*pi
    val r = math.sqrt(2.0)
    val shell = Seq((-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0), (-1.0, -1.0))
    val curves = (0 to 3).map(i => FileGdbCodec.CurveSpec(i, 1, Seq(0.0, 0.0), bits = 0))
    val bytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = true,
      Seq((Seq[Any](1.0), Seq(shell), curves)))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
    assert(g != null && g.getGeometryType == "Polygon", String.valueOf(g))
    val exact = math.Pi * r * r
    assert(math.abs(g.getArea - exact) / exact < 2e-3, s"area ${g.getArea} vs $exact")
    // the 0x20 line bit degrades the arc to the straight chord
    val straight = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = true,
      Seq((Seq[Any](1.0), Seq(shell),
        (0 to 3).map(i => FileGdbCodec.CurveSpec(i, 1, Seq(0.0, 0.0), bits = 0x20)))))
    val gs = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(straight).head._3)
    assert(gs.getArea == 4.0 && gs.getNumPoints == 5, s"${gs.getArea}/${gs.getNumPoints}")
  }

  test("interior-point arc (0x80/0x40 flag bits) reconstructs the circumcircle") {
    // arc (0,0) -> (2,0) through the interior point (1,1): circumcircle is
    // centered at (1,0) radius 1; traversal s->m->e bends over the TOP
    Seq(0x80, 0x40).foreach { ip =>
      val bytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
        Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
          Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 1.0), bits = ip)))))
      val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
      assert(g != null && g.getGeometryType == "LineString", s"bits=$ip")
      assert(g.getNumPoints >= 36, s"bits=$ip densified ${g.getNumPoints}")
      g.getCoordinates.foreach { c =>
        assert(math.abs(math.hypot(c.x - 1.0, c.y - 0.0) - 1.0) < 1e-9,
          s"bits=$ip off-circle $c")
        assert(c.y >= -1e-9, s"bits=$ip arc passes through (1,1), upper half: $c")
      }
      assert(math.abs(g.getLength - math.Pi) < 0.01, s"bits=$ip len ${g.getLength}")
    }
    // the mirrored interior point (1,-1) sweeps the LOWER half
    val lower = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, -1.0), bits = 0x80)))))
    val gl = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(lower).head._3)
    gl.getCoordinates.foreach(c => assert(c.y <= 1e-9, s"lower half: $c"))
    // a collinear interior point degenerates to the straight chord
    val line = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0x80)))))
    val glin = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(line).head._3)
    assert(glin.getNumPoints == 2 && glin.getLength == 2.0)
  }

  test("elliptic arc segments null the row (honestly unsupported)") {
    val bytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq(
        (Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
          Seq(FileGdbCodec.CurveSpec(0, 5, Seq(1.0, 0.0, 0.0, 1.0, 0.5)))),
        (Seq[Any](2.0), Seq(Seq((0.0, 0.0), (3.0, 4.0))), Seq.empty)))
    val rows = FileGdbCodec.decode(bytes)
    assert(rows.size == 2)
    assert(rows.head._3 == null, "elliptic-arc row must be null, not a chord")
    assert(graft.geom.GeomLib.readOrNull(rows(1)._3).getLength == 5.0,
      "plain row in the same table still decodes")
  }

  test("multipatch: strips/fans triangulate, rings take holes, walls drop") {
    val parts = Seq(
      // triangle strip over the unit square [0,1]² -> 2 triangles, area 1
      (0, Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))),
      // vertical wall (all x equal): projected-degenerate, must vanish
      (0, Seq((3.0, 0.0), (3.0, 0.5), (3.0, 1.0), (3.0, 1.5))),
      // triangle fan over the square [4,5]×[0,1] -> 2 triangles, area 1
      (1, Seq((4.0, 0.0), (5.0, 0.0), (5.0, 1.0), (4.0, 1.0))),
      // outer ring (closed) with an inner ring hole -> area 4 - 1 = 3
      (2, Seq((6.0, 0.0), (8.0, 0.0), (8.0, 2.0), (6.0, 2.0), (6.0, 0.0))),
      (3, Seq((6.5, 0.5), (7.5, 0.5), (7.5, 1.5), (6.5, 1.5), (6.5, 0.5))))
    val bytes = FileGdbCodec.writeMultipatchTable(Seq("v" -> 3),
      Seq((Seq[Any](1.0), parts)))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
    assert(g != null && g.getGeometryType == "MultiPolygon", String.valueOf(g))
    assert(g.getNumGeometries == 5, s"2 strip + 2 fan + 1 ring, got ${g.getNumGeometries}")
    assert(math.abs(g.getArea - 5.0) < 1e-9, s"area ${g.getArea}")
    assert(g.getNumPoints == 4 + 4 + 4 + 4 + 10, s"points ${g.getNumPoints}")
    // unclosed ring input gets closed by the decoder
    val open = FileGdbCodec.writeMultipatchTable(Seq("v" -> 3),
      Seq((Seq[Any](2.0), Seq((5, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))))))
    val go = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(open).head._3)
    assert(go != null && math.abs(go.getArea - 4.0) < 1e-9, String.valueOf(go))
    // unknown part type nulls the row (misread risk)
    val bad = FileGdbCodec.writeMultipatchTable(Seq("v" -> 3),
      Seq((Seq[Any](3.0), Seq((9, Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)))))))
    assert(FileGdbCodec.decode(bad).head._3 == null)
  }

  test("cubic Bezier curve follows the control polygon; endpoints exact") {
    val bytes = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq((Seq[Any](1.0), Seq(Seq((0.0, 0.0), (3.0, 0.0))),
        Seq(FileGdbCodec.CurveSpec(0, 4, Seq(1.0, 2.0, 2.0, 2.0))))))
    val g = graft.geom.GeomLib.readOrNull(FileGdbCodec.decode(bytes).head._3)
    assert(g != null && g.getNumPoints == 17, s"${g.getNumPoints}") // 2 + 15 interior
    val cs = g.getCoordinates
    assert(cs.head.x == 0.0 && cs.head.y == 0.0 && cs.last.x == 3.0 && cs.last.y == 0.0)
    // t=0.5 point of this cubic: x = 1.5, y = 1.5 (symmetric control points)
    val mid = cs(8)
    assert(math.abs(mid.x - 1.5) < 1e-9 && math.abs(mid.y - 1.5) < 1e-9, mid.toString)
    // the curve bows toward the control points but never above them
    cs.foreach(c => assert(c.y >= -1e-12 && c.y <= 1.5 + 1e-9, c.toString))
  }

  test("mixed curved and straight rows decode in one table") {
    val mixed = FileGdbCodec.writeCurveShapeTable(Seq("v" -> 3), polygon = false,
      Seq(
        (Seq[Any](1.0), Seq(Seq((0.0, 0.0), (2.0, 0.0))),
          Seq(FileGdbCodec.CurveSpec(0, 1, Seq(1.0, 0.0), bits = 0x8))),
        (Seq[Any](2.0), Seq(Seq((5.0, 5.0), (6.0, 6.0))), Seq.empty)))
    val rows = FileGdbCodec.decode(mixed)
    assert(rows.length == 2)
    val arc = graft.geom.GeomLib.readOrNull(rows.head._3)
    val straight = graft.geom.GeomLib.readOrNull(rows(1)._3)
    assert(arc.getNumPoints >= 36 && straight.getNumPoints == 2)
  }
}
