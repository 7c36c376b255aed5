package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomLib
import graft.sources.GeoPackage

/** GeoPackage sink (reference K2): minimal from-spec SQLite writer.
  * Round-trips through our own reader AND — when python3 is available —
  * through the real SQLite library (stdlib sqlite3), including
  * PRAGMA integrity_check, so the bytes are validated by an independent
  * implementation, not just self-consistency. */
class GeoPackageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpGpkg(): String =
    java.nio.file.Files.createTempDirectory("gpkg").resolve("out.gpkg").toString

  private def sampleDf(n: Int) = (1 to n).map { i =>
    (i * 3L, s"name_$i", i * 0.25, GeomLib.pointWkb(i % 360 - 180.0, i % 170 - 85.0))
  }.toDF("okey", "tag", "score", "geom")

  test("write + own-reader round-trip preserves rows, attrs, geometry") {
    val path = tmpGpkg()
    GeoPackage.write(sampleDf(300), path, "layer", geomCol = "geom",
      geometryType = "POINT")
    val back = GeoPackage.readTable(path, "layer")
    assert(back.length == 300)
    back.zipWithIndex.foreach { case ((rowid, vals), idx) =>
      val i = idx + 1
      assert(rowid == i)
      assert(vals.head == null) // fid INTEGER PRIMARY KEY = rowid alias
      val g = GeomLib.readOrNull(vals(1).asInstanceOf[Array[Byte]])
      assert(g.getCoordinate.x == (i % 360 - 180.0))
      assert(vals(2) == i * 3L)
      assert(vals(3) == s"name_$i")
      assert(vals(4) == i * 0.25)
    }
  }

  test("real SQLite accepts the file: integrity_check, metadata, aggregates") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(python.isDefined, "python3 not available for external validation")
    val path = tmpGpkg()
    GeoPackage.write(sampleDf(2500), path, "layer", geomCol = "geom",
      geometryType = "POINT") // 2500 rows → multiple leaves + interior page
    val script =
      s"""import sqlite3
         |cur = sqlite3.connect('$path').cursor()
         |assert cur.execute('PRAGMA integrity_check').fetchall() == [('ok',)]
         |assert cur.execute('PRAGMA application_id').fetchone()[0] == 0x47504B47
         |n, s = cur.execute('SELECT COUNT(*), SUM(okey) FROM layer').fetchone()
         |assert (n, s) == (2500, ${(1 to 2500).map(_ * 3L).sum}), (n, s)
         |ct = cur.execute('SELECT table_name, data_type, srs_id FROM gpkg_contents').fetchall()
         |assert ct == [('layer', 'features', 4326)], ct
         |g = cur.execute('SELECT geom FROM layer WHERE fid=1').fetchone()[0]
         |assert g[:2] == b'GP' and g[8:9] == b'\\x01', g[:9]
         |print('SQLITE_OK')
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("gpkgcheck", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq(python.get, f.toString))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(rc == 0 && out.toString.contains("SQLITE_OK"), s"external check failed:\n$out")
  }

  test("r-tree spatial index: real SQLite rtreecheck passes, range query matches") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(python.isDefined, "python3 not available for external validation")
    val path = tmpGpkg()
    // 3000 points -> a 2-level r-tree (2048-byte nodes hold 85 entries)
    GeoPackage.write(sampleDf(3000), path, "layer", geomCol = "geom",
      geometryType = "POINT")
    val script =
      s"""import sqlite3
         |cur = sqlite3.connect('$path').cursor()
         |assert cur.execute('PRAGMA integrity_check').fetchall() == [('ok',)]
         |# structural audit by the rtree module itself
         |chk = cur.execute("SELECT rtreecheck('rtree_layer_geom')").fetchone()[0]
         |assert chk == 'ok', chk
         |# extension registered
         |ext = cur.execute("SELECT extension_name FROM gpkg_extensions").fetchall()
         |assert ext == [('gpkg_rtree_index',)], ext
         |# the index is complete: one entry per feature
         |n = cur.execute('SELECT COUNT(*) FROM rtree_layer_geom').fetchone()[0]
         |assert n == 3000, n
         |# range query through the virtual table == brute force over blobs
         |import struct
         |def pt(b):
         |    x, y = struct.unpack('<dd', b[8+5:8+21])
         |    return x, y
         |rows = cur.execute('SELECT fid, geom FROM layer').fetchall()
         |brute = sorted(f for f, g in rows
         |               if -50 <= pt(g)[0] <= 10 and 0 <= pt(g)[1] <= 40)
         |idx = sorted(r[0] for r in cur.execute(
         |    'SELECT id FROM rtree_layer_geom '
         |    'WHERE maxx >= -50 AND minx <= 10 AND maxy >= 0 AND miny <= 40'))
         |assert brute == idx, (len(brute), len(idx))
         |assert len(brute) > 0
         |print('RTREE_OK')
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("rtreecheck", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq(python.get, f.toString))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(rc == 0 && out.toString.contains("RTREE_OK"), s"rtree check failed:\n$out")
  }

  test("oversized rows spill to overflow chains; real SQLite reads them back") {
    // spans the interesting sizes: just past MaxLocal (one overflow page,
    // and the formerly-miswritten 4062..4084 B band), a multi-page chain,
    // and a large blob alongside normal rows
    val longA = "a" * 4070                 // 1 page of overflow
    val longB = ("xy" * 30000) + "!"       // 15-page chain, odd length
    val blob = Array.tabulate[Byte](50000)(i => (i * 31 % 251).toByte)
    val df = Seq(
      (1L, "short", Array[Byte](1, 2, 3), GeomLib.pointWkb(1.0, 2.0)),
      (2L, longA, Array[Byte](9), GeomLib.pointWkb(3.0, 4.0)),
      (3L, longB, blob, GeomLib.pointWkb(5.0, 6.0)),
      (4L, "tail", Array[Byte](7), GeomLib.pointWkb(7.0, 8.0))
    ).toDF("okey", "tag", "payload", "geom")
    val path = tmpGpkg()
    GeoPackage.write(df, path, "layer", geomCol = "geom", geometryType = "POINT")
    // own reader follows the chain
    val back = GeoPackage.readTable(path, "layer")
    assert(back.length == 4)
    assert(back(1)._2(3) == longA)
    assert(back(2)._2(3) == longB)
    assert(java.util.Arrays.equals(
      back(2)._2(4).asInstanceOf[Array[Byte]], blob))
    assert(back(3)._2(3) == "tail") // rows AFTER a spilled row still decode
    // real SQLite walks the same chain
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(python.isDefined, "python3 not available for external validation")
    val blobSum = blob.map(b => (b & 0xff).toLong).sum
    val script =
      s"""import sqlite3
         |cur = sqlite3.connect('$path').cursor()
         |assert cur.execute('PRAGMA integrity_check').fetchall() == [('ok',)]
         |a = cur.execute('SELECT tag FROM layer WHERE fid=2').fetchone()[0]
         |assert a == 'a' * 4070, len(a)
         |b = cur.execute('SELECT tag FROM layer WHERE fid=3').fetchone()[0]
         |assert b == 'xy' * 30000 + '!', len(b)
         |pl = cur.execute('SELECT payload FROM layer WHERE fid=3').fetchone()[0]
         |assert len(pl) == 50000 and sum(pl) == $blobSum, len(pl)
         |assert cur.execute('SELECT COUNT(*) FROM layer').fetchone()[0] == 4
         |print('OVERFLOW_OK')
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("ovfcheck", ".py")
    java.nio.file.Files.write(f, script.getBytes("UTF-8"))
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq(python.get, f.toString))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(rc == 0 && out.toString.contains("OVERFLOW_OK"), s"overflow check failed:\n$out")
  }

  test("driver-memory budget: exports beyond maxRows/maxBytes fail loudly") {
    val exRows = intercept[IllegalStateException] {
      GeoPackage.write(sampleDf(100), tmpGpkg(), "layer", maxRows = 50)
    }
    assert(exRows.getMessage.contains("driver-memory budget"), exRows.getMessage)
    val exBytes = intercept[IllegalStateException] {
      GeoPackage.write(sampleDf(100), tmpGpkg(), "layer", maxBytes = 512)
    }
    assert(exBytes.getMessage.contains("driver-memory budget"), exBytes.getMessage)
    // within budget still writes fine
    val path = tmpGpkg()
    GeoPackage.write(sampleDf(100), path, "layer", maxRows = 100)
    assert(GeoPackage.readTable(path, "layer").length == 100)
  }

  test("null geometry and empty table are representable") {
    val path = tmpGpkg()
    val df = Seq((1L, null.asInstanceOf[Array[Byte]]),
      (2L, GeomLib.pointWkb(1.0, 2.0))).toDF("okey", "geom")
    GeoPackage.write(df, path, "layer")
    val back = GeoPackage.readTable(path, "layer")
    assert(back.length == 2)
    assert(back.head._2(1) == null)
    val empty = tmpGpkg()
    GeoPackage.write(sampleDf(0), empty, "layer")
    assert(GeoPackage.readTable(empty, "layer").isEmpty)
  }
}
