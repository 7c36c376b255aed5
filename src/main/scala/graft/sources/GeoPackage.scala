package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal SQLite database writer — just enough of the public file format
  * (sqlite.org/fileformat2: 100-byte header, table b-tree leaf/interior
  * pages, record serial types) to emit a valid GeoPackage (reference K2:
  * East-Asia-Building-Footprints.md:263-274 exports the final heatmap to
  * `.gpkg`; the environment has no GDAL, so the container format is
  * written directly).
  *
  * Scope: CREATE-only databases (no journal, no freelist, no indexes),
  * built fully in memory. Rows larger than a page spill to standard
  * overflow-page chains (round 6), so long TEXT/BLOB values export
  * correctly. This is an EXPORT sink for final artifacts, exactly the
  * reference's use; it is inherently single-writer (SQLite is a single
  * file), so rows stream through the driver — not a distributed write
  * path, and documented as such.
  */
private[sources] object SqliteMini {

  val PageSize = 4096

  sealed trait Value
  case object VNull extends Value
  final case class VInt(v: Long) extends Value
  final case class VReal(v: Double) extends Value
  final case class VText(v: String) extends Value
  final case class VBlob(v: Array[Byte]) extends Value

  private def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 127) return Array(v.toByte)
    // 9-byte form covers all 64-bit values; shorter forms for common sizes
    val out = new ArrayBuffer[Byte](9)
    var x = v
    val bytes = new Array[Byte](10)
    var n = 0
    if (x < 0) { // negative: always 9-byte encoding
      var i = 8
      val full = new Array[Byte](9)
      full(8) = (x & 0xff).toByte
      x >>= 8
      i = 7
      while (i >= 0) { full(i) = ((x & 0x7f) | 0x80).toByte; x >>= 7; i -= 1 }
      return full
    }
    while (x > 0) { bytes(n) = (x & 0x7f).toByte; x >>>= 7; n += 1 }
    var i = n - 1
    while (i > 0) { out += (bytes(i) | 0x80).toByte; i -= 1 }
    out += bytes(0)
    out.toArray
  }

  /** Record (row payload) in SQLite serial-type format. */
  def record(values: Seq[Value]): Array[Byte] = {
    val types = new ArrayBuffer[Byte]()
    val body = new java.io.ByteArrayOutputStream()
    values.foreach {
      case VNull => types ++= varint(0)
      case VInt(0) => types ++= varint(8)
      case VInt(1) => types ++= varint(9)
      case VInt(v) =>
        val (st, w) =
          if (v >= Byte.MinValue && v <= Byte.MaxValue) (1, 1)
          else if (v >= Short.MinValue && v <= Short.MaxValue) (2, 2)
          else if (v >= -(1L << 31) && v < (1L << 31)) (4, 4)
          else (6, 8)
        types ++= varint(st.toLong)
        var i = w - 1
        while (i >= 0) { body.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
      case VReal(v) =>
        types ++= varint(7)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 7
        while (i >= 0) { body.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      case VText(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        types ++= varint(b.length.toLong * 2 + 13)
        body.write(b)
      case VBlob(b) =>
        types ++= varint(b.length.toLong * 2 + 12)
        body.write(b)
    }
    // header = varint(total header len incl itself) + serial types
    var hlen = types.length + 1
    if (hlen > 127) hlen = types.length + varint(hlen.toLong).length // re-fit
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hlen.toLong), 0, varint(hlen.toLong).length)
    out.write(types.toArray, 0, types.length)
    body.writeTo(out)
    out.toByteArray
  }

  // SQLite payload-spill thresholds for table b-tree leaves
  // (sqlite.org/fileformat2 §B-tree Pages; usable size = PageSize, no
  // reserved region): payloads over `MaxLocal` spill to overflow pages,
  // keeping `M + (P - M) % (U - 4)` bytes local when that still fits,
  // else exactly `MinLocal`.
  val MaxLocal: Int = PageSize - 35
  val MinLocal: Int = ((PageSize - 12) * 32 / 255) - 23

  /** One table's rows → b-tree pages appended to `pages`; returns the root
    * FILE page number. Page 1 of the file is sqlite_master (prepended by
    * [[assemble]]), so `pages(i)` lands at file page `i + 2`. Rows larger
    * than the leaf-local threshold spill to overflow-page chains exactly
    * per the SQLite spill formula — real SQLite walks the same chain, so
    * arbitrarily long TEXT/BLOB values round-trip. */
  def buildTable(pages: ArrayBuffer[Array[Byte]], rows: Seq[(Long, Array[Byte])]): Int = {
    // --- leaves ---
    val leaves = new ArrayBuffer[(Int, Long)]() // (filePageNo, maxRowid)
    var cells = new ArrayBuffer[Array[Byte]]()
    var free = PageSize - 8
    def flushLeaf(maxRowid: Long): Unit = {
      pages += renderLeaf(cells.toSeq, headerOffset = 0)
      leaves += ((pages.length + 1, maxRowid))
      cells = new ArrayBuffer[Array[Byte]]()
      free = PageSize - 8
    }
    var lastRowid = 0L
    rows.foreach { case (rowid, payload) =>
      val cell = {
        val o = new java.io.ByteArrayOutputStream()
        val p = varint(payload.length.toLong); o.write(p, 0, p.length)
        val r = varint(rowid); o.write(r, 0, r.length)
        if (payload.length <= MaxLocal) o.write(payload, 0, payload.length)
        else {
          // overflow: local portion per the spill formula, remainder in a
          // chain of pages each led by a 4-byte next-page pointer (0 ends
          // the chain). Chain pages are appended BEFORE the leaf that
          // points at them — file order is free, only numbering matters.
          val k = MinLocal + (payload.length - MinLocal) % (PageSize - 4)
          val local = if (k <= MaxLocal) k else MinLocal
          o.write(payload, 0, local)
          val step = PageSize - 4
          val starts = local until payload.length by step
          val firstNo = pages.length + 2 // next appended page's file number
          starts.zipWithIndex.foreach { case (s, i) =>
            val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
            bb.putInt(0, if (i == starts.length - 1) 0 else firstNo + i + 1)
            bb.position(4)
            bb.put(payload, s, math.min(step, payload.length - s))
            pages += bb.array()
          }
          o.write((firstNo >> 24) & 0xff); o.write((firstNo >> 16) & 0xff)
          o.write((firstNo >> 8) & 0xff); o.write(firstNo & 0xff)
        }
        o.toByteArray
      }
      if (cell.length + 2 > free) flushLeaf(lastRowid)
      cells += cell
      free -= cell.length + 2
      lastRowid = rowid
    }
    flushLeaf(lastRowid) // empty tables still get one (empty) leaf
    // --- interior levels until a single root ---
    var level: Seq[(Int, Long)] = leaves.toSeq
    while (level.length > 1) {
      val next = new ArrayBuffer[(Int, Long)]()
      // 16 B per interior entry (4 child + ≤9 key varint + 2 pointer)
      level.grouped(((PageSize - 12) / 16) max 2).foreach { group =>
        pages += renderInterior(group)
        next += ((pages.length + 1, group.last._2))
      }
      level = next.toSeq
    }
    level.head._1
  }

  def renderLeaf(cells: Seq[Array[Byte]], headerOffset: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
    bb.put(headerOffset, 13.toByte) // leaf table page
    bb.putShort(headerOffset + 3, cells.length.toShort)
    var content = PageSize
    cells.zipWithIndex.foreach { case (cell, i) =>
      content -= cell.length
      bb.position(content)
      bb.put(cell)
      bb.putShort(headerOffset + 8 + i * 2, content.toShort)
    }
    bb.putShort(headerOffset + 5, content.toShort)
    bb.array()
  }

  private def renderInterior(children: Seq[(Int, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
    bb.put(0, 5.toByte) // interior table page
    bb.putShort(3, (children.length - 1).toShort)
    bb.putInt(8, children.last._1) // right-most pointer
    var content = PageSize
    children.dropRight(1).zipWithIndex.foreach { case ((child, maxRowid), i) =>
      val key = varint(maxRowid)
      content -= 4 + key.length
      bb.position(content)
      bb.putInt(child)
      bb.put(key)
      bb.putShort(12 + i * 2, content.toShort)
    }
    bb.putShort(5, content.toShort)
    bb.array()
  }

  /** Assemble the database: page 1 = header + sqlite_master leaf.
    * `master` rows are (name, tblName, rootpage, sql). */
  def assemble(pages: ArrayBuffer[Array[Byte]],
      master: Seq[(String, String, Int, String)], applicationId: Int,
      userVersion: Int): Array[Byte] = {
    val masterCells = master.zipWithIndex.map { case ((name, tbl, root, sql), i) =>
      val payload = record(Seq(VText("table"), VText(name), VText(tbl),
        VInt(root.toLong), VText(sql)))
      val o = new java.io.ByteArrayOutputStream()
      val p = varint(payload.length.toLong); o.write(p, 0, p.length)
      val r = varint(i + 1L); o.write(r, 0, r.length)
      o.write(payload, 0, payload.length)
      o.toByteArray
    }
    require(masterCells.map(_.length + 2).sum <= PageSize - 100 - 8,
      s"sqlite_master overflows page 1 (${masterCells.map(_.length).sum} B of " +
        "DDL cells): multi-page master b-trees are unsupported")
    val page1 = renderLeaf(masterCells, headerOffset = 100)
    val nPages = pages.length + 1
    val bb = ByteBuffer.wrap(page1).order(ByteOrder.BIG_ENDIAN)
    bb.put(0, "SQLite format 3".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte)
    bb.putShort(16, PageSize.toShort)
    bb.put(18, 1.toByte); bb.put(19, 1.toByte) // legacy write/read versions
    bb.put(21, 64.toByte); bb.put(22, 32.toByte); bb.put(23, 32.toByte)
    bb.putInt(24, 1) // change counter
    bb.putInt(28, nPages)
    bb.putInt(40, 1) // schema cookie
    bb.putInt(44, 4) // schema format
    bb.putInt(56, 1) // utf-8
    bb.putInt(60, userVersion)
    bb.putInt(68, applicationId)
    bb.putInt(92, 1) // version-valid-for = change counter
    bb.putInt(96, 3045001) // emitting-library version stamp
    val out = new java.io.ByteArrayOutputStream(nPages * PageSize)
    out.write(page1)
    pages.foreach(out.write)
    out.toByteArray
  }
}

/** GeoPackage writer + row reader over [[SqliteMini]] (OGC GeoPackage
  * spec, geopackage.org: required gpkg_spatial_ref_sys / gpkg_contents /
  * gpkg_geometry_columns metadata tables, GP-header geometry blobs,
  * application_id "GPKG"). */
object GeoPackage {
  import SqliteMini._

  /** Standard GeoPackage binary header around a WKB geometry: "GP",
    * version 0, flags = LE byte order, no envelope, then srs id. */
  def gpbHeader(wkb: Array[Byte], srsId: Int = 4326): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 'G'.toByte); out.put(1, 'P'.toByte)
    out.put(2, 0.toByte) // version
    out.put(3, 1.toByte) // flags: little-endian, no envelope
    out.putInt(4, srsId)
    out.position(8); out.put(wkb)
    out.array()
  }

  private def sqlType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType => "INTEGER"
    case DoubleType | FloatType => "REAL"
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(s"unsupported gpkg type $other")
  }

  private def toValue(v: Any): Value = v match {
    case null => VNull
    case b: Boolean => VInt(if (b) 1L else 0L)
    case b: Byte => VInt(b.toLong)
    case s: Short => VInt(s.toLong)
    case i: Int => VInt(i.toLong)
    case l: Long => VInt(l)
    case f: Float => VReal(f.toDouble)
    case d: Double => VReal(d)
    case s: String => VText(s)
    case b: Array[Byte] => VBlob(b)
    case other => throw new IllegalArgumentException(s"unsupported gpkg value $other")
  }

  /** Write `df` as a single-layer GeoPackage. The `geomCol` (WKB binary)
    * becomes a GPB POINT/GEOMETRY column; every other supported column
    * becomes a feature attribute. Rows stream through the driver
    * (`toLocalIterator`) and the whole file is assembled in driver memory —
    * this is the single-file FINAL-ARTIFACT sink (the reference exports the
    * aggregated heatmap this way), not a distributed table sink.
    *
    * `maxRows`/`maxBytes` are the driver-memory budget: exceeding either
    * fails LOUDLY (IllegalStateException) instead of OOMing the driver
    * mid-export. Raise them deliberately for a bigger driver; for genuinely
    * large tables write parquet and convert outside, or aggregate first. */
  def write(df: DataFrame, path: String, tableName: String,
      geomCol: String = "geom", srsId: Int = 4326,
      geometryType: String = "GEOMETRY",
      maxRows: Long = 5000000L, maxBytes: Long = 2L << 30,
      spatialIndex: Boolean = true): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    val pages = new ArrayBuffer[Array[Byte]]()

    // feature rows: rowid = running fid; geometry first column after fid
    val rows = new ArrayBuffer[(Long, Array[Byte])]()
    val envelopes = new ArrayBuffer[(Long, Double, Double, Double, Double)]()
    var fid = 0L
    var bytesBuffered = 0L
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = Double.MinValue; var maxY = Double.MinValue
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      fid += 1
      if (fid > maxRows || bytesBuffered > maxBytes)
        throw new IllegalStateException(
          s"GeoPackage export exceeds the driver-memory budget " +
            s"($fid rows / $bytesBuffered record bytes; limits maxRows=$maxRows, " +
            s"maxBytes=$maxBytes). This sink assembles ONE SQLite file on the " +
            "driver — aggregate/filter first, raise the budget for a bigger " +
            "driver, or export parquet instead.")
      val wkb = row.getAs[Array[Byte]](geomIdx)
      val gv = if (wkb == null) VNull else VBlob(gpbHeader(wkb, srsId))
      if (wkb != null) {
        val g = graft.geom.GeomLib.readOrNull(wkb)
        if (g != null && !g.isEmpty) {
          val e = g.getEnvelopeInternal
          minX = math.min(minX, e.getMinX); minY = math.min(minY, e.getMinY)
          maxX = math.max(maxX, e.getMaxX); maxY = math.max(maxY, e.getMaxY)
          if (spatialIndex)
            envelopes += ((fid, e.getMinX, e.getMaxX, e.getMinY, e.getMaxY))
        }
      }
      val vals = Seq[Value](VNull) :+ gv // NULL = INTEGER PRIMARY KEY alias
      val attrVals = attrs.map { case (_, i) => toValue(row.get(i)) }.toSeq
      val rec = record(vals ++ attrVals)
      bytesBuffered += rec.length
      rows += ((fid, rec))
    }
    val featureRoot = buildTable(pages, rows.toSeq)

    val srsRoot = buildTable(pages, Seq(
      (-1L, record(Seq(VText("Undefined cartesian SRS"), VNull, VText("NONE"),
        VInt(-1), VText("undefined"), VNull))),
      (0L, record(Seq(VText("Undefined geographic SRS"), VNull, VText("NONE"),
        VInt(0), VText("undefined"), VNull))),
      (4326L, record(Seq(VText("WGS 84 geodetic"), VNull, VText("EPSG"),
        VInt(4326), VText("GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
          "SPHEROID[\"WGS 84\",6378137,298.257223563]]]"), VNull)))))

    val (bMinX, bMinY, bMaxX, bMaxY) =
      if (fid == 0 || minX > maxX) (VNull, VNull, VNull, VNull)
      else (VReal(minX), VReal(minY), VReal(maxX), VReal(maxY))
    val contentsRoot = buildTable(pages, Seq(
      (1L, record(Seq(VText(tableName), VText("features"), VText(tableName),
        VText(""), VText("2026-01-01T00:00:00.000Z"),
        bMinX, bMinY, bMaxX, bMaxY, VInt(srsId.toLong))))))

    val geomColsRoot = buildTable(pages, Seq(
      (1L, record(Seq(VText(tableName), VText(geomCol), VText(geometryType),
        VInt(srsId.toLong), VInt(0), VInt(0))))))

    // ---- gpkg_rtree_index extension: SQLite R*Tree shadow tables ----
    // Node format per the public SQLite rtree module docs: a fixed-size
    // blob per node — root (always node 1) leads with 2 bytes of tree
    // depth, others leave them zero; then a 2-byte entry count; then
    // entries of one big-endian 8-byte integer (rowid in leaves, child
    // nodeno in internals) + 4 big-endian float32 coords (minx, maxx,
    // miny, maxy). The module infers the node size from the root blob's
    // length, so any uniform size works; 2048 keeps rows well under the
    // one-page ceiling of this writer. float32 bounds round OUTWARD so the
    // stored rect always contains the float64 envelope.
    val rtreeName = s"rtree_${tableName}_$geomCol"
    val rtreeMaster = new ArrayBuffer[(String, String, Int, String)]()
    if (spatialIndex && envelopes.nonEmpty) {
      val nodeSize = 2048
      // a 2048-byte node physically fits 85 entries, but SQLite's own
      // write path plans around RTREE_MAXCELLS=51 — stay within the
      // capacity SQLite itself would ever write so later INSERT/DELETE
      // through SQLite never sees an over-full node
      val cap = math.min(51, (nodeSize - 4) / 24)
      def fDown(d: Double): Float = {
        val f = d.toFloat
        if (f.toDouble > d) math.nextAfter(f, Float.NegativeInfinity) else f
      }
      def fUp(d: Double): Float = {
        val f = d.toFloat
        if (f.toDouble < d) math.nextAfter(f, Float.PositiveInfinity) else f
      }
      // bulk load: hilbert-order the entries so leaves are spatially tight
      final case class Node(entries: Seq[(Long, Float, Float, Float, Float)],
        leaf: Boolean)
      val sorted = envelopes.sortBy { case (_, x0, x1, y0, y1) =>
        graft.geom.GeomLib.hilbertEncode((y0 + y1) / 2, (x0 + x1) / 2)
      }
      val leaves = sorted.grouped(cap).map { g =>
        Node(g.map { case (id, x0, x1, y0, y1) =>
          (id, fDown(x0), fUp(x1), fDown(y0), fUp(y1))
        }.toSeq, leaf = true)
      }.toVector
      // build internal levels; record children per node for numbering
      val levels = new ArrayBuffer[Vector[Node]]()
      val childIdx = scala.collection.mutable.Map[(Int, Int), Seq[Int]]()
      levels += leaves
      while (levels.last.length > 1) {
        val below = levels.last
        val lvl = levels.length
        val groups = below.zipWithIndex.grouped(cap).toVector
        levels += groups.zipWithIndex.map { case (grp, gi) =>
          childIdx((lvl, gi)) = grp.map(_._2)
          Node(grp.map { case (n, ci) =>
            (ci.toLong /* placeholder: child index within level below */,
              n.entries.map(_._2).min, n.entries.map(_._3).max,
              n.entries.map(_._4).min, n.entries.map(_._5).max)
          }, leaf = false)
        }
      }
      // number nodes: root = 1, then top-down level by level
      val depth = levels.length - 1
      val nodeNo = scala.collection.mutable.Map[(Int, Int), Long]()
      var next = 1L
      for (lvl <- levels.indices.reverse; i <- levels(lvl).indices) {
        nodeNo((lvl, i)) = next; next += 1
      }
      val nodeRows = new ArrayBuffer[(Long, Array[Byte])]()
      val parentRows = new ArrayBuffer[(Long, Array[Byte])]()
      val rowidRows = new ArrayBuffer[(Long, Array[Byte])]()
      for (lvl <- levels.indices; i <- levels(lvl).indices) {
        val n = levels(lvl)(i)
        val no = nodeNo((lvl, i))
        val bb = ByteBuffer.allocate(nodeSize).order(ByteOrder.BIG_ENDIAN)
        if (no == 1L) bb.putShort(0, depth.toShort)
        bb.putShort(2, n.entries.length.toShort)
        n.entries.zipWithIndex.foreach { case ((id, x0, x1, y0, y1), e) =>
          val off = 4 + e * 24
          val realId = if (n.leaf) id
            else nodeNo((lvl - 1, childIdx((lvl, i))(e.toInt)))
          bb.putLong(off, realId)
          bb.putFloat(off + 8, x0); bb.putFloat(off + 12, x1)
          bb.putFloat(off + 16, y0); bb.putFloat(off + 20, y1)
          if (n.leaf) rowidRows += ((id, record(Seq(VNull, VInt(no)))))
          else parentRows += ((realId, record(Seq(VNull, VInt(no)))))
        }
        nodeRows += ((no, record(Seq(VNull, VBlob(bb.array())))))
      }
      val nodeRoot = buildTable(pages, nodeRows.sortBy(_._1).toSeq)
      val rowidRoot = buildTable(pages, rowidRows.sortBy(_._1).toSeq)
      val parentRoot = buildTable(pages, parentRows.sortBy(_._1).toSeq)
      val extRoot = buildTable(pages, Seq(
        (1L, record(Seq(VText(tableName), VText(geomCol),
          VText("gpkg_rtree_index"),
          VText("http://www.geopackage.org/spec120/#extension_rtree"),
          VText("write-only"))))))
      rtreeMaster ++= Seq(
        (rtreeName, rtreeName, 0,
          s"""CREATE VIRTUAL TABLE "$rtreeName" USING rtree(id, minx, maxx, miny, maxy)"""),
        (s"${rtreeName}_node", s"${rtreeName}_node", nodeRoot,
          s"""CREATE TABLE "${rtreeName}_node"(nodeno INTEGER PRIMARY KEY, data)"""),
        (s"${rtreeName}_rowid", s"${rtreeName}_rowid", rowidRoot,
          s"""CREATE TABLE "${rtreeName}_rowid"(rowid INTEGER PRIMARY KEY, nodeno)"""),
        (s"${rtreeName}_parent", s"${rtreeName}_parent", parentRoot,
          s"""CREATE TABLE "${rtreeName}_parent"(nodeno INTEGER PRIMARY KEY, parentnode)"""),
        ("gpkg_extensions", "gpkg_extensions", extRoot,
          "CREATE TABLE gpkg_extensions (table_name TEXT, column_name TEXT, " +
            "extension_name TEXT NOT NULL, definition TEXT NOT NULL, " +
            "scope TEXT NOT NULL)"))
    }

    val attrDdl = attrs.map { case (f, _) => s""", "${f.name}" ${sqlType(f.dataType)}""" }.mkString
    val master = Seq(
      ("gpkg_spatial_ref_sys", "gpkg_spatial_ref_sys", srsRoot,
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, " +
          "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, " +
          "definition TEXT NOT NULL, description TEXT)"),
      ("gpkg_contents", "gpkg_contents", contentsRoot,
        // no TEXT PRIMARY KEY / UNIQUE here: those would demand
        // sqlite_autoindex_* b-trees this writer does not emit (real SQLite
        // integrity_check verifies their presence); uniqueness is upheld by
        // construction — the writer emits exactly one row per layer
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT NOT NULL, " +
          "identifier TEXT, description TEXT DEFAULT '', last_change DATETIME, " +
          "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"),
      ("gpkg_geometry_columns", "gpkg_geometry_columns", geomColsRoot,
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, " +
          "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, " +
          "m TINYINT NOT NULL)"),
      (tableName, tableName, featureRoot,
        s"""CREATE TABLE "$tableName" (fid INTEGER PRIMARY KEY, "$geomCol" BLOB$attrDdl"""  + ")")) ++
      rtreeMaster

    val bytes = assemble(pages, master, applicationId = 0x47504B47 /* "GPKG" */,
      userVersion = 10300 /* GeoPackage 1.3 */)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }

  /** Read the feature rows of a table back from a GeoPackage this writer
    * produced (or any journal-free SQLite file): returns (rowid, record
    * values) with GPB headers stripped from blobs that carry them. Used by
    * the verification gate; a full SQL engine is out of scope. */
  def readTable(path: String, tableName: String): Seq[(Long, Seq[Any])] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3")
    val pageSize = bb.getShort(16) & 0xffff
    // find the table's rootpage in sqlite_master (page 1, offset 100)
    val masterRows = readBtree(bytes, pageSize, 1, 100)
    val root = masterRows.map(_._2).collectFirst {
      case Seq(_, name: String, _, rootpage: Long, _) if name == tableName => rootpage.toInt
    }.getOrElse(throw new IllegalArgumentException(s"no table $tableName"))
    readBtree(bytes, pageSize, root, 0).map { case (rowid, vals) =>
      (rowid, vals.map {
        case b: Array[Byte] if b.length >= 8 && b(0) == 'G' && b(1) == 'P' =>
          b.drop(8) // strip GPB header back to WKB
        case v => v
      })
    }
  }

  private def readBtree(bytes: Array[Byte], pageSize: Int, pageNo: Int,
      hdrOff: Int): Seq[(Long, Seq[Any])] = {
    val base = (pageNo - 1) * pageSize
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val ptype = bytes(base + hdrOff) & 0xff
    val nCells = bb.getShort(base + hdrOff + 3) & 0xffff
    ptype match {
      case 13 =>
        (0 until nCells).flatMap { i =>
          val off = base + (bb.getShort(base + hdrOff + 8 + i * 2) & 0xffff)
          val (plen, o1) = readVarint(bytes, off)
          val (rowid, o2) = readVarint(bytes, o1)
          val maxLocal = pageSize - 35
          if (plen <= maxLocal) Some((rowid, readRecord(bytes, o2, plen.toInt)))
          else {
            // spilled payload: local slice + the overflow-page chain (same
            // spill formula as the writer / SQLite itself)
            val minLocal = ((pageSize - 12) * 32 / 255) - 23
            val k = minLocal + ((plen - minLocal) % (pageSize - 4)).toInt
            val local = if (k <= maxLocal) k else minLocal
            val full = new Array[Byte](plen.toInt)
            System.arraycopy(bytes, o2, full, 0, local)
            var filled = local
            var pg = bb.getInt(o2 + local)
            while (pg != 0 && filled < plen) {
              val pb = (pg - 1) * pageSize
              val take = math.min(pageSize - 4, plen.toInt - filled)
              System.arraycopy(bytes, pb + 4, full, filled, take)
              filled += take
              pg = bb.getInt(pb)
            }
            require(filled == plen,
              s"broken overflow chain: $filled of $plen payload bytes")
            Some((rowid, readRecord(full, 0, plen.toInt)))
          }
        }
      case 5 =>
        val kids = (0 until nCells).map { i =>
          val off = base + (bb.getShort(base + hdrOff + 12 + i * 2) & 0xffff)
          bb.getInt(off)
        } :+ bb.getInt(base + hdrOff + 8)
        kids.flatMap(k => readBtree(bytes, pageSize, k, 0))
      case other => throw new IllegalArgumentException(s"unsupported page type $other")
    }
  }

  private def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = off
    var n = 0
    while (n < 8 && (b(i) & 0x80) != 0) { v = (v << 7) | (b(i) & 0x7f); i += 1; n += 1 }
    if (n == 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    else { v = (v << 7) | (b(i) & 0x7f); i += 1 }
    (v, i)
  }

  private def readRecord(b: Array[Byte], off: Int, len: Int): Seq[Any] = {
    val (hlen, afterH) = readVarint(b, off)
    var p = afterH
    val types = new ArrayBuffer[Long]()
    while (p < off + hlen) { val (t, np) = readVarint(b, p); types += t; p = np }
    var dp = off + hlen.toInt
    types.map { t =>
      def intN(w: Int): Long = {
        var v = if ((b(dp) & 0x80) != 0) -1L else 0L
        (0 until w).foreach { i => v = (v << 8) | (b(dp + i) & 0xff) }
        dp += w
        v
      }
      t match {
        case 0 => null
        case 1 => intN(1)
        case 2 => intN(2)
        case 3 => intN(3)
        case 4 => intN(4)
        case 5 => intN(6)
        case 6 => intN(8)
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(intN(8))
          v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 13 && n % 2 == 1 =>
          val l = ((n - 13) / 2).toInt
          val s = new String(b, dp, l, StandardCharsets.UTF_8); dp += l; s
        case n if n >= 12 && n % 2 == 0 =>
          val l = ((n - 12) / 2).toInt
          val arr = java.util.Arrays.copyOfRange(b, dp, dp + l); dp += l; arr
        case other => throw new IllegalArgumentException(s"serial type $other")
      }
    }.toSeq
  }
}
