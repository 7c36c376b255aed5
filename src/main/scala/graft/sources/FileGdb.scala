package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory, PrecisionModel}

import graft.geom.GeomLib

/** Minimal ESRI FileGeodatabase `.gdbtable` decoder (reference S2:
  * ORNL-FEMA-Buildings.md:77,81 — pick the largest `.gdbtable` in a `.gdb`
  * directory and read it).
  *
  * Follows the publicly documented, reverse-engineered FGDB layout (the
  * spec published alongside GDAL's OpenFileGDB driver): a 40-byte header
  * (LE int32 magic=3, row count, int64 file size at 24, int64 field-section
  * offset at 32), a field-description section (version, geometry type,
  * field list with UTF-16 names and type-specific trailers), then
  * length-prefixed row blobs: null bitmap over nullable fields, fixed-width
  * int32/float64 values, varuint-length strings, and point geometry as
  * varuint-packed scaled offsets from the layer origin
  * (v = round((x − xorigin)·xyscale) + 1).
  *
  * Scope (documented in docs/COVERAGE.md): point geometry, int32, float64,
  * string and OID fields — the subset a synthesized fixture can exercise
  * without GDAL in the environment. Polyline/polygon delta-ribbons, Z/M,
  * and the .gdbtablx row index are out of scope; rows are scanned
  * sequentially and corrupt length prefixes terminate the scan (the same
  * F10 error-isolation contract as the shapefile decoder).
  */
object FileGdbCodec {

  private val gf = new GeometryFactory(new PrecisionModel(), 4326)

  final case class Field(name: String, ftype: Int, nullable: Boolean,
      xorigin: Double = 0.0, yorigin: Double = 0.0, xyscale: Double = 1.0)

  // --- varuint helpers (LEB128, unsigned) -------------------------------
  private[sources] def readVaruint(bb: ByteBuffer): Long = {
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = bb.get() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0 && shift < 64)
    v
  }

  private[sources] def writeVaruint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    do {
      val b = (v & 0x7f).toInt
      v >>>= 7
      out.write(if (v != 0) b | 0x80 else b)
    } while (v != 0)
  }

  /** Decode a whole .gdbtable to (rowNo, attrs, wkbOrNull) rows. Broken
    * trailing records end the iteration rather than failing the file. */
  def decode(bytes: Array[Byte]): Seq[(Int, Map[String, String], Array[Byte])] = {
    if (bytes.length < 44) return Seq.empty
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 3) return Seq.empty
    val nRows = bb.getInt(4)
    val fileSize = math.min(bb.getLong(24), bytes.length.toLong)
    val fieldOff = bb.getLong(32)
    if (fieldOff < 40 || fieldOff + 8 > fileSize) return Seq.empty

    // --- field-description section ---
    bb.position(fieldOff.toInt)
    val sectionSize = bb.getInt()
    val rowStart = fieldOff + 4 + sectionSize
    /* version */ bb.getInt()
    /* geometry type + flags */ bb.getInt()
    val nFields = bb.getShort().toInt
    val fields = Seq.newBuilder[Field]
    var ok = true
    var i = 0
    while (i < nFields && ok) {
      try {
        val name = readUtf16(bb, bb.get() & 0xff)
        /* alias */ readUtf16(bb, bb.get() & 0xff)
        val ftype = bb.get() & 0xff
        ftype match {
          case 1 | 3 => // int32 / float64: width byte + flag byte
            bb.get()
            val flags = bb.get() & 0xff
            fields += Field(name, ftype, (flags & 1) != 0)
          case 4 => // string: int32 max length + flag byte
            bb.getInt()
            val flags = bb.get() & 0xff
            fields += Field(name, ftype, (flags & 1) != 0)
          case 6 => // objectid: width byte + flag byte; value is implicit
            bb.get(); bb.get()
            fields += Field(name, ftype, nullable = false)
          case 7 => // geometry: flag bytes, SRS text, origin/scale grid
            bb.get()
            val flags = bb.get() & 0xff
            val srsChars = bb.getShort().toInt
            readUtf16(bb, srsChars)
            /* z/m presence */ bb.get()
            val xorigin = bb.getDouble(); val yorigin = bb.getDouble()
            val xyscale = bb.getDouble()
            /* xytolerance */ bb.getDouble()
            /* extent */ bb.getDouble(); bb.getDouble(); bb.getDouble(); bb.getDouble()
            fields += Field(name, ftype, (flags & 1) != 0, xorigin, yorigin, xyscale)
          case _ => ok = false // unsupported field type: stop parsing
        }
      } catch { case _: Exception => ok = false }
      i += 1
    }
    if (!ok) return Seq.empty
    val fs = fields.result()
    val nullable = fs.filter(_.nullable)

    // --- rows: length-prefixed blobs from rowStart ---
    val out = Seq.newBuilder[(Int, Map[String, String], Array[Byte])]
    var pos = rowStart
    var rowNo = 0
    while (rowNo < nRows && pos + 4 <= fileSize) {
      bb.position(pos.toInt)
      val blobLen = bb.getInt()
      if (blobLen <= 0 || pos + 4 + blobLen > fileSize) {
        pos = fileSize // corrupt or truncated: stop, keep what decoded
      } else {
        rowNo += 1
        try {
          val nullBytes = (nullable.size + 7) / 8
          val bitmap = new Array[Byte](nullBytes)
          bb.get(bitmap)
          var nullIdx = 0
          def isNull: Boolean = {
            val r = (bitmap(nullIdx / 8) >> (nullIdx % 8) & 1) != 0
            nullIdx += 1
            r
          }
          var attrs = Map.empty[String, String]
          var wkb: Array[Byte] = null
          fs.foreach { f =>
            val fieldNull = f.nullable && isNull
            if (!fieldNull) f.ftype match {
              case 1 => attrs += f.name -> bb.getInt().toString
              case 3 => attrs += f.name -> bb.getDouble().toString
              case 4 =>
                val len = readVaruint(bb).toInt
                val buf = new Array[Byte](len)
                bb.get(buf)
                attrs += f.name -> new String(buf, StandardCharsets.UTF_8)
              case 6 => attrs += f.name -> rowNo.toString // implicit OID
              case 7 =>
                val glen = readVaruint(bb)
                val gEnd = bb.position() + glen
                val shapeType = readVaruint(bb)
                if (shapeType == 1L) { // point
                  val vx = readVaruint(bb)
                  val vy = readVaruint(bb)
                  val x = (vx - 1).toDouble / f.xyscale + f.xorigin
                  val y = (vy - 1).toDouble / f.xyscale + f.yorigin
                  wkb = GeomLib.write(gf.createPoint(new Coordinate(x, y)))
                }
                bb.position(gEnd.toInt) // skip unsupported shapes
              case _ => ()
            } else if (f.ftype == 6) attrs += f.name -> rowNo.toString
          }
          out += ((rowNo, attrs, wkb))
        } catch { case _: Exception => () } // skip broken row
        pos += 4 + blobLen
      }
    }
    out.result()
  }

  private def readUtf16(bb: ByteBuffer, chars: Int): String = {
    val buf = new Array[Byte](chars * 2)
    bb.get(buf)
    new String(buf, StandardCharsets.UTF_16LE)
  }

  /** Write a minimal point-layer .gdbtable (the fixture/test sink; the
    * environment has no GDAL to produce real ones). `attrs` gives
    * (name, type) with type ∈ {1 int32, 3 float64, 4 string}; `rows` are
    * (attrValues aligned with attrs, x, y). */
  def writePointTable(attrs: Seq[(String, Int)], rows: Seq[(Seq[Any], Double, Double)],
      xorigin: Double = -400.0, yorigin: Double = -400.0,
      xyscale: Double = 1e9): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    // field section payload
    val fsec = new java.io.ByteArrayOutputStream()
    val fbb = new java.io.DataOutputStream(fsec)
    def leInt(o: java.io.ByteArrayOutputStream, v: Int): Unit =
      o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def leShort(o: java.io.ByteArrayOutputStream, v: Int): Unit =
      o.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())
    def leDouble(o: java.io.ByteArrayOutputStream, v: Double): Unit =
      o.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array())
    def utf16(o: java.io.ByteArrayOutputStream, s: String): Unit = {
      o.write(s.length)
      o.write(s.getBytes(StandardCharsets.UTF_16LE))
    }
    leInt(fsec, 4) // version
    leInt(fsec, 1) // point layer
    leShort(fsec, attrs.size + 2) // + OBJECTID + SHAPE
    utf16(fsec, "OBJECTID"); fsec.write(0); fsec.write(6); fsec.write(4); fsec.write(2)
    attrs.foreach { case (name, t) =>
      utf16(fsec, name); fsec.write(0); fsec.write(t)
      t match {
        case 1 => fsec.write(4); fsec.write(3)
        case 3 => fsec.write(8); fsec.write(3)
        case 4 => leInt(fsec, 1024); fsec.write(3)
        case other => throw new IllegalArgumentException(s"unsupported attr type $other")
      }
    }
    utf16(fsec, "SHAPE"); fsec.write(0); fsec.write(7)
    fsec.write(0); fsec.write(1) // nullable geometry
    leShort(fsec, 0) // empty SRS text
    fsec.write(0) // no z/m
    leDouble(fsec, xorigin); leDouble(fsec, yorigin); leDouble(fsec, xyscale)
    leDouble(fsec, 0.0) // tolerance
    leDouble(fsec, -180.0); leDouble(fsec, -90.0); leDouble(fsec, 180.0); leDouble(fsec, 90.0)
    fbb.flush()
    val fsecBytes = fsec.toByteArray

    // row blobs
    val nullableCount = attrs.size + 1 // attrs + geometry
    rows.foreach { case (vals, x, y) =>
      val blob = new java.io.ByteArrayOutputStream()
      blob.write(new Array[Byte]((nullableCount + 7) / 8)) // nothing null
      vals.zip(attrs).foreach {
        case (v: Int, (_, 1))    => leInt(blob, v)
        case (v: Long, (_, 1))   => leInt(blob, v.toInt)
        case (v: Double, (_, 3)) => leDouble(blob, v)
        case (v: String, (_, 4)) =>
          val b = v.getBytes(StandardCharsets.UTF_8)
          writeVaruint(blob, b.length.toLong)
          blob.write(b)
        case (v, (n, t)) =>
          throw new IllegalArgumentException(s"value $v does not fit field $n type $t")
      }
      val geom = new java.io.ByteArrayOutputStream()
      writeVaruint(geom, 1L) // point
      writeVaruint(geom, math.round((x - xorigin) * xyscale) + 1)
      writeVaruint(geom, math.round((y - yorigin) * xyscale) + 1)
      writeVaruint(blob, geom.size().toLong)
      geom.writeTo(blob)
      leInt(body, blob.size())
      blob.writeTo(body)
    }
    val bodyBytes = body.toByteArray

    val total = 40 + 4 + fsecBytes.length + bodyBytes.length
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(0, 3)
    out.putInt(4, rows.size)
    out.putLong(24, total.toLong)
    out.putLong(32, 40L)
    out.position(40)
    out.putInt(fsecBytes.length)
    out.put(fsecBytes)
    out.put(bodyBytes)
    out.array()
  }
}

object FileGdb {

  /** List the `.gdbtable` files of a `.gdb` directory and return the path
    * of the largest — the reference's layer-selection heuristic
    * (ORNL-FEMA-Buildings.md:77: the biggest table is the feature layer;
    * the small ones are catalog metadata). */
  def largestTable(spark: SparkSession, gdbDir: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(gdbDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val tables = fs.listStatus(path).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".gdbtable"))
    if (tables.isEmpty) None
    else Some(tables.maxBy(_.getLen).getPath.toString)
  }

  /** Read the largest .gdbtable of `gdbDir` into
    * (source, row_no, attrs map, geom WKB). Decoding runs in an executor
    * task via the binaryFile source (driver only lists the directory). */
  def readLargest(spark: SparkSession, gdbDir: String): DataFrame = {
    import spark.implicits._
    val target = largestTable(spark, gdbDir).getOrElse(
      throw new IllegalArgumentException(s"no .gdbtable under $gdbDir"))
    spark.read.format("binaryFile")
      .load(target)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val src = path.substring(path.lastIndexOf('/') + 1)
        FileGdbCodec.decode(bytes).map { case (no, attrs, wkb) => (src, no, attrs, wkb) }
      }
      .toDF("source", "row_no", "attrs", "geom")
  }
}
