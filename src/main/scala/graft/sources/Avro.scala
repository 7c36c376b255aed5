package graft.sources

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Avro Object Container File reader, from the public Avro 1.12
  * specification ("Object Container Files" + "Binary Encoding" sections;
  * reference behavior: gis-etl reads whatever GDAL/DuckDB hand it —
  * `reference/east_asia.py` never names Avro, so this is extension
  * surface for the row-oriented format large pipelines actually exchange
  * (Kafka dumps, dataset interchange)).
  *
  * Layout per spec: magic `Obj\x01`, a string→bytes metadata map
  * (`avro.schema` JSON, `avro.codec`), a 16-byte sync marker, then data
  * blocks of (record count, byte length, payload, sync). Payload codecs:
  * `null`, `deflate` (raw DEFLATE), `snappy` (with a 4-byte big-endian
  * CRC32 suffix).
  *
  * Scale shape: one per-blob kernel (a Catalyst expression, no shuffle)
  * — each task decodes its own files, the Common Crawl / archive-scan
  * posture shared with [[Warc]] and [[Archives]]. Corrupt tails and sync
  * mismatches yield the records decoded so far, never an exception.
  *
  * Supported schema subset (documented, fail-fast on the rest): all
  * primitives, record / array / map / enum (→ string) / fixed (→ bytes),
  * and nullable 2-branch unions `[null, T]` / `[T, null]`. Arbitrary
  * unions and recursive named types are rejected at schema-parse time.
  * Logical types ride their carrier primitive (timestamp-micros stays
  * long) — annotate downstream, the bytes are lossless. */
object Avro extends Serializable {

  // ---- schema model ------------------------------------------------------

  sealed trait AvType extends Serializable
  case object ANull extends AvType
  case object ABool extends AvType
  case object AInt extends AvType
  case object ALong extends AvType
  case object AFloat extends AvType
  case object ADouble extends AvType
  case object AString extends AvType
  case object ABytes extends AvType
  final case class AFixed(size: Int) extends AvType
  final case class AEnum(symbols: Vector[String]) extends AvType
  final case class AArray(item: AvType) extends AvType
  final case class AMap(value: AvType) extends AvType
  final case class ARecord(fields: Vector[(String, AvType)]) extends AvType
  /** Nullable `[null, T]` union; `tIndex` is T's branch position. */
  final case class ANullable(t: AvType, tIndex: Int) extends AvType

  def parseSchema(json: String): AvType = {
    val node = new ObjectMapper().readTree(json)
    parseNode(node, Map.empty)._1
  }

  /** (type, named-type registry after this definition). */
  private def parseNode(n: JsonNode,
      reg: Map[String, AvType]): (AvType, Map[String, AvType]) = {
    if (n.isTextual) {
      val s = n.asText
      primitives.get(s) match {
        case Some(t) => (t, reg)
        case None => reg.get(s) match {
          case Some(t) => (t, reg)
          case None =>
            throw new IllegalArgumentException(s"unknown avro type: $s")
        }
      }
    } else if (n.isArray) { // union
      val branches = (0 until n.size).map(i => n.get(i))
      if (n.size == 2 && branches.exists(b =>
          b.isTextual && b.asText == "null")) {
        val ti = if (branches.head.isTextual &&
          branches.head.asText == "null") 1 else 0
        val (t, r2) = parseNode(n.get(ti), reg)
        (ANullable(t, ti), r2)
      } else throw new IllegalArgumentException(
        s"unsupported avro union (only [null, T]): $n")
    } else if (n.isObject) {
      val tp = Option(n.get("type")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(s"avro object without type: $n"))
      tp match {
        case "record" =>
          var r = reg
          val fieldsNode = n.get("fields")
          val fields = (0 until fieldsNode.size).map { i =>
            val f = fieldsNode.get(i)
            val (t, r2) = parseNode(f.get("type"), r)
            r = r2
            f.get("name").asText -> t
          }.toVector
          val rec = ARecord(fields)
          (rec, r + (fullName(n) -> rec))
        case "enum" =>
          val symsNode = n.get("symbols")
          val syms = (0 until symsNode.size).map(symsNode.get(_).asText)
            .toVector
          val e = AEnum(syms)
          (e, reg + (fullName(n) -> e))
        case "fixed" =>
          val f = AFixed(n.get("size").asInt)
          (f, reg + (fullName(n) -> f))
        case "array" =>
          val (t, r2) = parseNode(n.get("items"), reg)
          (AArray(t), r2)
        case "map" =>
          val (t, r2) = parseNode(n.get("values"), reg)
          (AMap(t), r2)
        case other => // {"type": "string", "logicalType": ...} carrier form
          primitives.get(other) match {
            case Some(t) => (t, reg)
            case None =>
              throw new IllegalArgumentException(s"unknown avro type: $other")
          }
      }
    } else throw new IllegalArgumentException(s"bad avro schema node: $n")
  }

  private val primitives: Map[String, AvType] = Map(
    "null" -> ANull, "boolean" -> ABool, "int" -> AInt, "long" -> ALong,
    "float" -> AFloat, "double" -> ADouble, "string" -> AString,
    "bytes" -> ABytes)

  private def fullName(n: JsonNode): String = {
    val name = n.get("name").asText
    Option(n.get("namespace")).map(_.asText + "." + name).getOrElse(name)
  }

  /** Avro type → Spark type. Nullability is carried by the FIELD in
    * [[sparkSchema]]; a bare ANullable maps to its inner type. */
  def sparkType(t: AvType): DataType = t match {
    case ANull => NullType
    case ABool => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case AString | AEnum(_) => StringType
    case ABytes | AFixed(_) => BinaryType
    case AArray(i) =>
      ArrayType(sparkType(i), containsNull = i.isInstanceOf[ANullable])
    case AMap(v) =>
      MapType(StringType, sparkType(v),
        valueContainsNull = v.isInstanceOf[ANullable])
    case ARecord(fs) => StructType(fs.map { case (name, ft) =>
      StructField(name, sparkType(ft), nullable = ft.isInstanceOf[ANullable])
    })
    case ANullable(inner, _) => sparkType(inner)
  }

  /** Top-level record schema of a container's rows. */
  def sparkSchema(schemaJson: String): StructType =
    parseSchema(schemaJson) match {
      case r: ARecord => sparkType(r).asInstanceOf[StructType]
      case other => throw new IllegalArgumentException(
        s"container schema must be a record, got $other")
    }

  // ---- binary decoding ---------------------------------------------------

  private final class In(val b: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def varLong(): Long = { // zigzag varint per spec
      var shift = 0
      var acc = 0L
      var byte = 0
      do {
        byte = u8()
        acc |= (byte & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new IllegalArgumentException("varint overrun")
      } while ((byte & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1)
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > b.length)
        throw new IllegalArgumentException("length out of range")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def skip(n: Int): Unit = {
      if (n < 0 || pos + n > b.length)
        throw new IllegalArgumentException("skip out of range")
      pos += n
    }
  }

  /** Decode one value into CATALYST representation (UTF8String /
    * GenericInternalRow / GenericArrayData / ArrayBasedMapData) so the
    * expression emits rows with zero re-conversion. */
  private def decode(in: In, t: AvType): Any = t match {
    case ANull => null
    case ABool => in.u8() != 0
    case AInt => in.varLong().toInt
    case ALong => in.varLong()
    case AFloat =>
      java.lang.Float.intBitsToFloat(
        in.u8() | (in.u8() << 8) | (in.u8() << 16) | (in.u8() << 24))
    case ADouble =>
      var acc = 0L
      var i = 0
      while (i < 8) { acc |= (in.u8().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(acc)
    case AString =>
      org.apache.spark.unsafe.types.UTF8String.fromBytes(
        in.bytes(in.varLong().toInt))
    case ABytes => in.bytes(in.varLong().toInt)
    case AFixed(n) => in.bytes(n)
    case AEnum(syms) =>
      val i = in.varLong().toInt
      if (i < 0 || i >= syms.length)
        throw new IllegalArgumentException(s"enum index $i")
      org.apache.spark.unsafe.types.UTF8String.fromString(syms(i))
    case AArray(item) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = in.varLong()
      while (n != 0) {
        if (n < 0) { in.varLong(); n = -n } // negative count: block size follows
        var i = 0L
        while (i < n) { out += decode(in, item); i += 1 }
        n = in.varLong()
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    case AMap(value) =>
      val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = in.varLong()
      while (n != 0) {
        if (n < 0) { in.varLong(); n = -n }
        var i = 0L
        while (i < n) {
          keys += decode(in, AString)
          vals += decode(in, value)
          i += 1
        }
        n = in.varLong()
      }
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        keys.toArray, vals.toArray)
    case ARecord(fields) =>
      val vals = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        vals(i) = decode(in, fields(i)._2)
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    case ANullable(inner, tIndex) =>
      val branch = in.varLong().toInt
      if (branch == tIndex) decode(in, inner)
      else null
  }

  // ---- container ---------------------------------------------------------

  final case class Header(schemaJson: String, codec: String, sync: Array[Byte],
      dataStart: Int)

  /** Parse the container header; null when the blob is not an Avro OCF. */
  def header(blob: Array[Byte]): Header = {
    if (blob == null || blob.length < 20 || blob(0) != 'O' ||
      blob(1) != 'b' || blob(2) != 'j' || blob(3) != 1) return null
    try {
      val in = new In(blob, 4)
      var schema: String = null
      var codec = "null"
      var n = in.varLong()
      while (n != 0) {
        if (n < 0) { in.varLong(); n = -n }
        var i = 0L
        while (i < n) {
          val key = new String(in.bytes(in.varLong().toInt),
            StandardCharsets.UTF_8)
          val value = in.bytes(in.varLong().toInt)
          key match {
            case "avro.schema" =>
              schema = new String(value, StandardCharsets.UTF_8)
            case "avro.codec" =>
              codec = new String(value, StandardCharsets.UTF_8)
            case _ => ()
          }
          i += 1
        }
        n = in.varLong()
      }
      if (schema == null) return null
      val sync = in.bytes(16)
      Header(schema, codec, sync, in.pos)
    } catch { case _: Exception => null }
  }

  /** Schema JSON of a container blob; null for non-Avro input. */
  def schemaOf(blob: Array[Byte]): String = {
    val h = header(blob)
    if (h == null) null else h.schemaJson
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    // avro.codec=deflate is RAW deflate (no zlib wrapper)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val k = inf.inflate(buf)
      if (k == 0 && inf.needsInput()) {
        // truncated stream: surface what inflated so far
        inf.end()
        return out.toByteArray
      }
      out.write(buf, 0, k)
    }
    inf.end()
    out.toByteArray
  }

  /** All records of a container as Catalyst rows (the expression body).
    * Corrupt tails / sync mismatches / unknown codecs end the walk with
    * the rows decoded so far. When `expectedSchemaJson` is given (the
    * plan-time schema that fixed the expression's dataType), a blob whose
    * embedded writer schema maps to a DIFFERENT Catalyst shape yields an
    * empty array — a mixed-schema glob must not produce rows whose
    * physical layout contradicts the declared type. */
  def records(blob: Array[Byte], expectedSchemaJson: String = null)
      : Array[org.apache.spark.sql.catalyst.expressions.GenericInternalRow] = {
    val h = header(blob)
    if (h == null) return Array.empty
    val schema =
      try parseSchema(h.schemaJson)
      catch { case _: Exception => return Array.empty }
    if (expectedSchemaJson != null &&
      (try sparkSchema(h.schemaJson) != sparkSchema(expectedSchemaJson)
       catch { case _: Exception => true })) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    val in = new In(blob, h.dataStart)
    try {
      while (in.pos < blob.length) {
        val count = in.varLong()
        val byteLen = in.varLong().toInt
        val raw = in.bytes(byteLen)
        val sync = in.bytes(16)
        if (!java.util.Arrays.equals(sync, h.sync)) return out.toArray
        val payload = h.codec match {
          case "null" => raw
          case "deflate" => inflate(raw)
          case "snappy" => // 4-byte big-endian CRC32 suffix per spec
            if (raw.length < 4) return out.toArray
            org.xerial.snappy.Snappy.uncompress(
              java.util.Arrays.copyOfRange(raw, 0, raw.length - 4))
          case _ => return out.toArray // unknown codec: honest stop
        }
        val bin = new In(payload, 0)
        var i = 0L
        while (i < count) {
          out += decode(bin, schema)
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
          i += 1
        }
      }
      out.toArray
    } catch { case _: Exception => out.toArray }
  }

  // ---- binary encoding (writer) ------------------------------------------

  private final class Out {
    val buf = new java.io.ByteArrayOutputStream(4096)
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def varLong(n: Long): Unit = { // zigzag varint per spec
      var z = (n << 1) ^ (n >> 63)
      while ((z & ~0x7fL) != 0) { u8(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      u8(z.toInt)
    }
    def raw(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    def lenBytes(b: Array[Byte]): Unit = { varLong(b.length.toLong); raw(b) }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  /** Encode one value from EXTERNAL Scala representation (String, Long,
    * Seq, Map, Array[Byte], Row/Seq for nested records) — the shapes a
    * `df.foreachPartition`/`.map` hands us. Exact inverse of [[decode]]. */
  private def encode(out: Out, t: AvType, v: Any): Unit = t match {
    case ANull => ()
    case ABool => out.u8(if (v.asInstanceOf[Boolean]) 1 else 0)
    case AInt => out.varLong(v.asInstanceOf[Number].intValue.toLong)
    case ALong => out.varLong(v.asInstanceOf[Number].longValue)
    case AFloat =>
      val bits =
        java.lang.Float.floatToIntBits(v.asInstanceOf[Number].floatValue)
      var i = 0
      while (i < 4) { out.u8(bits >>> (8 * i)); i += 1 }
    case ADouble =>
      val bits =
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue)
      var i = 0
      while (i < 8) { out.u8((bits >>> (8 * i)).toInt); i += 1 }
    case AString =>
      out.lenBytes(v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
    case ABytes => out.lenBytes(v.asInstanceOf[Array[Byte]])
    case AFixed(n) =>
      val b = v.asInstanceOf[Array[Byte]]
      require(b.length == n, s"fixed($n) got ${b.length} bytes")
      out.raw(b)
    case AEnum(syms) =>
      val i = syms.indexOf(v.asInstanceOf[String])
      require(i >= 0, s"enum symbol ${v} not in $syms")
      out.varLong(i.toLong)
    case AArray(item) =>
      val xs = v.asInstanceOf[scala.collection.Seq[Any]]
      if (xs.nonEmpty) {
        out.varLong(xs.length.toLong)
        xs.foreach(encode(out, item, _))
      }
      out.varLong(0L)
    case AMap(value) =>
      val m = v.asInstanceOf[scala.collection.Map[String, Any]]
      if (m.nonEmpty) {
        out.varLong(m.size.toLong)
        // sorted for byte-determinism across runs/partitionings
        m.toSeq.sortBy(_._1).foreach { case (k, mv) =>
          out.lenBytes(k.getBytes(StandardCharsets.UTF_8))
          encode(out, value, mv)
        }
      }
      out.varLong(0L)
    case ARecord(fields) =>
      val vals: Seq[Any] = v match {
        case r: org.apache.spark.sql.Row => r.toSeq
        case s: scala.collection.Seq[_] => s.toSeq
        case other => throw new IllegalArgumentException(
          s"record value must be Row or Seq, got ${other.getClass}")
      }
      require(vals.length == fields.length,
        s"record arity ${vals.length} != schema ${fields.length}")
      fields.indices.foreach(i => encode(out, fields(i)._2, vals(i)))
    case ANullable(inner, tIndex) =>
      if (v == null) { out.varLong((1 - tIndex).toLong) }
      else { out.varLong(tIndex.toLong); encode(out, inner, v) }
  }

  /** Spark type → Avro schema JSON (inverse of [[sparkType]] over the
    * supported subset). Nullable fields become `["null", T]`. */
  def avroSchemaJson(schema: StructType, name: String = "SparkRow"): String = {
    def tpe(dt: DataType, nullable: Boolean, path: String): String = {
      val base = dt match {
        case BooleanType => "\"boolean\""
        case IntegerType | ShortType | ByteType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case BinaryType => "\"bytes\""
        case ArrayType(item, cn) =>
          s"""{"type":"array","items":${tpe(item, cn, path + "_i")}}"""
        case MapType(StringType, v, vn) =>
          s"""{"type":"map","values":${tpe(v, vn, path + "_v")}}"""
        case st: StructType => recJson(st, path)
        case other => throw new IllegalArgumentException(
          s"unsupported Spark type for Avro write: $other")
      }
      if (nullable) s"""["null",$base]""" else base
    }
    def recJson(st: StructType, recName: String): String = {
      val fields = st.fields.map { f =>
        s"""{"name":"${f.name}","type":${
          tpe(f.dataType, f.nullable, recName + "_" + f.name)}}"""
      }.mkString(",")
      s"""{"type":"record","name":"$recName","fields":[$fields]}"""
    }
    recJson(schema, name)
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw, no zlib
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Write one Avro Object Container File THROUGH `os` from
    * external-representation rows (each a `Seq[Any]` in schema-field
    * order, or a `Row`) — one ≤`blockRows` block in memory at a time,
    * flushed as it completes, so peak memory is a block, never the
    * partition. Codecs: `null`, `deflate` (raw DEFLATE), `snappy`
    * (+ big-endian CRC32 of the uncompressed block, per spec). The
    * 16-byte sync marker derives from md5(schema ∥ salt) so output
    * bytes are deterministic — reruns produce identical files (the
    * idempotent-sink posture). */
  def writeTo(os: java.io.OutputStream, schemaJson: String,
      rows: Iterator[Any], codec: String = "null", blockRows: Int = 1000,
      syncSalt: String = ""): Unit = {
    val schema = parseSchema(schemaJson)
    val head = new Out
    head.raw(Array[Byte]('O', 'b', 'j', 1))
    head.varLong(2L)
    head.lenBytes("avro.schema".getBytes(StandardCharsets.UTF_8))
    head.lenBytes(schemaJson.getBytes(StandardCharsets.UTF_8))
    head.lenBytes("avro.codec".getBytes(StandardCharsets.UTF_8))
    head.lenBytes(codec.getBytes(StandardCharsets.UTF_8))
    head.varLong(0L)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest((schemaJson + " " + syncSalt)
        .getBytes(StandardCharsets.UTF_8))
    head.raw(sync)
    os.write(head.toBytes)
    rows.grouped(blockRows).foreach { block =>
      val body = new Out
      block.foreach(encode(body, schema, _))
      val plain = body.toBytes
      val payload = codec match {
        case "null" => plain
        case "deflate" => deflateRaw(plain)
        case "snappy" =>
          val c = org.xerial.snappy.Snappy.compress(plain)
          val crc = new java.util.zip.CRC32
          crc.update(plain)
          val v = crc.getValue
          c ++ Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
            (v >>> 8).toByte, v.toByte)
        case other =>
          throw new IllegalArgumentException(s"unsupported codec: $other")
      }
      val blk = new Out
      blk.varLong(block.length.toLong)
      blk.varLong(payload.length.toLong)
      os.write(blk.toBytes)
      os.write(payload)
      os.write(sync) // block flushed — it leaves the heap
    }
  }

  /** [[writeTo]] into a byte array (tests / single-blob callers). */
  def writeBlob(schemaJson: String, rows: Iterator[Any],
      codec: String = "null", blockRows: Int = 1000,
      syncSalt: String = ""): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    writeTo(bos, schemaJson, rows, codec, blockRows, syncSalt)
    bos.toByteArray
  }

  /** Avro sink: one container file per partition, STREAMED executor-side
    * block by block (no driver materialization, no whole-partition
    * buffer — the unit of parallelism is the partition, symmetric with
    * [[read]]'s file-per-task; the unit of memory is one block). Schema
    * derives from `df.schema`; unsupported Catalyst types fail fast on
    * the driver before any task runs. */
  def write(df: DataFrame, dir: String, codec: String = "deflate",
      blockRows: Int = 1000): String = {
    val schemaJson = avroSchemaJson(df.schema)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val os = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(
            java.nio.file.Paths.get(dir, f"part-$pid%05d.avro")), 1 << 16)
        try writeTo(os, schemaJson, it.map(_.toSeq), codec, blockRows,
          syncSalt = s"part-$pid")
        finally os.close()
      }
    }
    schemaJson
  }

  // ---- streamed decoding (DataFrame source path) -------------------------

  /** Bounded-read stream cursor: the streamed twin of [[In]]. Block
    * payloads are the only allocations — a container is never whole in
    * memory, so files beyond 2 GB stream through. */
  private final class SIn(in: java.io.InputStream) {
    def u8(): Int = {
      val v = in.read()
      if (v < 0) throw new IllegalStateException("EOF")
      v
    }
    def varLong(): Long = {
      var shift = 0
      var acc = 0L
      var byte = 0
      do {
        byte = u8()
        acc |= (byte & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new IllegalArgumentException("varint overrun")
      } while ((byte & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1)
    }
    def bytes(n: Int): Array[Byte] = {
      // cap at the JVM array limit (minus header slack), not an
      // arbitrary 1 GiB: a VALID container block between 1 and 2 GiB
      // must decode rather than be silently truncated as a "corrupt
      // tail" by the block loop's catch; anything beyond 2 GiB is
      // unrepresentable in a byte[] and is a hard format bound
      if (n < 0 || n > (Int.MaxValue - 64))
        throw new IllegalArgumentException(s"length out of range: $n")
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(b, off, n - off)
        if (k < 0) throw new IllegalStateException("EOF in block")
        off += k
      }
      b
    }
  }

  /** Container header off a stream; null when not an Avro OCF. Consumes
    * exactly the header bytes, leaving the cursor at the first block. */
  private def headerFrom(s: SIn): Header = {
    try {
      if (s.u8() != 'O' || s.u8() != 'b' || s.u8() != 'j' || s.u8() != 1)
        return null
      var schema: String = null
      var codec = "null"
      var n = s.varLong()
      while (n != 0) {
        if (n < 0) { s.varLong(); n = -n }
        var i = 0L
        while (i < n) {
          val key = new String(s.bytes(s.varLong().toInt),
            StandardCharsets.UTF_8)
          val value = s.bytes(s.varLong().toInt)
          key match {
            case "avro.schema" =>
              schema = new String(value, StandardCharsets.UTF_8)
            case "avro.codec" =>
              codec = new String(value, StandardCharsets.UTF_8)
            case _ => ()
          }
          i += 1
        }
        n = s.varLong()
      }
      if (schema == null) return null
      Header(schema, codec, s.bytes(16), 0)
    } catch { case _: Exception => null }
  }

  /** Decode one value into EXTERNAL Scala representation (String / Seq /
    * Map / Row / Array[Byte]) — the DataFrame-source twin of [[decode]]
    * (which emits Catalyst values for the expression path). */
  private def decodeExt(in: In, t: AvType): Any = t match {
    case ANull => null
    case ABool => in.u8() != 0
    case AInt => in.varLong().toInt
    case ALong => in.varLong()
    case AFloat =>
      java.lang.Float.intBitsToFloat(
        in.u8() | (in.u8() << 8) | (in.u8() << 16) | (in.u8() << 24))
    case ADouble =>
      var acc = 0L
      var i = 0
      while (i < 8) { acc |= (in.u8().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(acc)
    case AString =>
      new String(in.bytes(in.varLong().toInt), StandardCharsets.UTF_8)
    case ABytes => in.bytes(in.varLong().toInt)
    case AFixed(n) => in.bytes(n)
    case AEnum(syms) =>
      val i = in.varLong().toInt
      if (i < 0 || i >= syms.length)
        throw new IllegalArgumentException(s"enum index $i")
      syms(i)
    case AArray(item) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = in.varLong()
      while (n != 0) {
        if (n < 0) { in.varLong(); n = -n }
        var i = 0L
        while (i < n) { out += decodeExt(in, item); i += 1 }
        n = in.varLong()
      }
      out.toSeq
    case AMap(value) =>
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var n = in.varLong()
      while (n != 0) {
        if (n < 0) { in.varLong(); n = -n }
        var i = 0L
        while (i < n) {
          val k = new String(in.bytes(in.varLong().toInt),
            StandardCharsets.UTF_8)
          out(k) = decodeExt(in, value)
          i += 1
        }
        n = in.varLong()
      }
      out.toMap
    case ARecord(fields) =>
      val vals = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        vals(i) = decodeExt(in, fields(i)._2)
        i += 1
      }
      org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
    case ANullable(inner, tIndex) =>
      val branch = in.varLong().toInt
      if (branch == tIndex) decodeExt(in, inner)
      else null
  }

  /** Lazy per-block row iterator off a container stream: only the
    * current block's payload and rows are in memory. A file whose
    * writer schema maps to a different Catalyst shape than
    * `expectedSchemaJson` yields no rows; corrupt tails / sync
    * mismatches / unknown codecs end the walk with the prefix decoded
    * so far. Closes the stream at exhaustion AND at task completion. */
  def rowIterator(in: java.io.InputStream, expectedSchemaJson: String,
      path: String): Iterator[org.apache.spark.sql.Row] = {
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeAll(): Unit = if (closed.compareAndSet(false, true)) {
      try in.close() catch { case _: Exception => () }
    }
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
    val s = new SIn(in)
    val h = headerFrom(s)
    if (h == null) { closeAll(); return Iterator.empty }
    val schema =
      try parseSchema(h.schemaJson)
      catch { case _: Exception => closeAll(); return Iterator.empty }
    if (expectedSchemaJson != null &&
      (try sparkSchema(h.schemaJson) != sparkSchema(expectedSchemaJson)
       catch { case _: Exception => true })) {
      closeAll(); return Iterator.empty
    }
    if (!schema.isInstanceOf[ARecord]) { closeAll(); return Iterator.empty }
    new Iterator[org.apache.spark.sql.Row] {
      private var batch: IndexedSeq[org.apache.spark.sql.Row] = IndexedSeq.empty
      private var i = 0
      private var done = false
      private def loadBlock(): Unit = {
        val count = s.varLong()
        val raw = s.bytes(s.varLong().toInt)
        val sync = s.bytes(16)
        if (!java.util.Arrays.equals(sync, h.sync)) { done = true; return }
        val payload = h.codec match {
          case "null" => raw
          case "deflate" => inflate(raw)
          case "snappy" =>
            if (raw.length < 4) { done = true; return }
            org.xerial.snappy.Snappy.uncompress(
              java.util.Arrays.copyOfRange(raw, 0, raw.length - 4))
          case _ => done = true; return
        }
        val bin = new In(payload, 0)
        val out = new Array[org.apache.spark.sql.Row](count.toInt)
        var r = 0
        while (r < count) {
          val rec = decodeExt(bin, schema)
            .asInstanceOf[org.apache.spark.sql.Row]
          out(r) = org.apache.spark.sql.Row.fromSeq(path +: rec.toSeq)
          r += 1
        }
        batch = out.toIndexedSeq
        i = 0
      }
      private def advance(): Unit =
        while (i >= batch.size && !done) {
          try loadBlock()
          catch { case _: Exception => done = true } // corrupt tail: stop
          if (done) closeAll()
        }
      override def hasNext: Boolean = { advance(); i < batch.size }
      override def next(): org.apache.spark.sql.Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = batch(i); i += 1; r
      }
    }
  }

  // ---- DataFrame read ----------------------------------------------------

  /** Read a glob of Avro container files. Schema discovery reads ONE
    * file's header on the driver (bounded metadata bytes, the
    * Shapefile/.shx posture); decode then runs distributed, one file per
    * task, blocks STREAMED off the filesystem — peak task memory is one
    * block, and files beyond 2 GB read through (the binaryFile-blob cap
    * no longer applies). At 100 TB the unit of parallelism is the file —
    * the Kafka-dump / interchange layout (many moderate files), matching
    * how the WARC scan treats Common Crawl segments. The per-blob
    * expression path ([[records]] / `avro_records`) remains for
    * containers embedded in other sources. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).map(_.toSeq)
      .getOrElse(Seq.empty).filter(_.isFile)
    require(statuses.nonEmpty, s"no files matched Avro glob: $path")
    val schemaJson = {
      val in = fs.open(statuses.head.getPath)
      try {
        val h = headerFrom(new SIn(new java.io.BufferedInputStream(in, 1 << 16)))
        if (h == null) null else h.schemaJson
      } finally in.close()
    }
    require(schemaJson != null, s"not an Avro object container: $path")
    val sch = sparkSchema(schemaJson)
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType) +: sch.fields.toIndexedSeq)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    import spark.implicits._
    val files = spark.createDataset(statuses.map(_.getPath.toString))
    files.flatMap { f =>
      val fp = new org.apache.hadoop.fs.Path(f)
      // open failures PROPAGATE (Spark retries the task) — the
      // swallow-and-continue tolerance is only for content-level
      // problems (non-Avro header, schema mismatch, corrupt tail)
      // inside rowIterator
      val stream: java.io.InputStream = new java.io.BufferedInputStream(
        fp.getFileSystem(serConf.value).open(fp), 1 << 16)
      rowIterator(stream, schemaJson, f)
    }(enc)
  }
}
