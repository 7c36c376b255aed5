package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Arrow IPC stream interchange — the zero-copy handoff format the ML
  * ecosystem reads natively (PyTorch/Polars/pandas/DuckDB all consume
  * Arrow streams). Spark ships the Arrow Java library on its own
  * classpath (it uses Arrow for pandas-UDF transport), so this is the
  * Spark-first move: drive `arrow-vector` directly rather than
  * re-implement the flatbuffer framing.
  *
  * Scale shape mirrors [[Avro]]: the sink writes ONE stream file per
  * partition executor-side (no driver materialization); the source reads
  * a glob through `binaryFile` — one task per file, schema discovered
  * from one stream's header on the driver, batches decoded distributed.
  * Supported Catalyst types: long/int/double/float/boolean/string/binary
  * (nullable); anything else fails fast on the driver. */
object ArrowIpc {

  private def allocator() =
    new org.apache.arrow.memory.RootAllocator(Long.MaxValue)

  private def arrowField(f: StructField): org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Arrow IPC: $other (column ${f.name})")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  /** Encode one partition's rows as an Arrow IPC stream (bytes). */
  private def encodePartition(schema: StructType, rows: Iterator[Row],
      batchRows: Int): Array[Byte] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    val alloc = allocator()
    val fields = schema.fields.map(arrowField).toSeq
    val arrowSchema =
      new org.apache.arrow.vector.types.pojo.Schema(fields.asJava)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    val w = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    try {
      w.start()
      rows.grouped(batchRows).foreach { batch =>
        root.allocateNew()
        var r = 0
        batch.foreach { row =>
          var c = 0
          while (c < schema.length) {
            val v = root.getVector(c)
            if (row.isNullAt(c)) v match {
              case fv: BigIntVector => fv.setNull(r)
              case fv: IntVector => fv.setNull(r)
              case fv: Float8Vector => fv.setNull(r)
              case fv: Float4Vector => fv.setNull(r)
              case fv: BitVector => fv.setNull(r)
              case fv: VarCharVector => fv.setNull(r)
              case fv: VarBinaryVector => fv.setNull(r)
            } else v match {
              case fv: BigIntVector => fv.setSafe(r, row.getLong(c))
              case fv: IntVector => fv.setSafe(r, row.getInt(c))
              case fv: Float8Vector => fv.setSafe(r, row.getDouble(c))
              case fv: Float4Vector => fv.setSafe(r, row.getFloat(c))
              case fv: BitVector =>
                fv.setSafe(r, if (row.getBoolean(c)) 1 else 0)
              case fv: VarCharVector =>
                fv.setSafe(r, row.getString(c).getBytes("UTF-8"))
              case fv: VarBinaryVector =>
                fv.setSafe(r, row.getAs[Array[Byte]](c))
            }
            c += 1
          }
          r += 1
        }
        root.setRowCount(r)
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); root.close(); alloc.close() }
    bos.toByteArray
  }

  /** Decode one Arrow IPC stream blob into external Rows. Corrupt tails
    * yield the batches decoded so far (the crawl posture). */
  private def decodeBlob(blob: Array[Byte], schema: StructType): Seq[Row] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val alloc = allocator()
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val rd = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(blob), alloc)
      try {
        val root = rd.getVectorSchemaRoot
        while (rd.loadNextBatch()) {
          var r = 0
          val n = root.getRowCount
          while (r < n) {
            val vals = new Array[Any](schema.length)
            var c = 0
            while (c < schema.length) {
              val v = root.getVector(c)
              vals(c) =
                if (v.isNull(r)) null
                else v match {
                  case fv: BigIntVector => fv.get(r)
                  case fv: IntVector => fv.get(r)
                  case fv: Float8Vector => fv.get(r)
                  case fv: Float4Vector => fv.get(r)
                  case fv: BitVector => fv.get(r) == 1
                  case fv: VarCharVector => new String(fv.get(r), "UTF-8")
                  case fv: VarBinaryVector => fv.get(r)
                }
              c += 1
            }
            out += Row.fromSeq(vals.toIndexedSeq)
            r += 1
          }
        }
      } finally rd.close()
    } catch { case _: Exception => () } // keep decoded prefix
    finally alloc.close()
    out.toSeq
  }

  /** Read the Spark schema from one stream's header bytes. */
  def schemaOf(blob: Array[Byte]): StructType = {
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val alloc = allocator()
    try {
      val rd = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(blob), alloc)
      try {
        val fs = rd.getVectorSchemaRoot.getSchema.getFields.asScala.map { f =>
          import org.apache.arrow.vector.types.pojo.ArrowType
          import org.apache.arrow.vector.types.FloatingPointPrecision
          val dt = f.getType match {
            case i: ArrowType.Int if i.getBitWidth == 64 => LongType
            case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
            case fp: ArrowType.FloatingPoint
              if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
            case fp: ArrowType.FloatingPoint
              if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
            case _: ArrowType.Bool => BooleanType
            case _: ArrowType.Utf8 => StringType
            case _: ArrowType.Binary => BinaryType
            case other => throw new IllegalArgumentException(
              s"unsupported Arrow type: $other (field ${f.getName})")
          }
          StructField(f.getName, dt, f.isNullable)
        }
        StructType(fs.toSeq)
      } finally rd.close()
    } finally alloc.close()
  }

  /** Sink: one Arrow IPC stream file per partition, written
    * executor-side. Returns the schema written. */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096): StructType = {
    val schema = df.schema
    schema.fields.foreach(arrowField) // driver-side fail-fast
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = encodePartition(schema, it, batchRows)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"part-$pid%05d.arrows"), bytes)
        ()
      }
    }
    schema
  }

  /** Source: read a glob of Arrow IPC stream files — schema from ONE
    * file's header (driver), batch decode distributed per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin =
      try spark.read.format("binaryFile").load(path)
        .select(col("path"), col("content"))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"no files matched Arrow glob: $path", e)
      }
    val probe = bin.select("content").take(1)
    require(probe.nonEmpty, s"no files matched Arrow glob: $path")
    val schema = schemaOf(probe(0).getAs[Array[Byte]](0))
    val outSchema = StructType(StructField("path", StringType) +:
      schema.fields.toIndexedSeq)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    bin.flatMap { row =>
      val p = row.getString(0)
      decodeBlob(row.getAs[Array[Byte]](1), schema)
        .map(r => Row.fromSeq(p +: r.toSeq))
    }(enc)
  }
}
