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
  * Scale shape mirrors [[Avro]]: the sink STREAMS one file per partition
  * executor-side — each `batchRows` batch is encoded and flushed to the
  * file channel, so peak executor memory is one batch, never the
  * partition (a 2 GB partition costs ~batch-size of heap, and nothing
  * hits the JVM `Array[Byte]` 2 GB cap). The source reads a glob through
  * `binaryFile` — one task per file, schema discovered from one stream's
  * header on the driver, batches decoded lazily per file: rows are
  * yielded batch by batch, never materialized per-file. Files whose
  * header schema differs from the plan schema yield no rows (a
  * mixed-schema glob must not emit rows whose physical layout
  * contradicts the declared type); corrupt tails yield the decoded
  * prefix.
  *
  * Supported Catalyst types: long/int/double/float/boolean/string/binary,
  * timestamp (Arrow micros, UTC), date (Arrow day), and arrays of
  * long/int/double/float (Arrow list) — the `events` and `embeddings`
  * shapes ride natively; anything else fails fast on the driver. */
object ArrowIpc {

  private def allocator() =
    new org.apache.arrow.memory.RootAllocator(Long.MaxValue)

  private def arrowField(f: StructField): org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
    def scalar(dt: DataType, where: String): ArrowType = dt match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Arrow IPC: $other ($where)")
    }
    f.dataType match {
      case ArrayType(elem, containsNull) =>
        elem match {
          case LongType | IntegerType | DoubleType | FloatType => ()
          case other => throw new IllegalArgumentException(
            s"unsupported Arrow list element: $other (column ${f.name})")
        }
        val child = new Field("item",
          new FieldType(containsNull, scalar(elem, s"column ${f.name}"), null),
          null)
        new Field(f.name, new FieldType(f.nullable, ArrowType.List.INSTANCE,
          null), Seq(child).asJava)
      case dt =>
        new Field(f.name, new FieldType(f.nullable,
          scalar(dt, s"column ${f.name}"), null), null)
    }
  }

  /** Encode one partition's rows as an Arrow IPC stream written THROUGH
    * `channel` — one batch in memory at a time, flushed as it completes. */
  private def encodePartition(schema: StructType, rows: Iterator[Row],
      batchRows: Int, channel: java.nio.channels.WritableByteChannel): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.ListVector
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    val alloc = allocator()
    val fields = schema.fields.map(arrowField).toSeq
    val arrowSchema =
      new org.apache.arrow.vector.types.pojo.Schema(fields.asJava)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val w = new ArrowStreamWriter(root, null, channel)
    def setElem(dv: ValueVector, at: Int, e: Any): Unit = dv match {
      case v: Float8Vector =>
        if (e == null) v.setNull(at)
        else v.setSafe(at, e.asInstanceOf[Number].doubleValue)
      case v: Float4Vector =>
        if (e == null) v.setNull(at)
        else v.setSafe(at, e.asInstanceOf[Number].floatValue)
      case v: BigIntVector =>
        if (e == null) v.setNull(at)
        else v.setSafe(at, e.asInstanceOf[Number].longValue)
      case v: IntVector =>
        if (e == null) v.setNull(at)
        else v.setSafe(at, e.asInstanceOf[Number].intValue)
    }
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
              case fv: TimeStampMicroTZVector => fv.setNull(r)
              case fv: DateDayVector => fv.setNull(r)
              case fv: ListVector => fv.setNull(r)
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
              case fv: TimeStampMicroTZVector =>
                val inst = row.get(c) match {
                  case t: java.sql.Timestamp => t.toInstant
                  case i: java.time.Instant => i
                }
                fv.setSafe(r, inst.getEpochSecond * 1000000L +
                  inst.getNano / 1000L)
              case fv: DateDayVector =>
                val days = row.get(c) match {
                  case d: java.sql.Date => d.toLocalDate.toEpochDay
                  case d: java.time.LocalDate => d.toEpochDay
                }
                fv.setSafe(r, days.toInt)
              case fv: ListVector =>
                val seq = row.getSeq[Any](c)
                val start = fv.startNewValue(r)
                val dv = fv.getDataVector
                var k = 0
                seq.foreach { e => setElem(dv, start + k, e); k += 1 }
                fv.endValue(r, seq.length)
            }
            c += 1
          }
          r += 1
        }
        root.setRowCount(r)
        w.writeBatch() // flushed to the channel — batch leaves the heap
      }
      w.end()
    } finally { w.close(); root.close(); alloc.close() }
  }

  /** Spark schema of an Arrow schema (inverse of [[arrowField]]). */
  private def sparkSchemaOf(
      s: org.apache.arrow.vector.types.pojo.Schema): StructType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
    def scalar(t: ArrowType, name: String): DataType = t match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case ts: ArrowType.Timestamp
        if ts.getUnit == TimeUnit.MICROSECOND => TimestampType
      case _: ArrowType.Date => DateType
      case other => throw new IllegalArgumentException(
        s"unsupported Arrow type: $other (field $name)")
    }
    val fs = s.getFields.asScala.map { f =>
      val dt = f.getType match {
        case _: ArrowType.List =>
          val child = f.getChildren.get(0)
          ArrayType(scalar(child.getType, f.getName), child.isNullable)
        case t => scalar(t, f.getName)
      }
      StructField(f.getName, dt, f.isNullable)
    }
    StructType(fs.toSeq)
  }

  /** Read the Spark schema from one stream's header. */
  def schemaOf(in: java.io.InputStream): StructType = {
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val alloc = allocator()
    try {
      val rd = new ArrowStreamReader(in, alloc)
      try sparkSchemaOf(rd.getVectorSchemaRoot.getSchema)
      finally rd.close()
    } finally alloc.close()
  }

  def schemaOf(blob: Array[Byte]): StructType =
    schemaOf(new java.io.ByteArrayInputStream(blob))

  /** Lazy per-batch row iterator over one stream blob: only the current
    * batch's rows are materialized. Files whose header schema maps to a
    * different Catalyst shape than `expected` yield no rows; a corrupt
    * tail ends the walk with the prefix decoded so far (never a throw).
    * Resources close at exhaustion AND at task completion (so an early
    * `limit` cannot leak the allocator). */
  private def rowIterator(in: java.io.InputStream, expected: StructType,
      path: String): Iterator[Row] = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.ListVector
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val alloc = allocator()
    var rd: ArrowStreamReader = null
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeAll(): Unit = if (closed.compareAndSet(false, true)) {
      try { if (rd != null) rd.close() } catch { case _: Exception => () }
      try in.close() catch { case _: Exception => () }
      try alloc.close() catch { case _: Exception => () }
    }
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
    try {
      rd = new ArrowStreamReader(in, alloc)
      val root = rd.getVectorSchemaRoot // parses the header; throws if not Arrow
      val fileSchema = sparkSchemaOf(root.getSchema)
      val sameShape = fileSchema.length == expected.length &&
        fileSchema.fields.zip(expected.fields).forall { case (a, b) =>
          a.name == b.name && a.dataType == b.dataType }
      if (!sameShape) { closeAll(); return Iterator.empty }
      def elemAt(dv: ValueVector, at: Int): Any =
        if (dv.isNull(at)) null
        else dv match {
          case v: Float8Vector => v.get(at)
          case v: Float4Vector => v.get(at)
          case v: BigIntVector => v.get(at)
          case v: IntVector => v.get(at)
        }
      def decodeBatch(): IndexedSeq[Row] = {
        val n = root.getRowCount
        val out = new Array[Row](n)
        var r = 0
        while (r < n) {
          val vals = new Array[Any](expected.length + 1)
          vals(0) = path
          var c = 0
          while (c < expected.length) {
            val v = root.getVector(c)
            vals(c + 1) =
              if (v.isNull(r)) null
              else v match {
                case fv: BigIntVector => fv.get(r)
                case fv: IntVector => fv.get(r)
                case fv: Float8Vector => fv.get(r)
                case fv: Float4Vector => fv.get(r)
                case fv: BitVector => fv.get(r) == 1
                case fv: VarCharVector => new String(fv.get(r), "UTF-8")
                case fv: VarBinaryVector => fv.get(r)
                case fv: TimeStampMicroTZVector =>
                  val us = fv.get(r)
                  java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                    Math.floorDiv(us, 1000000L),
                    Math.floorMod(us, 1000000L) * 1000L))
                case fv: DateDayVector =>
                  java.sql.Date.valueOf(
                    java.time.LocalDate.ofEpochDay(fv.get(r).toLong))
                case fv: ListVector =>
                  val s = fv.getElementStartIndex(r)
                  val e = fv.getElementEndIndex(r)
                  val dv = fv.getDataVector
                  (s until e).map(elemAt(dv, _))
              }
            c += 1
          }
          out(r) = Row.fromSeq(vals.toIndexedSeq)
          r += 1
        }
        out.toIndexedSeq
      }
      new Iterator[Row] {
        private var batch: IndexedSeq[Row] = IndexedSeq.empty
        private var i = 0
        private var done = false
        private def advance(): Unit =
          while (i >= batch.size && !done) {
            val more =
              try rd.loadNextBatch()
              catch { case _: Exception => false } // corrupt tail: stop here
            if (!more) { done = true; closeAll() }
            else { batch = try decodeBatch() catch {
              case _: Exception => done = true; closeAll(); IndexedSeq.empty }
              i = 0 }
          }
        override def hasNext: Boolean = { advance(); i < batch.size }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = batch(i); i += 1; r
        }
      }
    } catch {
      case _: Exception => closeAll(); Iterator.empty // not an Arrow stream
    }
  }

  /** Sink: one Arrow IPC stream file per partition, written and FLUSHED
    * batch-by-batch executor-side. Returns the schema written. */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096): StructType = {
    val schema = df.schema
    schema.fields.foreach(arrowField) // driver-side fail-fast
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(dir, f"part-$pid%05d.arrows"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        try encodePartition(schema, it, batchRows, ch)
        finally ch.close()
      }
    }
    schema
  }

  /** Source: read a glob of Arrow IPC stream files — schema from ONE
    * file's header (driver, bounded header bytes), batches decoded
    * lazily and distributed, one task per file. Files stream straight
    * off the filesystem (no whole-file blob), so a single stream can
    * exceed 2 GB and peak task memory is one Arrow batch. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).map(_.toSeq)
      .getOrElse(Seq.empty).filter(_.isFile)
    require(statuses.nonEmpty, s"no files matched Arrow glob: $path")
    val schema = {
      val in = fs.open(statuses.head.getPath)
      try schemaOf(in) finally in.close()
    }
    val outSchema = StructType(StructField("path", StringType) +:
      schema.fields.toIndexedSeq)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    import spark.implicits._
    val files = spark.createDataset(statuses.map(_.getPath.toString))
    files.flatMap { f =>
      val fp = new org.apache.hadoop.fs.Path(f)
      // open failures PROPAGATE (Spark retries the task): a transient
      // filesystem/permission error must not silently drop a whole
      // file's rows. The swallow-and-yield-nothing tolerance is reserved
      // for content-level problems (bad header, schema mismatch, corrupt
      // tail) inside rowIterator.
      val raw = fp.getFileSystem(serConf.value).open(fp)
      val stream: java.io.InputStream =
        new java.io.BufferedInputStream(raw, 1 << 16)
      rowIterator(stream, schema, f)
    }(enc)
  }
}
