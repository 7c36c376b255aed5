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
  * timestamp (Arrow micros, UTC), date (Arrow day), decimal (Arrow
  * decimal128), plus ARBITRARILY NESTED lists and structs —
  * `array<struct<role,content>>` (the chat-transcript shape) rides the
  * interchange natively alongside the `events` and `embeddings` shapes.
  * Maps fail fast on the driver. */
object ArrowIpc {

  private def allocator() =
    new org.apache.arrow.memory.RootAllocator(Long.MaxValue)

  /** Spark → Arrow field, RECURSIVE: scalars (incl. decimal128), structs,
    * and lists nest arbitrarily — `array<struct<role,content>>` (the
    * chat-transcript shape) rides the interchange natively. Maps and
    * anything else still fail fast on the driver. */
  private def arrowField(f: StructField): org.apache.arrow.vector.types.pojo.Field =
    arrowFieldOf(f.name, f.dataType, f.nullable)

  private def arrowFieldOf(name: String, dt: DataType, nullable: Boolean)
      : org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
    dt match {
      case ArrayType(elem, containsNull) =>
        new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE,
          null), Seq(arrowFieldOf("item", elem, containsNull)).asJava)
      case StructType(fields) =>
        new Field(name, new FieldType(nullable, ArrowType.Struct.INSTANCE,
          null),
          fields.map(c => arrowFieldOf(c.name, c.dataType, c.nullable))
            .toSeq.asJava)
      case scalarDt =>
        val t: ArrowType = scalarDt match {
          case LongType => new ArrowType.Int(64, true)
          case IntegerType => new ArrowType.Int(32, true)
          case DoubleType =>
            new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
          case FloatType =>
            new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
          case BooleanType => ArrowType.Bool.INSTANCE
          case StringType => ArrowType.Utf8.INSTANCE
          case BinaryType => ArrowType.Binary.INSTANCE
          case TimestampType =>
            new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
          case DateType => new ArrowType.Date(DateUnit.DAY)
          case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
          case other => throw new IllegalArgumentException(
            s"unsupported Spark type for Arrow IPC: $other (field $name)")
        }
        new Field(name, new FieldType(nullable, t, null), null)
    }
  }

  /** Encode one partition's rows as an Arrow IPC stream written THROUGH
    * `channel` — one batch in memory at a time, flushed as it completes. */
  /** Recursive value writer: scalars, decimal128, lists, and structs
    * nest arbitrarily (list elements and struct children are themselves
    * vectors, so one dispatch covers every depth). */
  private def setValue(v: org.apache.arrow.vector.ValueVector, at: Int,
      e: Any): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{ListVector, StructVector}
    v match {
      case fv: BigIntVector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[Number].longValue)
      case fv: IntVector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[Number].intValue)
      case fv: Float8Vector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[Number].doubleValue)
      case fv: Float4Vector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[Number].floatValue)
      case fv: BitVector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, if (e.asInstanceOf[Boolean]) 1 else 0)
      case fv: VarCharVector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[String].getBytes("UTF-8"))
      case fv: VarBinaryVector =>
        if (e == null) fv.setNull(at)
        else fv.setSafe(at, e.asInstanceOf[Array[Byte]])
      case fv: TimeStampMicroTZVector =>
        if (e == null) fv.setNull(at)
        else {
          val inst = e match {
            case t: java.sql.Timestamp => t.toInstant
            case i: java.time.Instant => i
          }
          fv.setSafe(at, inst.getEpochSecond * 1000000L +
            inst.getNano / 1000L)
        }
      case fv: DateDayVector =>
        if (e == null) fv.setNull(at)
        else {
          val days = e match {
            case d: java.sql.Date => d.toLocalDate.toEpochDay
            case d: java.time.LocalDate => d.toEpochDay
          }
          fv.setSafe(at, days.toInt)
        }
      case fv: DecimalVector =>
        if (e == null) fv.setNull(at)
        else {
          val bd = e match {
            case d: java.math.BigDecimal => d
            case d: scala.math.BigDecimal => d.bigDecimal
          }
          fv.setSafe(at, bd.setScale(fv.getScale))
        }
      case fv: ListVector =>
        if (e == null) fv.setNull(at)
        else {
          val seq = e.asInstanceOf[scala.collection.Seq[Any]]
          val start = fv.startNewValue(at)
          val dv = fv.getDataVector
          var k = 0
          seq.foreach { el => setValue(dv, start + k, el); k += 1 }
          fv.endValue(at, seq.length)
        }
      case fv: StructVector =>
        if (e == null) fv.setNull(at)
        else {
          fv.setIndexDefined(at)
          val row = e.asInstanceOf[Row]
          val children = fv.getChildrenFromFields
          var c = 0
          while (c < children.size) {
            setValue(children.get(c), at, row.get(c))
            c += 1
          }
        }
    }
  }

  private def encodePartition(schema: StructType, rows: Iterator[Row],
      batchRows: Int, channel: java.nio.channels.WritableByteChannel): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    val alloc = allocator()
    val fields = schema.fields.map(arrowField).toSeq
    val arrowSchema =
      new org.apache.arrow.vector.types.pojo.Schema(fields.asJava)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val w = new ArrowStreamWriter(root, null, channel)
    try {
      w.start()
      rows.grouped(batchRows).foreach { batch =>
        root.allocateNew()
        var r = 0
        batch.foreach { row =>
          var c = 0
          while (c < schema.length) {
            setValue(root.getVector(c), r,
              if (row.isNullAt(c)) null else row.get(c))
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

  /** Spark schema of an Arrow schema (recursive inverse of
    * [[arrowFieldOf]]). */
  private def sparkTypeOf(
      f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
    f.getType match {
      case _: ArrowType.List =>
        val child = f.getChildren.get(0)
        ArrayType(sparkTypeOf(child), child.isNullable)
      case _: ArrowType.Struct =>
        StructType(f.getChildren.asScala.map(c =>
          StructField(c.getName, sparkTypeOf(c), c.isNullable)).toSeq)
      case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
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
        s"unsupported Arrow type: $other (field ${f.getName})")
    }
  }

  private def sparkSchemaOf(
      s: org.apache.arrow.vector.types.pojo.Schema): StructType =
    StructType(s.getFields.asScala.map(f =>
      StructField(f.getName, sparkTypeOf(f), f.isNullable)).toSeq)

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
      // recursive value reader — the mirror of the writer's setValue
      def readValue(v: ValueVector, at: Int): Any =
        if (v.isNull(at)) null
        else v match {
          case fv: BigIntVector => fv.get(at)
          case fv: IntVector => fv.get(at)
          case fv: Float8Vector => fv.get(at)
          case fv: Float4Vector => fv.get(at)
          case fv: BitVector => fv.get(at) == 1
          case fv: VarCharVector => new String(fv.get(at), "UTF-8")
          case fv: VarBinaryVector => fv.get(at)
          case fv: TimeStampMicroTZVector =>
            val us = fv.get(at)
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L),
              Math.floorMod(us, 1000000L) * 1000L))
          case fv: DateDayVector =>
            java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(fv.get(at).toLong))
          case fv: DecimalVector => fv.getObject(at) // java BigDecimal
          case fv: ListVector =>
            val s = fv.getElementStartIndex(at)
            val e = fv.getElementEndIndex(at)
            val dv = fv.getDataVector
            (s until e).map(readValue(dv, _))
          case fv: org.apache.arrow.vector.complex.StructVector =>
            val children = fv.getChildrenFromFields
            Row.fromSeq((0 until children.size)
              .map(c => readValue(children.get(c), at)))
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
            vals(c + 1) = readValue(root.getVector(c), r)
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
