package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Row-group-level data skipping: a footer index at ROW-GROUP granularity
  * plus a selective scan that reads only the matching row groups.
  *
  * File-level zone maps ([[ParquetTuning.zoneMapIndexFiles]]) stop at file
  * bounds: a 500 MB Hilbert-sorted file whose [zmin, zmax] straddles the
  * predicate is opened WHOLE even though only a handful of its row groups
  * intersect. The reference's entire physical design leans on small row
  * groups for exactly this reason (15 000-row groups — ref
  * east_asia.py:82, SURVEY §1.3): the pruning unit is the row group, not
  * the file. This object extends the log's own index to that granularity:
  *
  *  - [[rowGroupIndexFiles]] — (file, rg, zmin, zmax, n_rows) from the
  *    parquet footers only, one distributed task per file, no data pages
  *    touched (the same scale shape as the file-level index).
  *  - [[readRowGroupsPruned]] — keeps only row groups whose [zmin, zmax]
  *    intersects [lo, hi] (null-bounds groups kept conservatively) and
  *    scans EXACTLY those via parquet-mr's `readRowGroup(i)`, fanned out
  *    over bounded-size tasks so one hot file still parallelizes.
  *
  * The selective scan materializes records through parquet-mr's example
  * Group reader and converts them to Spark rows with a schema-driven
  * converter covering the flat scalar shape lake tables use (boolean,
  * int8/16/32/64, float, double, decimal, date, timestamp — INT64 and
  * legacy INT96 — string, binary). Nested/repeated schemas are rejected
  * loudly: for those the file-level path plus parquet's own pushdown
  * remains the route.
  *
  * Scale: driver residency is one (file, rowGroup) pair per indexed row
  * group — the same O(metadata) footprint as the snapshot's file list
  * (100 TB at 128 MB row groups ≈ 10⁶ pairs). Each scan task opens one
  * footer and reads at most [[rgsPerTask]] row groups' pages; nothing
  * reads a page outside the keep set.
  */
object RowGroupScan {

  /** Max row groups per scan task: bounds task size so a single file with
    * many kept row groups fans out instead of serializing on one task. */
  private val rgsPerTask = 8

  /** Per-ROW-GROUP zone-map index over a numeric column — (file, rg,
    * zmin, zmax, n_rows) from the parquet footers only, distributed one
    * file per task. Row groups lacking stats for `column` (or whose
    * min/max is non-numeric) get null bounds — [[readRowGroupsPruned]]
    * keeps them conservatively. */
  def rowGroupIndexFiles(spark: SparkSession, files: Seq[String],
      column: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    files.toDS().mapPartitions { it =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      it.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf.value))
        try {
          reader.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
            case (rg, i) =>
              val st = rg.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .map(_.getStatistics).filter(s => s != null && !s.isEmpty)
              (st.map(_.genericGetMin), st.map(_.genericGetMax)) match {
                case (Some(a: Number), Some(b: Number)) =>
                  (f, i, Some(a.longValue), Some(b.longValue),
                    rg.getRowCount)
                case _ =>
                  (f, i, None: Option[Long], None: Option[Long],
                    rg.getRowCount)
              }
          }
        } finally reader.close()
      }
    }.toDF("file", "rg", "zmin", "zmax", "n_rows")
  }

  /** Per-ROW-GROUP zone-map index over a STRING column — the
    * [[rowGroupIndexFiles]] twin for the most common lake predicate
    * shape (date strings, category codes, url prefixes). Bounds fold in
    * UTF-8 BYTE order (the order parquet stats and Spark's pruning
    * filters use — Java String `<` disagrees beyond the BMP). */
  def rowGroupIndexStringFiles(spark: SparkSession, files: Seq[String],
      column: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    files.toDS().mapPartitions { it =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      it.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), conf.value))
        try {
          reader.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
            case (rg, i) =>
              val st = rg.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .map(_.getStatistics).filter(s => s != null && !s.isEmpty)
              (st.map(_.genericGetMin), st.map(_.genericGetMax)) match {
                case (Some(a: org.apache.parquet.io.api.Binary),
                      Some(b: org.apache.parquet.io.api.Binary)) =>
                  (f, i, Some(a.toStringUsingUTF8),
                    Some(b.toStringUsingUTF8), rg.getRowCount)
                case _ =>
                  (f, i, None: Option[String], None: Option[String],
                    rg.getRowCount)
              }
          }
        } finally reader.close()
      }
    }.toDF("file", "rg", "zmin", "zmax", "n_rows")
  }

  /** Range-pruned read off a [[rowGroupIndexFiles]] index: scans ONLY row
    * groups whose [zmin, zmax] intersects [lo, hi] (null-bounds groups
    * kept conservatively — skipping may lose rows, keeping never does).
    * The caller re-applies the exact predicate. Returns (frame,
    * rgOpened, rgTotal, filesOpened). Zero kept groups returns an empty
    * frame WITH the table schema (from the first indexed file's footer),
    * so downstream plans analyze cleanly. `columns` non-empty = a
    * PROJECTION pushed into the scan: only those columns' pages are
    * read (a point fetch on a wide table reads 2 column chunks, not
    * 200 — the custom scan materializes rows eagerly, so Catalyst's own
    * column pruning cannot reach inside it). */
  def readRowGroupsPruned(spark: SparkSession, index: DataFrame,
      lo: Long, hi: Long, columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) =
    prunedScan(spark, index, r =>
      r.getLong(2) <= hi && r.getLong(3) >= lo, columns)

  /** [[readRowGroupsPruned]] for a STRING index ([[
    * rowGroupIndexStringFiles]]): lexicographic [lo, hi] intersection in
    * UTF-8 byte order — matching ORDER BY / BETWEEN semantics on
    * strings. */
  def readRowGroupsPrunedString(spark: SparkSession, index: DataFrame,
      lo: String, hi: String, columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) =
    readRowGroupsPrunedStringBounds(spark, index, Some(lo), Some(hi),
      columns)

  /** [[readRowGroupsPrunedString]] with OPTIONAL bounds: `None` skips
    * that side of the comparison, so `col >= lo` predicates prune
    * exactly without inventing a fake top string. */
  def readRowGroupsPrunedStringBounds(spark: SparkSession,
      index: DataFrame, lo: Option[String], hi: Option[String],
      columns: Seq[String] = Nil): (DataFrame, Long, Long, Int) =
    prunedScan(spark, index, r =>
      hi.forall(h => !utf8Gt(r.getString(2), h)) &&
        lo.forall(l => !utf8Gt(l, r.getString(3))), columns)

  /** IN-list-pruned read off a numeric index: keeps a row group iff ANY
    * probe value falls inside its [zmin, zmax] — the point-lookup shape
    * ([[graft.operators.TableLog.readPointLookup]] composes it with the
    * bloom file prune). */
  def readRowGroupsPrunedIn(spark: SparkSession, index: DataFrame,
      values: Seq[Long], columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) =
    prunedScan(spark, index, r =>
      values.exists(v => r.getLong(2) <= v && r.getLong(3) >= v), columns)

  /** [[readRowGroupsPrunedIn]] for a STRING index (UTF-8 byte order). */
  def readRowGroupsPrunedInString(spark: SparkSession, index: DataFrame,
      values: Seq[String], columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) =
    prunedScan(spark, index, r =>
      values.exists(v =>
        !utf8Gt(r.getString(2), v) && !utf8Gt(v, r.getString(3))),
      columns)

  /** Kept (file, rowGroup) set judged by `intersects` over an index
    * (null-bounds rows always kept) plus the index's total row-group
    * count and one file path for empty-schema recovery — the
    * composition point for multi-constraint pruning (intersect several
    * constraints' keep sets, scan once). */
  private[operators] def keepSet(index: DataFrame,
      intersects: Row => Boolean): (Set[(String, Int)], Long, String) = {
    val rows = index.select("file", "rg", "zmin", "zmax").collect()
    require(rows.nonEmpty, "row-group pruned read needs a non-empty index")
    val keep = rows.filter(r => r.isNullAt(2) || r.isNullAt(3) ||
        intersects(r))
      .map(r => (r.getString(0), r.getInt(1))).toSet
    (keep, rows.length.toLong, rows.head.getString(0))
  }

  /** Scan a keep set computed by [[keepSet]] (possibly intersected
    * across constraints). Returns (frame, rgOpened, rgTotal,
    * filesOpened). */
  private[operators] def scanKeep(spark: SparkSession,
      keep: Set[(String, Int)], total: Long, anyFile: String,
      columns: Seq[String] = Nil): (DataFrame, Long, Long, Int) = {
    val byFile = keep.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    val df =
      if (keep.isEmpty) {
        val conf = spark.sparkContext.hadoopConfiguration
        callerOrder(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          sparkSchemaOf(project(
            parquetSchemaOf(anyFile, conf), columns))), columns)
      } else readRowGroups(spark, byFile, columns)
    (df, keep.size.toLong, total, byFile.size)
  }

  /** Shared prune+scan core: `intersects` judges a non-null-bounds index
    * row; null-bounds rows are always kept. */
  private def prunedScan(spark: SparkSession, index: DataFrame,
      intersects: Row => Boolean, columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) = {
    val (keep, total, anyFile) = keepSet(index, intersects)
    scanKeep(spark, keep, total, anyFile, columns)
  }

  // index-row predicates for the public constraint shapes — shared by
  // the single-constraint readers above and TableLog's multi-constraint
  // intersection
  private[operators] def numRangePred(lo: Option[Long],
      hi: Option[Long]): Row => Boolean = r =>
    hi.forall(h => r.getLong(2) <= h) && lo.forall(l => r.getLong(3) >= l)
  private[operators] def numInPred(values: Seq[Long]): Row => Boolean =
    r => values.exists(v => r.getLong(2) <= v && r.getLong(3) >= v)
  private[operators] def strRangePred(lo: Option[String],
      hi: Option[String]): Row => Boolean = r =>
    hi.forall(h => !utf8Gt(r.getString(2), h)) &&
      lo.forall(l => !utf8Gt(l, r.getString(3)))
  private[operators] def strInPred(values: Seq[String]): Row => Boolean =
    r => values.exists(v =>
      !utf8Gt(r.getString(2), v) && !utf8Gt(v, r.getString(3)))

  /** Projected frames come back in the CALLER's column order (the
    * parquet-side subset stays in table order for the readers). */
  private def callerOrder(df: DataFrame, columns: Seq[String]): DataFrame =
    if (columns.isEmpty) df
    else df.select(columns.map(org.apache.spark.sql.functions.col): _*)

  /** UTF-8 byte-order > — mirrors [[ParquetTuning]]'s string zone-map
    * comparison so file- and row-group-level pruning can never
    * disagree. */
  private def utf8Gt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c > 0
      i += 1
    }
    x.length > y.length
  }

  /** Scan exactly the given (file, row-group indices) — one distributed
    * job, ≤ [[rgsPerTask]] row groups per task. All files must carry the
    * SAME parquet schema (the committed-snapshot contract; schema drift
    * fails loudly rather than silently dropping columns). A non-empty
    * `columns` projection reads ONLY those columns' pages — a point
    * fetch on a wide table touches 2 column chunks, not 200; the custom
    * scan materializes rows eagerly, so Catalyst's own column pruning
    * cannot reach inside it. */
  def readRowGroups(spark: SparkSession,
      plan: Seq[(String, Seq[Int])],
      columns: Seq[String] = Nil): DataFrame = {
    require(plan.nonEmpty, "readRowGroups needs a non-empty plan")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val msg = parquetSchemaOf(plan.head._1,
      spark.sparkContext.hadoopConfiguration)
    val schema = sparkSchemaOf(project(msg, columns))
    val expect = msg.toString
    val tasks = plan.flatMap { case (f, rgs) =>
      rgs.sorted.grouped(rgsPerTask).map(f -> _.toSeq)
    }
    val cols = columns // stable local for the task closure
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.size))
      .flatMap { case (f, rgs) =>
        taskRows(f, rgs, conf.value, expect, cols)
      }
    callerOrder(spark.createDataFrame(rdd, schema), columns)
  }

  /** Field subset of `msg` in TABLE order (empty `columns` = all);
    * unknown names fail loudly. */
  private def project(msg: org.apache.parquet.schema.MessageType,
      columns: Seq[String]): org.apache.parquet.schema.MessageType =
    if (columns.isEmpty) msg
    else {
      import scala.jdk.CollectionConverters._
      val want = columns.toSet
      val known = msg.getFields.asScala.map(_.getName).toSet
      val missing = want -- known
      require(missing.isEmpty,
        s"projection names unknown columns: ${missing.mkString(", ")}")
      new org.apache.parquet.schema.MessageType(msg.getName,
        msg.getFields.asScala.filter(f => want(f.getName)).asJava)
    }

  // ===== executor-side selective scan ==================================

  /** Iterator over the rows of `rgs` in `file`, reading only those row
    * groups' pages. The reader closes on task completion (and eagerly on
    * exhaustion). */
  private def taskRows(file: String, rgs: Seq[Int],
      conf: org.apache.hadoop.conf.Configuration,
      expectSchema: String, columns: Seq[String]): Iterator[Row] = {
    import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.ColumnIOFactory
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    var closed = false
    def close(): Unit = if (!closed) { closed = true; reader.close() }
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
    val full = reader.getFooter.getFileMetaData.getSchema
    require(full.toString == expectSchema,
      s"schema drift: $file does not match the plan's first file")
    // projection pushdown: the reader then fetches ONLY these columns'
    // chunks per readRowGroup — unread pages never leave disk
    val msg = project(full, columns)
    if (columns.nonEmpty) reader.setRequestedSchema(msg)
    val nRgs = reader.getFooter.getBlocks.size
    val convs = Array.tabulate(msg.getFieldCount)(i =>
      fieldConverter(msg.getType(i), i))
    val io = new ColumnIOFactory().getColumnIO(msg)
    val inner = rgs.iterator.flatMap { i =>
      require(i >= 0 && i < nRgs, s"row group $i out of range in $file")
      val pages = reader.readRowGroup(i)
      val rr = io.getRecordReader(pages, new GroupRecordConverter(msg))
      Iterator.range(0L, pages.getRowCount).map { _ =>
        val g = rr.read()
        Row.fromSeq((0 until msg.getFieldCount).map(j =>
          if (g.getFieldRepetitionCount(j) == 0) null else convs(j)(g)))
      }
    }
    new Iterator[Row] {
      def hasNext: Boolean = {
        val h = inner.hasNext
        if (!h) close()
        h
      }
      def next(): Row = inner.next()
    }
  }

  /** Value converter for one flat scalar field, mirroring Spark's own
    * parquet type mapping so a selective scan unions cleanly with a
    * `spark.read.parquet` of sibling files. */
  private def fieldConverter(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    require(t.isPrimitive && t.getRepetition != Repetition.REPEATED,
      s"row-group scan supports flat scalar schemas only: $t")
    val p = t.asPrimitiveType()
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case BOOLEAN => g => g.getBoolean(idx, 0)
      case INT32 => ann match {
        case _: DateLogicalTypeAnnotation => g =>
          java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(g.getInteger(idx, 0).toLong))
        case d: DecimalLogicalTypeAnnotation => g =>
          java.math.BigDecimal.valueOf(g.getInteger(idx, 0).toLong,
            d.getScale)
        case i: IntLogicalTypeAnnotation if i.getBitWidth == 8 => g =>
          g.getInteger(idx, 0).toByte
        case i: IntLogicalTypeAnnotation if i.getBitWidth == 16 => g =>
          g.getInteger(idx, 0).toShort
        case _ => g => g.getInteger(idx, 0)
      }
      case INT64 => ann match {
        case ts: TimestampLogicalTypeAnnotation =>
          val toUs: Long => Long = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
            case LogicalTypeAnnotation.TimeUnit.MICROS => identity
            case _ => Math.floorDiv(_, 1000L) // NANOS
          }
          if (ts.isAdjustedToUTC) g =>
            microsToTimestamp(toUs(g.getLong(idx, 0)))
          else g => microsToLocalDateTime(toUs(g.getLong(idx, 0)))
        case d: DecimalLogicalTypeAnnotation => g =>
          java.math.BigDecimal.valueOf(g.getLong(idx, 0), d.getScale)
        case _ => g => g.getLong(idx, 0)
      }
      case FLOAT => g => g.getFloat(idx, 0)
      case DOUBLE => g => g.getDouble(idx, 0)
      case BINARY | FIXED_LEN_BYTE_ARRAY => ann match {
        case _: StringLogicalTypeAnnotation |
             _: EnumLogicalTypeAnnotation |
             _: JsonLogicalTypeAnnotation => g =>
          g.getBinary(idx, 0).toStringUsingUTF8
        case d: DecimalLogicalTypeAnnotation => g =>
          new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(idx, 0).getBytes),
            d.getScale)
        case _ => g => g.getBinary(idx, 0).getBytes
      }
      case INT96 => g => // legacy Spark timestamp (julian day + nanos)
        microsToTimestamp(int96ToMicros(g.getInt96(idx, 0)))
      case other => sys.error(s"row-group scan: unsupported primitive " +
        s"$other for field ${t.getName}")
    }
  }

  /** [[fieldConverter]]'s CATALYST twin: values in InternalRow
    * representation (UTF8String, epoch-day ints, micros longs,
    * sql.types.Decimal) — what a DataSource-v2 PartitionReader emits
    * ([[graft.sources.LakeStreamProvider]]) without dragging encoder
    * machinery onto the executors. */
  private[graft] def catalystConverter(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    require(t.isPrimitive && t.getRepetition != Repetition.REPEATED,
      s"row-group scan supports flat scalar schemas only: $t")
    val p = t.asPrimitiveType()
    val ann = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case BOOLEAN => g => g.getBoolean(idx, 0)
      case INT32 => ann match {
        case _: DateLogicalTypeAnnotation => g => g.getInteger(idx, 0)
        case d: DecimalLogicalTypeAnnotation => g =>
          org.apache.spark.sql.types.Decimal(
            java.math.BigDecimal.valueOf(g.getInteger(idx, 0).toLong,
              d.getScale))
        case i: IntLogicalTypeAnnotation if i.getBitWidth == 8 => g =>
          g.getInteger(idx, 0).toByte
        case i: IntLogicalTypeAnnotation if i.getBitWidth == 16 => g =>
          g.getInteger(idx, 0).toShort
        case _ => g => g.getInteger(idx, 0)
      }
      case INT64 => ann match {
        case ts: TimestampLogicalTypeAnnotation =>
          val toUs: Long => Long = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
            case LogicalTypeAnnotation.TimeUnit.MICROS => identity
            case _ => Math.floorDiv(_, 1000L) // NANOS
          }
          g => toUs(g.getLong(idx, 0)) // micros either way (TZ and NTZ)
        case d: DecimalLogicalTypeAnnotation => g =>
          org.apache.spark.sql.types.Decimal(
            java.math.BigDecimal.valueOf(g.getLong(idx, 0), d.getScale))
        case _ => g => g.getLong(idx, 0)
      }
      case FLOAT => g => g.getFloat(idx, 0)
      case DOUBLE => g => g.getDouble(idx, 0)
      case BINARY | FIXED_LEN_BYTE_ARRAY => ann match {
        case _: StringLogicalTypeAnnotation |
             _: EnumLogicalTypeAnnotation |
             _: JsonLogicalTypeAnnotation => g =>
          org.apache.spark.unsafe.types.UTF8String.fromBytes(
            g.getBinary(idx, 0).getBytes)
        case d: DecimalLogicalTypeAnnotation => g =>
          org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(
              new java.math.BigInteger(g.getBinary(idx, 0).getBytes),
              d.getScale))
        case _ => g => g.getBinary(idx, 0).getBytes
      }
      case INT96 => g => int96ToMicros(g.getInt96(idx, 0))
      case other => sys.error(s"row-group scan: unsupported primitive " +
        s"$other for field ${t.getName}")
    }
  }

  private def int96ToMicros(b: org.apache.parquet.io.api.Binary): Long = {
    val buf = java.nio.ByteBuffer.wrap(b.getBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588).toLong * 86400000000L + nanosOfDay / 1000L
  }

  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def microsToLocalDateTime(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  // ===== schema bridging ===============================================

  private def parquetSchemaOf(file: String,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** Spark schema for a flat scalar parquet message — the same mapping
    * [[fieldConverter]] materializes, so created frames union cleanly
    * with `spark.read.parquet` frames of sibling files. */
  private[graft] def sparkSchemaOf(
      msg: org.apache.parquet.schema.MessageType): StructType = {
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    StructType((0 until msg.getFieldCount).map { i =>
      val t = msg.getType(i)
      require(t.isPrimitive && t.getRepetition != Repetition.REPEATED,
        s"row-group scan supports flat scalar schemas only: $t")
      val p = t.asPrimitiveType()
      val ann = p.getLogicalTypeAnnotation
      val dt: DataType = p.getPrimitiveTypeName match {
        case BOOLEAN => BooleanType
        case INT32 => ann match {
          case _: DateLogicalTypeAnnotation => DateType
          case d: DecimalLogicalTypeAnnotation =>
            DecimalType(d.getPrecision, d.getScale)
          case a: IntLogicalTypeAnnotation if a.getBitWidth == 8 => ByteType
          case a: IntLogicalTypeAnnotation if a.getBitWidth == 16 =>
            ShortType
          case _ => IntegerType
        }
        case INT64 => ann match {
          case ts: TimestampLogicalTypeAnnotation =>
            if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
          case d: DecimalLogicalTypeAnnotation =>
            DecimalType(d.getPrecision, d.getScale)
          case _ => LongType
        }
        case FLOAT => FloatType
        case DOUBLE => DoubleType
        case BINARY | FIXED_LEN_BYTE_ARRAY => ann match {
          case _: StringLogicalTypeAnnotation |
               _: EnumLogicalTypeAnnotation |
               _: JsonLogicalTypeAnnotation => StringType
          case d: DecimalLogicalTypeAnnotation =>
            DecimalType(d.getPrecision, d.getScale)
          case _ => BinaryType
        }
        case INT96 => TimestampType
        case other => sys.error(s"row-group scan: unsupported primitive " +
          s"$other for field ${t.getName}")
      }
      // always nullable: Spark's file sources relax REQUIRED to nullable
      // on read, and this schema must union cleanly with theirs
      StructField(t.getName, dt, nullable = true)
    })
  }
}
