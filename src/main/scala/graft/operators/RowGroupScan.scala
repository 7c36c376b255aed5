package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  *  - [[buildWideIndex]] — one row per (file, row group, COLUMN) from the
  *    parquet footers only: min/max (numeric AND string), null counts,
  *    row counts, and the column's Spark type. One distributed task per
  *    file, no data pages touched. The log persists it as a stats/
  *    sidecar ([[TableLog.computeRowGroupIndex]]) so repeated reads open
  *    ZERO footers.
  *  - [[prunePairs]] — the DISTRIBUTED prune: every constraint becomes a
  *    Catalyst Column filter over the index rows (IN-lists via
  *    `functions.exists` over a literal array — never an O(|index|·|values|)
  *    driver loop), the per-(file, rg) verdicts fold in one metadata-sized
  *    aggregation, and the driver collects ONLY the kept slices. Null
  *    bounds keep conservatively (skipping may lose rows; keeping never
  *    does).
  *  - [[scanSlices]] — scans EXACTLY the kept row groups via parquet-mr's
  *    `readRowGroup(i)`, fanned out over bounded-size tasks so one hot
  *    file still parallelizes. Optionally emits each row's FILE-ORDINAL
  *    position (`__graft_fn`, `__graft_ridx`) — rebased from the index's
  *    per-group row counts — so deletion vectors apply to a PARTIAL read
  *    (DV positions are file ordinals; without the rebase a DV-carrying
  *    file would degrade to a whole-file scan).
  *
  * The selective scan materializes records through parquet-mr's example
  * Group reader and converts them with a schema-driven converter covering
  * scalars (boolean, int8/16/32/64, float, double, decimal, date,
  * timestamp — INT64 and legacy INT96 — string, binary) AND the nested
  * shapes Spark writes (3-level LIST, 3-level MAP, struct — the
  * `array<struct<role,content>>` training-data chat shape included).
  * Schema evolution across files is tolerated the way the log's own
  * readers tolerate it: the plan's UNION schema comes from the index's
  * per-file column types, files missing a trailing column null-fill it,
  * and a TYPE conflict on a shared column fails loudly.
  *
  * Scale: driver residency is the KEPT (file, rowGroup) slices only —
  * bounded by the query's selectivity, never the table (100 TB at 128 MB
  * row groups ≈ 10⁶ index rows, all filtered where they live). Each scan
  * task opens one footer and reads at most [[rgsPerTask]] row groups'
  * pages; nothing reads a page outside the keep set.
  */
object RowGroupScan {

  /** Max row groups per scan task: bounds task size so a single file with
    * many kept row groups fans out instead of serializing on one task. */
  private val rgsPerTask = 8

  /** Footer opens performed by INDEX BUILDS (not data scans) — a
    * local-mode diagnostic counter: with the index served from the log's
    * persisted sidecar a declarative read must not open any footer just
    * to plan (the gate contract for `computeRowGroupIndex`). Executors
    * share the JVM under local[*]; on a real cluster this is advisory. */
  private[graft] val indexFooterOpens =
    new java.util.concurrent.atomic.LongAdder

  /** One wide-index row: per-(file, row group, top-level column) stats.
    * `rg == -1` marks a zero-row-group file (schema carrier only, never
    * scanned). Numeric bounds fold through `longValue` (safe for pruning:
    * truncation can only widen the kept set for integral probes); string
    * bounds only for string-annotated BINARY columns, in UTF-8 byte order
    * (what parquet stats and Spark's string comparison both use). */
  private[operators] final case class IdxRow(file: String, rg: Int,
      column: String, ord: Int, dtype: String, n_rows: Long,
      n_nulls: Option[Long], lmin: Option[Long], lmax: Option[Long],
      smin: Option[String], smax: Option[String],
      dmin: Option[Double] = None, dmax: Option[Double] = None)

  /** One kept row group: `start` is the row group's first row's
    * FILE-ORDINAL index (prefix sum of preceding groups' row counts) —
    * what deletion-vector positions are keyed by. */
  private[operators] final case class RgSlice(file: String, rg: Int,
      start: Long, nRows: Long)

  /** The WIDE per-row-group stats index over EVERY top-level column —
    * (file, rg, column, ord, dtype, n_rows, n_nulls, lmin, lmax, smin,
    * smax), one distributed footer-only task per file. `files` pairs the
    * path to OPEN with the label to EMIT (the log's sidecar stores
    * table-relative labels; ad-hoc builds pass the path twice). */
  private[operators] def buildWideIndex(spark: SparkSession,
      files: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    files.toDS().mapPartitions { it =>
      it.flatMap { case (abs, label) => fileIdxRows(abs, label, conf.value) }
    }.toDF()
  }

  /** One file's wide-index rows from its footer only — the per-file body
    * of [[buildWideIndex]], also callable DRIVER-side so small snapshots
    * can plan with zero Spark jobs (the Delta manifest posture: planning
    * metadata is driver work). */
  private[operators] def fileIdxRows(abs: String, label: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[IdxRow] = {
    {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      {
        indexFooterOpens.increment()
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(abs), conf))
        try {
          val msg = reader.getFooter.getFileMetaData.getSchema
          val fields = (0 until msg.getFieldCount).map { i =>
            val t = msg.getType(i)
            (t, i, sparkTypeOf(t).catalogString)
          }
          val blocks = reader.getFooter.getBlocks.asScala.toList
          if (blocks.isEmpty)
            fields.map { case (t, i, dt) =>
              IdxRow(label, -1, t.getName, i, dt, 0L, None, None, None,
                None, None, None, None)
            }
          else blocks.zipWithIndex.flatMap { case (rg, rgIdx) =>
            val chunks = rg.getColumns.asScala
            fields.map { case (t, i, dt) =>
              var nNulls: Option[Long] = None
              var lmin: Option[Long] = None
              var lmax: Option[Long] = None
              var smin: Option[String] = None
              var smax: Option[String] = None
              var dmin: Option[Double] = None
              var dmax: Option[Double] = None
              if (t.isPrimitive) {
                import org.apache.parquet.schema.LogicalTypeAnnotation
                val stringish = t.asPrimitiveType()
                  .getLogicalTypeAnnotation match {
                  case _: LogicalTypeAnnotation
                      .StringLogicalTypeAnnotation => true
                  case _: LogicalTypeAnnotation
                      .EnumLogicalTypeAnnotation => true
                  case _: LogicalTypeAnnotation
                      .JsonLogicalTypeAnnotation => true
                  case _ => false
                }
                // INT64 timestamps normalize to MICROS — the unit the
                // CONVERTER emits (floorDiv for nanos truncates stats
                // and values identically, so bounds stay exact)
                val tsToUs: Long => Long = t.asPrimitiveType()
                  .getLogicalTypeAnnotation match {
                  case ts: LogicalTypeAnnotation
                      .TimestampLogicalTypeAnnotation =>
                    ts.getUnit match {
                      case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                        _ * 1000L
                      case LogicalTypeAnnotation.TimeUnit.MICROS =>
                        identity
                      case _ => Math.floorDiv(_, 1000L) // NANOS
                    }
                  case _ => identity
                }
                chunks.find(_.getPath.toDotString == t.getName)
                  .map(_.getStatistics).filter(_ != null).foreach { st =>
                    if (st.isNumNullsSet) nNulls = Some(st.getNumNulls)
                    // hasNonNullValue guards an ALL-NULL chunk, whose
                    // min/max fields are uninitialized primitives (0) —
                    // taking them would fabricate bounds
                    if (!st.isEmpty && st.hasNonNullValue)
                      (st.genericGetMin, st.genericGetMax) match {
                        case (a: java.lang.Long, b: java.lang.Long) =>
                          lmin = Some(tsToUs(a.longValue))
                          lmax = Some(tsToUs(b.longValue))
                        case (a: java.lang.Float, b: java.lang.Float) =>
                          val (x, y) = (a.doubleValue, b.doubleValue)
                          // NaN in FP stats is writer-dependent
                          // (PARQUET-1222): a NaN max means "unbounded
                          // above" under Spark's NaN-greatest order, a
                          // NaN min drops the stats entirely. -0.0
                          // collapses to 0.0 so plain comparisons agree
                          // with Spark's -0.0 = 0.0 semantics.
                          if (!x.isNaN) {
                            dmin = Some(if (x == 0.0) 0.0 else x)
                            if (!y.isNaN)
                              dmax = Some(if (y == 0.0) 0.0 else y)
                          }
                          lmin = Some(a.longValue); lmax = Some(b.longValue)
                        case (a: java.lang.Double, b: java.lang.Double) =>
                          val (x, y) = (a.doubleValue, b.doubleValue)
                          if (!x.isNaN) {
                            dmin = Some(if (x == 0.0) 0.0 else x)
                            if (!y.isNaN)
                              dmax = Some(if (y == 0.0) 0.0 else y)
                          }
                          lmin = Some(a.longValue); lmax = Some(b.longValue)
                        case (a: Number, b: Number) =>
                          lmin = Some(a.longValue); lmax = Some(b.longValue)
                        case (a: org.apache.parquet.io.api.Binary,
                              b: org.apache.parquet.io.api.Binary)
                            if stringish =>
                          smin = Some(a.toStringUsingUTF8)
                          smax = Some(b.toStringUsingUTF8)
                        case _ =>
                      }
                  }
              }
              IdxRow(label, rgIdx, t.getName, i, dt, rg.getRowCount,
                nNulls, lmin, lmax, smin, smax, dmin, dmax)
            }
          }
        } finally reader.close()
      }
    }
  }

  /** `spark.read.parquet` minus the schema-inference job: Spark 4 runs a
    * one-task Spark job per `spark.read.parquet` call just to read a
    * footer for the schema — a fixed scheduler round-trip per read that
    * dominates small-query latency and is pure overhead at any scale
    * (the footer is driver-readable metadata). This derives the schema
    * driver-side from the FIRST path's footer through Spark's own
    * ParquetToSparkSchemaConverter (same session conversion flags:
    * binaryAsString, int96AsTimestamp, inferTimestampNTZ, nanosAsLong),
    * so the read plans with an explicit schema and zero jobs. For
    * uniform-schema path sets only — the lake's write invariant;
    * schema-evolution readers use mergeSchema and keep inference.
    * Anything unexpected (directory with no parquet, unreadable footer)
    * falls back to the inferring read. */
  private[graft] def readNoInfer(spark: SparkSession,
      paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readNoInfer needs at least one path")
    try {
      def filesOf(path: String): Seq[String] = {
        val p = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.isDirectory(p)) Seq(path)
        else {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.list(p)
          try s.iterator.asScala.map(_.toString)
            .filter(_.endsWith(".parquet")).toSeq.sorted
          finally s.close()
        }
      }
      val headFiles = filesOf(paths.head)
      val head = headFiles.head
      val msg = parquetSchemaOf(head,
        spark.sparkContext.hadoopConfiguration)
      // uniform-schema cross-check (one extra footer, driver-side): when
      // the path set spans more than one file, a set that silently
      // violates the write contract must fall back to inference LOUDLY
      // here rather than read mismatched files as nulls. Field names in
      // order are the cheap sufficient check — a type drift with the
      // same names is the widening the lake handles via readEvolved,
      // which keeps mergeSchema.
      val guard =
        if (paths.size > 1) Some(filesOf(paths.last).last)
        else if (headFiles.size > 1) Some(headFiles.last)
        else None
      val drifted = guard.filter(_ != head).exists { g =>
        val gMsg = parquetSchemaOf(g,
          spark.sparkContext.hadoopConfiguration)
        import scala.jdk.CollectionConverters._
        def names(m: org.apache.parquet.schema.MessageType) =
          m.getFields.asScala.map(_.getName).toSeq
        names(msg) != names(gMsg)
      }
      if (drifted)
        // detected drift: a plain inferring read would ALSO trust one
        // arbitrary footer — mergeSchema is the read that is actually
        // correct for a drifted set
        spark.read.option("mergeSchema", "true").parquet(paths: _*)
      else {
        val schema = new org.apache.spark.sql.execution.datasources.parquet
          .ParquetToSparkSchemaConverter(
            org.apache.spark.sql.graft.SparkInternals.sqlConf(spark))
          .convert(msg)
        spark.read.schema(schema).parquet(paths: _*)
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        spark.read.parquet(paths: _*)
    }
  }

  /** DRIVER-side parquet write of wide-index rows (parquet-mr Group
    * API) — the write half of zero-job sidecar staging. The schema
    * matches what Spark writes for an IdxRow frame (same names, string
    * annotations, physical types), so spark.read, the distributed
    * planners, and [[localParquetRows]] consume either provenance
    * identically. */
  private[operators] def writeIdxRowsLocal(rows: Seq[IdxRow],
      out: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter,
      GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      """message graft_rgidx {
        |  optional binary file (UTF8);
        |  optional int32 rg;
        |  optional binary column (UTF8);
        |  optional int32 ord;
        |  optional binary dtype (UTF8);
        |  optional int64 n_rows;
        |  optional int64 n_nulls;
        |  optional int64 lmin;
        |  optional int64 lmax;
        |  optional binary smin (UTF8);
        |  optional binary smax (UTF8);
        |  optional double dmin;
        |  optional double dmax;
        |}""".stripMargin)
    val c = new org.apache.hadoop.conf.Configuration(conf)
    GroupWriteSupport.setSchema(schema, c)
    val writer = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(out))
      .withConf(c)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.append("file", r.file)
      g.append("rg", r.rg)
      g.append("column", r.column)
      g.append("ord", r.ord)
      g.append("dtype", r.dtype)
      g.append("n_rows", r.n_rows)
      r.n_nulls.foreach(v => g.append("n_nulls", v))
      r.lmin.foreach(v => g.append("lmin", v))
      r.lmax.foreach(v => g.append("lmax", v))
      r.smin.foreach(v => g.append("smin", v))
      r.smax.foreach(v => g.append("smax", v))
      r.dmin.foreach(v => g.append("dmin", v))
      r.dmax.foreach(v => g.append("dmax", v))
      writer.write(g)
    } finally writer.close()
  }

  /** DRIVER-side parquet write of (file, bitmap) bloom rows — the
    * compaction twin of [[writeIdxRowsLocal]]; schema matches the
    * Spark-written bloom sidecars. */
  private[operators] def writeBloomRowsLocal(
      rows: Seq[(String, Array[Byte])], out: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter,
      GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      """message graft_bloom {
        |  optional binary f (UTF8);
        |  optional binary bitmap;
        |}""".stripMargin)
    val c = new org.apache.hadoop.conf.Configuration(conf)
    GroupWriteSupport.setSchema(schema, c)
    val writer = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(out))
      .withConf(c)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (f, bytes) =>
      val g = gf.newGroup()
      g.append("f", f)
      g.add("bitmap", org.apache.parquet.io.api.Binary
        .fromConstantByteArray(bytes))
      writer.write(g)
    } finally writer.close()
  }

  /** Whole-file DRIVER-side read of a SMALL parquet into Spark rows —
    * zero Spark jobs. For METADATA sidecars only (stats indexes, bloom
    * bitmaps, DV position lists, vector codebooks): callers enforce a
    * byte bound before calling. Shares [[taskSliceRows]]' converter
    * stack, so values and schema are identical to
    * `spark.read.parquet(file).collect()`. */
  private[graft] def localParquetRows(file: String,
      conf: org.apache.hadoop.conf.Configuration)
      : (Array[Row], StructType) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    val (msg, nRgs) =
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getBlocks.size)
      finally r.close()
    val schema = sparkSchemaOf(msg)
    val wanted = schema.fields.toSeq.map(f =>
      f.name -> f.dataType.catalogString)
    val rows = taskSliceRows(file, (0 until nRgs).map(i => (i, 0L)),
      conf, wanted, emitPos = false).toArray
    (rows, schema)
  }

  // ===== distributed prune =============================================

  /** TRUE iff some ASCII case VARIANT v of `x` (each char independently
    * upper- or lower-cased; non-letters fixed) lies in [lo, hi] under
    * UTF-8 byte order — the exact row-group keep test for case-mapped
    * equalities (`lower(c) = x` matches exactly the variants of x).
    * Digit-DP over v's positions with lo/hi tightness flags: O(|x|)
    * states, each trying the (at most two) case forms of that char.
    * Caller guarantees `x` is pure ASCII, so each variant char is one
    * byte and byte order equals the stats' comparator. */
  private[operators] def variantInRange(x: String, lo: String,
      hi: String, prefix: Boolean = false): Boolean = {
    val lob = lo.getBytes("UTF-8"); val hib = hi.getBytes("UTF-8")
    val n = x.length
    // memo per (pos, loTight, hiTight): 0 unknown, 1 true, 2 false
    val memo = new Array[Byte]((n + 1) * 4)
    def rec(i: Int, loT: Boolean, hiT: Boolean): Boolean = {
      val key = i * 4 + (if (loT) 1 else 0) + (if (hiT) 2 else 0)
      if (memo(key) != 0) return memo(key) == 1
      val r =
        if (i == n)
          // v complete: a still-tight lo means v equals lo's first n
          // bytes, so v >= lo iff lo has no tail; dually a still-tight
          // hi admits v iff hi is at least as long. PREFIX mode asks a
          // different question — can [lo, hi] contain some string
          // STARTING WITH v? — and reaching i == n already proves it:
          // tight-lo means lo itself starts with v; tight-hi means hi
          // does; non-tight sides are strictly inside the bound.
          prefix ||
            ((!loT || lob.length <= n) && (!hiT || hib.length >= n))
        else {
          val ch = x.charAt(i)
          val up = Character.toUpperCase(ch).toByte
          val dn = Character.toLowerCase(ch).toByte
          val cands = if (up == dn) Seq(up) else Seq(up, dn)
          cands.exists { b =>
            val vb = b & 0xff
            // an exhausted tight lo (v extends lo) is already > lo;
            // an exhausted tight hi (v extends hi) is already > hi
            val loOk = !loT || i >= lob.length || vb >= (lob(i) & 0xff)
            val hiOk = !hiT || (i < hib.length && vb <= (hib(i) & 0xff))
            loOk && hiOk && rec(i + 1,
              loT && i < lob.length && vb == (lob(i) & 0xff),
              hiT && vb == (hib(i) & 0xff))
          }
        }
      memo(key) = if (r) 1 else 2
      r
    }
    rec(0, loT = true, hiT = true)
  }

  /** TRUE iff some SPACE-PADDED variant of `x` (`' '^i + x + ' '^j`;
    * sides per `mode`: 'b' both, 'l' leading-only, 'r' trailing-only;
    * i = j = 0 included) lies in [lo, hi] under UTF-8 byte order — the
    * row-group keep test for trim-mapped equalities (`trim(c) = x`
    * matches exactly the padded variants of x). The trailing-pad
    * family {x + ' '^j} is tested EXACTLY: its minimum is x, so a
    * member ≥ lo exists iff lo ≤ x, or lo = x ++ t where the minimal
    * witness x + ' '^j ≥ lo (t all spaces → lo itself; first non-space
    * byte of t below 0x20 → one pad past it) also clears hi. Leading
    * pads (i ≥ 1) are tested conservatively: every such variant starts
    * with byte 0x20, so they all sort below a lo whose first byte
    * exceeds 0x20 and above a hi that is empty or starts below 0x20 —
    * anything else keeps. On space-free data (the overwhelmingly
    * common case: smin's first byte > 0x20) the leading test rejects
    * and pruning is driven by the exact trailing test, as tight as a
    * plain equality. */
  private[operators] def paddedVariantInRange(x: String, lo: String,
      hi: String, mode: Char): Boolean = {
    val xb = x.getBytes("UTF-8")
    val lob = lo.getBytes("UTF-8"); val hib = hi.getBytes("UTF-8")
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    def trailing: Boolean =
      if (cmp(xb, hib) > 0) false            // even x exceeds hi
      else if (cmp(lob, xb) <= 0) true       // witness: x itself
      else if (lob.length > xb.length &&
          xb.indices.forall(i => lob(i) == xb(i))) {
        var i = xb.length                    // lo = x ++ t; scan t
        while (i < lob.length && lob(i) == 0x20.toByte) i += 1
        if (i == lob.length) true            // t all spaces: witness lo
        else if ((lob(i) & 0xff) < 0x20) {
          // minimal witness: x padded one space past t's low byte
          val w = xb ++ Array.fill(i - xb.length + 1)(0x20.toByte)
          cmp(w, hib) <= 0
        } else false                         // every pad sorts below lo
      } else false
    def leading: Boolean =
      !(lob.nonEmpty && (lob(0) & 0xff) > 0x20) &&
        !(hib.isEmpty || (hib(0) & 0xff) < 0x20)
    def point: Boolean = cmp(lob, xb) <= 0 && cmp(xb, hib) <= 0
    mode match {
      case 'r' => trailing
      case 'l' => point || leading
      case _ => trailing || leading
    }
  }

  /** An index-row DISPROOF for one constraint: TRUE iff this (file, rg,
    * column) row's bounds PROVE no row can satisfy the constraint. Null
    * or missing bounds never reject (conservative keep). Spark's string
    * comparison is UTF-8 byte order — the same order the stats fold in,
    * so string pruning can never disagree with the scan's re-filter. */
  private[operators] def rejectCond(c: TableLog.RgConstraint): Column = {
    import org.apache.spark.sql.functions.{col, exists, lit}
    c match {
      case TableLog.NumRange(_, lo, hi) =>
        val sides = lo.map(l => col("lmax") < lit(l)).toSeq ++
          hi.map(h => col("lmin") > lit(h)).toSeq
        col("lmin").isNotNull && col("lmax").isNotNull &&
          sides.reduceOption(_ || _).getOrElse(lit(false))
      case TableLog.NumIn(_, vs) =>
        col("lmin").isNotNull && col("lmax").isNotNull &&
          !exists(lit(vs.toArray),
            v => col("lmin") <= v && v <= col("lmax"))
      case TableLog.DblRange(_, lo, hi, hiExcl) =>
        // sides reject independently: a NaN max drops dmax (unbounded
        // above), but a present dmin can still disprove the hi side
        val loRej = lo.map(l =>
          col("dmax").isNotNull && col("dmax") < lit(l))
        val hiRej = hi.map(h =>
          col("dmin").isNotNull &&
            (if (hiExcl) col("dmin") >= lit(h)
             else col("dmin") > lit(h)))
        (loRej.toSeq ++ hiRej.toSeq)
          .reduceOption(_ || _).getOrElse(lit(false))
      case TableLog.DblIn(_, vs) =>
        col("dmin").isNotNull && col("dmax").isNotNull &&
          !exists(lit(vs.toArray),
            v => col("dmin") <= v && v <= col("dmax"))
      case TableLog.StrRange(_, lo, hi, hiExcl) =>
        val sides = lo.map(l => col("smax") < lit(l)).toSeq ++
          hi.map(h => if (hiExcl) col("smin") >= lit(h)
                      else col("smin") > lit(h)).toSeq
        col("smin").isNotNull && col("smax").isNotNull &&
          sides.reduceOption(_ || _).getOrElse(lit(false))
      case TableLog.StrIn(_, vs) =>
        col("smin").isNotNull && col("smax").isNotNull &&
          !exists(lit(vs.toArray),
            v => col("smin") <= v && v <= col("smax"))
      case TableLog.NullCheck(_, isNull) =>
        if (isNull) col("n_nulls") === 0L // no nulls → IS NULL disproven
        else col("n_nulls") === col("n_rows") // all null → no non-null
      case TableLog.NumNotIn(_, vs) =>
        // only a CONSTANT group disproves: its one value is excluded.
        // Any null row satisfies nothing (WHERE semantics drop nulls),
        // so nulls don't block the disproof.
        col("lmin").isNotNull && col("lmin") === col("lmax") &&
          exists(lit(vs.toArray), v => col("lmin") === v)
      case TableLog.StrNotIn(_, vs) =>
        col("smin").isNotNull && col("smin") === col("smax") &&
          exists(lit(vs.toArray), v => col("smin") === v)
      case TableLog.CaseIn(_, vs, _, pfx) =>
        // non-codegen, but evaluated over the tiny index frame, never
        // data rows
        val anyVariant = org.apache.spark.sql.functions.udf(
          (lo: String, hi: String) =>
            vs.exists(variantInRange(_, lo, hi, pfx)))
        col("smin").isNotNull && col("smax").isNotNull &&
          !anyVariant(col("smin"), col("smax"))
      case TableLog.TrimIn(_, vs, mode) =>
        if (vs.isEmpty) lit(true) // provably-false predicate: all drop
        else {
          val anyPadded = org.apache.spark.sql.functions.udf(
            (lo: String, hi: String) =>
              vs.exists(paddedVariantInRange(_, lo, hi, mode)))
          col("smin").isNotNull && col("smax").isNotNull &&
            !anyPadded(col("smin"), col("smax"))
        }
      case or: TableLog.RgOr => sys.error(
        s"RgOr must be expanded before leaf evaluation: $or")
    }
  }

  /** Flag machinery shared by [[prunePairs]] and the metadata count:
    * one (reject, full) flag pair per LEAF constraint folded in the
    * per-(file, rg) aggregation, then boolean trees over the flags —
    * a top-level conjunct disproves the group when its flag fires, a
    * DISJUNCTION ([[TableLog.RgOr]]) only when EVERY branch's does
    * (`a OR b` has no matching row iff neither side can match); dually
    * a disjunction PROVES the group when any branch proves it. Returns
    * (agg expressions, group-rejected, group-fully-matching). */
  private[operators] def constraintFlags(
      constraints: Seq[TableLog.RgConstraint])
      : (Seq[Column], Column, Column) = {
    import org.apache.spark.sql.functions.{col, lit, max, when}
    def leavesOf(c: TableLog.RgConstraint): Seq[TableLog.RgConstraint] =
      c match {
        case TableLog.RgOr(bs) =>
          bs.foreach {
            case _: TableLog.RgOr =>
              sys.error("nested RgOr unsupported (flatten the branches)")
            case _ =>
          }
          bs
        case x => Seq(x)
      }
    var next = 0
    val topLeafIds: Seq[(TableLog.RgConstraint, Seq[Int])] =
      constraints.map { c =>
        val ls = leavesOf(c)
        val ids = ls.indices.map(_ + next)
        next += ls.size
        (c, ids)
      }
    val leaves = constraints.flatMap(leavesOf)
    val aggs = leaves.zipWithIndex.flatMap { case (l, i) =>
      Seq(
        max(when(col("column") === l.column && rejectCond(l), 1)
          .otherwise(0)).as(s"__rej$i"),
        max(when(col("column") === l.column && fullMatchCond(l), 1)
          .otherwise(0)).as(s"__full$i"))
    }
    val rej = topLeafIds.map { case (c, ids) =>
      c match {
        case _: TableLog.RgOr =>
          ids.map(i => col(s"__rej$i") === 1).reduce(_ && _)
        case _ => col(s"__rej${ids.head}") === 1
      }
    }.reduceOption(_ || _).getOrElse(lit(false))
    val full = topLeafIds.map { case (c, ids) =>
      c match {
        case _: TableLog.RgOr =>
          ids.map(i => col(s"__full$i") === 1).reduce(_ || _)
        case _ => col(s"__full${ids.head}") === 1
      }
    }.reduceOption(_ && _).getOrElse(lit(false))
    (aggs, rej, full)
  }

  /** An index-row PROOF for one constraint: TRUE iff the bounds prove
    * EVERY row of the group satisfies it — the metadata-only COUNT path.
    * Demands exact stats: zero nulls, and a dtype whose parquet min/max
    * are not truncated (integral/date for numeric, string for string —
    * float/double bounds fold through longValue and cannot prove
    * containment). */
  private[operators] def fullMatchCond(c: TableLog.RgConstraint): Column = {
    import org.apache.spark.sql.functions.{array_contains, col, exists,
      lit}
    // micros-normalized timestamps are exact integers too (INT96 and
    // unit-drift files carry NULL bounds, so they can never prove)
    val exactNum = col("dtype").isin("tinyint", "smallint", "int",
      "bigint", "date", "timestamp", "timestamp_ntz")
    c match {
      case TableLog.NumRange(_, lo, hi) =>
        exactNum && col("n_nulls") === 0L &&
          col("lmin").isNotNull && col("lmax").isNotNull &&
          lo.map(l => col("lmin") >= lit(l)).getOrElse(lit(true)) &&
          hi.map(h => col("lmax") <= lit(h)).getOrElse(lit(true))
      case TableLog.NumIn(_, vs) =>
        exactNum && col("n_nulls") === 0L &&
          col("lmin").isNotNull && col("lmin") === col("lmax") &&
          array_contains(lit(vs.toArray), col("lmin"))
      case _: TableLog.DblRange | _: TableLog.DblIn =>
        // FP stats may silently exclude NaN rows (writer-dependent),
        // and a NaN row fails any range — containment never proves
        lit(false)
      case TableLog.StrRange(_, lo, hi, hiExcl) =>
        col("dtype") === "string" && col("n_nulls") === 0L &&
          col("smin").isNotNull && col("smax").isNotNull &&
          lo.map(l => col("smin") >= lit(l)).getOrElse(lit(true)) &&
          hi.map(h => if (hiExcl) col("smax") < lit(h)
                      else col("smax") <= lit(h)).getOrElse(lit(true))
      case TableLog.StrIn(_, vs) =>
        col("dtype") === "string" && col("n_nulls") === 0L &&
          col("smin").isNotNull && col("smin") === col("smax") &&
          array_contains(lit(vs.toArray), col("smin"))
      case TableLog.NullCheck(_, isNull) =>
        if (isNull) col("n_nulls") === col("n_rows")
        else col("n_nulls") === 0L
      case TableLog.NumNotIn(_, vs) =>
        // full iff every excluded value lies OUTSIDE [min, max] (no
        // value in the group can equal one) and the group has no nulls
        exactNum && col("n_nulls") === 0L &&
          col("lmin").isNotNull && col("lmax").isNotNull &&
          !exists(lit(vs.toArray),
            v => col("lmin") <= v && v <= col("lmax"))
      case TableLog.CaseIn(_, vs, up, pfx) =>
        // only a CONSTANT no-null group proves: its single value's
        // case-fold (Spark's own upper/lower, so semantics match the
        // re-applied predicate exactly) must be (prefix mode: start
        // with) one of the targets
        val folded =
          if (up) org.apache.spark.sql.functions.upper(col("smin"))
          else org.apache.spark.sql.functions.lower(col("smin"))
        val hit =
          if (pfx) exists(lit(vs.toArray),
            p => folded.startsWith(p))
          else array_contains(lit(vs.toArray), folded)
        col("dtype") === "string" && col("n_nulls") === 0L &&
          col("smin").isNotNull && col("smin") === col("smax") && hit
      case TableLog.TrimIn(_, vs, mode) =>
        // only a CONSTANT no-null group proves: its single value's
        // trim (Spark's own, so semantics match the re-applied
        // predicate exactly) must be a target
        if (vs.isEmpty) lit(false)
        else {
          val f = mode match {
            case 'l' => org.apache.spark.sql.functions.ltrim(col("smin"))
            case 'r' => org.apache.spark.sql.functions.rtrim(col("smin"))
            case _ => org.apache.spark.sql.functions.trim(col("smin"))
          }
          col("dtype") === "string" && col("n_nulls") === 0L &&
            col("smin").isNotNull && col("smin") === col("smax") &&
            array_contains(lit(vs.toArray), f)
        }
      case TableLog.StrNotIn(_, vs) =>
        col("dtype") === "string" && col("n_nulls") === 0L &&
          col("smin").isNotNull && col("smax").isNotNull &&
          !exists(lit(vs.toArray),
            v => col("smin") <= v && v <= col("smax"))
      case or: TableLog.RgOr => sys.error(
        s"RgOr must be expanded before leaf evaluation: $or")
    }
  }

  // ===== driver-side prune (memoized small snapshots) ==================
  //
  // The Delta/Iceberg planning model: when a snapshot's whole index is
  // already resident on the driver (the bounded memo — ≤512 files), the
  // prune is plain Scala over the rows, ZERO Spark jobs. The scalar
  // predicates below are exact twins of [[rejectCond]] /
  // [[fullMatchCond]] (including three-valued null handling: a missing
  // bound never rejects and never proves). Large snapshots keep the
  // distributed aggregation.

  /** One (file, rg) planning verdict. `start` is the file-ordinal first
    * row (deletion-vector rebasing); `full` = every row provably
    * satisfies ALL constraints. */
  private[operators] final case class RgVerdict(file: String, rg: Int,
      nRows: Long, start: Long, rejected: Boolean, full: Boolean)

  private[operators] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Scalar [[rejectCond]]: bounds of THIS (file, rg, column) row
    * disprove the constraint. */
  private def leafReject(l: TableLog.RgConstraint, r: Row,
      ix: Map[String, Int]): Boolean = {
    def lng(c: String): Option[Long] =
      if (r.isNullAt(ix(c))) None else Some(r.getLong(ix(c)))
    def str(c: String): Option[String] =
      if (r.isNullAt(ix(c))) None else Some(r.getString(ix(c)))
    // defensive get: rows memoized before the dmin/dmax columns
    // existed simply never disprove FP constraints
    def dbl(c: String): Option[Double] =
      ix.get(c).filter(i => !r.isNullAt(i)).map(r.getDouble)
    l match {
      case TableLog.NumRange(_, lo, hi) =>
        (lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) =>
            lo.exists(lmax < _) || hi.exists(lmin > _)
          case _ => false
        }
      case TableLog.DblRange(_, lo, hi, hiExcl) =>
        lo.exists(l0 => dbl("dmax").exists(_ < l0)) ||
          hi.exists(h => dbl("dmin").exists(m =>
            if (hiExcl) m >= h else m > h))
      case TableLog.DblIn(_, vs) =>
        (dbl("dmin"), dbl("dmax")) match {
          case (Some(mn), Some(mx)) =>
            !vs.exists(v => mn <= v && v <= mx)
          case _ => false
        }
      case TableLog.NumIn(_, vs) =>
        (lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) =>
            !vs.exists(v => lmin <= v && v <= lmax)
          case _ => false
        }
      case TableLog.StrRange(_, lo, hi, hiExcl) =>
        (str("smin"), str("smax")) match {
          case (Some(smin), Some(smax)) =>
            lo.exists(utf8Cmp(smax, _) < 0) ||
              hi.exists(h => if (hiExcl) utf8Cmp(smin, h) >= 0
                             else utf8Cmp(smin, h) > 0)
          case _ => false
        }
      case TableLog.StrIn(_, vs) =>
        (str("smin"), str("smax")) match {
          case (Some(smin), Some(smax)) =>
            !vs.exists(v => utf8Cmp(smin, v) <= 0 && utf8Cmp(v, smax) <= 0)
          case _ => false
        }
      case TableLog.NullCheck(_, isNull) =>
        lng("n_nulls") match {
          case Some(nn) =>
            if (isNull) nn == 0L else nn == r.getLong(ix("n_rows"))
          case None => false
        }
      case TableLog.NumNotIn(_, vs) =>
        (lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) => lmin == lmax && vs.contains(lmin)
          case _ => false
        }
      case TableLog.StrNotIn(_, vs) =>
        (str("smin"), str("smax")) match {
          case (Some(smin), Some(smax)) => smin == smax && vs.contains(smin)
          case _ => false
        }
      case TableLog.CaseIn(_, vs, _, pfx) =>
        (str("smin"), str("smax")) match {
          case (Some(smin), Some(smax)) =>
            !vs.exists(variantInRange(_, smin, smax, pfx))
          case _ => false
        }
      case TableLog.TrimIn(_, vs, mode) =>
        vs.isEmpty || ((str("smin"), str("smax")) match {
          case (Some(smin), Some(smax)) =>
            !vs.exists(paddedVariantInRange(_, smin, smax, mode))
          case _ => false
        })
      case or: TableLog.RgOr => sys.error(
        s"RgOr must be expanded before leaf evaluation: $or")
    }
  }

  /** Scalar [[fullMatchCond]]: bounds prove EVERY row satisfies it. */
  private def leafFull(l: TableLog.RgConstraint, r: Row,
      ix: Map[String, Int]): Boolean = {
    def lng(c: String): Option[Long] =
      if (r.isNullAt(ix(c))) None else Some(r.getLong(ix(c)))
    def str(c: String): Option[String] =
      if (r.isNullAt(ix(c))) None else Some(r.getString(ix(c)))
    val dtype = r.getString(ix("dtype"))
    val exactNum = Set("tinyint", "smallint", "int", "bigint",
      "date", "timestamp", "timestamp_ntz")(dtype)
    val noNulls = lng("n_nulls").contains(0L)
    l match {
      case TableLog.NumRange(_, lo, hi) =>
        exactNum && noNulls && ((lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) =>
            lo.forall(lmin >= _) && hi.forall(lmax <= _)
          case _ => false
        })
      case TableLog.NumIn(_, vs) =>
        exactNum && noNulls && ((lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) =>
            lmin == lmax && vs.contains(lmin)
          case _ => false
        })
      case _: TableLog.DblRange | _: TableLog.DblIn =>
        false // FP stats never prove containment (NaN rows invisible)
      case TableLog.StrRange(_, lo, hi, hiExcl) =>
        dtype == "string" && noNulls &&
          ((str("smin"), str("smax")) match {
            case (Some(smin), Some(smax)) =>
              lo.forall(utf8Cmp(smin, _) >= 0) &&
                hi.forall(h => if (hiExcl) utf8Cmp(smax, h) < 0
                               else utf8Cmp(smax, h) <= 0)
            case _ => false
          })
      case TableLog.StrIn(_, vs) =>
        dtype == "string" && noNulls &&
          ((str("smin"), str("smax")) match {
            case (Some(smin), Some(smax)) =>
              smin == smax && vs.contains(smin)
            case _ => false
          })
      case TableLog.NullCheck(_, isNull) =>
        lng("n_nulls") match {
          case Some(nn) =>
            if (isNull) nn == r.getLong(ix("n_rows")) else nn == 0L
          case None => false
        }
      case TableLog.NumNotIn(_, vs) =>
        exactNum && noNulls && ((lng("lmin"), lng("lmax")) match {
          case (Some(lmin), Some(lmax)) =>
            !vs.exists(v => lmin <= v && v <= lmax)
          case _ => false
        })
      case TableLog.StrNotIn(_, vs) =>
        dtype == "string" && noNulls &&
          ((str("smin"), str("smax")) match {
            case (Some(smin), Some(smax)) =>
              !vs.exists(v => utf8Cmp(smin, v) <= 0 && utf8Cmp(v, smax) <= 0)
            case _ => false
          })
      case TableLog.CaseIn(_, vs, up, pfx) =>
        // driver-side fold restricted to pure-ASCII group values, where
        // Java and Spark case mapping provably agree; anything wider
        // simply doesn't prove (conservative)
        dtype == "string" && noNulls &&
          ((str("smin"), str("smax")) match {
            case (Some(smin), Some(smax)) =>
              smin == smax && smin.forall(_.toInt < 128) && {
                val f = if (up) smin.toUpperCase(java.util.Locale.ROOT)
                        else smin.toLowerCase(java.util.Locale.ROOT)
                if (pfx) vs.exists(f.startsWith) else vs.contains(f)
              }
            case _ => false
          })
      case TableLog.TrimIn(_, vs, mode) =>
        // strip SPACES only (0x20) — Spark's trim family semantics
        def strip(s: String): String = {
          var a = 0; var b = s.length
          if (mode != 'r') while (a < b && s.charAt(a) == ' ') a += 1
          if (mode != 'l') while (b > a && s.charAt(b - 1) == ' ') b -= 1
          s.substring(a, b)
        }
        dtype == "string" && noNulls && vs.nonEmpty &&
          ((str("smin"), str("smax")) match {
            case (Some(smin), Some(smax)) =>
              smin == smax && vs.contains(strip(smin))
            case _ => false
          })
      case or: TableLog.RgOr => sys.error(
        s"RgOr must be expanded before leaf evaluation: $or")
    }
  }

  /** Driver-side twin of [[prunePairs]]'s per-group aggregation: fold
    * the index rows into one [[RgVerdict]] per (file, rg) — reject =
    * any top-level conjunct disproves (a disjunction only when EVERY
    * branch does), full = every conjunct proves (a disjunction when ANY
    * branch does) — plus the union column descriptors. rg == -1 schema
    * carriers contribute descriptors but no verdicts. */
  private[operators] def classifyLocal(rows: Array[Row],
      schema: org.apache.spark.sql.types.StructType,
      constraints: Seq[TableLog.RgConstraint])
      : (Seq[RgVerdict], Seq[(Int, String, String)]) = {
    val ix = schema.fieldNames.zipWithIndex.toMap
    val (iFile, iRg, iCol) = (ix("file"), ix("rg"), ix("column"))
    val (iOrd, iDtype, iNRows) = (ix("ord"), ix("dtype"), ix("n_rows"))
    def leavesOf(c: TableLog.RgConstraint): Seq[TableLog.RgConstraint] =
      c match { case TableLog.RgOr(bs) => bs; case x => Seq(x) }
    val cols = scala.collection.mutable.LinkedHashSet[(Int, String,
      String)]()
    // group rows by (file, rg), keeping encounter order
    val groups = scala.collection.mutable.LinkedHashMap[(String, Int),
      scala.collection.mutable.Map[String, Row]]()
    rows.foreach { r =>
      cols += ((r.getInt(iOrd), r.getString(iCol), r.getString(iDtype)))
      groups.getOrElseUpdate((r.getString(iFile), r.getInt(iRg)),
        scala.collection.mutable.Map.empty)
        .update(r.getString(iCol), r)
    }
    def flag(byCol: scala.collection.Map[String, Row],
        l: TableLog.RgConstraint,
        f: (TableLog.RgConstraint, Row, Map[String, Int]) => Boolean)
        : Boolean = byCol.get(l.column).exists(f(l, _, ix))
    val verdicts = groups.iterator.map { case ((f, rg), byCol) =>
      val rej = constraints.exists {
        case TableLog.RgOr(bs) =>
          bs.nonEmpty && bs.forall(flag(byCol, _, leafReject))
        case leaf => flag(byCol, leaf, leafReject)
      }
      val full = constraints.nonEmpty && constraints.forall {
        case TableLog.RgOr(bs) => bs.exists(flag(byCol, _, leafFull))
        case leaf => flag(byCol, leaf, leafFull)
      }
      val n = byCol.valuesIterator.next().getLong(iNRows)
      RgVerdict(f, rg, n, 0L, rej, full)
    }.toSeq
    // file-ordinal start offsets: prefix sums per file in rg order
    val withStarts = verdicts.groupBy(_.file).toSeq.sortBy(_._1)
      .flatMap { case (_, vs) =>
        var acc = 0L
        vs.filter(_.rg >= 0).sortBy(_.rg).map { v =>
          val out = v.copy(start = acc); acc += v.nRows; out
        } ++ vs.filter(_.rg < 0)
      }
    (withStarts, cols.toSeq)
  }

  /** DISTRIBUTED prune of a wide index by every constraint at once:
    * per-(file, rg) reject verdicts fold in one metadata aggregation
    * (a constraint rejects a group iff ITS column's bounds disprove it;
    * a column with no stats — or absent from an evolved file — never
    * rejects), file-ordinal start offsets ride a window over the same
    * rows, and the driver collects ONLY the kept slices plus the total
    * group count. Caller should have the index persisted (two jobs). */
  private[operators] def prunePairs(spark: SparkSession, wide: DataFrame,
      constraints: Seq[TableLog.RgConstraint],
      withStarts: Boolean = true,
      needCols: Boolean = false)
      : (Seq[RgSlice], Long, Option[Seq[(String, String)]]) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{coalesce, col, collect_list,
      collect_set, first, lit, sort_array, struct, sum, when}
    // rg == -1 rows (zero-row-group schema carriers) ride through the
    // grouping so the union schema below sees them, but never become
    // slices and never count
    val (flagAggs, rej, _) = constraintFlags(constraints)
    val aggs = (first(col("n_rows")).as("n_rows") +: flagAggs) ++
      (if (needCols)
        Seq(sort_array(collect_set(struct(col("ord"), col("column"),
          col("dtype")))).as("__cols"))
      else Nil)
    val pairs0 = wide.groupBy(col("file"), col("rg"))
      .agg(aggs.head, aggs.tail: _*)
    // file-ordinal start offsets exist to rebase DELETION-VECTOR
    // positions; a snapshot without vectors skips the window (one fewer
    // shuffle per read)
    val w = Window.partitionBy("file").orderBy("rg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val startCol =
      if (withStarts) coalesce(sum(col("n_rows")).over(w), lit(0L))
      else lit(0L)
    val pairs = pairs0
      .withColumn("__start", startCol)
      .withColumn("__rej", rej)
    // ONE action: total group count, the kept slices (collect_list
    // skips the nulls when() emits for rejects), and — when no memo had
    // the union schema — the DISTINCT per-group column descriptors
    // (files share schemas, so the set of sets stays O(distinct
    // schemas), never O(groups))
    val globalAggs = Seq(
      sum(when(col("rg") >= 0, 1L).otherwise(0L)).as("total"),
      collect_list(when(!col("__rej") && col("rg") >= 0,
        struct(col("file"), col("rg"), col("__start"), col("n_rows"))))
        .as("kept")) ++
      (if (needCols) Seq(collect_set(col("__cols")).as("colsets"))
       else Nil)
    val row = pairs.agg(globalAggs.head, globalAggs.tail: _*).first()
    val kept = row.getSeq[Row](1)
      .map(r => RgSlice(r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(s => (s.file, s.rg))
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val cols =
      if (!needCols) None
      else Some(unionColsFromSets(row.getSeq[scala.collection.Seq[Row]](2)))
    (kept, total, cols)
  }

  // ===== read-side type widening =======================================
  //
  // Files written before an int→long / float→double / decimal-precision
  // evolution stay readable through the selective scan: the union
  // schema resolves to the WIDEST type and each file's values upcast at
  // emit time. Only lossless scalar widenings qualify; anything else is
  // still a loud type-drift error (a silent narrow or cross-family cast
  // could corrupt data).

  private val intWidths = Seq("tinyint", "smallint", "int", "bigint")
  private val DecimalRe = """decimal\((\d+),(\d+)\)""".r

  /** Least upper bound of two catalog types under lossless widening;
    * None when they don't widen into each other. */
  private[operators] def widenType(a: String, b: String)
      : Option[String] = {
    if (a == b) return Some(a)
    val ia = intWidths.indexOf(a); val ib = intWidths.indexOf(b)
    if (ia >= 0 && ib >= 0) return Some(intWidths(math.max(ia, ib)))
    if (Set(a, b) == Set("float", "double")) return Some("double")
    (a, b) match {
      case (DecimalRe(p1, s1), DecimalRe(p2, s2)) =>
        // scale-up keeps every value exact iff both the fractional and
        // the integral digit budgets grow monotonically
        val (ip1, is1) = (p1.toInt, s1.toInt)
        val (ip2, is2) = (p2.toInt, s2.toInt)
        val s = math.max(is1, is2)
        val p = math.max(ip1 - is1, ip2 - is2) + s
        if (p <= 38) Some(s"decimal($p,$s)") else None
      case _ => None
    }
  }

  /** Value upcast into catalog type `to` (applied only when the file's
    * type is strictly narrower — identity otherwise). */
  private def upcastTo(to: String): Any => Any = to match {
    case "smallint" => {
      case b: java.lang.Byte => b.shortValue(); case v => v }
    case "int" => {
      case b: java.lang.Byte => b.intValue()
      case s: java.lang.Short => s.intValue(); case v => v }
    case "bigint" => {
      case b: java.lang.Byte => b.longValue()
      case s: java.lang.Short => s.longValue()
      case i: java.lang.Integer => i.longValue(); case v => v }
    case "double" => {
      case f: java.lang.Float => f.doubleValue(); case v => v }
    case DecimalRe(_, s) => {
      case d: java.math.BigDecimal => d.setScale(s.toInt); case v => v }
    case _ => identity
  }

  /** Fold the collected per-group column-descriptor sets into the
    * union schema: mergeSchema order (first field position, then name),
    * widening scalar types to their lossless LUB, loud on any other
    * type conflict — the driver-side twin of what a separate
    * metadata job used to compute. */
  private[operators] def unionColsFromSets(
      sets: scala.collection.Seq[scala.collection.Seq[Row]])
      : Seq[(String, String)] =
    unionColsFromTuples(sets.flatten
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq)

  private[operators] def unionColsFromTuples(
      all0: Seq[(Int, String, String)]): Seq[(String, String)] = {
    val all = all0.distinct
    all.groupBy(_._2).map { case (c, rs) =>
      val t = rs.map(_._3).distinct.reduceLeft { (x, y) =>
        widenType(x, y).getOrElse(sys.error(
          s"type drift on column $c: " +
            rs.map(_._3).distinct.sorted.mkString(" vs ")))
      }
      (rs.map(_._1).min, c, t)
    }.toSeq.sortBy(t => (t._1, t._2)).map(t => (t._2, t._3))
  }


  /** Empty frame carrying the (projected) union schema — what a fully
    * pruned read returns so downstream plans analyze cleanly. */
  private[operators] def emptyFrame(spark: SparkSession,
      unionCols: Seq[(String, String)], columns: Seq[String]): DataFrame = {
    val wanted = wantedCols(unionCols, columns)
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(wanted.map { case (n, dt) =>
        StructField(n, DataType.fromDDL(dt), nullable = true)
      }))
  }

  /** Projection resolution: caller order, loud on unknown names. */
  private def wantedCols(unionCols: Seq[(String, String)],
      columns: Seq[String]): Seq[(String, String)] =
    if (columns.isEmpty) unionCols
    else {
      val m = unionCols.toMap
      columns.map { c =>
        require(m.contains(c), s"projection names unknown columns: $c")
        c -> m(c)
      }
    }

  // ===== page-level pruning (parquet ColumnIndex) ======================
  //
  // Under the row-group keep set, surviving groups can still skip
  // PAGES: the constraint conjuncts translate to a parquet
  // FilterPredicate built against the FILE's physical types (so type
  // validation can never fail), the ColumnIndex computes the surviving
  // row ranges, and the slice scan decodes only those pages. Emitted
  // rows stay a SUPERSET of the matches (the exact predicate re-applies
  // on top) and positions rebase through the store's row indexes, so
  // deletion vectors keep working. Any unconvertible conjunct simply
  // drops from the page filter — conservative, like every skip layer.

  /** The constraints as a parquet FilterPredicate over `full`'s
    * physical schema; None when nothing converts. */
  private def pageFilterFor(full: org.apache.parquet.schema.MessageType,
      constraints: Seq[TableLog.RgConstraint])
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.{FilterApi,
      FilterPredicate}
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    def isStringish(p: org.apache.parquet.schema.PrimitiveType): Boolean =
      p.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => true
        case _: LogicalTypeAnnotation.EnumLogicalTypeAnnotation => true
        case _: LogicalTypeAnnotation.JsonLogicalTypeAnnotation => true
        case _ => false
      }
    // an INT64 numeric filter is sound iff the file's physical values
    // ARE the constraint's space: plain longs, or MICROS timestamps
    // (the constraint side is micros-normalized; millis/nanos files
    // would compare in the wrong unit — they just skip page filtering)
    def int64Comparable(p: org.apache.parquet.schema.PrimitiveType)
        : Boolean = p.getLogicalTypeAnnotation match {
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
      case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => false
      case _ => true
    }
    def leaf(c: TableLog.RgConstraint): Option[FilterPredicate] = {
      if (!full.containsField(c.column)) return None
      val t = full.getType(full.getFieldIndex(c.column))
      if (!t.isPrimitive) return None
      val p = t.asPrimitiveType()
      if (p.getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
            .INT64 && !int64Comparable(p)) return None
      val inIntRange = (v: Long) =>
        v >= Int.MinValue.toLong && v <= Int.MaxValue.toLong
      p.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          return None // unscaled-vs-scaled spaces never compare raw
        case _ => ()
      }
      (c, p.getPrimitiveTypeName) match {
        case (TableLog.NumRange(n, lo, hi), INT64) =>
          val col = FilterApi.longColumn(n)
          (lo.map(l => FilterApi.gtEq(col,
              java.lang.Long.valueOf(l)): FilterPredicate).toSeq ++
            hi.map(h => FilterApi.ltEq(col,
              java.lang.Long.valueOf(h)): FilterPredicate))
            .reduceOption(FilterApi.and(_, _))
        case (TableLog.NumRange(n, lo, hi), INT32) =>
          // bounds outside int space: a too-high hi / too-low lo drops
          // its side (no constraint); a too-high lo / too-low hi cannot
          // convert exactly — drop the conjunct (conservative)
          if (lo.exists(_ > Int.MaxValue.toLong) ||
              hi.exists(_ < Int.MinValue.toLong)) None
          else {
            val col = FilterApi.intColumn(n)
            (lo.filter(inIntRange).map(l => FilterApi.gtEq(col,
                java.lang.Integer.valueOf(l.toInt)): FilterPredicate)
              .toSeq ++
              hi.filter(inIntRange).map(h => FilterApi.ltEq(col,
                java.lang.Integer.valueOf(h.toInt)): FilterPredicate))
              .reduceOption(FilterApi.and(_, _))
          }
        case (TableLog.NumIn(n, vs), INT64) if vs.nonEmpty =>
          Some(FilterApi.in(FilterApi.longColumn(n),
            vs.map(java.lang.Long.valueOf).toSet.asJava))
        case (TableLog.NumIn(n, vs), INT32) if vs.nonEmpty =>
          val ints = vs.filter(inIntRange)
          if (ints.isEmpty) None
          else Some(FilterApi.in(FilterApi.intColumn(n),
            ints.map(v => java.lang.Integer.valueOf(v.toInt))
              .toSet.asJava))
        case (TableLog.StrRange(n, lo, hi, hiExcl), BINARY)
            if isStringish(p) =>
          val col = FilterApi.binaryColumn(n)
          (lo.map(l => FilterApi.gtEq(col,
              Binary.fromString(l)): FilterPredicate).toSeq ++
            hi.map(h => (if (hiExcl)
                FilterApi.lt(col, Binary.fromString(h))
              else FilterApi.ltEq(col,
                Binary.fromString(h))): FilterPredicate))
            .reduceOption(FilterApi.and(_, _))
        case (TableLog.StrIn(n, vs), BINARY)
            if isStringish(p) && vs.nonEmpty =>
          Some(FilterApi.in(FilterApi.binaryColumn(n),
            vs.map(Binary.fromString).toSet.asJava))
        case (TableLog.NullCheck(n, isNull), INT64) =>
          val col = FilterApi.longColumn(n)
          Some(if (isNull) FilterApi.eq(col,
              null.asInstanceOf[java.lang.Long]): FilterPredicate
            else FilterApi.notEq(col,
              null.asInstanceOf[java.lang.Long]))
        case (TableLog.NullCheck(n, isNull), INT32) =>
          val col = FilterApi.intColumn(n)
          Some(if (isNull) FilterApi.eq(col,
              null.asInstanceOf[java.lang.Integer]): FilterPredicate
            else FilterApi.notEq(col,
              null.asInstanceOf[java.lang.Integer]))
        case (TableLog.NullCheck(n, isNull), BINARY) =>
          val col = FilterApi.binaryColumn(n)
          Some(if (isNull) FilterApi.eq(col,
              null.asInstanceOf[Binary]): FilterPredicate
            else FilterApi.notEq(col, null.asInstanceOf[Binary]))
        case (TableLog.NumNotIn(n, vs), INT64) if vs.nonEmpty =>
          val col = FilterApi.longColumn(n)
          vs.map(v => FilterApi.notEq(col,
            java.lang.Long.valueOf(v)): FilterPredicate)
            .reduceOption(FilterApi.and(_, _))
        case (TableLog.NumNotIn(n, vs), INT32) if vs.nonEmpty =>
          val ints = vs.filter(inIntRange) // out-of-range can't match
          val col = FilterApi.intColumn(n)
          ints.map(v => FilterApi.notEq(col,
            java.lang.Integer.valueOf(v.toInt)): FilterPredicate)
            .reduceOption(FilterApi.and(_, _))
        case (TableLog.StrNotIn(n, vs), BINARY)
            if isStringish(p) && vs.nonEmpty =>
          val col = FilterApi.binaryColumn(n)
          vs.map(v => FilterApi.notEq(col,
            Binary.fromString(v)): FilterPredicate)
            .reduceOption(FilterApi.and(_, _))
        case _ => None
      }
    }
    def top(c: TableLog.RgConstraint): Option[FilterPredicate] = c match {
      case TableLog.RgOr(bs) =>
        // every branch must convert, or the disjunction drops whole
        val ps = bs.map(leaf)
        if (ps.isEmpty || ps.exists(_.isEmpty)) None
        else ps.flatten.reduceOption(FilterApi.or(_, _))
      case l => leaf(l)
    }
    constraints.flatMap(top).reduceOption(FilterApi.and(_, _))
  }

  /** Page-skip accounting (local-mode diagnostic, like
    * [[indexFooterOpens]]): rows decoded vs rows the kept row groups
    * hold. */
  private[graft] val pageFilteredRows =
    new java.util.concurrent.atomic.LongAdder
  private[graft] val pageTotalRows =
    new java.util.concurrent.atomic.LongAdder

  /** `ParquetFileReader.readFilteredRowGroup(Int, RowRanges)` — its
    * declared return type is a package-private class, so the call goes
    * through reflection and upcasts to the public interface. */
  private lazy val filteredRowGroupMh =
    classOf[org.apache.parquet.hadoop.ParquetFileReader]
      .getMethod("readFilteredRowGroup", classOf[Int],
        classOf[org.apache.parquet.internal.filter2.columnindex
          .RowRanges])

  /** Scan exactly the given slices — one distributed job, ≤
    * [[rgsPerTask]] row groups per task. Schema evolution across files
    * null-fills (a file missing a union column emits nulls for it); a
    * TYPE conflict fails loudly in the task. `emitPos` appends
    * `__graft_fn` (file basename) and `__graft_ridx` (file-ordinal row
    * index, rebased from the slice's start offset) — the join identity
    * deletion vectors use, so a DV-carrying file can be read
    * PARTIALLY. A non-empty `columns` projection reads only those
    * columns' pages (a point fetch on a wide table touches 2 column
    * chunks, not 200 — the custom scan materializes rows eagerly, so
    * Catalyst's own column pruning cannot reach inside it). */
  private[operators] def scanSlices(spark: SparkSession,
      slices: Seq[RgSlice], unionCols: Seq[(String, String)],
      columns: Seq[String] = Nil, emitPos: Boolean = false,
      constraints: Seq[TableLog.RgConstraint] = Nil): DataFrame = {
    val wanted = wantedCols(unionCols, columns)
    val base = StructType(wanted.map { case (n, dt) =>
      StructField(n, DataType.fromDDL(dt), nullable = true)
    })
    val schema =
      if (!emitPos) base
      else StructType(base.fields :+
        StructField("__graft_fn", StringType, nullable = false) :+
        StructField("__graft_ridx", LongType, nullable = false))
    if (slices.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val tasks = slices.groupBy(_.file).toSeq.sortBy(_._1)
      .flatMap { case (f, ss) =>
        ss.sortBy(_.rg).grouped(rgsPerTask)
          .map(g => (f, g.map(s => (s.rg, s.start))))
      }
    val wantedLocal = wanted
    val emitPosLocal = emitPos
    val constraintsLocal = constraints
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.size))
      .flatMap { case (f, parts) =>
        taskSliceRows(f, parts, conf.value, wantedLocal, emitPosLocal,
          constraintsLocal)
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Executor-side selective scan of `parts` (rg index, start offset) in
    * `file`, emitting rows in `wanted` order with nulls for columns the
    * file predates. The reader closes on task completion (and eagerly on
    * exhaustion). */
  private def taskSliceRows(file: String, parts: Seq[(Int, Long)],
      conf: org.apache.hadoop.conf.Configuration,
      wanted: Seq[(String, String)], emitPos: Boolean,
      constraints: Seq[TableLog.RgConstraint] = Nil): Iterator[Row] = {
    import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.ColumnIOFactory
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    var closed = false
    def close(): Unit = if (!closed) { closed = true; reader.close() }
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
    val full = reader.getFooter.getFileMetaData.getSchema
    val fileCols = full.getFields.asScala.map(_.getName).toSet
    val have = wanted.filter(w => fileCols(w._1))
    // per-column upcast into the plan's (possibly widened) type; a file
    // whose type neither equals nor widens into the plan's fails loudly
    val adapters: Map[String, Any => Any] = have.map { case (n, dt) =>
      val got = sparkTypeOf(full.getType(full.getFieldIndex(n)))
        .catalogString
      require(got == dt || widenType(got, dt).contains(dt),
        s"type drift on column $n in $file: $got, plan wants $dt")
      n -> (if (got == dt) identity[Any] _ else upcastTo(dt))
    }.toMap
    val blocks = reader.getFooter.getBlocks
    val nRgs = blocks.size
    val fname = new org.apache.hadoop.fs.Path(file).getName
    if (have.isEmpty) {
      // nothing to decode from this file: emit null rows by count only
      // (no data page leaves disk)
      val out = parts.iterator.flatMap { case (i, start) =>
        require(i >= 0 && i < nRgs, s"row group $i out of range in $file")
        val n = blocks.get(i).getRowCount
        Iterator.range(0L, n).map { r =>
          val base: Seq[Any] = wanted.map(_ => null)
          Row.fromSeq(if (emitPos) base :+ fname :+ (start + r) else base)
        }
      }
      return new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) close(); h }
        def next(): Row = out.next()
      }
    }
    val haveSet = have.map(_._1).toSet
    val msg = new org.apache.parquet.schema.MessageType(full.getName,
      full.getFields.asScala.filter(f => haveSet(f.getName)).asJava)
    reader.setRequestedSchema(msg)
    val msgIdx = (0 until msg.getFieldCount)
      .map(j => msg.getType(j).getName -> j).toMap
    val convs = Array.tabulate(msg.getFieldCount)(j =>
      fieldConverter(msg.getType(j), j))
    val io = new ColumnIOFactory().getColumnIO(msg)
    // page-level pruning: constraints → FilterPredicate over the FILE
    // schema → ColumnIndex row ranges; a group whose ranges cover every
    // row reads plain (no synchronization overhead). Failures fall back
    // to the whole group — skipping may lose rows, reading more never.
    val pageFilter =
      if (constraints.isEmpty) None
      else pageFilterFor(full, constraints)
        .map(org.apache.parquet.filter2.compat.FilterCompat.get)
    val inner = parts.iterator.flatMap { case (i, start) =>
      require(i >= 0 && i < nRgs, s"row group $i out of range in $file")
      val block = blocks.get(i)
      val (pages, rowIdx) = pageFilter match {
        case Some(filter) =>
          try {
            import scala.jdk.CollectionConverters._
            val ranges = org.apache.parquet.internal.filter2.columnindex
              .ColumnIndexFilter.calculateRowRanges(filter,
                reader.getColumnIndexStore(i),
                block.getColumns.asScala.map(_.getPath).toSet.asJava,
                block.getRowCount)
            pageTotalRows.add(block.getRowCount)
            if (ranges.rowCount() >= block.getRowCount)
              (reader.readRowGroup(i), None)
            else {
              // the 2-arg readFilteredRowGroup's declared return class
              // is package-private; go through the public interface
              val ps = filteredRowGroupMh.invoke(reader,
                Int.box(i), ranges)
                .asInstanceOf[org.apache.parquet.column.page
                  .PageReadStore]
              pageFilteredRows.add(block.getRowCount - ps.getRowCount)
              (ps, Option(ps.getRowIndexes.orElse(null)))
            }
          } catch {
            case _: Exception => (reader.readRowGroup(i), None)
          }
        case None => (reader.readRowGroup(i), None)
      }
      val rr = io.getRecordReader(pages, new GroupRecordConverter(msg))
      Iterator.range(0L, pages.getRowCount).map { r =>
        val g = rr.read()
        // positions rebase through the filtered store's row indexes so
        // deletion vectors keep addressing the right rows
        val pos = rowIdx.map(_.nextLong()).getOrElse(r)
        val base: Seq[Any] = wanted.map { case (n, _) =>
          msgIdx.get(n) match {
            case Some(j) =>
              if (g.getFieldRepetitionCount(j) == 0) null
              else adapters(n)(convs(j)(g))
            case None => null
          }
        }
        Row.fromSeq(if (emitPos) base :+ fname :+ (start + pos) else base)
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

  // ===== legacy single-column index API ================================
  //
  // The wide index above is what the log's readers use; these per-column
  // builders and pruned readers remain as the standalone surface for
  // ad-hoc parquet directories (and the specs that pin the index shape).
  // Their prune is the same DISTRIBUTED filter, never a driver loop.

  /** Per-ROW-GROUP zone-map index over a numeric column — (file, rg,
    * zmin, zmax, n_rows) from the parquet footers only, distributed one
    * file per task. Row groups lacking stats for `column` (or whose
    * min/max is non-numeric) get null bounds — [[readRowGroupsPruned]]
    * keeps them conservatively. */
  def rowGroupIndexFiles(spark: SparkSession, files: Seq[String],
      column: String): DataFrame =
    narrowView(buildWideIndex(spark, files.map(f => (f, f))), column,
      "lmin", "lmax")

  /** Per-ROW-GROUP zone-map index over a STRING column — the
    * [[rowGroupIndexFiles]] twin for the most common lake predicate
    * shape (date strings, category codes, url prefixes). Bounds fold in
    * UTF-8 BYTE order (the order parquet stats and Spark's string
    * comparison use — Java String `<` disagrees beyond the BMP). */
  def rowGroupIndexStringFiles(spark: SparkSession, files: Seq[String],
      column: String): DataFrame =
    narrowView(buildWideIndex(spark, files.map(f => (f, f))), column,
      "smin", "smax")

  /** Single-column (file, rg, zmin, zmax, n_rows) view of a wide index.
    * EVERY (file, rg) appears — a file that predates the column (or a
    * column with no stats) carries null bounds and is kept
    * conservatively by the pruned readers. */
  private def narrowView(wide: DataFrame, column: String,
      minCol: String, maxCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val pairs = wide.filter(col("rg") >= 0)
      .select("file", "rg", "n_rows").distinct()
    val stats = wide.filter(col("column") === column && col("rg") >= 0)
      .select(col("file"), col("rg"), col(minCol).as("zmin"),
        col(maxCol).as("zmax"))
    pairs.join(stats, Seq("file", "rg"), "left")
      .select("file", "rg", "zmin", "zmax", "n_rows")
  }

  /** Range-pruned read off a [[rowGroupIndexFiles]] index: scans ONLY row
    * groups whose [zmin, zmax] intersects [lo, hi] (null-bounds groups
    * kept conservatively — skipping may lose rows, keeping never does).
    * The caller re-applies the exact predicate. Returns (frame,
    * rgOpened, rgTotal, filesOpened). Zero kept groups returns an empty
    * frame WITH the table schema, so downstream plans analyze cleanly.
    * `columns` non-empty = a PROJECTION pushed into the scan: only those
    * columns' pages are read. */
  def readRowGroupsPruned(spark: SparkSession, index: DataFrame,
      lo: Long, hi: Long, columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    prunedScanNarrow(spark, index,
      col("zmin") <= lit(hi) && col("zmax") >= lit(lo), columns)
  }

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
      columns: Seq[String] = Nil): (DataFrame, Long, Long, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val conds = lo.map(l => col("zmax") >= lit(l)).toSeq ++
      hi.map(h => col("zmin") <= lit(h)).toSeq
    prunedScanNarrow(spark, index,
      conds.reduceOption(_ && _).getOrElse(lit(true)), columns)
  }

  /** IN-list-pruned read off a numeric index: keeps a row group iff ANY
    * probe value falls inside its [zmin, zmax] — the point-lookup shape
    * ([[graft.operators.TableLog.readPointLookup]] composes it with the
    * bloom file prune). The probe runs DISTRIBUTED as an `exists` over a
    * literal array — never an O(|index|·|values|) driver loop. */
  def readRowGroupsPrunedIn(spark: SparkSession, index: DataFrame,
      values: Seq[Long], columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) = {
    import org.apache.spark.sql.functions.{col, exists, lit}
    prunedScanNarrow(spark, index,
      exists(lit(values.toArray),
        v => col("zmin") <= v && v <= col("zmax")), columns)
  }

  /** [[readRowGroupsPrunedIn]] for a STRING index (UTF-8 byte order). */
  def readRowGroupsPrunedInString(spark: SparkSession, index: DataFrame,
      values: Seq[String], columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) = {
    import org.apache.spark.sql.functions.{col, exists, lit}
    prunedScanNarrow(spark, index,
      exists(lit(values.toArray),
        v => col("zmin") <= v && v <= col("zmax")), columns)
  }

  /** Shared narrow prune+scan core: `keepCond` judges a non-null-bounds
    * index row DISTRIBUTED (Column filter, not a collected loop);
    * null-bounds rows are always kept. The driver receives only the kept
    * (file, rg) pairs. */
  private def prunedScanNarrow(spark: SparkSession, index: DataFrame,
      keepCond: Column, columns: Seq[String] = Nil)
      : (DataFrame, Long, Long, Int) = {
    import org.apache.spark.sql.functions.col
    val cached = index.persist()
    try {
      val kept = cached
        .filter(col("zmin").isNull || col("zmax").isNull || keepCond)
        .select("file", "rg").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      val total = cached.count()
      val anyFile = cached.select("file").limit(1).collect()
        .headOption.map(_.getString(0))
      require(anyFile.isDefined,
        "row-group pruned read needs a non-empty index")
      scanKeep(spark, kept, total, anyFile.get, columns)
    } finally cached.unpersist()
  }

  /** Scan a keep set (possibly intersected across constraints). Returns
    * (frame, rgOpened, rgTotal, filesOpened). */
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

  /** Projected frames come back in the CALLER's column order (the
    * parquet-side subset stays in table order for the readers). */
  private def callerOrder(df: DataFrame, columns: Seq[String]): DataFrame =
    if (columns.isEmpty) df
    else df.select(columns.map(org.apache.spark.sql.functions.col): _*)

  /** Scan exactly the given (file, row-group indices) — one distributed
    * job, ≤ [[rgsPerTask]] row groups per task. All files must carry the
    * SAME parquet schema (the strict ad-hoc contract; the log's own
    * reads go through [[scanSlices]], which tolerates add-column
    * evolution). A non-empty `columns` projection reads ONLY those
    * columns' pages. */
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

  /** Value converter for one field — scalars mirror Spark's own parquet
    * type mapping (so a selective scan unions cleanly with a
    * `spark.read.parquet` of sibling files); nested shapes cover what
    * Spark WRITES: 3-level LIST, 3-level MAP, struct. The converter
    * assumes the field is PRESENT (repetition count > 0) — the caller
    * null-checks. */
  private def fieldConverter(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any =
    if (t.isPrimitive) primitiveConverter(t, idx)
    else {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val gt = t.asGroupType()
      t.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val rep = listRepeated(gt)
          val elemT = rep.getType(0)
          val ec = fieldConverter(elemT, 0)
          g => {
            val lg = g.getGroup(idx, 0)
            val n = lg.getFieldRepetitionCount(0)
            val out = new Array[Any](n)
            var i = 0
            while (i < n) {
              val entry = lg.getGroup(0, i)
              out(i) =
                if (entry.getFieldRepetitionCount(0) == 0) null
                else ec(entry)
              i += 1
            }
            out.toSeq
          }
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = mapKeyValue(gt)
          val kc = fieldConverter(kv.getType(0), 0)
          val vc = fieldConverter(kv.getType(1), 1)
          g => {
            val mg = g.getGroup(idx, 0)
            val n = mg.getFieldRepetitionCount(0)
            (0 until n).map { i =>
              val e = mg.getGroup(0, i)
              val v = if (e.getFieldRepetitionCount(1) == 0) null
                      else vc(e)
              kc(e) -> v
            }.toMap
          }
        case _ => // plain group = struct
          requireStruct(t)
          val convs = Array.tabulate(gt.getFieldCount)(j =>
            fieldConverter(gt.getType(j), j))
          g => {
            val sg = g.getGroup(idx, 0)
            Row.fromSeq((0 until gt.getFieldCount).map(j =>
              if (sg.getFieldRepetitionCount(j) == 0) null
              else convs(j)(sg)))
          }
      }
    }

  /** Scalar converter (shared by flat and nested paths). */
  private def primitiveConverter(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    require(t.getRepetition != Repetition.REPEATED,
      s"row-group scan: legacy 2-level repeated field unsupported: $t")
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
    * sql.types.Decimal, GenericArrayData / ArrayBasedMapData /
    * GenericInternalRow for the nested shapes) — what a DataSource-v2
    * PartitionReader emits ([[graft.sources.LakeStreamProvider]])
    * without dragging encoder machinery onto the executors. */
  private[graft] def catalystConverter(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any =
    if (t.isPrimitive) catalystPrimitive(t, idx)
    else {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData,
        GenericArrayData}
      val gt = t.asGroupType()
      t.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val rep = listRepeated(gt)
          val ec = catalystConverter(rep.getType(0), 0)
          g => {
            val lg = g.getGroup(idx, 0)
            val n = lg.getFieldRepetitionCount(0)
            val out = new Array[Any](n)
            var i = 0
            while (i < n) {
              val entry = lg.getGroup(0, i)
              out(i) =
                if (entry.getFieldRepetitionCount(0) == 0) null
                else ec(entry)
              i += 1
            }
            new GenericArrayData(out)
          }
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = mapKeyValue(gt)
          val kc = catalystConverter(kv.getType(0), 0)
          val vc = catalystConverter(kv.getType(1), 1)
          g => {
            val mg = g.getGroup(idx, 0)
            val n = mg.getFieldRepetitionCount(0)
            val ks = new Array[Any](n)
            val vs = new Array[Any](n)
            var i = 0
            while (i < n) {
              val e = mg.getGroup(0, i)
              ks(i) = kc(e)
              vs(i) = if (e.getFieldRepetitionCount(1) == 0) null
                      else vc(e)
              i += 1
            }
            new ArrayBasedMapData(new GenericArrayData(ks),
              new GenericArrayData(vs))
          }
        case _ => // plain group = struct
          requireStruct(t)
          val convs = Array.tabulate(gt.getFieldCount)(j =>
            catalystConverter(gt.getType(j), j))
          g => {
            val sg = g.getGroup(idx, 0)
            val vals = new Array[Any](gt.getFieldCount)
            var j = 0
            while (j < gt.getFieldCount) {
              vals(j) =
                if (sg.getFieldRepetitionCount(j) == 0) null
                else convs(j)(sg)
              j += 1
            }
            new GenericInternalRow(vals)
          }
      }
    }

  private def catalystPrimitive(t: org.apache.parquet.schema.Type,
      idx: Int): org.apache.parquet.example.data.Group => Any = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    require(t.getRepetition != Repetition.REPEATED,
      s"row-group scan: legacy 2-level repeated field unsupported: $t")
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

  /** The repeated "list" group of a 3-level parquet LIST (what Spark
    * writes); legacy 2-level shapes fail loudly. */
  private def listRepeated(gt: org.apache.parquet.schema.GroupType)
      : org.apache.parquet.schema.GroupType = {
    import org.apache.parquet.schema.Type.Repetition
    require(gt.getFieldCount == 1 && !gt.getType(0).isPrimitive &&
      gt.getType(0).getRepetition == Repetition.REPEATED &&
      gt.getType(0).asGroupType().getFieldCount == 1,
      s"row-group scan supports 3-level LIST only: $gt")
    gt.getType(0).asGroupType()
  }

  /** The repeated key_value group of a 3-level parquet MAP. */
  private def mapKeyValue(gt: org.apache.parquet.schema.GroupType)
      : org.apache.parquet.schema.GroupType = {
    import org.apache.parquet.schema.Type.Repetition
    require(gt.getFieldCount == 1 && !gt.getType(0).isPrimitive &&
      gt.getType(0).getRepetition == Repetition.REPEATED &&
      gt.getType(0).asGroupType().getFieldCount == 2,
      s"row-group scan supports 3-level MAP only: $gt")
    gt.getType(0).asGroupType()
  }

  private def requireStruct(t: org.apache.parquet.schema.Type): Unit = {
    import org.apache.parquet.schema.Type.Repetition
    require(t.getRepetition != Repetition.REPEATED,
      s"row-group scan: legacy repeated group unsupported: $t")
  }

  /** Spark type for one parquet field — scalars as
    * [[primitiveConverter]] materializes them, nested via the 3-level
    * LIST/MAP and struct shapes, so created frames union cleanly with
    * `spark.read.parquet` frames of sibling files. */
  private[operators] def sparkTypeOf(
      t: org.apache.parquet.schema.Type): DataType =
    if (t.isPrimitive) {
      import org.apache.parquet.schema.LogicalTypeAnnotation._
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      import org.apache.parquet.schema.Type.Repetition
      require(t.getRepetition != Repetition.REPEATED,
        s"row-group scan: legacy 2-level repeated field unsupported: $t")
      val p = t.asPrimitiveType()
      val ann = p.getLogicalTypeAnnotation
      p.getPrimitiveTypeName match {
        case BOOLEAN => BooleanType
        case INT32 => ann match {
          case _: DateLogicalTypeAnnotation => DateType
          case d: DecimalLogicalTypeAnnotation =>
            DecimalType(d.getPrecision, d.getScale)
          case a: IntLogicalTypeAnnotation if a.getBitWidth == 8 =>
            ByteType
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
    } else {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val gt = t.asGroupType()
      t.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          ArrayType(sparkTypeOf(listRepeated(gt).getType(0)),
            containsNull = true)
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = mapKeyValue(gt)
          MapType(sparkTypeOf(kv.getType(0)), sparkTypeOf(kv.getType(1)),
            valueContainsNull = true)
        case _ =>
          requireStruct(t)
          StructType((0 until gt.getFieldCount).map(j =>
            StructField(gt.getType(j).getName, sparkTypeOf(gt.getType(j)),
              nullable = true)))
      }
    }

  private def parquetSchemaOf(file: String,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** Spark schema for a parquet message — the same mapping the
    * converters materialize, so created frames union cleanly with
    * `spark.read.parquet` frames of sibling files. */
  private[graft] def sparkSchemaOf(
      msg: org.apache.parquet.schema.MessageType): StructType =
    StructType((0 until msg.getFieldCount).map { i =>
      val t = msg.getType(i)
      // always nullable: Spark's file sources relax REQUIRED to nullable
      // on read, and this schema must union cleanly with theirs
      StructField(t.getName, sparkTypeOf(t), nullable = true)
    })
}
