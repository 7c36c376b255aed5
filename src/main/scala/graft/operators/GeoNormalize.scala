package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.GraftFunctions._

/** The reference's `extract()` pipeline (east_asia.py:96-283) as one
  * declarative DataFrame program, plus the ZSTD/Hilbert Parquet write
  * contract shared by every reference sink (§1.3 of SURVEY.md).
  *
  * Differences from the reference mechanics (same capability, SURVEY.md §7.5):
  * heterogenous 2D/3D inputs are normalized per-row (`st_force2d`) instead of
  * per-file fallback; reprojection is the in-engine `st_transform` instead of
  * an ogr2ogr subprocess; the flip probe is a 1-row aggregate collect.
  */
object GeoNormalize {

  /** Discover the geometry column like the reference's
    * `DESCRIBE FROM ST_READ(...) LIMIT 1` probe (east_asia.py:145-161):
    * prefer conventional names, else the first binary column. */
  def findGeomColumn(df: DataFrame): Option[String] = {
    val binCols = df.schema.fields.filter(_.dataType == BinaryType).map(_.name)
    binCols.find(_.equalsIgnoreCase("geom"))
      .orElse(binCols.find(_.equalsIgnoreCase("shape")))
      .orElse(binCols.headOption)
  }

  /** Normalize one source table of WKB geometry + attributes:
    *  1. force 3D shapes to 2D (subsumes the reference's Python fallback F6)
    *  2. drop non-core-7 / broken / null geometries (P3, P4, P5)
    *  3. reproject `srcEpsg` → EPSG:4326 (G4)
    *  4. repair flipped lat-lon sources when MIN(ST_XMin) < 60 (F7 heuristic,
    *     east_asia.py:239)
    * Attribute columns ride along untouched (ORNL `* EXCLUDE(Shape)` shape,
    * ORNL-FEMA-Buildings.md:79-80). Returns the normalized frame with the
    * geometry in a `geom` column.
    */
  def normalize(df: DataFrame, srcEpsg: Int = 4326, flipProbe: Boolean = true): DataFrame = {
    val geomCol = findGeomColumn(df).getOrElse(
      throw new IllegalArgumentException("no binary geometry column found"))
    val attrs = df.columns.filter(_ != geomCol).map(col).toSeq

    val transformed =
      if (srcEpsg == 4326) (c: Column) => c
      else (c: Column) => st_transform(c, lit(srcEpsg), lit(4326))
    val flat = df
      .withColumn("__g", st_force2d(col(geomCol)))
      .filter(col("__g").isNotNull && wkb_shape_type(col("__g")) < 8)
      .withColumn("__g", transformed(col("__g")))
      .filter(centroid_x(col("__g")).isNotNull && centroid_y(col("__g")).isNotNull)

    val repaired =
      if (!flipProbe) flat
      else {
        // probe-before-plan (east_asia.py:195-239): cheap 1-row aggregate
        // decides whether the whole source is lat-lon flipped
        val minX = flat.agg(min(st_xmin(col("__g")))).head() match {
          case r if r.isNullAt(0) => Double.MaxValue
          case r                  => r.getDouble(0)
        }
        if (minX < 60.0) flat.withColumn("__g", st_flip_coordinates(col("__g")))
        else flat
      }

    repaired.select((attrs :+ col("__g").as("geom")): _*)
  }

  /** Spatial clustering + write contract (every reference sink,
    * east_asia.py:72-83): order by Hilbert(lat, lon of centroid), write
    * ZSTD parquet. `numFiles <= 0` leaves Spark's range-partitioned sort
    * parallelism intact (the 100TB path: each range partition is written by
    * its own task and is internally Hilbert-ordered, giving the same
    * row-group locality without a single-writer bottleneck); a positive
    * `numFiles` forces that many output files (reference parity: 1).
    */
  def writeClustered(df: DataFrame, outPath: String, numFiles: Int = 0,
      zstdLevel: Int = 22, rowGroupBytes: Long = 4L * 1024 * 1024,
      geoFooter: Boolean = true): Unit = {
    // the WKB→Hilbert kernel runs in the pre-exchange stage (twice, for the
    // range sampling) — scatter a few-split input first (no-op at scale)
    val keyed = Scatter(df).withColumn("__hk", hilbert_of_geom(col("geom")))
    val arranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__hk"))
        .sortWithinPartitions("__hk")
      else keyed.sortWithinPartitions("__hk") // caller controls partitioning
    arranged.drop("__hk")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", zstdLevel.toString)
      // parquet-mr sizes row groups in bytes, not rows; small groups keep
      // the reference's row-group-level spatial pruning property (§1.3)
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(outPath)
    if (geoFooter) writeGeoParquetFooter(df.sparkSession, outPath)
  }

  /** Stamp the public GeoParquet 1.1 `geo` footer key on every parquet file
    * under `outPath` so GDAL / geopandas / DuckDB-spatial auto-recognize the
    * geometry column (the reference reads its own output back via explicit
    * `ST_GEOMFROMWKB`, East-Asia-Building-Footprints.md:231-234 — the footer
    * is pure interop upside). Per-file bbox and geometry_types come from one
    * geometry-only scan of the fresh files (column pruning reads a single
    * column); the footer rewrite itself is a raw row-group byte copy
    * (`ParquetFileWriter.appendFile` — no decode, no re-compression),
    * distributed one task per file. `crs` is omitted: the spec default
    * OGC:CRS84 is exactly the normalized lon-lat WGS84 this sink emits. */
  def writeGeoParquetFooter(spark: SparkSession, outPath: String,
      geomCol: String = "geom"): Unit = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet")).map(_.toString).sorted
    if (files.isEmpty) return
    val stats = spark.read.parquet(outPath)
      .select(input_file_name().as("f"),
        st_xmin(col(geomCol)).as("x0"), st_ymin(col(geomCol)).as("y0"),
        st_xmax(col(geomCol)).as("x1"), st_ymax(col(geomCol)).as("y1"),
        wkb_shape_type(col(geomCol)).as("t"))
      .groupBy(col("f"))
      .agg(min(col("x0")).as("x0"), min(col("y0")).as("y0"),
        max(col("x1")).as("x1"), max(col("y1")).as("y1"),
        collect_set(col("t")).as("types"))
      .collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName ->
        ((if (r.isNullAt(1)) None
          else Some((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))),
          r.getSeq[Int](5))))
      .toMap
    val metas = files.map { f =>
      val (bbox, types) = stats.getOrElse(new org.apache.hadoop.fs.Path(f).getName,
        (None, Seq.empty[Int]))
      f -> geoFooterJson(geomCol, bbox, types)
    }
    val par = math.max(1, math.min(metas.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(metas, par)
      .foreach { case (f, json) => GeoParquetFooter.stamp(f, json) }
  }

  /** The GeoParquet 1.1 `geo` JSON for one file (hand-rolled: the shape is
    * fixed and determinism matters for the gate hash). */
  private[graft] def geoFooterJson(geomCol: String,
      bbox: Option[(Double, Double, Double, Double)], typeCodes: Seq[Int]): String = {
    val names = Map(1 -> "Point", 2 -> "LineString", 3 -> "Polygon",
      4 -> "MultiPoint", 5 -> "MultiLineString", 6 -> "MultiPolygon",
      7 -> "GeometryCollection")
    val types = typeCodes.flatMap(names.get).distinct.sorted
      .map(t => s""""$t"""").mkString(",")
    val bboxStr = bbox.map { case (x0, y0, x1, y1) =>
      s""","bbox":[$x0,$y0,$x1,$y1]"""
    }.getOrElse("")
    s"""{"version":"1.1.0","primary_column":"$geomCol","columns":""" +
      s"""{"$geomCol":{"encoding":"WKB","geometry_types":[$types]$bboxStr}}}"""
  }

  /** Consumer-side GeoParquet discovery (the read twin of
    * [[writeGeoParquetFooter]]): parse the public `geo` footer key and
    * return the DataFrame plus the discovered primary geometry column and
    * the dataset bbox merged across files. Jackson-parsed, so ANY
    * GeoParquet 1.x writer's output works — GDAL/geopandas/DuckDB-spatial
    * files read back the same way ours do; fails loudly when no file
    * carries the key (plain parquet → caller names the column itself). */
  def readGeoParquet(spark: SparkSession, path: String)
      : (DataFrame, String, Option[(Double, Double, Double, Double)]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    var primary: String = null
    var bbox: Option[(Double, Double, Double, Double)] = None
    files.foreach { f =>
      GeoParquetFooter.read(f.toString, conf).foreach { json =>
        val node = om.readTree(json)
        if (primary == null) primary = node.path("primary_column").asText(null)
        if (primary != null) {
          val b = node.path("columns").path(primary).path("bbox")
          if (b.isArray && b.size >= 4) {
            val nb = (b.get(0).asDouble, b.get(1).asDouble,
              b.get(2).asDouble, b.get(3).asDouble)
            bbox = Some(bbox.fold(nb)(o => (math.min(o._1, nb._1),
              math.min(o._2, nb._2), math.max(o._3, nb._3), math.max(o._4, nb._4))))
          }
        }
      }
    }
    require(primary != null, s"no GeoParquet 'geo' footer found under $path")
    (spark.read.parquet(path), primary, bbox)
  }

  /** Bbox-pruned GeoParquet scan: list the lake's files, read each one's
    * GeoParquet `geo` footer (a KB-sized driver read per file — the same
    * planning cost every GeoParquet reader pays), and hand Spark ONLY the
    * files whose stored per-file bbox intersects the query box. On a
    * Hilbert-clustered lake ([[writeClustered]]) file bboxes are compact,
    * so a small query box reads a small fraction of a 100 TB lake before
    * a single row is scanned. Files without a footer (or without a bbox)
    * are conservatively kept — pruning is an optimization, never a
    * filter; combine with an exact predicate downstream.
    *
    * Returns (pruned frame, files kept, files total). */
  def readGeoParquetPruned(spark: SparkSession, path: String,
      bbox: (Double, Double, Double, Double)): (DataFrame, Int, Int) = {
    val (minx, miny, maxx, maxy) = bbox
    require(minx <= maxx && miny <= maxy, s"invalid query bbox: $bbox")
    val root = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val kept = files.filter { f =>
      GeoParquetFooter.read(f.toString, conf) match {
        case None => true // no footer: keep, never silently drop data
        case Some(json) =>
          val node = om.readTree(json)
          val primary = node.path("primary_column").asText(null)
          val b =
            if (primary == null) null
            else node.path("columns").path(primary).path("bbox")
          if (b == null || !b.isArray || b.size < 4) true
          else !(b.get(2).asDouble < minx || b.get(0).asDouble > maxx ||
            b.get(3).asDouble < miny || b.get(1).asDouble > maxy)
      }
    }
    val df =
      if (kept.isEmpty)
        spark.read.parquet(path).limit(0) // schema-preserving empty frame
      else spark.read.parquet(kept.map(_.toString): _*)
    (df, kept.length, files.length)
  }

  /** Hilbert-sorted global order variant: one total sort (range exchange)
    * across the cluster — the exact reference semantics for single-file
    * outputs (east_asia.py:75-82). */
  def writeClusteredSorted(df: DataFrame, outPath: String, zstdLevel: Int = 22): Unit = {
    val keyed = Scatter(df).withColumn("__hk", hilbert_of_geom(col("geom")))
    keyed.orderBy("__hk").drop("__hk")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", zstdLevel.toString)
      .parquet(outPath)
  }

  // (footer stamping lives in GeoParquetFooter below so executor tasks call
  // a static method instead of serializing this object's state)

  /** Idempotency guard (F4, east_asia.py:99-106 / ORNL-FEMA-Buildings.md:69):
    * true if `outPath` already holds a committed non-empty dataset. */
  def alreadyDone(spark: SparkSession, outPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) &&
      fs.listStatus(p).exists(s => s.getPath.getName.endsWith(".parquet") && s.getLen > 0)
  }

  /** Per-source error isolation (F10): run `work` for each source, collect
    * failures instead of aborting the run. */
  def forEachSource[T](sources: Seq[T])(work: T => Unit): Seq[(T, Throwable)] =
    sources.flatMap { s =>
      try { work(s); None }
      catch { case e: Throwable => Some(s -> e) }
    }

  /** The reference's `main` command end-to-end (east_asia.py:286-314): for
    * each (inputPath → srcEpsg) source table of WKB geometry, normalize and
    * write a Hilbert-clustered output under `outDir`, with retry-friendly
    * shuffled ordering (F3), idempotency skip (F4), and per-source error
    * isolation (F10). Sources are independent Spark jobs submitted from a
    * bounded driver-side pool (`maxConcurrent` at once) — concurrent
    * submission is the parallelism the reference got from its process Pool
    * (F1), and it hides each job's straggler tail behind the next job's
    * ramp-up; serial submission left the cluster idle between sources.
    * Returns the failures. */
  def convertAll(spark: SparkSession, sources: Seq[(String, Int)], outDir: String,
      numFilesPerSource: Int = 1, seed: Long = 42L,
      maxConcurrent: Int = 4): Seq[((String, Int), Throwable)] = {
    val shuffled = new scala.util.Random(seed).shuffle(sources)
    Concurrency.mapBounded(shuffled, maxConcurrent) { case src @ (path, epsg) =>
      try {
        val name = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".parquet")
        val out = s"$outDir/$name"
        if (!alreadyDone(spark, out)) {
          val df = spark.read.parquet(path)
          writeClustered(normalize(df, epsg), out, numFiles = numFilesPerSource)
        }
        None
      } catch { case e: Throwable => Some(src -> e) }
    }.flatten
  }
}

/** Executor-side GeoParquet footer rewrite: copy a parquet file's row groups
  * as raw bytes (no decode/re-encode) into a sibling temp file whose footer
  * carries the extra `geo` key, then atomically swap. Going through the
  * file's own Hadoop FileSystem keeps sidecar checksums (.crc on local FS)
  * consistent. */
object GeoParquetFooter {
  def stamp(pathStr: String, geoJson: String): Unit = {
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val conf = new org.apache.hadoop.conf.Configuration()
    val path = new org.apache.hadoop.fs.Path(pathStr)
    val in = HadoopInputFile.fromPath(path, conf)
    val reader = ParquetFileReader.open(in)
    val (schema, kv) =
      try {
        val fmd = reader.getFooter.getFileMetaData
        (fmd.getSchema, fmd.getKeyValueMetaData)
      } finally reader.close()
    val tmp = new org.apache.hadoop.fs.Path(path.getParent, "." + path.getName + ".geo.tmp")
    val writer = new ParquetFileWriter(HadoopOutputFile.fromPath(tmp, conf),
      schema, ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 0)
    writer.start()
    writer.appendFile(in)
    val newKv = new java.util.HashMap[String, String](kv)
    newKv.put("geo", geoJson)
    writer.end(newKv)
    val fs = path.getFileSystem(conf)
    if (!fs.delete(path, false) || !fs.rename(tmp, path))
      throw new java.io.IOException(s"geo footer swap failed for $pathStr")
  }

  /** Read back the `geo` footer value of one parquet file (None when the
    * key is absent) — the gate/spec verification path. */
  def read(pathStr: String, conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(pathStr), conf))
    try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
    finally reader.close()
  }
}
