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
      zstdLevel: Int = 22, rowGroupBytes: Long = 4L * 1024 * 1024): Unit = {
    val keyed = df.withColumn("__hk", hilbert_of_geom(col("geom")))
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
  }

  /** Hilbert-sorted global order variant: one total sort (range exchange)
    * across the cluster — the exact reference semantics for single-file
    * outputs (east_asia.py:75-82). */
  def writeClusteredSorted(df: DataFrame, outPath: String, zstdLevel: Int = 22): Unit = {
    val keyed = df.withColumn("__hk", hilbert_of_geom(col("geom")))
    keyed.orderBy("__hk").drop("__hk")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.compression.codec.zstd.level", zstdLevel.toString)
      .parquet(outPath)
  }

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
