package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Compaction: the reference's `merge-pqs` command (east_asia.py:376-419) —
  * greedy bin-packing of per-file row counts into ≤ maxRows batches, then one
  * Hilbert-clustered ZSTD parquet file per batch with a lineage column.
  */
object MergeParquet {

  /** Greedy bin-pack (exact reference semantics, east_asia.py:382-393):
    * accumulate counts in the given order; when adding a file would exceed
    * `maxRows`, start a new batch. Driver-side planning over per-file counts
    * — at 100 TB this is a few thousand (path, count) rows, trivially
    * collectable. */
  def planBatches(fileCounts: Seq[(String, Long)], maxRows: Long): Seq[Seq[String]] = {
    val batches = Seq.newBuilder[Seq[String]]
    var current = Seq.newBuilder[String]
    var acc = 0L
    var empty = true
    fileCounts.foreach { case (f, n) =>
      if (!empty && acc + n > maxRows) {
        batches += current.result()
        current = Seq.newBuilder[String]
        acc = 0L
        empty = true
      }
      current += f
      acc += n
      empty = false
    }
    if (!empty) batches += current.result()
    batches.result()
  }

  /** Count rows per input file (the resp.json manifest the reference builds
    * with a separate DuckDB query, East-Asia-Building-Footprints.md:279-287). */
  def fileCounts(spark: SparkSession, paths: Seq[String]): Seq[(String, Long)] = {
    spark.read.parquet(paths: _*)
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
  }

  /** Merge: per batch, union-scan the files, attach `source` lineage
    * (READ_PARQUET(filename=True) → `filename AS source`, east_asia.py:396-400),
    * Hilbert-sort, write one ~500MB-class ZSTD file (east_asia.py:401-408).
    *
    * Batches are independent Spark jobs; `maxConcurrent` of them are
    * submitted at once from a bounded driver-side pool, so a batch whose
    * final single-file write tails off does not leave the cluster idle —
    * serial submission was leaving (batches−1)·write-tail of wall-clock on
    * the table. Spark's scheduler interleaves the stages (FIFO by default;
    * a fair pool makes it even). */
  def merge(spark: SparkSession, inPaths: Seq[String], outDir: String,
      maxRows: Long = 10000000L, zstdLevel: Int = 22,
      maxConcurrent: Int = 4): Seq[String] = {
    val counts = fileCounts(spark, inPaths)
    val batches = planBatches(counts, maxRows)
    def writeBatch(files: Seq[String], i: Int): String = {
      val out = f"$outDir/merged_$i%04d"
      val df = spark.read.parquet(files: _*)
        .withColumn("source", substring_index(input_file_name(), "/", -1))
      val keyed = df.withColumn("__hk", hilbert_of_geom(col("geom")))
      keyed.repartitionByRange(1, col("__hk")).sortWithinPartitions("__hk")
        .drop("__hk")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("parquet.compression.codec.zstd.level", zstdLevel.toString)
        .parquet(out)
      out
    }
    Concurrency.mapBounded(batches.zipWithIndex, maxConcurrent) {
      case (files, i) => writeBatch(files, i)
    }
  }
}

/** Bounded-concurrency driver-side job submission. Spark jobs triggered
  * from different driver threads run concurrently on the cluster; the
  * bound keeps driver memory and scheduler pressure sane. */
private[graft] object Concurrency {
  def mapBounded[A, B](items: Seq[A], maxConcurrent: Int)(f: A => B): Seq[B] = {
    require(maxConcurrent >= 1)
    if (items.sizeIs <= 1 || maxConcurrent == 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrent, items.size))
    try {
      val futures = items.map(a => pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = f(a)
      }))
      futures.map(_.get()) // propagate the first failure
    } finally pool.shutdown()
  }
}
