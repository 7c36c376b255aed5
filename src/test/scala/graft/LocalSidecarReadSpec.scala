package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LakeSelect, RowGroupScan, TableLog}

/** Driver-side metadata reads (round 15): small sidecars (stats index,
  * bloom bitmaps, DV position lists) and small-table planning read via
  * parquet-mr on the driver — ZERO Spark jobs — with the distributed
  * path as byte-budget fallback. Pins (a) value/schema equivalence of
  * the local reader against spark.read, (b) result equality between the
  * local and distributed planning paths, and (c) the zero-job property
  * planning now has. */
class LocalSidecarReadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** Spark jobs started while `body` runs (local-mode listener). */
  private def jobsDuring[A](body: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      Thread.sleep(300) // listener events are posted asynchronously
      (a, n.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("localParquetRows matches spark.read for every sidecar type " +
    "class (string/int/long/double/binary/array<float>, with nulls)") {
    val dir = java.nio.file.Files.createTempDirectory("lsr_types")
      .toString
    val df = spark.range(50).select(
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id"))
        .cast("int").as("i"),
      col("id").cast("long").as("l"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") * 1.5).as("d"),
      col("id").cast("string").cast("binary").as("b"),
      when(col("id") % 3 === 0, lit(null)).otherwise(
        array(col("id").cast("float"),
          (col("id") * 2).cast("float"))).as("af"))
    df.repartition(1).write.mode("overwrite").parquet(dir)
    val file = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get.toString
      finally s.close()
    }
    val (rows, schema) = RowGroupScan.localParquetRows(file,
      spark.sparkContext.hadoopConfiguration)
    val expected = spark.read.parquet(file)
    assert(schema == expected.schema)
    def canon(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }
    val got = rows.map(canon).sortBy(_.toString)
    val want = expected.collect().map(canon).sortBy(_.toString)
    assert(got.toSeq == want.toSeq)
  }

  test("planning-path equality: local sidecar build == distributed " +
    "build, and the local build runs ZERO Spark jobs") {
    val a = tmp("lsr_loc"); val b = tmp("lsr_dist")
    def build(dir: String): Unit = {
      TableLog.append(spark.range(20000)
        .selectExpr("id as k", "id * 7 as v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"),
        dir, options = Map("parquet.block.size" -> "16384",
          "parquet.page.size" -> "4096"))
      TableLog.computeRowGroupIndex(spark, dir)
      // second append: top-up sidecar (two sidecars map the table)
      TableLog.append(spark.range(20000L, 24000L)
        .selectExpr("id as k", "id * 7 as v"), dir)
    }
    build(a); build(b)
    def run(dir: String): (Long, Long, Long) = {
      val (df, st) = LakeSelect.readWhere(spark, dir,
        "k >= 3000 and k < 9000")
      val r = df.agg(count(lit(1)), sum(col("v"))).first()
      (r.getLong(0), r.getLong(1), st.rgOpened)
    }
    val prev = TableLog.localSidecarMaxBytes
    val (ra, jobsLocalPlan) = try {
      jobsDuring {
        // planning only: readWhere classifies row groups in the call
        LakeSelect.readWhere(spark, a, "k >= 3000 and k < 9000")
      }
    } finally TableLog.localSidecarMaxBytes = prev
    assert(jobsLocalPlan == 0,
      s"indexed small-table planning must run zero Spark jobs, " +
        s"ran $jobsLocalPlan")
    val resA = run(a)
    val resB = try {
      TableLog.localSidecarMaxBytes = 0L // force the distributed build
      run(b)
    } finally TableLog.localSidecarMaxBytes = prev
    assert(resA == resB,
      s"local and distributed planning disagree: $resA vs $resB")
    assert(resA._1 == 6000L)
  }

  test("deletion vectors read locally agree with the distributed read " +
    "across MULTIPLE dv sidecars") {
    val a = tmp("lsr_dva"); val b = tmp("lsr_dvb")
    def build(dir: String): (Long, Long) = {
      TableLog.append(spark.range(9000)
        .selectExpr("id as k", "id * 3 as v"), dir)
      TableLog.deleteVectored(spark, dir, "k % 11 = 5")
      TableLog.deleteVectored(spark, dir, "k % 13 = 2")
      val r = TableLog.read(spark, dir)
        .agg(count(lit(1)), sum(col("v"))).first()
      (r.getLong(0), r.getLong(1))
    }
    val ra = build(a)
    val prev = TableLog.localSidecarMaxBytes
    val rb = try {
      TableLog.localSidecarMaxBytes = 0L
      build(b)
    } finally TableLog.localSidecarMaxBytes = prev
    assert(ra == rb, s"DV local vs distributed disagree: $ra vs $rb")
  }

  test("readNoInfer detects schema drift across files and falls back to " +
    "a mergeSchema read instead of nulling the drifted file") {
    // two files under one directory with DIFFERENT field names — a
    // violation of the uniform-schema write contract. Trusting the first
    // footer would read file b's columns as nulls; the one-extra-footer
    // guard must detect the drift and route through mergeSchema, which
    // surfaces every column.
    val dir = java.nio.file.Files.createTempDirectory("lsr_drift").toString
    spark.range(5).coalesce(1).selectExpr("id as a")
      .write.parquet(dir + "/p1")
    spark.range(5).coalesce(1).selectExpr("id as b")
      .write.parquet(dir + "/p2")
    // collapse into one directory of bare files (sorted order: a first)
    val flat = java.nio.file.Files.createTempDirectory("lsr_flat").toString
    def move(src: String, name: String): Unit = {
      val f = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(flat, name))
    }
    move(dir + "/p1", "part-0001.parquet")
    move(dir + "/p2", "part-0002.parquet")
    val out = RowGroupScan.readNoInfer(spark, Seq(flat))
    assert(out.columns.toSet == Set("a", "b"),
      s"drifted set must merge schemas, got ${out.columns.mkString(",")}")
    assert(out.count() == 10)
    // and the uniform fast path still yields the explicit-schema read
    val uni = java.nio.file.Files.createTempDirectory("lsr_uni").toString
    spark.range(7).selectExpr("id as a").write.mode("overwrite").parquet(uni + "/t")
    val fast = RowGroupScan.readNoInfer(spark, Seq(uni + "/t"))
    assert(fast.columns.toSeq == Seq("a") && fast.count() == 7)
  }
}
