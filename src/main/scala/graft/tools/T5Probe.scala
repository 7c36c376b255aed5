package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostic — not part of the library surface
object T5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("T5_COALESCE", "true"))
      .getOrCreate()
    val d = "/root/testdata/sf0.1"
    val docs0 = spark.read.parquet(d + "/documents.parquet").select(col("doc_id"), col("text"))
    val seeds = docs0.filter(col("doc_id") < 20)
    val corpus = docs0.unionByName(
      seeds.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    import graft.functions.GraftFunctions._
    var t0 = System.nanoTime
    val sigs = corpus.select(col("doc_id").as("id"),
      simhash64(shingle_hashes(col("text"), lit(3))).as("sh")).localCheckpoint()
    println("SIGS_TIME " + (System.nanoTime - t0) / 1e9)
    val nBlocks = 6
    val widths = (0 until nBlocks).map(b => 64 * (b + 1) / nBlocks - 64 * b / nBlocks)
    val blockCols = (0 until nBlocks).map { b =>
      val lo = 64 * b / nBlocks; val w = widths(b)
      val mask = if (w == 64) -1L else (1L << w) - 1L
      shiftright(col("sh"), lo).bitwiseAND(lit(mask))
    }
    val blocks = sigs.select(col("id"), col("sh"), posexplode(array(blockCols: _*)))
      .withColumnRenamed("pos", "blk").withColumnRenamed("col", "bv")
    val occ = blocks.groupBy("blk", "bv").count
    occ.agg(max("count"), avg("count"), count(lit(1))).show()
    occ.orderBy(desc("count")).show(10)
    def ballMasks(w: Int, r: Int): Seq[Long] =
      (0 to r).flatMap(k => (0 until w).combinations(k)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq)
    def expand(r: Int) =
      if (r == 0) blocks.withColumn("bvp", col("bv"))
      else blocks.withColumn("xm", explode(element_at(
        typedLit(widths.map(w => ballMasks(w, r))), col("blk") + 1)))
        .withColumn("bvp", col("bv").bitwiseXOR(col("xm"))).drop("xm")
    val pa = expand(1); val pb = expand(1)
    for (i <- 1 to 3) {
      t0 = System.nanoTime
      val s2 = corpus.select(col("doc_id").as("id"),
        simhash64(shingle_hashes(col("text"), lit(3))).as("sh"))
      println(s"SIGS_$i " + s2.count + " time " + (System.nanoTime - t0) / 1e9)
    }
    for (i <- 1 to 3) {
      t0 = System.nanoTime
      val joined = pa.as("a").join(pb.as("b"),
        col("a.blk") === col("b.blk") && col("a.bvp") === col("b.bvp") &&
          col("a.id") < col("b.id"))
      println(s"JOIN_OUT_$i " + joined.count + " time " + (System.nanoTime - t0) / 1e9)
    }
    for (i <- 1 to 3) {
      t0 = System.nanoTime
      val joined = pa.as("a").join(pb.as("b"),
        col("a.blk") === col("b.blk") && col("a.bvp") === col("b.bvp") &&
          col("a.id") < col("b.id"))
      val pairs = joined
        .withColumn("dist", bit_count(col("a.sh").bitwiseXOR(col("b.sh"))))
        .filter(col("dist") <= 16)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist")).distinct
      println(s"PAIRS_$i " + pairs.count + " time " + (System.nanoTime - t0) / 1e9)
    }
    {
      val joined = pa.as("a").join(pb.as("b"),
        col("a.blk") === col("b.blk") && col("a.bvp") === col("b.bvp") &&
          col("a.id") < col("b.id"))
      joined.count
      println(joined.queryExecution.executedPlan.toString.take(4000))
    }
    // one-sided variant: full radius-2 ball on A, bare blocks on B
    val pa2 = expand(2); val pb0 = expand(0)
    for (i <- 1 to 3) {
      t0 = System.nanoTime
      val joined = pa2.as("a").join(pb0.as("b"),
        col("a.blk") === col("b.blk") && col("a.bvp") === col("b.bvp") &&
          col("a.id") < col("b.id"))
      println(s"ONESIDED_JOIN_$i " + joined.count + " time " + (System.nanoTime - t0) / 1e9)
    }
    for (i <- 1 to 3) {
      t0 = System.nanoTime
      val joined = pa2.as("a").join(pb0.as("b"),
        col("a.blk") === col("b.blk") && col("a.bvp") === col("b.bvp") &&
          col("a.id") < col("b.id"))
      val pairs = joined
        .withColumn("dist", bit_count(col("a.sh").bitwiseXOR(col("b.sh"))))
        .filter(col("dist") <= 16)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist")).distinct
      println(s"ONESIDED_PAIRS_$i " + pairs.count + " time " + (System.nanoTime - t0) / 1e9)
    }
    spark.stop()
  }
}
