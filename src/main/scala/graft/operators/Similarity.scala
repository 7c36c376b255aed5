package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast;
  *    the corpus streams — correct baseline, O(|Q|·|C|) compute but no
  *    shuffle of the corpus. Use when |Q| is small.
  *  - [[lshTopK]]: random-hyperplane LSH buckets + in-bucket ranking with
  *    multi-probe (searching the query's bucket and single-bit-flip
  *    neighbors) — the 100 TB path: equality join on bucket keys, compute
  *    proportional to bucket sizes.
  */
object Similarity {

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine_similarity(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk"), col("cos"))
  }

  /** LSH top-k: multi-table OR-construction × multi-probe.
    *
    * `tables` independent random-hyperplane signatures (seeds seed+t) are
    * computed per vector; a corpus vector lands in one bucket per table, a
    * query probes its own bucket plus `probes` single-bit-flip neighbors in
    * every table. Candidates are the union across tables (OR-construction):
    * recall ≈ 1 − (1 − p^bits)^tables per probe, so more tables buys recall
    * without widening buckets. The join stays a pure equality join on
    * (table, bucket) — bucket count is tables · 2^bits, so in-bucket
    * brute-force cost is |corpus|²·tables/2^bits per table pair; at
    * bits = 16 that is 65536× smaller than the corpus square, the 100 TB
    * shape. Corpus-side cost is `tables` rows per vector (linear, shuffled
    * once); query-side fan-out is tables · (1 + probes). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 16,
      probes: Int = 4, tables: Int = 4, seed: Long = 7L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62]: $bits")
    require(tables >= 1, s"tables must be >= 1: $tables")
    val sigT = (t: Int, v: Column) => rhp_signature(v, lit(bits), lit(seed + t))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      posexplode(array((0 until tables).map(t => sigT(t, col(vecCol))): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val qSig = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      posexplode(array((0 until tables).map(t => sigT(t, col(vecCol))): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "qb")
    // query-side fan-out: own bucket + single-bit flips (bounded by `probes`)
    val probed = qSig.select(col("qid"), col("qv"), col("tbl"),
      explode(expr(s"concat(array(qb), transform(sequence(0, ${math.min(probes, bits) - 1}), " +
        s"b -> qb ^ shiftleft(cast(1 as bigint), b)))")).as("bucket"))
      .dropDuplicates("qid", "tbl", "bucket")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    probed.join(c, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid") // union candidates across tables/probes
      .withColumn("cos", cosine_similarity(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk"), col("cos"))
  }
}
