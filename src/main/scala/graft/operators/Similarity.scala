package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** LSH top-k with multi-probe: each query also probes the `probes`
    * buckets at hamming distance 1 from its own signature, trading a
    * constant fan-out for recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      probes: Int = 4, seed: Long = 7L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      rhp_signature(col(vecCol), lit(bits), lit(seed)).as("bucket"))
    val qSig = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      rhp_signature(col(vecCol), lit(bits), lit(seed)).as("qb"))
    // query-side fan-out: own bucket + single-bit flips (bounded by `probes`)
    val probed = qSig.select(col("qid"), col("qv"),
      explode(expr(s"concat(array(qb), transform(sequence(0, ${math.min(probes, bits) - 1}), " +
        s"b -> qb ^ shiftleft(cast(1 as bigint), b)))")).as("bucket"))
      .dropDuplicates("qid", "bucket")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    probed.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine_similarity(col("qv"), col("nv")))
      .dropDuplicates("qid", "nid")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("rk"), col("cos"))
  }
}
