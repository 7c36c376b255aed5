package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.Similarity

/** Streaming twins of the vector/ANN surface ([[graft.operators.Similarity]]).
  */
object VectorStreams {

  /** Incremental ANN intake: a stream (or batch) of NEW embeddings probes
    * an EXISTING IVF index without retraining — the streaming sibling of
    * [[Similarity.ivfTopK]], shaped like the incremental-dedup corpus probe
    * (`Dedup.incrementalDedup`): the small arriving side does the moving,
    * the corpus never shuffles.
    *
    * Index construction happens ONCE, at plan-construction time: the
    * spherical-kmeans codebook trains on a bounded corpus sample on the
    * driver (O(sample), independent of corpus size) and the centroids are
    * baked into the plan as one literal array — so every micro-batch
    * reuses the same cells, and a checkpoint restart re-derives the same
    * codebook (training is deterministic in corpus order). Per
    * micro-batch: the new vectors probe their `nprobe` nearest cells
    * map-side and BROADCAST onto the corpus's map-only cell assignment —
    * an equality join in which the corpus side carries no Exchange at all
    * (asserted in ScalePlanSpec). Only the candidate set (|batch| · nprobe
    * cells' worth) shuffles, into the per-query top-`k` aggregate.
    *
    * The top-k is a streaming-legal aggregation (sorted `collect_list`
    * slice, ties toward the lower corpus id — no window functions, which
    * streams cannot run): in streaming use `update`/`complete` output, or
    * add an upstream event-time watermark + window for append mode.
    * Returns (qid, rk, nid, cos) with exact cosine scores: like
    * [[Similarity.ivfTopK]], approximation lives only in which candidates
    * are probed, so a planted identical twin surfaces at rank 1 / cos 1.0
    * structurally. */
  def ivfIntake(newVecs: DataFrame, corpus: DataFrame, k: Int = 10,
      nlist: Int = 64, nprobe: Int = 8, trainSample: Int = 10000,
      iters: Int = 5, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"need 1 <= nprobe <= nlist: nlist=$nlist nprobe=$nprobe")
    val sample = corpus.select(col(idCol), col(vecCol)).sort(col(idCol))
      .limit(trainSample).collect()
      .map(_.getSeq[Number](1).map(_.floatValue).toArray)
    require(sample.nonEmpty, "IVF intake needs a non-empty corpus")
    val centroids = Similarity.trainSpherical(sample, nlist, iters)
    // deliberately NO Scatter here: the corpus-side plan re-executes every
    // micro-batch, so it must stay EXCHANGE-FREE even at small scale — the
    // no-shuffle-of-corpus contract (asserted in ScalePlanSpec) is the
    // point of the incremental shape
    val assigned = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("cell", element_at(nearest_cells(col("nv"), centroids, 1), 1))
    val probed = newVecs.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .select(col("qid"), col("qv"),
        explode(nearest_cells(col("qv"), centroids, nprobe)).as("cell"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine_similarity(col("qv"), col("nv")))
      .groupBy(col("qid"))
      .agg(slice(array_sort(collect_list(struct(
        (lit(0.0) - col("cos")).as("nc"), col("nid"), col("cos")))), 1, k)
        .as("topk"))
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rk"),
        col("col.nid").as("nid"), col("col.cos").as("cos"))
  }
}
