package graft.operators

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle layout for iterative operators.
  *
  * The loop operators (label propagation, PageRank/HITS, radius-doubling
  * KNN) checkpoint their frames with the layout KEPT
  * ([[org.apache.spark.sql.graft.SparkInternals.checkpointKeepLayout]])
  * so each round reuses the edge partitioning instead of re-exchanging
  * 2|E| rows. The kept layout is the session's
  * `spark.sql.shuffle.partitions` — right on a cluster where that conf
  * is sized to the data, but a 32-way layout over a few thousand rows
  * runs every round at 32 near-empty tasks. The fix is the guide's
  * "derive partitioning from input size": the first checkpoint OBSERVES
  * the frame's row count in its own job, and the loop then runs with
  * shuffle partitions pinned to `ceil(rows / rowsPerPartition)`, capped
  * by the session conf (never above the cluster posture, never a
  * constant tuned to local mode). `spark.graft.loopRowsPerPartition`
  * (default 4M rows ≈ 100 MB of edge pairs, guide §2.2's
  * 100 MB–1 GB partition band) is the published knob.
  */
private[graft] object LoopLayout {

  /** Partitions needed for `rows` at the configured per-partition row
    * budget — at least 1, never above the session's configured shuffle
    * partitions. */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    val confN = org.apache.spark.sql.graft.SparkInternals
      .sqlConf(spark).numShufflePartitions
    val rpp = spark.conf
      .get("spark.graft.loopRowsPerPartition", "4000000").toLong
    math.max(1L, math.min(confN.toLong, (rows + rpp - 1) / rpp)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the previous setting afterwards (exception-safe). The
    * session conf is global: callers are the sequential batch operators,
    * which is the engine's execution model. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConfs(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Run `body` with session confs temporarily set, restoring previous
    * values afterwards (exception-safe; same global-session caveat as
    * [[withShufflePartitions]]). */
  def withConfs[T](spark: SparkSession, kvs: (String, String)*)
      (body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
