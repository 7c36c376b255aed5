package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (a fact
  * of life in 100 TB corpora: one hot URL/domain/cell key can pin a single
  * reducer). AQE's skew-join handles sort-merge cases adaptively; this
  * explicit salting utility covers the cases AQE cannot see (e.g. forced
  * shuffled-hash joins, or pre-aggregation fan-in) and makes the technique
  * first-class in the library.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, salting the hot side:
    * the big side scatters each row into one of `salt` sub-keys
    * (deterministically, from a row hash so re-runs are stable), the small
    * side replicates `salt` times. The join key becomes (key, salt_bucket),
    * splitting each hot key across `salt` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    // replicating the small side `salt`× is only sound when unmatched
    // small-side rows are never emitted — a right/full outer join would
    // surface each unmatched replica as a duplicate output row
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins only, got '$joinType': " +
        "right/full outer would emit each unmatched small-side row salt times")
    // salt hashing + the shuffle write inherit the scan's split count —
    // scatter a few-split big side first (no-op when splits >= cores)
    val saltedBig = Scatter(big).withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val out = saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }

  /** Two-path salted join — the production form of [[saltedJoin]]: only
    * DETECTED hot keys pay the salt (big side scattered, small side
    * replicated `salt`×); the cold majority takes a plain equi-join with no
    * replication at all, and the two paths union. At 100 TB with a non-tiny
    * small side this is the difference between replicating the whole small
    * side 16× and replicating only its few hot rows.
    *
    * Hot-key detection samples the big side (`sampleFraction`, fixed seed so
    * re-runs are stable) and flags keys whose extrapolated count exceeds
    * `hotThreshold`, capped at the `maxHotKeys` heaviest (the hot set rides
    * the driver → plan as an isin literal, so it must stay small — hot keys
    * are by definition few). An empty hot set degrades to exactly the plain
    * join. Join-type restrictions match [[saltedJoin]]. */
  def saltedJoinTwoPath(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner",
      hotThreshold: Long = 100000, sampleFraction: Double = 0.05,
      maxHotKeys: Int = 1000): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoinTwoPath supports inner/left/left_semi/left_anti joins only, got '$joinType'")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1]: $sampleFraction")
    require(hotThreshold > 0, s"hotThreshold must be positive: $hotThreshold")
    // sampled big-side frequency → extrapolated count ≥ threshold ⇒ hot.
    // TakeOrderedAndProject bounds the driver transfer to maxHotKeys rows.
    val sampleCut = math.max(1L, (hotThreshold * sampleFraction).toLong)
    val hotRows = big.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 42)
      .groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= sampleCut)
      .orderBy(col("__cnt").desc)
      .limit(maxHotKeys)
      .select(col(key)).collect()
    val hotSet = hotRows.map(_.get(0)).toSeq
    if (hotSet.isEmpty) return big.join(small, Seq(key), joinType)
    val isHot = col(key).isInCollection(hotSet)
    // cold path: plain join, null keys included (they never match in an
    // inner/left join but a left join must still emit them)
    val cold = big.filter(!coalesce(isHot, lit(false)))
      .join(small.filter(isHot === false), Seq(key), joinType)
    val hot = saltedJoin(big.filter(isHot), small.filter(isHot), key, salt, joinType)
    // align column order (join key position is identical on both paths)
    cold.unionByName(hot)
  }

  /** Two-phase skew-safe aggregation: count-style aggregates over a
    * heavy-tailed key first aggregate on (key, salt), then re-aggregate on
    * key — bounding any single reducer's input to ~1/salt of the hot key.
    * `aggs` must be decomposable (sum/count/min/max). */
  def saltedCount(df: DataFrame, key: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
