package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** The shuffle-architecture techniques the engine leans on at 100 TB:
  * salting for skewed keys and bucketing for co-located joins. These specs
  * assert behavior (identical results) and plan shape (no exchange on
  * bucketed joins). */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin: identical result to a plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (0 until 20000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).agg(count(lit(1)), sum($"v")).head()
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8)
      .agg(count(lit(1)), sum($"v")).head()
    assert(plain == salted)
  }

  test("saltedJoinTwoPath: identical to plain join; only the hot key is salted") {
    // one key carries 60% of the corpus, 49 cold keys share the rest
    val big = (0 until 20000).map(i => (if (i % 5 < 3) 7L else i.toLong % 50, i))
      .toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).agg(count(lit(1)), sum($"v")).head()
    val two = Skew.saltedJoinTwoPath(big, dim, "k",
      salt = 8, hotThreshold = 2000, sampleFraction = 0.3)
    assert(two.agg(count(lit(1)), sum($"v")).head() == plain)
    // the plan must carry BOTH paths: a union of the salted hot sub-join
    // and the plain cold join (the isin hot-key filter is the marker)
    val p = two.queryExecution.executedPlan.toString
    assert(p.contains("Union"), s"two-path join must union hot+cold:\n$p")
    assert(p.contains("__salt"), s"hot path must salt:\n$p")
  }

  test("saltedJoinTwoPath: empty hot set degrades to exactly the plain join") {
    val big = (0 until 5000).map(i => (i.toLong % 500, i)).toDF("k", "v") // uniform
    val dim = (0L until 500L).map(k => (k, s"d$k")).toDF("k", "name")
    val two = Skew.saltedJoinTwoPath(big, dim, "k",
      salt = 8, hotThreshold = 1000, sampleFraction = 0.5)
    val p = two.queryExecution.executedPlan.toString
    assert(!p.contains("Union") && !p.contains("__salt"),
      s"uniform keys must take the plain single-path join:\n$p")
    assert(two.count() == 5000)
  }

  test("saltedJoinTwoPath: left join keeps unmatched and null-key big rows") {
    val big = Seq[(Option[Long], Int)]((Some(7L), 1), (Some(7L), 2), (Some(7L), 3),
      (Some(7L), 4), (Some(99L), 5), (None, 6)).toDF("k", "v")
    val dim = Seq((7L, "hot")).toDF("k", "name")
    val out = Skew.saltedJoinTwoPath(big, dim, "k", salt = 4, joinType = "left",
      hotThreshold = 3, sampleFraction = 1.0)
    val rows = out.select($"v", $"name").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1 -> Some("hot"), 2 -> Some("hot"), 3 -> Some("hot"),
      4 -> Some("hot"), 5 -> None, 6 -> None))
  }

  test("saltedCount: matches plain groupBy count on skewed keys") {
    val df = (0 until 30000).map(i => (if (i % 5 == 0) "hot" else s"k${i % 100}"))
      .toDF("k")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").saveAsTable("b_orders")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
