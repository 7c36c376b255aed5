package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Deterministic hash-order sampling: reproducibility, partitioning
  * invariance, mergeability, uniformity, and sample-quantile accuracy. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("doc_id")

  test("bottomK: deterministic, partitioning-invariant, seed-sensitive") {
    val a = Sampling.bottomK(ids(5000).repartition(3), 100, "s1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.bottomK(ids(5000).repartition(17), 100, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 100)
    val c = Sampling.bottomK(ids(5000), 100, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(a != c, "different seed must move the sample")
  }

  test("bottomK: mergeable — bottom-k of shard samples == global sample") {
    val whole = Sampling.bottomK(ids(4000), 50, "m")
      .collect().map(_.getLong(0)).toSet
    val s1 = Sampling.bottomK(ids(4000).filter($"doc_id" <= 2000), 50, "m")
    val s2 = Sampling.bottomK(ids(4000).filter($"doc_id" > 2000), 50, "m")
    val merged = s1.unionByName(s2).orderBy("samp_h", "doc_id").limit(50)
      .collect().map(_.getLong(0)).toSet
    assert(merged == whole)
  }

  test("bottomK: roughly uniform across the id range") {
    val samp = Sampling.bottomK(ids(10000), 1000, "u")
      .collect().map(_.getLong(0))
    val lowHalf = samp.count(_ <= 5000)
    assert(lowHalf > 380 && lowHalf < 620, s"skewed sample: $lowHalf/1000 low")
  }

  test("reservoirByGroup: exactly k per group, deterministic, ranked") {
    val df = (1L to 900L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val res = Sampling.reservoirByGroup(df, "grp", 7, "r")
    val byGrp = res.groupBy("grp").agg(count(lit(1)).as("n"),
        max("samp_rk").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(byGrp.length == 3 && byGrp.forall(t => t._2 == 7L && t._3 == 7))
    // a group smaller than k yields the whole group
    val tiny = Sampling.reservoirByGroup(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp"), "grp", 5, "r")
    assert(tiny.count() == 3)
    // deterministic across partitionings
    val r1 = Sampling.reservoirByGroup(df.repartition(2), "grp", 7, "r")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Sampling.reservoirByGroup(df.repartition(11), "grp", 7, "r")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2)
  }

  test("sampleQuantiles: within DKW bounds of the true quantiles") {
    // values = doc_id, so the true q-quantile of 1..20000 is q*20000
    val df = ids(20000).withColumn("v", $"doc_id".cast("double"))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = Sampling.sampleQuantiles(df, "v", qs, k = 2000, seed = "q")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got.size == qs.size)
    qs.foreach { q =>
      val err = math.abs(got(q) - q * 20000) / 20000
      assert(err < 0.05, s"q=$q estimate ${got(q)} off by $err")
    }
    // deterministic: same seed reproduces the same values
    val again = Sampling.sampleQuantiles(df, "v", qs, k = 2000, seed = "q")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }
}
