package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.functions.GeoSimplify

class GeoSimplifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def optimizedPlan(df: org.apache.spark.sql.DataFrame): String = {
    GeoSimplify.install(spark)
    df.queryExecution.optimizedPlan.toString
  }

  test("st_x(st_centroid(st_point(x,y))) fuses to column arithmetic") {
    val df = Seq((1.5, 2.5)).toDF("x", "y")
      .select(st_x(st_centroid(st_point($"x", $"y"))).as("out"))
    val plan = optimizedPlan(df)
    assert(!plan.contains("st_centroid") && !plan.contains("st_point"), plan)
    assert(df.head().getDouble(0) == 1.5)
  }

  test("fusion crosses withColumn project boundaries (ctor inlining)") {
    val df = Seq((10.0, 20.0)).toDF("x", "y")
      .withColumn("geom", st_make_square($"x", $"y", lit(0.5)))
      .select(st_xmin($"geom").as("xmin"), st_ymax($"geom").as("ymax"))
    val plan = optimizedPlan(df)
    assert(!plan.contains("st_make_square"), plan)
    val r = df.head()
    assert(r.getDouble(0) == 9.5 && r.getDouble(1) == 20.5)
  }

  test("null inputs still propagate through fused expressions") {
    val df = Seq((Some(1.0), Option.empty[Double]), (Some(3.0), Some(4.0)))
      .toDF("x", "y")
      .select(st_x(st_point($"x", $"y")).as("out"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "null y must null the fused st_x")
    assert(rows(1).getDouble(0) == 3.0)
  }

  // NOTE: tests go through parquet because ConvertToLocalRelation eagerly
  // evaluates projects over in-memory relations before extra optimizer
  // rules run — real scans (the production path) hit the rule.
  test("fusion result over a real scan matches kernel evaluation bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("gs").toString + "/d"
    val data = (0 until 1000).map(i => (i.toLong, i * 0.7 - 350.0, i * 0.13 - 65.0))
    data.toDF("id", "x", "y").write.parquet(dir)
    GeoSimplify.install(spark)
    val fused = spark.read.parquet(dir)
      .withColumn("g", st_make_square($"x", $"y", lit(0.25)))
      .select($"id", st_xmin($"g"), st_xmax($"g"), st_x(st_centroid($"g")))
      .collect().map(r => r.getLong(0) -> r).toMap
    data.foreach { case (id, x, _) =>
      val row = fused(id)
      assert(row.getDouble(1) == x - 0.25 && row.getDouble(2) == x + 0.25)
      assert(row.getDouble(3) == x)
    }
  }

  test("non-constructor children are left alone") {
    val dir = java.nio.file.Files.createTempDirectory("gs2").toString + "/d"
    val wkb = graft.geom.GeomLib.squareWkb(5.0, 6.0, 1.0)
    Seq(Tuple1(wkb)).toDF("geom").write.parquet(dir)
    val df = spark.read.parquet(dir).select(st_xmin($"geom").as("xmin"))
    assert(optimizedPlan(df).contains("st_xmin"))
    assert(df.head().getDouble(0) == 4.0)
  }
}
