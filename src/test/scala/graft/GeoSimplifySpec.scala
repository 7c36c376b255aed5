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

  test("conditional constructors fuse through a Filter (p4's shape)") {
    val dir = java.nio.file.Files.createTempDirectory("gs3").toString + "/d"
    (0 until 100).map(i => (i.toLong, i * 1.0, i * 2.0, i % 3 == 0))
      .toDF("id", "x", "y", "bad").write.parquet(dir)
    GeoSimplify.install(spark)
    val df = spark.read.parquet(dir)
      .withColumn("geom", when($"bad", lit(null).cast("binary"))
        .otherwise(st_point($"x", $"y")))
      .filter(st_x(st_centroid($"geom")).isNotNull)
      .select($"id")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("st_point") && !plan.contains("st_centroid") &&
      !plan.contains("centroid_x"), s"filter must fuse away all WKB work:\n$plan")
    assert(df.count() == 66, "rows with bad=false survive")
  }

  test("conditional constructors fuse through stacked projects (f6's shape)") {
    val dir = java.nio.file.Files.createTempDirectory("gs4").toString + "/d"
    (0 until 10).map(i => (i.toLong, i * 1.0, i * 2.0)).toDF("id", "x", "y")
      .write.parquet(dir)
    GeoSimplify.install(spark)
    val df = spark.read.parquet(dir)
      .withColumn("geom", when($"id" % 3 === 2, st_point_z($"x", $"y", lit(5.0)))
        .otherwise(st_point($"x", $"y")))
      .withColumn("g2", st_force2d($"geom"))
      .select($"id", wkb_shape_type($"g2").as("st"), st_x($"g2").as("gx"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("st_point") && !plan.contains("st_force2d") &&
      !plan.contains("wkb_shape_type"), s"stacked projects must fuse:\n$plan")
    df.collect().foreach { r =>
      assert(r.getInt(1) == 1 && r.getDouble(2) == r.getLong(0) * 1.0)
    }
  }

  test("constructor aliases fuse into aggregate expressions (bbox shape)") {
    val dir = java.nio.file.Files.createTempDirectory("gs5").toString + "/d"
    (0 until 50).map(i => (i * 1.0, i * 0.5)).toDF("x", "y").write.parquet(dir)
    GeoSimplify.install(spark)
    val df = spark.read.parquet(dir)
      .withColumn("geom", st_point($"x", $"y"))
      .agg(min(st_xmin($"geom")).as("minx"), max(st_ymax($"geom")).as("maxy"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("st_point") && !plan.contains("st_xmin"),
      s"aggregate inputs must fuse:\n$plan")
    val r = df.head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 24.5)
  }

  test("group-by a constructed geometry column stays a valid Aggregate") {
    // regression: inlining the ctor into groupingExpressions while the bare
    // attribute stayed in the result list produced an Aggregate that failed
    // attribute binding at physical planning
    val dir = java.nio.file.Files.createTempDirectory("gs6").toString + "/d"
    (0 until 40).map(i => ((i % 4) * 1.0, ((i / 4) % 2) * 1.0)).toDF("x", "y")
      .write.parquet(dir)
    GeoSimplify.install(spark)
    val df = spark.read.parquet(dir)
      .withColumn("geom", st_point($"x", $"y"))
      .groupBy($"geom").agg(count(lit(1)).as("n"))
    val rows = df.collect()
    assert(rows.length == 8 && rows.map(_.getLong(1)).sum == 40, rows.mkString(","))
    // mixed shape: grouped-on ctor attr + accessor aggregates over it
    val df2 = spark.read.parquet(dir)
      .withColumn("geom", st_point($"x", $"y"))
      .groupBy($"geom").agg(min(st_x($"geom")).as("mx"), count(lit(1)).as("n"))
    val rows2 = df2.collect()
    assert(rows2.length == 8 && rows2.map(_.getLong(2)).sum == 40, rows2.mkString(","))
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
