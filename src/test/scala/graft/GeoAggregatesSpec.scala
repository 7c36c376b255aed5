package graft

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.geom.GeomLib

class GeoAggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("st_union_agg dissolves disjoint squares to the exact area sum") {
    // 3 groups × disjoint squares at 10-spaced centers (half 2, area 16)
    val df = (0 until 3).flatMap { g =>
      (0 until 5).map(i => (g, i * 10.0))
    }.toDF("g", "px")
      .withColumn("sq", st_make_square(col("px"), lit(0.0), lit(2.0)))
    val out = df.groupBy("g")
      .agg(st_area(st_union_agg(col("sq"))).as("area"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out == Map(0 -> 80.0, 1 -> 80.0, 2 -> 80.0))
  }

  test("st_union_agg merges overlapping squares to the true extent") {
    // chain [p-2, p+2] x [-2, 2] for p in 0..9 -> one 13 x 4 rectangle
    val df = (0 until 10).map(p => Tuple1(p.toDouble)).toDF("p")
      .withColumn("sq", st_make_square(col("p"), lit(0.0), lit(2.0)))
    val r = df.agg(st_area(st_union_agg(col("sq"))).as("area"),
        st_union_agg(col("sq")).as("u")).head()
    assert(r.getDouble(0) == 52.0)
    // dissolved to ONE polygon spanning the full extent (collinear edge
    // vertices survive JTS union; part count and bbox are the contract)
    val u = r.get(1).asInstanceOf[Array[Byte]]
    assert(GeomLib.wkbShapeType(u) == 3)
    assert(GeomLib.xMin(u) == -2.0 && GeomLib.xMax(u) == 11.0)
  }

  test("st_union_agg skips broken WKB and yields null on empty groups") {
    val rows = Seq[(Int, Array[Byte])](
      (0, GeomLib.squareWkb(0.0, 0.0, 1.0)),
      (0, Array[Byte](9, 9)), // broken: skipped, not fatal
      (1, null),
      (1, Array[Byte](1)))
    val out = rows.toDF("g", "sq").groupBy("g")
      .agg(st_union_agg(col("sq")).as("u"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    assert(GeomLib.area(out(0).asInstanceOf[Array[Byte]]) == 4.0)
    assert(out(1) == null)
  }

  test("st_union_agg works through SQL and plans a partial/final split") {
    registerAll(spark)
    (0 until 40).map(i => (i % 4, (i % 10).toDouble))
      .toDF("g", "px").createOrReplaceTempView("union_agg_in")
    val df = spark.sql(
      """SELECT g, st_area(st_union_agg(st_make_square(px * 10.0, 0.0, 2.0))) AS a
         FROM union_agg_in GROUP BY g ORDER BY g""")
    val rows = df.collect()
    assert(rows.length == 4)
    // each group sees centers {0,10,...,90} minus the ones its residue skips
    assert(rows.forall(_.getDouble(1) % 16.0 == 0.0))
    // TypedImperativeAggregate must split partial (map-side union) / final;
    // AQE hides children from collect{}, so assert on the plan string the
    // way ScalePlanSpec does
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_st_union_agg"),
      s"expected a partial (map-side) st_union_agg stage in:\n$plan")
  }
}
