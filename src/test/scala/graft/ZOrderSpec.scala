package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def enc(bits: Int, xs: Long*): Long =
    Seq((xs.head, 0)).toDF("x", "pad")
      .select(ZOrder.zorderEncode(xs.map(lit), bits).as("z"))
      .collect().head.getLong(0)

  test("interleave matches hand-computed Morton codes") {
    // x=3 (011), y=5 (101), 3 bits: bits land at (b*2 + c)
    // b0: x->pos0=1, y->pos1=1; b1: x->pos2=1, y->0; b2: x->0, y->pos5=1
    assert(enc(3, 3L, 5L) == 39L)
    assert(enc(3, 0L, 0L) == 0L)
    assert(enc(3, 7L, 7L) == 63L) // all bits set
    // single column degenerates to identity
    assert(enc(6, 41L) == 41L)
  }

  test("bijective over the full grid; scala and sql forms agree") {
    val df = spark.range(0, 16 * 16 * 4).toDF("i")
      .select((col("i") % 16).as("a"), ((col("i") / 16) % 16).cast("long").as("b"),
        ((col("i") / 256) % 4).cast("long").as("c"))
    val keys = df.select(ZOrder.zorderEncode(
        Seq(col("a"), col("b"), col("c")), 4).as("z"))
    assert(keys.distinct().count() == 16L * 16 * 4)
    // the zorderSql twin evaluates to the identical key set
    val viaSql = df.selectExpr(ZOrder.zorderSql(Seq("a", "b", "c"), 4) + " AS z")
    assert(keys.except(viaSql).count() == 0 &&
      viaSql.except(keys).count() == 0)
  }

  test("locality: quadrant-prefix property — a top-bits range predicate " +
      "maps to a contiguous key prefix") {
    val df = spark.range(0, 64).toDF("i")
      .select((col("i") % 8).as("a"), (col("i") / 8).cast("long").as("b"))
    val z = df.withColumn("z",
      ZOrder.zorderEncode(Seq(col("a"), col("b")), 3))
    // the (a < 2, b < 2) quadrant IS keys [0, 4); (a < 4, b < 4) IS [0, 16)
    // — this is exactly what makes min-max pruning effective on a z-sorted
    // layout: the predicate's quadrant occupies a contiguous key band
    val q1 = z.filter(col("a") < 2 && col("b") < 2)
      .select("z").collect().map(_.getLong(0)).toSet
    assert(q1 == Set(0L, 1L, 2L, 3L))
    val q2 = z.filter(col("a") < 4 && col("b") < 4)
      .select("z").collect().map(_.getLong(0)).toSet
    assert(q2 == (0L until 16L).toSet)
  }

  test("guards: bit budget and empty columns rejected") {
    intercept[IllegalArgumentException](ZOrder.zorderEncode(Seq.empty, 4))
    intercept[IllegalArgumentException](
      ZOrder.zorderEncode(Seq(lit(1L), lit(2L)), 32))
  }
}
