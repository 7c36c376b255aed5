package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("auc: perfect, inverted, random, and tied rankings") {
    def aucOf(rows: Seq[(Double, Int)]): Double =
      Eval.auc(rows.toDF("s", "y"), "s", "y").collect()(0).getDouble(2)
    // perfect separation
    assert(aucOf(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) == 1.0)
    // perfectly inverted
    assert(aucOf(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))) == 0.0)
    // all scores tied -> 0.5 exactly
    assert(aucOf(Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0))) == 0.5)
    // hand-computed mix: pos {0.8, 0.4}, neg {0.6, 0.2}
    // pairs: (.8>.6)+(.8>.2)+(.4<.6=0)+(.4>.2) = 3 of 4
    assert(aucOf(Seq((0.8, 1), (0.4, 1), (0.6, 0), (0.2, 0))) == 0.75)
    // one-class input -> null
    val r = Eval.auc(Seq((0.5, 1), (0.7, 1)).toDF("s", "y"), "s", "y")
      .collect()(0)
    assert(r.isNullAt(2))
  }

  test("psi: identical distributions score ~0, disjoint ones alarm") {
    val base = (0 until 100).map(i => Tuple1((i % 10).toDouble)).toDF("s")
    val same = (0 until 50).map(i => Tuple1((i % 10).toDouble)).toDF("s")
    val psiSame = Eval.psi(base, same, "s", 0.0, 10.0).collect()(0).getDouble(2)
    assert(math.abs(psiSame) < 1e-12, s"identical shares: $psiSame")
    // mass moved entirely into the top edge bucket
    val shifted = (0 until 50).map(_ => Tuple1(25.0)).toDF("s") // clamps to bucket 9
    val psiShift = Eval.psi(base, shifted, "s", 0.0, 10.0).collect()(0).getDouble(2)
    assert(psiShift > 0.25, s"disjoint must alarm: $psiShift")
    // counts surface
    val row = Eval.psi(base, shifted, "s", 0.0, 10.0).collect()(0)
    assert(row.getLong(0) == 100L && row.getLong(1) == 50L)
    intercept[IllegalArgumentException](Eval.psi(base, same, "s", 5.0, 5.0))
  }
}
