package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.vector.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jacobiEigen: known 2x2 and 3x3 spectra, orthonormal vectors") {
    // [[2,1],[1,2]] -> eigenvalues {3, 1}, vectors (1,1)/√2 and (1,-1)/√2
    val (e2, v2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(e2.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
    // columns orthonormal
    val dot = v2(0)(0) * v2(0)(1) + v2(1)(0) * v2(1)(1)
    assert(math.abs(dot) < 1e-10)
    // diag(5, 2, 7) is its own spectrum
    val (e3, _) = Pca.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(e3.sorted.zip(Array(2.0, 5.0, 7.0)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
  }

  test("fit recovers a planted low-rank structure; whitening unit-variances it") {
    // 2000 points in 8-d: big variance along axis 0 mixed into axis 1,
    // small noise elsewhere — top component must align with the plant
    val rnd = new scala.util.Random(17)
    val rows = (0 until 2000).map { _ =>
      val t = rnd.nextGaussian() * 10
      val v = Array.tabulate(8)(i => (rnd.nextGaussian() * 0.1).toFloat)
      v(0) = (t * 0.8 + v(0)).toFloat
      v(1) = (t * 0.6 + v(1)).toFloat
      Tuple1(v.toSeq)
    }.toDF("embedding")
    val m = Pca.fit(rows, k = 3, whiten = false)
    // eigenvalues strictly ordered desc, first dominates
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) >= m.eigenvalues(2))
    assert(m.eigenvalues(0) > 50 && m.eigenvalues(1) < 1.0, m.eigenvalues.toSeq)
    // top component aligns with the planted (0.8, 0.6) direction
    val c0 = m.components(0)
    val align = math.abs(c0(0) * 0.8 + c0(1) * 0.6)
    assert(align > 0.99, s"alignment $align ${c0.toSeq}")
    // whitened projection has ~unit variance per component
    val w = Pca.fit(rows, k = 3, whiten = true)
    val proj = rows.collect().map(r =>
      w.project(r.getSeq[Float](0).toArray))
    (0 until 3).foreach { c =>
      val xs = proj.map(_(c).toDouble)
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(va - 1.0) < 0.05, s"component $c variance $va")
    }
    // projections of identical inputs are identical (the gate contract)
    val v0 = rows.head().getSeq[Float](0).toArray
    assert(w.project(v0).sameElements(w.project(v0.clone())))
  }

  test("validation is loud; short/null vectors skipped in fit") {
    val ok = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(3.0f, 4.0f)),
      Tuple1(Seq.empty[Float])).toDF("embedding")
    val m = Pca.fit(ok, k = 1, whiten = false) // empty row ignored
    assert(m.k == 1 && m.mean.length == 2)
    intercept[IllegalArgumentException](Pca.fit(ok, k = 5))
  }
}
