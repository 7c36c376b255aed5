package graft.vector

import org.apache.spark.sql.{DataFrame, Row}

/** PCA / whitening for embedding columns — the linear-algebra step
  * between raw vectors and the ANN tier: decorrelated, variance-ordered
  * components let a product quantizer spend its codebook bits evenly
  * (the OPQ observation, Ge et al. CVPR 2013), and truncating to the top
  * components is the standard 2-4× ANN memory cut before any
  * quantization.
  *
  * Fit: one pass accumulates per-partition (n, Σx, upper-triangle Σxxᵀ)
  * — dim(dim+1)/2 + dim + 1 doubles of state per partition, the
  * classic imperative per-partition accumulation (this is the one shape
  * where a declarative plan has no good form: an element-wise array-sum
  * aggregate over 2k-wide outer products either explodes row count or
  * generates thousands of aggregate columns). The driver then runs a
  * cyclic Jacobi eigensolver on the dim×dim covariance (dim ≤ 512
  * guard; 64×64 converges in a few sweeps).
  *
  * Transform: a broadcast-model expression
  * ([[graft.functions.PcaProject]]) computing `Λ^(-1/2) Vᵀ (x - μ)` —
  * map-only, codegen, no shuffle. `whiten = false` skips the Λ^(-1/2)
  * scaling (plain PCA projection). */
object Pca {

  /** Trained model: mean, top-k eigenvalues (desc), and the matching
    * eigenvectors as rows (k × dim). */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]], whiten: Boolean) extends Serializable {
    def k: Int = components.length
    def project(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](components.length)
      var c = 0
      while (c < components.length) {
        val row = components(c)
        var s = 0.0
        var i = 0
        while (i < row.length) {
          val x = (if (i < v.length) v(i).toDouble else 0.0) - mean(i)
          s += row(i) * x
          i += 1
        }
        if (whiten) s /= math.sqrt(math.max(eigenvalues(c), 1e-12))
        out(c) = s.toFloat
        c += 1
      }
      out
    }
  }

  def fit(df: DataFrame, k: Int, whiten: Boolean = true,
      vecCol: String = "embedding"): PcaModel = {
    val first = df.select(vecCol).head()
    val dim = first.getSeq[Number](0).length
    require(dim >= 1 && dim <= 512, s"dim must be in [1,512]: $dim")
    require(k >= 1 && k <= dim, s"k must be in [1,dim]: $k dim=$dim")
    val tri = dim * (dim + 1) / 2
    // per-partition imperative accumulation of (n, sum, upper-tri gram)
    val (n, sums, gram) = df.select(vecCol).rdd.mapPartitions { it =>
      var nn = 0L
      val s = new Array[Double](dim)
      val g = new Array[Double](tri)
      it.foreach { row =>
        val v = row.getSeq[Number](0)
        if (v != null && v.length == dim) {
          nn += 1
          var i = 0
          var t = 0
          while (i < dim) {
            val xi = v(i).doubleValue
            s(i) += xi
            var j = i
            while (j < dim) { g(t) += xi * v(j).doubleValue; t += 1; j += 1 }
            i += 1
          }
        }
      }
      Iterator.single((nn, s, g))
    }.reduce { (a, b) =>
      var i = 0
      while (i < dim) { a._2(i) += b._2(i); i += 1 }
      var t = 0
      while (t < tri) { a._3(t) += b._3(t); t += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    require(n >= 2, s"PCA needs at least 2 complete vectors, got $n")
    val mean = sums.map(_ / n)
    // covariance from the gram: C(i,j) = G(i,j)/n - mean_i*mean_j
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (eig, vecs) = jacobiEigen(cov)
    // sort desc by eigenvalue, take top k
    val order = eig.indices.sortBy(i => -eig(i)).take(k)
    PcaModel(mean, order.map(eig).toArray,
      order.map(c => Array.tabulate(dim)(r => vecs(r)(c))).toArray, whiten)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (Golub & Van Loan
    * §8.5): rotate out the largest off-diagonal entries sweep by sweep
    * until the off-diagonal Frobenius mass is below tolerance.
    * Deterministic: fixed sweep order, fixed tolerance. Returns
    * (eigenvalues, eigenvector MATRIX with vectors in COLUMNS). */
  private[graft] def jacobiEigen(mIn: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12)
      : (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = Array.tabulate(n, n)((i, j) => mIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val tt = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
                case x => x
              }
            val c = 1.0 / math.sqrt(tt * tt + 1)
            val s = tt * c
            var r = 0
            while (r < n) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < n) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < n) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
