package graft.vector

/** Dense-vector kernel for the similarity-search surface (embeddings table:
  * `array<float>` columns). Accumulation is in double regardless of input
  * precision — deterministic left-to-right fold, so results are bit-stable
  * across runs and partitionings (per-row scalar, no reduction order issues).
  */
object VectorLib {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** The `n` codebook indices with the highest dot product against `v`,
    * in (dot desc, index asc) order — strict-greater argmax scan, so ties
    * break toward the lower index deterministically. One tight two-loop
    * pass, no allocation beyond the dots buffer and the output: this is
    * the per-row IVF cell-assignment kernel (a HOF formulation allocates a
    * zip_with array per centroid per row — measured 100× slower at 200k
    * rows × 1024 centroids). */
  def nearestCells(v: Array[Float], centroids: Array[Array[Float]], n: Int): Array[Int] = {
    val nc = centroids.length
    val dots = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cc = centroids(c)
      val m = math.min(cc.length, v.length)
      var d = 0.0
      var i = 0
      while (i < m) { d += cc(i).toDouble * v(i).toDouble; i += 1 }
      dots(c) = d
      c += 1
    }
    val k = math.min(n, nc)
    val out = new Array[Int](k)
    val used = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var bd = Double.NegativeInfinity
      var j = 0
      while (j < nc) {
        if (!used(j) && dots(j) > bd) { bd = dots(j); best = j }
        j += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    out
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (splitmix64-seeded, no stored
    * model). Hamming distance on signatures approximates angular distance —
    * the bucketing path for ANN at scale. */
  def rhpSignature(v: Array[Float], bits: Int, seed: Long): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      var state = seed + b * 0x9e3779b97f4a7c15L
      while (i < v.length) {
        // one splitmix64 step per component — deterministic hyperplane
        state += 0x9e3779b97f4a7c15L
        var z = state
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        // map to [-1, 1)
        val r = (z >> 11).toDouble / (1L << 52).toDouble
        s += r * v(i)
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
