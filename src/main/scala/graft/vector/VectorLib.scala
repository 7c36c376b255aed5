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
  /** Index of the squared-distance-nearest planar centroid; ties take the
    * first (lowest) index — with centroids held in ascending-cid order
    * this IS the lexicographic (d², cid) k-means tie contract. Tight
    * no-allocation loop: the assignment kernel of
    * [[graft.operators.SpatialCluster.kmeans]]. */
  def nearestCentroid2(x: Double, y: Double,
      cxs: Array[Double], cys: Array[Double]): Int = {
    var best = 0
    var bd = Double.PositiveInfinity
    var i = 0
    while (i < cxs.length) {
      val dx = x - cxs(i)
      val dy = y - cys(i)
      val d = dx * dx + dy * dy
      if (d < bd) { bd = d; best = i }
      i += 1
    }
    best
  }

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

  /** Unit-normalize (copy); zero vectors pass through unchanged. */
  def unit(v: Array[Float]): Array[Float] = {
    val n = norm(v)
    if (n == 0.0) v.clone
    else {
      val out = new Array[Float](v.length)
      var i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Product-quantization subspace boundary: subspace `s` of `m` over `dim`
    * components covers [s*dsub, min((s+1)*dsub, dim)) with dsub = ⌈dim/m⌉ —
    * general (dim need not divide m), and encode/LUT/train all share it. */
  @inline def pqSubDim(dim: Int, m: Int): Int = (dim + m - 1) / m

  /** IVF-PQ corpus-side assignment kernel: unit-normalize, coarse-assign to
    * the argmax-dot centroid (ties toward the lower index, the planted
    * self-match guarantee shared with [[nearestCells]]), then encode the
    * RESIDUAL (v̂ − centroid) per subspace as the argmin-L2 codeword index.
    * Returns the cell id and the m-byte code array — the only per-vector
    * state the index retains (m bytes vs 4·dim: the 100 TB memory story).
    * Codeword count is ≤ 256 so a code is one unsigned byte. */
  def ivfPqAssign(v: Array[Float], centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): (Int, Array[Byte]) = {
    val vh = unit(v)
    val cell = nearestCells(vh, centroids, 1)(0)
    val c = centroids(cell)
    val m = codebooks.length
    val dsub = pqSubDim(vh.length, m)
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val lo = s * dsub
      val hi = math.min(lo + dsub, vh.length)
      val cb = codebooks(s)
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var d = 0.0
        var i = lo
        while (i < hi) {
          val cc = if (i < c.length) c(i) else 0f
          val r = (vh(i) - cc).toDouble - cw(i - lo)
          d += r * r
          i += 1
        }
        if (d < bd) { bd = d; best = j } // strict-less: ties toward lower idx
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    (cell, codes)
  }

  /** Query-side ADC lookup table: lut[s·ksub + j] = ⟨q̂ sub s, codeword j⟩.
    * Computed ONCE per query row (m·ksub·dsub ≈ dim·ksub mults), after
    * which every candidate scores in m adds ([[pqAdc]]) instead of a dim-
    * length dot — the asymmetric-distance-computation shape from the PQ
    * paper (Jégou et al., TPAMI 2011). */
  def pqLut(q: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Float] = {
    val qh = unit(q)
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = pqSubDim(qh.length, m)
    val lut = new Array[Float](m * ksub)
    var s = 0
    while (s < m) {
      val lo = s * dsub
      val hi = math.min(lo + dsub, qh.length)
      val cb = codebooks(s)
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var d = 0.0
        var i = lo
        while (i < hi) { d += qh(i).toDouble * cw(i - lo); i += 1 }
        lut(s * ksub + j) = d.toFloat
        j += 1
      }
      s += 1
    }
    lut
  }

  /** ADC score of one candidate: Σ_s lut[s·ksub + code_s] — m table adds.
    * Together with the query·centroid term this approximates ⟨q̂, x̂⟩ =
    * ⟨q̂, c⟩ + ⟨q̂, x̂−c⟩ with the residual replaced by its codeword. */
  def pqAdc(lut: Array[Float], ksub: Int, codes: Array[Byte]): Double = {
    var s = 0
    var acc = 0.0
    while (s < codes.length) {
      acc += lut(s * ksub + (codes(s) & 0xff))
      s += 1
    }
    acc
  }

  /** ⟨q̂, centroids(cell)⟩ — the coarse term of the ADC score. */
  def cellDot(q: Array[Float], centroids: Array[Array[Float]], cell: Int): Double =
    dot(unit(q), centroids(cell))

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
