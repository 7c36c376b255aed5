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
