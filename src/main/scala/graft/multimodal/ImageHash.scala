package graft.multimodal

/** Perceptual image hashing for image near-dup detection — the visual
  * counterpart of SimHash: re-encoded, resized, or slightly
  * brightness-shifted copies of an image land within a few Hamming bits
  * of each other, so the existing [[graft.operators.Dedup.simhashPairs]]
  * pigeonhole machinery (or a plain equality join at distance 0) dedupes
  * an image corpus the way it dedupes text.
  *
  * dHash (difference hash, the public "Kind of Like That" construction):
  * decode to grayscale, box-filter down to 9×8, emit one bit per
  * horizontal neighbor pair (`left < right`), row-major — 64 bits that
  * survive scaling and uniform brightness/contrast changes because only
  * RELATIVE gradients are kept. Container-agnostic: PNG, JPEG (any
  * supported family), GIF, and BMP all route through the from-spec
  * decoders' pixel paths.
  */
object ImageHash extends Serializable {

  /** Decode any supported still image to (width, height, grayscale
    * doubles). Color collapses by the integer luma weights (JPEG's own
    * 299/587/114 split). Null for undecodable bytes. */
  private[multimodal] def toGray(p: Array[Byte]): (Int, Int, Array[Double]) = {
    if (p == null || p.length < 4) return null
    // PNG / GIF / BMP via the PngCodec image carrier; JPEG via luma
    val img: PngCodec.Image =
      if ((p(0) & 0xff) == 0x89 && p(1) == 'P') PngCodec.decode(p)
      else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') GifCodec.decode(p)
      else if (p(0) == 'B' && p(1) == 'M') PngCodec.decodeBmp(p)
      else null
    if (img != null) {
      val g = new Array[Double](img.width * img.height)
      var i = 0
      while (i < g.length) {
        if (img.channels >= 3) {
          val r = img.pixels(i * img.channels) & 0xff
          val gg = img.pixels(i * img.channels + 1) & 0xff
          val b = img.pixels(i * img.channels + 2) & 0xff
          g(i) = (299 * r + 587 * gg + 114 * b) / 1000.0
        } else g(i) = (img.pixels(i) & 0xff).toDouble
        i += 1
      }
      return (img.width, img.height, g)
    }
    if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      val l = JpegCodec.decodeLuma(p)
      if (l == null) return null
      val g = new Array[Double](l.width * l.height)
      var i = 0
      while (i < g.length) { g(i) = (l.pixels(i) & 0xff).toDouble; i += 1 }
      return (l.width, l.height, g)
    }
    null
  }

  /** Area-average (box-filter) downscale to exactly tw×th. Each target
    * cell averages its source rectangle — deterministic double
    * arithmetic, no resampling kernels. */
  private[multimodal] def boxScale(w: Int, h: Int, g: Array[Double],
      tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = y(ty, h, th); val y1 = math.max(y0 + 1, y(ty + 1, h, th))
      var tx = 0
      while (tx < tw) {
        val x0 = y(tx, w, tw); val x1 = math.max(x0 + 1, y(tx + 1, w, tw))
        var s = 0.0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { s += g(yy * w + xx); xx += 1 }
          yy += 1
        }
        out(ty * tw + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }
  @inline private def y(t: Int, src: Int, dst: Int): Int =
    (t.toLong * src / dst).toInt

  /** 64-bit dHash; null when the bytes are not a decodable image or are
    * smaller than the 9×8 sampling grid needs (degenerate 1-px inputs
    * still work — the box filter clamps to ≥1 source pixel). */
  def dhash(p: Array[Byte]): java.lang.Long = {
    val d = toGray(p)
    if (d == null) return null
    val (w, h, g) = d
    if (w <= 0 || h <= 0) return null
    val s = boxScale(w, h, g, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (s(r * 9 + c) < s(r * 9 + c + 1)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Hamming distance helper for SQL-side thresholding. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
