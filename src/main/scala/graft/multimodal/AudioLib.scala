package graft.multimodal

/** Audio feature extraction for multimodal training pipelines: PCM WAV
  * decode (RIFF chunk walk, 16-bit PCM) and an in-place radix-2
  * Cooley–Tukey FFT — both from the public specs (RIFF/WAVE; the FFT is
  * the textbook iterative bit-reversal form), zero dependencies, callable
  * per row from codegen'd expressions. The feature contract mirrors what
  * audio-corpus filters actually gate on: RMS level and the normalized
  * power-spectrum shape (band energy fractions), which are scale-free and
  * numerically stable enough to pin against an independent direct-DFT
  * oracle.
  */
object AudioLib extends Serializable {

  /** First-channel PCM samples plus format. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Double])

  private def u16le(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode WAV or FLAC to first-channel PCM — every AudioLib feature
    * (spectrum, RMS, fingerprint) accepts both transparently, so the
    * audio-dedup story covers the format audio corpora actually ship. */
  def readPcm(b: Array[Byte]): Pcm = {
    if (b != null && b.length > 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      val a = Flac.decode(b)
      if (a == null || a.samples.isEmpty || a.samples(0).isEmpty) return null
      val s = a.samples(0)
      val out = new Array[Double](s.length)
      var i = 0
      while (i < s.length) { out(i) = s(i).toDouble; i += 1 }
      Pcm(a.sampleRate, a.channels, out)
    } else readPcm16(b)
  }

  /** Decode a 16-bit PCM WAV: RIFF walk to fmt + data, first channel
    * only (deterministic; mixing policy belongs to the caller). Null for
    * non-WAV, non-PCM, or non-16-bit payloads — the loud-reject posture. */
  def readPcm16(b: Array[Byte]): Pcm = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var o = 12
    var rate = 0
    var chans = 0
    var bits = 0
    var fmtCode = -1
    var dataOff = -1
    var dataLen = 0
    while (o + 8 <= b.length) {
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32le(b, o + 4).toInt
      if (len < 0 || o + 8 + len > b.length) return null
      if (id == "fmt ") {
        if (len < 16) return null
        fmtCode = u16le(b, o + 8)
        chans = u16le(b, o + 10)
        rate = u32le(b, o + 12).toInt
        bits = u16le(b, o + 22)
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = len
      }
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || bits != 16 || chans < 1 || rate <= 0 || dataOff < 0)
      return null
    val frame = 2 * chans
    val n = dataLen / frame
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val so = dataOff + i * frame
      out(i) = ((u16le(b, so) << 16) >> 16).toDouble // sign-extend
      i += 1
    }
    Pcm(rate, chans, out)
  }

  /** In-place iterative radix-2 FFT (n a power of two). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"radix-2 needs 2^k: $n")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k
          val b2 = blk + k + len / 2
          val xr = re(b2) * cr - im(b2) * ci
          val xi = re(b2) * ci + im(b2) * cr
          re(b2) = re(a) - xr
          im(b2) = im(a) - xi
          re(a) += xr
          im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Normalized power spectrum of the first `nfft` samples (rectangular
    * window): fractions of total power in bins 0..nfft/2. Null when the
    * payload is not decodable or shorter than `nfft`; an all-zero signal
    * yields all-zero fractions. */
  def wavSpectrum(payload: Array[Byte], nfft: Int): Array[Double] = {
    if (nfft < 2 || (nfft & (nfft - 1)) != 0) return null
    val pcm = readPcm(payload)
    if (pcm == null || pcm.samples.length < nfft) return null
    val re = java.util.Arrays.copyOf(pcm.samples, nfft)
    val im = new Array[Double](nfft)
    fft(re, im)
    val half = nfft / 2
    val p = new Array[Double](half + 1)
    var k = 0
    var total = 0.0
    while (k <= half) {
      p(k) = re(k) * re(k) + im(k) * im(k)
      total += p(k)
      k += 1
    }
    if (total > 0.0) {
      k = 0
      while (k <= half) { p(k) /= total; k += 1 }
    }
    p
  }

  /** RMS level over every sample of the first channel; null when not
    * decodable. */
  def wavRms(payload: Array[Byte]): java.lang.Double = {
    val pcm = readPcm(payload)
    if (pcm == null || pcm.samples.isEmpty) return null
    var s = 0.0
    var i = 0
    while (i < pcm.samples.length) { s += pcm.samples(i) * pcm.samples(i); i += 1 }
    math.sqrt(s / pcm.samples.length)
  }

  /** 16-bit PCM WAV writer (fixture/sink twin): interleaved channels. */
  def writeWav(sampleRate: Int, channels: Int,
      samples: Array[Int]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "frame alignment")
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      var i = 0
      while (i < 4) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    bos.write("RIFF".getBytes); w32(36L + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    bos.write("data".getBytes); w32(dataLen)
    samples.foreach(s => w16(s & 0xffff))
    bos.toByteArray
  }

  /** Peak-constellation audio fingerprint (the Shazam-family shape, Wang
    * ISMIR 2003, reduced to one 64-bit code): frame the first channel
    * into `nfft`-sample windows (hop = nfft), take each frame's dominant
    * FFT bin, and SimHash the (frame-index-delta, peak-bin) pair stream.
    * Amplitude-invariant by construction (argmax ignores scale), so a
    * volume-normalized re-encode fingerprints identically; different
    * tonal content lands far away in Hamming space — joinable with the
    * same pigeonhole machinery as text SimHash and image dHash.
    * Null for undecodable audio or fewer than 2 frames. */
  def fingerprint(payload: Array[Byte], nfft: Int = 512): java.lang.Long = {
    val pcm = readPcm(payload)
    if (pcm == null) return null
    val n = pcm.samples.length / nfft
    if (n < 2) return null
    val peaks = new Array[Int](n)
    val re = new Array[Double](nfft)
    val im = new Array[Double](nfft)
    var f = 0
    while (f < n) {
      var i = 0
      while (i < nfft) {
        re(i) = pcm.samples(f * nfft + i); im(i) = 0.0; i += 1
      }
      fft(re, im)
      var best = 1 // skip DC: silence/offset should not dominate
      var bestP = -1.0
      var k = 1
      while (k < nfft / 2) {
        val p = re(k) * re(k) + im(k) * im(k)
        if (p > bestP) { bestP = p; best = k }
        k += 1
      }
      peaks(f) = best
      f += 1
    }
    // SimHash over consecutive peak pairs: robust to a few corrupted
    // frames (one bad frame flips a minority of votes, not the code)
    val votes = new Array[Int](64)
    f = 0
    while (f < n - 1) {
      val h = graft.text.TextLib.hash64((peaks(f).toLong << 20) | peaks(f + 1))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      f += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    Long.box(out)
  }

  /** codegen entry point (generated Java cannot pass Scala defaults). */
  def fingerprintDefault(payload: Array[Byte]): java.lang.Long =
    fingerprint(payload)
}
