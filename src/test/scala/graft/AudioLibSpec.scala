package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AudioLib

class AudioLibSpec extends AnyFunSuite {

  test("FFT agrees with a direct DFT and satisfies Parseval") {
    val n = 64
    val x = Array.tabulate(n)(j => ((j * j * 13 + 7) % 200 - 100).toDouble)
    val re = x.clone()
    val im = new Array[Double](n)
    AudioLib.fft(re, im)
    for (k <- 0 until n) {
      var dr = 0.0
      var di = 0.0
      for (j <- 0 until n) {
        val a = -2.0 * math.Pi * j * k / n
        dr += x(j) * math.cos(a)
        di += x(j) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-7, s"bin $k re")
      assert(math.abs(im(k) - di) < 1e-7, s"bin $k im")
    }
    val t = x.map(v => v * v).sum
    val f = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(t - f) / t < 1e-12, "Parseval")
  }

  test("pure tone concentrates its power in one bin pair") {
    val n = 64
    val x = Array.tabulate(n)(j => 1000.0 * math.sin(2 * math.Pi * 5 * j / n))
    val wav = AudioLib.writeWav(8000, 1, x.map(math.rint(_).toInt))
    val sp = AudioLib.wavSpectrum(wav, n)
    assert(sp.length == n / 2 + 1)
    assert(sp(5) > 0.999, s"tone bin: ${sp(5)}")
    assert(math.abs(sp.sum - 1.0) < 1e-12)
  }

  test("WAV round-trip: mono and stereo first channel, negative samples") {
    val mono = Array(-32768, -1, 0, 1, 32767, 100, -100, 5000)
    val pcm = AudioLib.readPcm16(AudioLib.writeWav(44100, 1, mono))
    assert(pcm.sampleRate == 44100 && pcm.channels == 1)
    assert(pcm.samples.toSeq == mono.map(_.toDouble).toSeq)
    // stereo: first channel only
    val inter = Array(10, -99, 20, -99, 30, -99, 40, -99)
    val st = AudioLib.readPcm16(AudioLib.writeWav(8000, 2, inter))
    assert(st.channels == 2)
    assert(st.samples.toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    val rms = AudioLib.wavRms(AudioLib.writeWav(8000, 1, Array(3, 4, 3, -4)))
    assert(math.abs(rms - math.sqrt((9.0 + 16 + 9 + 16) / 4)) < 1e-12)
  }

  test("loud rejects: non-WAV, truncated, non-PCM, short clip, bad nfft") {
    assert(AudioLib.readPcm16("not audio".getBytes) == null)
    val ok = AudioLib.writeWav(8000, 1, Array.tabulate(64)(identity))
    assert(AudioLib.readPcm16(java.util.Arrays.copyOf(ok, 30)) == null)
    val nonPcm = ok.clone()
    nonPcm(20) = 3 // fmt code -> IEEE float
    assert(AudioLib.readPcm16(nonPcm) == null)
    assert(AudioLib.wavSpectrum(ok, 128) == null, "clip shorter than nfft")
    assert(AudioLib.wavSpectrum(ok, 48) == null, "non-power-of-two nfft")
    assert(AudioLib.wavSpectrum(ok, 32) != null)
  }

  test("fingerprint: volume-invariant, tone-sensitive, frame-corruption-robust") {
    import graft.multimodal.AudioLib
    def tones(bins: Seq[Int], amp: Double): Array[Int] =
      bins.zipWithIndex.flatMap { case (b, j) =>
        (0 until 512).map(i => (amp * math.sin(2 * math.Pi * b * i / 512.0)).toInt)
      }.toArray
    val a = Seq(7, 12, 19, 25, 31, 9, 14, 22)
    val fA = AudioLib.fingerprint(AudioLib.writeWav(8000, 1, tones(a, 9000)))
    assert(fA != null)
    // volume invariance (0.2x) — exact
    assert(fA == AudioLib.fingerprint(AudioLib.writeWav(8000, 1, tones(a, 1800))))
    // a different tone sequence lands far away
    val b = a.map(_ + 3)
    val fB = AudioLib.fingerprint(AudioLib.writeWav(8000, 1, tones(b, 9000)))
    assert(java.lang.Long.bitCount(fA ^ fB) >= 10)
    // corrupting ONE of 8 frames moves only a minority of bits
    val corrupted = tones(a, 9000)
    val rnd = new scala.util.Random(4)
    (0 until 512).foreach(i => corrupted(3 * 512 + i) = rnd.nextInt(8000) - 4000)
    val fC = AudioLib.fingerprint(AudioLib.writeWav(8000, 1, corrupted))
    assert(java.lang.Long.bitCount(fA ^ fC) <= 24,
      s"one bad frame must not rewrite the code: ${java.lang.Long.bitCount(fA ^ fC)}")
    // too-short audio and junk bytes are null
    assert(AudioLib.fingerprint(AudioLib.writeWav(8000, 1, new Array[Int](600))) == null)
    assert(AudioLib.fingerprint(Array[Byte](1, 2, 3)) == null)
  }
}
