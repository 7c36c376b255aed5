package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AudioLib, Flac}
import graft.multimodal.Flac.EncodeOpts

/** FLAC codec: lossless round-trips through every decoder branch
  * (subframe types, residual codings, stereo modes), CRC enforcement,
  * corrupt-tail prefix recovery, and the AudioLib feature dispatch. */
class FlacSpec extends AnyFunSuite {

  // deterministic 16-bit test signal: mixed tones + ramps, full-ish range
  private def signal(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n) { i =>
      val t = (8000.0 * math.sin(2 * math.Pi * (30 + seed) * i / 512.0) +
        4000.0 * math.sin(2 * math.Pi * (7 + seed) * i / 512.0) +
        (i % 97) * 11 - 500).toInt
      math.max(-32768, math.min(32767, t))
    }

  private def roundTrip(chs: Array[Array[Int]], bits: Int, blockSize: Int,
      midSide: Boolean = false, opts: EncodeOpts = EncodeOpts()): Unit = {
    val flac = Flac.encode(44100, bits, chs, blockSize, midSide, opts)
    val dec = Flac.decode(flac)
    assert(dec != null, "decode returned null")
    assert(dec.sampleRate == 44100 && dec.channels == chs.length &&
      dec.bits == bits, s"${dec.sampleRate}/${dec.channels}/${dec.bits}")
    chs.indices.foreach { c =>
      assert(java.util.Arrays.equals(dec.samples(c), chs(c)),
        s"channel $c not lossless (bits=$bits block=$blockSize ms=$midSide $opts)")
    }
  }

  test("mono round-trip: multi-frame with partial tail, 16/12/8 bit") {
    roundTrip(Array(signal(1000, 1)), 16, 256) // 3 full frames + 232 tail
    roundTrip(Array(signal(300, 2).map(_ >> 4)), 12, 128)
    roundTrip(Array(signal(257, 3).map(_ >> 8)), 8, 64)
  }

  test("constant and near-constant blocks") {
    roundTrip(Array(Array.fill(512)(1234)), 16, 256) // pure CONSTANT
    val mixed = Array.fill(512)(-77)
    mixed(300) = -76 // second frame constant, first not
    roundTrip(Array(mixed), 16, 256)
    roundTrip(Array(Array.fill(100)(0)), 16, 64)
  }

  test("stereo: independent and mid/side decorrelation") {
    val l = signal(700, 4)
    val r = signal(700, 9).map(v => -v / 2)
    roundTrip(Array(l, r), 16, 256)
    roundTrip(Array(l, r), 16, 256, midSide = true)
    // odd left/right sums exercise the mid floor + side parity path
    val lo = Array.tabulate(300)(i => 2 * i + 1)
    val ro = Array.tabulate(300)(i => -i)
    roundTrip(Array(lo, ro), 16, 128, midSide = true)
  }

  test("decoder branches: LPC, Rice2, partitions, escape, wasted bits") {
    val s = signal(1024, 5)
    roundTrip(Array(s), 16, 256, opts = EncodeOpts(lpc = true))
    roundTrip(Array(s), 16, 256, opts = EncodeOpts(rice2 = true))
    roundTrip(Array(s), 16, 256, opts = EncodeOpts(partitionOrder = 2))
    roundTrip(Array(s), 16, 256, opts = EncodeOpts(escape = true))
    roundTrip(Array(s.map(_ & ~7)), 16, 256, opts = EncodeOpts(wasted = true))
    // everything at once, stereo mid/side, partial tail frame
    roundTrip(Array(signal(900, 6).map(_ & ~3), signal(900, 7).map(_ & ~3)),
      16, 256, midSide = true,
      opts = EncodeOpts(lpc = true, rice2 = true, partitionOrder = 1,
        wasted = true))
  }

  test("corrupt tails yield decoded prefix; CRC flips reject the frame") {
    val s = signal(1024, 8)
    val flac = Flac.encode(44100, 16, Array(s), 256)
    val full = Flac.decode(flac)
    assert(full.samples(0).length == 1024)
    // cut mid-stream: whole frames before the cut survive
    val cut = Flac.decode(java.util.Arrays.copyOf(flac, flac.length - 40))
    assert(cut != null && cut.samples(0).length == 768,
      s"prefix frames: ${if (cut == null) -1 else cut.samples(0).length}")
    // flip one payload byte in the LAST frame: its CRC-16 fails, the
    // earlier frames survive
    val bad = flac.clone()
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x55).toByte
    val dec = Flac.decode(bad)
    assert(dec != null && dec.samples(0).length == 768,
      "frame with broken CRC must be dropped")
    // junk and null reject cleanly
    assert(Flac.decode(null) == null)
    assert(Flac.decode("fLaC but not really a stream".getBytes) == null)
    assert(Flac.decode(Array.fill(100)(0x42.toByte)) == null)
  }

  test("AudioLib features accept FLAC: fingerprint/RMS/spectrum match WAV") {
    // same PCM through both containers must produce IDENTICAL features —
    // the dedup invariance that makes FLAC corpora joinable against WAV
    val s = signal(4096, 11)
    val wav = AudioLib.writeWav(8000, 1, s)
    val flac = Flac.encode(8000, 16, Array(s), 1024)
    assert(AudioLib.fingerprint(wav) == AudioLib.fingerprint(flac))
    assert(math.abs(AudioLib.wavRms(wav) - AudioLib.wavRms(flac)) < 1e-12)
    val sw = AudioLib.wavSpectrum(wav, 512)
    val sf = AudioLib.wavSpectrum(flac, 512)
    assert(sw.zip(sf).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // and a re-encode at different block size fingerprints identically
    val flac2 = Flac.encode(8000, 16, Array(s), 256,
      opts = EncodeOpts(rice2 = true, partitionOrder = 1))
    assert(AudioLib.fingerprint(flac) == AudioLib.fingerprint(flac2))
  }
}
