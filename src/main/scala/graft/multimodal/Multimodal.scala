package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery (schema, batching, partitioning, UDF signature)
  * is real. Decoding is pluggable via [[Multimodal.MediaDecoder]]:
  * [[Multimodal.HeaderDecoder]] (default) REALLY parses container headers
  * — PNG/JPEG/GIF/BMP dimensions and WAV rate/channels, all zero-dependency
  * byte-level parsing of public formats — and falls back to
  * [[Multimodal.StubDecoder]]'s deterministic fake for payloads it cannot
  * sniff. Full PIXEL decode is real for PNG ([[PngCodec]] over the JDK's
  * zlib — see [[Multimodal.pngPixelStats]]); other formats' sample decode
  * needs codec libraries this container lacks, and a production decoder
  * plugs in behind the same trait. This
  * mirrors running `mapInPandas` batches in a Python pipeline: the batch
  * unit is the partition iterator, which Spark feeds without materializing
  * the whole partition.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. `width`/`height` carry
    * pixel dimensions for images and (for backward compatibility) sample
    * rate / channel count for audio; the dedicated `duration_ms` /
    * `sample_rate` / `channels` / `codec` fields cover the audio/video
    * container formats where a 2D size is meaningless. Defaults keep
    * image-only decoders source-compatible. */
  case class MediaMeta(mime: String, n_bytes: Long, width: Int, height: Int,
      duration_ms: Long = 0L, sample_rate: Int = 0, channels: Int = 0,
      codec: String = "")
  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, width: Int, height: Int, histogram: Array[Long])

  /** Pluggable payload → metadata decode. Implementations must be
    * deterministic and serializable (they run inside executor tasks). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake dimensions from a payload hash — the honest stand-in
    * for payloads whose container format is unknown. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      val w = 64 + (math.abs(h) % 960).toInt
      val ht = 64 + (math.abs(h / 7) % 540).toInt
      MediaMeta("application/octet-stream", payload.length.toLong, w, ht)
    }
  }

  /** Real container-header parsing for the common public formats; falls
    * back to [[StubDecoder]] for unrecognized bytes. For audio (WAV) the
    * width/height fields carry sample rate and channel count. */
  object HeaderDecoder extends MediaDecoder {
    private def u16le(b: Array[Byte], o: Int) = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8))
    private def u32le(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def u32be(b: Array[Byte], o: Int) =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def u16be(b: Array[Byte], o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u64be(b: Array[Byte], o: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    private def fourcc(b: Array[Byte], o: Int) =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** ISO-BMFF (MP4/MOV/3GP family) header walk: ftyp's major brand is
      * the container-level codec tag; moov → mvhd gives timescale +
      * duration (version 0 and 1 layouts). Box walk only — no mdat or
      * sample-table decode (headers-only contract). */
    private def decodeMp4(p: Array[Byte], n: Long): MediaMeta = {
      val brand = fourcc(p, 8).trim
      var durMs = 0L
      var o = 0
      var guard = 0
      while (o + 8 <= p.length && guard < 256) {
        val size = u32be(p, o)
        if (fourcc(p, o + 4) == "moov") {
          val end = math.min(p.length.toLong, o.toLong + size).toInt
          var c = o + 8
          var cg = 0
          while (c + 8 <= end && cg < 256) {
            val cs = u32be(p, c)
            if (fourcc(p, c + 4) == "mvhd") {
              val ver = p(c + 8) & 0xff
              if (ver == 1 && c + 40 <= end) {
                val ts = u32be(p, c + 28)
                if (ts > 0) durMs = u64be(p, c + 32) * 1000L / ts
              } else if (ver == 0 && c + 28 <= end) {
                val ts = u32be(p, c + 20)
                val dur = u32be(p, c + 24).toLong & 0xffffffffL
                if (ts > 0) durMs = dur * 1000L / ts
              }
            }
            if (cs <= 8) c = end else c += cs
            cg += 1
          }
        }
        if (size <= 8) o = p.length else o += size
        guard += 1
      }
      MediaMeta("video/mp4", n, 0, 0, durMs, 0, 0, brand)
    }

    /** FLAC STREAMINFO (mandatory first metadata block, 34 bytes): sample
      * rate 20 bits, channels-1 3 bits, bits-per-sample-1 5 bits, total
      * samples 36 bits, per the public FLAC format spec. */
    private def decodeFlac(p: Array[Byte], n: Long): MediaMeta = {
      if (p.length < 26 || (p(4) & 0x7f) != 0) return StubDecoder.decode(p)
      val rate = ((p(18) & 0xff) << 12) | ((p(19) & 0xff) << 4) | ((p(20) & 0xff) >> 4)
      val chans = (((p(20) & 0xff) >> 1) & 0x7) + 1
      val total = ((p(21) & 0x0fL) << 32) |
        ((p(22) & 0xffL) << 24) | ((p(23) & 0xffL) << 16) |
        ((p(24) & 0xffL) << 8) | (p(25) & 0xffL)
      val durMs = if (rate > 0) total * 1000L / rate else 0L
      MediaMeta("audio/flac", n, rate, chans, durMs, rate, chans, "flac")
    }

    // Layer III bitrate tables (kbps) per the public MPEG audio frame
    // header layout; index 0 = free, 15 = bad (both rejected)
    private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val V2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

    /** MPEG audio (MP3) frame header at `off`: 11-bit sync, version, layer
      * III bitrate/sample-rate indices, channel mode. Duration is the CBR
      * estimate (audio bytes × 8 / bitrate) — the honest headers-only
      * answer; VBR streams would need a full frame walk or a Xing tag. */
    private def decodeMp3(p: Array[Byte], n: Long, off: Int): MediaMeta = {
      if (off + 4 > p.length) return StubDecoder.decode(p)
      val h1 = p(off + 1) & 0xff
      val h2 = p(off + 2) & 0xff
      val h3 = p(off + 3) & 0xff
      val verBits = (h1 >> 3) & 3 // 0=MPEG2.5, 2=MPEG2, 3=MPEG1
      val layerBits = (h1 >> 1) & 3 // 1 = Layer III
      if (layerBits != 1 || verBits == 1) return StubDecoder.decode(p)
      val brIdx = (h2 >> 4) & 15
      val srIdx = (h2 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return StubDecoder.decode(p)
      val kbps = if (verBits == 3) V1L3(brIdx) else V2L3(brIdx)
      val rate = verBits match {
        case 3 => Array(44100, 48000, 32000)(srIdx)
        case 2 => Array(22050, 24000, 16000)(srIdx)
        case _ => Array(11025, 12000, 8000)(srIdx)
      }
      val chans = if (((h3 >> 6) & 3) == 3) 1 else 2
      val durMs = (n - off) * 8 / kbps
      MediaMeta("audio/mpeg", n, rate, chans, durMs, rate, chans, "mp3")
    }

    def decode(p: Array[Byte]): MediaMeta = {
      val n = p.length.toLong
      if (p.length >= 24 && p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
        MediaMeta("image/png", n, u32be(p, 16), u32be(p, 20))
      else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
        MediaMeta("image/gif", n, u16le(p, 6), u16le(p, 8))
      else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
        MediaMeta("image/bmp", n, u32le(p, 18), math.abs(u32le(p, 22)))
      else if (p.length >= 28 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
        // RIFF chunk walk (not fixed offsets): fmt carries format/rate/
        // channels/byte-rate, data's size over byte-rate gives duration
        var rate = 0; var chans = 0; var fmtCode = 0; var byteRate = 0
        var dataLen = -1L
        var o = 12
        var run = true
        while (run && o + 8 <= p.length) {
          val id = new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val sz = u32le(p, o + 4).toLong & 0xffffffffL
          if (id == "fmt " && o + 24 <= p.length) {
            fmtCode = u16le(p, o + 8); chans = u16le(p, o + 10)
            rate = u32le(p, o + 12); byteRate = u32le(p, o + 16)
          } else if (id == "data") dataLen = sz
          if (sz > p.length) run = false // corrupt size: stop, keep what we have
          else o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
        val durMs = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
        MediaMeta("audio/wav", n, rate, chans, durMs, rate, chans,
          if (fmtCode == 1) "pcm" else s"wav-fmt-$fmtCode")
      }
      else if (p.length >= 26 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C')
        decodeFlac(p, n)
      else if (p.length >= 16 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p')
        decodeMp4(p, n)
      else if (p.length >= 14 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
        // ID3v2 tag prefix: 10-byte header with a syncsafe (4×7-bit) size,
        // then the first MPEG audio frame
        val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
          ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
        val off = 10 + size
        if (off + 4 <= p.length && p(off) == 0xff.toByte &&
            (p(off + 1) & 0xe0) == 0xe0) decodeMp3(p, n, off)
        else StubDecoder.decode(p)
      }
      else if (p.length >= 4 && p(0) == 0xff.toByte && (p(1) & 0xff) != 0xd8 &&
          (p(1) & 0xe0) == 0xe0)
        decodeMp3(p, n, 0)
      else if (p.length >= 4 && p(0) == 0xff.toByte && p(1) == 0xd8.toByte) {
        // JPEG: walk marker segments to the first SOF0/1/2 frame header
        var i = 2
        while (i + 9 < p.length) {
          if (p(i) != 0xff.toByte) return StubDecoder.decode(p)
          val marker = p(i + 1) & 0xff
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
            return MediaMeta("image/jpeg", n, u16be(p, i + 7), u16be(p, i + 5))
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else i += 2 + u16be(p, i + 2)
        }
        MediaMeta("image/jpeg", n, 0, 0) // truncated: type known, dims not
      }
      else StubDecoder.decode(p)
    }
  }

  /** One ISO-BMFF track's metadata (trak → tkhd/mdhd/hdlr/stbl/stsd walk):
    * `handler` is the hdlr type (vide/soun), `codec` the first stsd sample
    * entry's fourcc (avc1, hev1, mp4a, ...). Video tracks carry
    * width/height (tkhd 16.16 fixed point, truncated); audio tracks carry
    * sample_rate/channels (stsd AudioSampleEntry); `duration_ms` comes
    * from mdhd's media timescale. */
  case class TrackMeta(track_id: Long, handler: String, codec: String,
      width: Int, height: Int, sample_rate: Int, channels: Int,
      duration_ms: Long)

  /** Per-track ISO-BMFF walk: moov → trak* → tkhd (id, visual dims),
    * mdia → mdhd (timescale/duration, v0+v1), hdlr (handler type), and
    * minf → stbl → stsd's FIRST sample entry (codec fourcc; channel
    * count/sample rate for audio entries). Box walk only, bounded; empty
    * for anything that is not a parseable ISO-BMFF stream. */
  def mp4Tracks(p: Array[Byte]): Array[TrackMeta] = {
    if (p.length < 16 || !(p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'))
      return Array.empty
    def u16(o: Int) = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    def u32(o: Int): Long = ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int) = new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // find child box `name` within [from, end); -1 when absent
    def child(from: Int, end: Int, name: String): Int = {
      var c = from
      var g = 0
      while (c + 8 <= end && g < 256) {
        if (fourcc(c + 4) == name) return c
        val cs = u32(c)
        if (cs <= 8) return -1
        c += cs.toInt
        g += 1
      }
      -1
    }
    val out = scala.collection.mutable.ArrayBuffer[TrackMeta]()
    val moov = child(0, p.length, "moov")
    if (moov < 0) return Array.empty
    val moovEnd = math.min(p.length.toLong, moov + u32(moov)).toInt
    var t = moov + 8
    var guard = 0
    while (t + 8 <= moovEnd && guard < 64) {
      val ts = u32(t)
      if (ts <= 8) { t = moovEnd } else {
        if (fourcc(t + 4) == "trak") {
          val tEnd = math.min(moovEnd.toLong, t + ts).toInt
          var trackId = 0L; var w = 0; var h = 0
          var handler = ""; var codec = ""
          var rate = 0; var chans = 0; var durMs = 0L
          val tkhd = child(t + 8, tEnd, "tkhd")
          if (tkhd >= 0) {
            val ver = p(tkhd + 8) & 0xff
            if (ver == 0 && tkhd + 92 <= tEnd) {
              trackId = u32(tkhd + 20)
              w = (u32(tkhd + 84) >> 16).toInt
              h = (u32(tkhd + 88) >> 16).toInt
            } else if (ver == 1 && tkhd + 104 <= tEnd) {
              trackId = u32(tkhd + 28)
              w = (u32(tkhd + 96) >> 16).toInt
              h = (u32(tkhd + 100) >> 16).toInt
            }
          }
          val mdia = child(t + 8, tEnd, "mdia")
          if (mdia >= 0) {
            val mEnd = math.min(tEnd.toLong, mdia + u32(mdia)).toInt
            val mdhd = child(mdia + 8, mEnd, "mdhd")
            if (mdhd >= 0) {
              val ver = p(mdhd + 8) & 0xff
              if (ver == 1 && mdhd + 40 <= mEnd) {
                val mts = u32(mdhd + 28)
                if (mts > 0) durMs = u64(mdhd + 32) * 1000L / mts
              } else if (ver == 0 && mdhd + 28 <= mEnd) {
                val mts = u32(mdhd + 20)
                if (mts > 0) durMs = u32(mdhd + 24) * 1000L / mts
              }
            }
            val hdlr = child(mdia + 8, mEnd, "hdlr")
            if (hdlr >= 0 && hdlr + 20 <= mEnd) handler = fourcc(hdlr + 16).trim
            val minf = child(mdia + 8, mEnd, "minf")
            if (minf >= 0) {
              val iEnd = math.min(mEnd.toLong, minf + u32(minf)).toInt
              val stbl = child(minf + 8, iEnd, "stbl")
              if (stbl >= 0) {
                val sEnd = math.min(iEnd.toLong, stbl + u32(stbl)).toInt
                val stsd = child(stbl + 8, sEnd, "stsd")
                if (stsd >= 0 && stsd + 24 <= sEnd && u32(stsd + 12) >= 1) {
                  val e = stsd + 16
                  codec = fourcc(e + 4).trim
                  if (handler == "soun" && e + 36 <= sEnd) {
                    chans = u16(e + 24)
                    rate = (u32(e + 32) >> 16).toInt
                  }
                }
              }
            }
          }
          out += TrackMeta(trackId, handler, codec, w, h, rate, chans, durMs)
        }
        t += ts.toInt
      }
      guard += 1
    }
    out.toArray
  }

  case class TrackRow(id: Long, track_id: Long, handler: String, codec: String,
      width: Int, height: Int, sample_rate: Int, channels: Int,
      duration_ms: Long)

  /** Explode each MP4 payload into its tracks (one row per track) on the
    * partition iterator — the metadata a video training pipeline filters
    * on (codec allowlists, resolution floors, audio presence). Non-BMFF
    * payloads contribute no rows. */
  def mp4TrackRows(rows: Dataset[MediaRow]): Dataset[TrackRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        mp4Tracks(r.payload).iterator.map(t => TrackRow(r.id, t.track_id,
          t.handler, t.codec, t.width, t.height, t.sample_rate, t.channels,
          t.duration_ms))
      }
    }
  }

  /** Fixture writer: a spec-shaped ISO-BMFF track spec for [[writeMp4]].
    * `sttsRuns` ((count, delta) pairs), `sizes`, and `sync` (1-based
    * keyframe sample numbers) author the stbl sample tables when
    * non-empty. */
  case class TrackSpec(trackId: Long, handler: String, codec: String,
      width: Int = 0, height: Int = 0, sampleRate: Int = 0, channels: Int = 0,
      mediaTimescale: Int = 1000, mediaDuration: Long = 0L,
      sttsRuns: Seq[(Int, Int)] = Nil, sizes: Seq[Int] = Nil,
      sync: Seq[Int] = Nil)

  /** One sync sample (keyframe) of an ISO-BMFF track: decode time from the
    * stts run expansion in media-timescale units and milliseconds, byte
    * size from stsz. The rows a video pipeline seeks/cuts on. */
  case class KeySample(track_id: Long, sample_no: Int, time_units: Long,
      time_ms: Long, size: Long)

  /** Keyframe inventory via the sample tables (stbl → stts/stsz/stss):
    * stts runs give each sample's decode time, stsz its size, stss the
    * sync set (absent stss = every sample is sync, per ISO 14496-12).
    * Box walk only; empty for non-BMFF bytes. Capped at 4096 keyframes
    * per track (fixture/probe scale — a real lake stores these rows once
    * at ingest, not per query). */
  def mp4Keyframes(p: Array[Byte]): Array[KeySample] = try {
    mp4KeyframesUnsafe(p)
  } catch {
    // truncated sample tables (stts/stsz entry counts pointing past the
    // buffer) surface as bounds errors — honest empty, never a task kill
    case _: IndexOutOfBoundsException => Array.empty
  }

  private def mp4KeyframesUnsafe(p: Array[Byte]): Array[KeySample] = {
    if (p.length < 16 || !(p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'))
      return Array.empty
    def u32(o: Int): Long = ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def fourcc(o: Int) = new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def child(from: Int, end: Int, name: String): Int = {
      var c = from
      var g = 0
      while (c + 8 <= end && g < 256) {
        if (fourcc(c + 4) == name) return c
        val cs = u32(c)
        if (cs <= 8) return -1
        c += cs.toInt
        g += 1
      }
      -1
    }
    val out = scala.collection.mutable.ArrayBuffer[KeySample]()
    val moov = child(0, p.length, "moov")
    if (moov < 0) return Array.empty
    val moovEnd = math.min(p.length.toLong, moov + u32(moov)).toInt
    var t = moov + 8
    var guard = 0
    while (t + 8 <= moovEnd && guard < 64) {
      val ts = u32(t)
      if (ts <= 8) { t = moovEnd } else {
        if (fourcc(t + 4) == "trak") {
          val tEnd = math.min(moovEnd.toLong, t + ts).toInt
          var trackId = 0L
          val tkhd = child(t + 8, tEnd, "tkhd")
          if (tkhd >= 0) {
            val ver = p(tkhd + 8) & 0xff
            trackId = if (ver == 1) u32(tkhd + 28) else u32(tkhd + 20)
          }
          val mdia = child(t + 8, tEnd, "mdia")
          if (mdia >= 0) {
            val mEnd = math.min(tEnd.toLong, mdia + u32(mdia)).toInt
            var timescale = 0L
            val mdhd = child(mdia + 8, mEnd, "mdhd")
            if (mdhd >= 0) {
              val ver = p(mdhd + 8) & 0xff
              timescale = if (ver == 1) u32(mdhd + 28) else u32(mdhd + 20)
            }
            val minf = child(mdia + 8, mEnd, "minf")
            val stbl = if (minf < 0) -1
              else child(minf + 8, math.min(mEnd.toLong, minf + u32(minf)).toInt, "stbl")
            if (stbl >= 0 && timescale > 0) {
              val sEnd = math.min(mEnd.toLong, stbl + u32(stbl)).toInt
              val stts = child(stbl + 8, sEnd, "stts")
              val stsz = child(stbl + 8, sEnd, "stsz")
              val stss = child(stbl + 8, sEnd, "stss")
              if (stts >= 0 && stsz >= 0) {
                // stts run expansion: per-sample decode time
                val nRuns = u32(stts + 12).toInt
                val runs = Array.tabulate(nRuns)(i =>
                  (u32(stts + 16 + i * 8), u32(stts + 20 + i * 8)))
                val nSamples = runs.foldLeft(0L)(_ + _._1)
                val constSize = u32(stsz + 12)
                val szCount = u32(stsz + 16)
                def sizeOf(no1: Int): Long =
                  if (constSize != 0) constSize
                  else if (no1 <= szCount) u32(stsz + 20 + (no1 - 1) * 4)
                  else 0L
                def timeOf(no1: Int): Long = {
                  var left = no1 - 1L
                  var acc = 0L
                  var r = 0
                  while (r < runs.length) {
                    val (c, dl) = runs(r)
                    if (left < c) return acc + left * dl
                    acc += c * dl
                    left -= c
                    r += 1
                  }
                  acc
                }
                val keys: Seq[Int] =
                  if (stss >= 0) {
                    val n = math.min(u32(stss + 12), 4096L).toInt
                    (0 until n).map(i => u32(stss + 16 + i * 4).toInt)
                  } else (1 to math.min(nSamples, 4096L).toInt)
                keys.foreach { no =>
                  if (no >= 1 && no <= nSamples) {
                    val tu = timeOf(no)
                    out += KeySample(trackId, no, tu, tu * 1000L / timescale,
                      sizeOf(no))
                  }
                }
              }
            }
          }
        }
        t += ts.toInt
      }
      guard += 1
    }
    out.toArray
  }

  case class KeyframeRow(id: Long, track_id: Long, sample_no: Int,
      time_units: Long, time_ms: Long, size: Long)

  /** Explode each payload's keyframes (one row per sync sample) on the
    * partition iterator — the seek index a video pipeline cuts clips on. */
  def mp4KeyframeRows(rows: Dataset[MediaRow]): Dataset[KeyframeRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        mp4Keyframes(r.payload).iterator.map(k => KeyframeRow(r.id,
          k.track_id, k.sample_no, k.time_units, k.time_ms, k.size))
      }
    }
  }

  /** Fixture writer: ftyp + moov { mvhd, trak* { tkhd, mdia { mdhd, hdlr,
    * minf { stbl { stsd { visual|audio sample entry } } } } } } — the
    * authored-box twin of [[mp4Tracks]]. tkhd/mdhd use version 0 for even
    * track ids and version 1 for odd ones, so both layouts stay covered. */
  def writeMp4(timescale: Int, duration: Long, tracks: Seq[TrackSpec]): Array[Byte] = {
    def box(name: String, content: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](8 + content.length)
      val sz = b.length
      b(0) = (sz >> 24).toByte; b(1) = (sz >> 16).toByte
      b(2) = (sz >> 8).toByte; b(3) = sz.toByte
      name.getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(b, 4)
      content.copyToArray(b, 8)
      b
    }
    class W {
      val bos = new java.io.ByteArrayOutputStream()
      def u8(v: Int): W = { bos.write(v & 0xff); this }
      def u16(v: Int): W = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff); this }
      def u32(v: Long): W = { var i = 3; while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }; this }
      def u64(v: Long): W = { u32(v >>> 32); u32(v & 0xffffffffL) }
      def tag(s: String): W = { bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); this }
      def zeros(n: Int): W = { var i = 0; while (i < n) { bos.write(0); i += 1 }; this }
      def bytes: Array[Byte] = bos.toByteArray
    }
    def mvhd: Array[Byte] = {
      val w = new W
      w.u8(0).zeros(3).u32(0).u32(0).u32(timescale).u32(duration)
      w.u32(0x00010000).u16(0x0100).zeros(10)
      w.u32(0x00010000).u32(0).u32(0).u32(0).u32(0x00010000).u32(0)
      w.u32(0).u32(0).u32(0x40000000)
      w.zeros(24).u32(tracks.map(_.trackId).foldLeft(0L)(math.max) + 1)
      box("mvhd", w.bytes)
    }
    def trak(ts: TrackSpec): Array[Byte] = {
      val v1 = ts.trackId % 2 == 1
      val tkhd = {
        val w = new W
        if (v1) w.u8(1).zeros(3).u64(0).u64(0).u32(ts.trackId).u32(0).u64(0)
        else w.u8(0).zeros(3).u32(0).u32(0).u32(ts.trackId).u32(0).u32(0)
        w.zeros(8).u16(0).u16(0).u16(0).u16(0)
        w.u32(0x00010000).u32(0).u32(0).u32(0).u32(0x00010000).u32(0)
        w.u32(0).u32(0).u32(0x40000000)
        w.u32(ts.width.toLong << 16).u32(ts.height.toLong << 16)
        box("tkhd", w.bytes)
      }
      val mdhd = {
        val w = new W
        if (v1) w.u8(1).zeros(3).u64(0).u64(0).u32(ts.mediaTimescale).u64(ts.mediaDuration)
        else w.u8(0).zeros(3).u32(0).u32(0).u32(ts.mediaTimescale).u32(ts.mediaDuration)
        w.u16(0x55c4).u16(0) // language 'und', pre_defined
        box("mdhd", w.bytes)
      }
      val hdlr = {
        val w = new W
        w.u8(0).zeros(3).u32(0).tag(ts.handler).zeros(12).u8(0)
        box("hdlr", w.bytes)
      }
      val entry: Array[Byte] =
        if (ts.handler == "soun") {
          val w = new W
          w.zeros(6).u16(1) // reserved + data_reference_index
          w.zeros(8).u16(ts.channels).u16(16).u16(0).u16(0)
          w.u32(ts.sampleRate.toLong << 16)
          box(ts.codec, w.bytes)
        } else {
          val w = new W
          w.zeros(6).u16(1)
          w.u16(0).u16(0).zeros(12)
          w.u16(ts.width).u16(ts.height)
          w.u32(0x00480000).u32(0x00480000).u32(0).u16(1)
          w.zeros(32).u16(24).u16(0xffff)
          box(ts.codec, w.bytes)
        }
      val stsd = {
        val w = new W
        w.u8(0).zeros(3).u32(1)
        box("stsd", w.bytes ++ entry)
      }
      val sampleBoxes: Array[Byte] =
        if (ts.sttsRuns.isEmpty) Array.empty
        else {
          val stts = {
            val w = new W
            w.u8(0).zeros(3).u32(ts.sttsRuns.length)
            ts.sttsRuns.foreach { case (c, dl) => w.u32(c); w.u32(dl) }
            box("stts", w.bytes)
          }
          val stsz = {
            val w = new W
            w.u8(0).zeros(3).u32(0).u32(ts.sizes.length)
            ts.sizes.foreach(w.u32(_))
            box("stsz", w.bytes)
          }
          val stss =
            if (ts.sync.isEmpty) Array.empty[Byte]
            else {
              val w = new W
              w.u8(0).zeros(3).u32(ts.sync.length)
              ts.sync.foreach(w.u32(_))
              box("stss", w.bytes)
            }
          stts ++ stsz ++ stss
        }
      val stbl = box("stbl", stsd ++ sampleBoxes)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val ftyp = {
      val w = new W
      w.tag("mp42").u32(0).tag("isom")
      box("ftyp", w.bytes)
    }
    val moov = box("moov", mvhd ++ tracks.flatMap(trak).toArray)
    ftyp ++ moov
  }

  /** Fixture writer: a minimal spec-shaped ISO-BMFF stream — ftyp (major
    * brand mp42) + moov/mvhd with the given timescale and duration, in the
    * requested mvhd version (0: 32-bit duration, 1: 64-bit). 136 bytes for
    * v0, 148 for v1. Test/gate authoring only. */
  def writeMp4Header(timescale: Int, duration: Long, version: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { bos.write((v >> 24).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def tag(s: String): Unit = bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u32(20); tag("ftyp"); tag("mp42"); u32(0); tag("isom")
    val mvhdSize = if (version == 0) 108 else 120
    u32(8 + mvhdSize); tag("moov")
    u32(mvhdSize); tag("mvhd")
    bos.write(version); bos.write(0); bos.write(0); bos.write(0) // ver + flags
    if (version == 0) { u32(0); u32(0); u32(timescale); u32(duration) }
    else { u64(0); u64(0); u32(timescale); u64(duration) }
    u32(0x00010000); bos.write(0x01); bos.write(0x00) // rate, volume
    (0 until 10).foreach(_ => bos.write(0))           // reserved
    // identity matrix (fixed-point) + 24 predefined zero bytes + next track
    u32(0x00010000); u32(0); u32(0); u32(0); u32(0x00010000); u32(0)
    u32(0); u32(0); u32(0x40000000)
    (0 until 24).foreach(_ => bos.write(0))
    u32(2)
    bos.toByteArray
  }

  /** Fixture writer: FLAC magic + a lone STREAMINFO block (42 bytes) with
    * the given sample rate, channel count, and total samples. */
  def writeFlacHeader(sampleRate: Int, channels: Int, totalSamples: Long,
      bitsPerSample: Int = 16): Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte // last-block flag | type 0 (STREAMINFO)
    b(5) = 0; b(6) = 0; b(7) = 34
    b(8) = 0x10; b(9) = 0x00; b(10) = 0x10; b(11) = 0x00 // block sizes 4096
    // min/max frame size (12..17) left 0 = unknown
    b(18) = (sampleRate >> 12).toByte
    b(19) = ((sampleRate >> 4) & 0xff).toByte
    b(20) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    b(21) = ((((bitsPerSample - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf)).toByte
    b(22) = ((totalSamples >> 24) & 0xff).toByte
    b(23) = ((totalSamples >> 16) & 0xff).toByte
    b(24) = ((totalSamples >> 8) & 0xff).toByte
    b(25) = (totalSamples & 0xff).toByte
    b
  }

  /** Deterministic MP3 fixture: ID3v2 header with `id3Pad` bytes of tag
    * body, then one Layer-III frame header (MPEG1 when `v1`, else MPEG2)
    * followed by `audioBytes - 4` filler bytes — enough surface for the
    * CBR headers-only parse (bitrate/rate/channels/duration). */
  def writeMp3(id3Pad: Int, v1: Boolean, brIdx: Int, srIdx: Int,
      mono: Boolean, audioBytes: Int): Array[Byte] = {
    require(id3Pad < 128 && audioBytes >= 4, "fixture bounds")
    val b = new Array[Byte](10 + id3Pad + audioBytes)
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 3 // ID3v2.3
    b(9) = id3Pad.toByte // syncsafe size, fits one 7-bit byte
    val off = 10 + id3Pad
    b(off) = 0xff.toByte
    b(off + 1) = (0xe0 | ((if (v1) 3 else 2) << 3) | (1 << 1) | 1).toByte
    b(off + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
    b(off + 3) = (if (mono) 3 << 6 else 0).toByte
    java.util.Arrays.fill(b, off + 4, b.length, 0xaa.toByte)
    b
  }

  /** Wrap raw binary payloads (e.g. from Spark's binaryFile source) with
    * decoded metadata. */
  def withMeta(spark: SparkSession, payloads: DataFrame,
      idCol: String = "id", payloadCol: String = "payload",
      decoder: MediaDecoder = HeaderDecoder): Dataset[MediaRow] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => MediaRow(id, p, decoder.decode(p)) }
  }

  /** Batch feature extraction over partition iterators: 16-bin byte
    * histogram per payload (the stub "feature"); the partition-iterator
    * shape is the point — a real extractor would batch payloads to a model
    * the same way. Partition count controls batch size at scale. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) { hist((r.payload(i) & 0xff) >> 4) += 1; i += 1 }
        MediaFeatures(r.id, r.meta.width, r.meta.height, hist)
      }
    }
  }

  case class PixelStats(id: Long, width: Int, height: Int, channels: Int,
      n_pixels: Long, sum_pixels: Long, decoded: Boolean)

  /** REAL pixel decode for PNG payloads via [[PngCodec]] (JDK zlib — no
    * codec library needed): per-image dimensions, channel count, and pixel
    * sum. Non-PNG or unsupported payloads report `decoded = false` with
    * header-only dimensions, so mixed corpora keep one schema. Runs on the
    * partition iterator like every other multimodal stage. */
  def pngPixelStats(rows: Dataset[MediaRow]): Dataset[PixelStats] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val img = PngCodec.decode(r.payload)
        if (img == null)
          PixelStats(r.id, r.meta.width, r.meta.height, 0, 0L, 0L, decoded = false)
        else {
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
          PixelStats(r.id, img.width, img.height, img.channels,
            img.pixels.length.toLong, sum, decoded = true)
        }
      }
    }
  }

  case class Frame(id: Long, frame_no: Int, frame_payload: Array[Byte])

  /** Frame sampling for video-shaped payloads: emit `n` evenly spaced
    * byte-range "frames" per payload (the decode being stubbed, a frame is
    * the corresponding payload slice — a real decoder would seek keyframes
    * behind the same explode shape). One row in, n rows out, streamed via
    * the partition iterator so a large payload never amplifies memory by
    * more than one row's frames. */
  def frameSample(rows: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val len = r.payload.length
        if (len == 0 || n <= 0) Iterator.empty
        else (0 until n).iterator.map { i =>
          val from = (len.toLong * i / n).toInt
          val until = math.max(from + 1, (len.toLong * (i + 1) / n).toInt)
          Frame(r.id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  /** Resize stub: recompute metadata for a target box, keeping aspect ratio —
    * pure arithmetic on the typed metadata (a real implementation would remap
    * payload bytes). */
  def resizeMeta(rows: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(r.meta.width, r.meta.height))
      r.copy(meta = r.meta.copy(
        width = math.max(1, (r.meta.width * scale).toInt),
        height = math.max(1, (r.meta.height * scale).toInt)))
    }
  }
}
