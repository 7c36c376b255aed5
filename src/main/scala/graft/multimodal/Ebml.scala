package graft.multimodal

/** Matroska / WebM container walk over EBML (RFC 8794 + the public
  * Matroska element registry) — the video container crawled media
  * actually ships in next to MP4 (reference behavior: gis-etl's media
  * columns are opaque blobs; this is extension surface mirroring
  * [[Multimodal.mp4Tracks]] for the EBML family).
  *
  * Parsed surface: EBML header DocType; Segment → Info (TimestampScale,
  * Duration) and Tracks → TrackEntry (TrackNumber, TrackType, CodecID,
  * Video PixelWidth/PixelHeight, Audio SamplingFrequency/Channels).
  * Box-walk only — no codec payload decode; a per-blob kernel with the
  * crawl posture (corrupt tails yield the tracks parsed so far, never an
  * exception). Unknown-size master elements (streamed Segments) extend
  * to the end of the enclosing scope per RFC 8794 §6.2. */
object Ebml extends Serializable {

  final case class MkvTrack(track_number: Long, track_type: String,
      codec: String, width: Int, height: Int, sample_rate: Double,
      channels: Int)

  final case class MkvMeta(doctype: String, timescale_ns: Long,
      duration_ms: Double, n_tracks: Int)

  // Matroska element IDs (full encoded form, marker bit included)
  private val EBML_HEADER = 0x1A45DFA3L
  private val DOCTYPE = 0x4282L
  private val SEGMENT = 0x18538067L
  private val INFO = 0x1549A966L
  private val TIMESTAMP_SCALE = 0x2AD7B1L
  private val DURATION = 0x4489L
  private val TRACKS = 0x1654AE6BL
  private val TRACK_ENTRY = 0xAEL
  private val TRACK_NUMBER = 0xD7L
  private val TRACK_TYPE = 0x83L
  private val CODEC_ID = 0x86L
  private val VIDEO = 0xE0L
  private val PIXEL_WIDTH = 0xB0L
  private val PIXEL_HEIGHT = 0xBAL
  private val AUDIO = 0xE1L
  private val SAMPLING_FREQ = 0xB5L
  private val CHANNELS = 0x9FL

  private final class In(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    /** Element ID: vint WITH the marker bit kept (RFC 8794 §5). */
    def elementId(): Long = {
      val first = b(pos) & 0xff
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (len < 1 || len > 4 || pos + len > end)
        throw new IllegalArgumentException("bad id")
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += len
      v
    }
    /** Data size: vint with the marker bit cleared; -1 = unknown size. */
    def vintSize(): Long = {
      val first = b(pos) & 0xff
      if (first == 0) throw new IllegalArgumentException("bad size")
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (len < 1 || len > 8 || pos + len > end)
        throw new IllegalArgumentException("bad size")
      var v = (first & (0xff >>> len)).toLong
      var allOnes = (first & (0xff >>> len)) == (0xff >>> len)
      var i = 1
      while (i < len) {
        val byte = b(pos + i) & 0xff
        v = (v << 8) | byte
        allOnes &&= byte == 0xff
        i += 1
      }
      pos += len
      if (allOnes) -1L else v
    }
  }

  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    len match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt)
      case 8 => java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
      case 0 => 0.0
      case _ => throw new IllegalArgumentException(s"float len $len")
    }

  private def strAt(b: Array[Byte], off: Int, len: Int): String = {
    var e = off + len // trim trailing NULs per spec
    while (e > off && b(e - 1) == 0) e -= 1
    new String(b, off, e - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Walk one master scope, calling `f(id, dataStart, dataLen)` per child;
    * unknown-size children (master elements only in practice) extend to
    * the scope end. Returns silently at the first malformed element. */
  private def walk(b: Array[Byte], start: Int, end: Int)
      (f: (Long, Int, Int) => Unit): Unit = {
    val in = new In(b, start, end)
    try {
      while (in.hasMore) {
        val id = in.elementId()
        val size = in.vintSize()
        val dataStart = in.pos
        val dataLen =
          if (size < 0) end - dataStart
          else if (dataStart + size > end) return
          else size.toInt
        f(id, dataStart, dataLen)
        in.pos = dataStart + dataLen
      }
    } catch { case _: Exception => () }
  }

  private def parse(p: Array[Byte])
      : (MkvMeta, Array[MkvTrack]) = {
    if (p == null || p.length < 8) return (null, Array.empty)
    // must open with the EBML header element
    if ((uintAt(p, 0, 4) & 0xffffffffL) != EBML_HEADER)
      return (null, Array.empty)
    var doctype = "matroska"
    var timescale = 1000000L // default per spec: 1 ms
    var durationTicks = 0.0
    val tracks = scala.collection.mutable.ArrayBuffer.empty[MkvTrack]
    walk(p, 0, p.length) { (id, off, len) =>
      if (id == EBML_HEADER) {
        walk(p, off, off + len) { (hid, hoff, hlen) =>
          if (hid == DOCTYPE) doctype = strAt(p, hoff, hlen)
        }
      } else if (id == SEGMENT) {
        walk(p, off, off + len) { (sid, soff, slen) =>
          if (sid == INFO) {
            walk(p, soff, soff + slen) { (iid, ioff, ilen) =>
              if (iid == TIMESTAMP_SCALE) timescale = uintAt(p, ioff, ilen)
              else if (iid == DURATION) durationTicks = floatAt(p, ioff, ilen)
            }
          } else if (sid == TRACKS) {
            walk(p, soff, soff + slen) { (tid, toff, tlen) =>
              if (tid == TRACK_ENTRY) {
                var num = 0L
                var tpe = 0L
                var codec = ""
                var w = 0
                var h = 0
                var rate = 0.0
                var ch = 0
                walk(p, toff, toff + tlen) { (eid, eoff, elen) =>
                  if (eid == TRACK_NUMBER) num = uintAt(p, eoff, elen)
                  else if (eid == TRACK_TYPE) tpe = uintAt(p, eoff, elen)
                  else if (eid == CODEC_ID) codec = strAt(p, eoff, elen)
                  else if (eid == VIDEO) {
                    walk(p, eoff, eoff + elen) { (vid, voff, vlen) =>
                      if (vid == PIXEL_WIDTH) w = uintAt(p, voff, vlen).toInt
                      else if (vid == PIXEL_HEIGHT) h = uintAt(p, voff, vlen).toInt
                    }
                  } else if (eid == AUDIO) {
                    walk(p, eoff, eoff + elen) { (aid, aoff, alen) =>
                      if (aid == SAMPLING_FREQ) rate = floatAt(p, aoff, alen)
                      else if (aid == CHANNELS) ch = uintAt(p, aoff, alen).toInt
                    }
                  }
                }
                val typeName = tpe match {
                  case 1 => "video"
                  case 2 => "audio"
                  case 17 => "subtitle"
                  case t => s"type$t"
                }
                tracks += MkvTrack(num, typeName, codec, w, h, rate, ch)
              }
            }
          }
        }
      }
    }
    val durMs = durationTicks * timescale / 1e6
    (MkvMeta(doctype, timescale, durMs, tracks.length), tracks.toArray)
  }

  /** Segment/track metadata; null for non-EBML input. */
  def mkvMeta(p: Array[Byte]): MkvMeta =
    try parse(p)._1 catch { case _: Exception => null }

  /** All TrackEntry rows; empty for non-EBML / corrupt input. */
  def mkvTracks(p: Array[Byte]): Array[MkvTrack] =
    try parse(p)._2 catch { case _: Exception => Array.empty }

  /** One output row per TrackEntry, segment metadata joined in. */
  final case class MkvRow(id: Long, doctype: String, track_number: Long,
      track_type: String, codec: String, width: Int, height: Int,
      sample_rate: Double, channels: Int, duration_ms: Double)

  /** Explode (id, payload) into per-track rows on the partition iterator
    * — [[Multimodal.mp4TrackRows]]'s EBML twin. Non-EBML payloads
    * contribute no rows. */
  def mkvTrackRows(rows: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : org.apache.spark.sql.Dataset[MkvRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val meta = mkvMeta(payload)
        if (meta == null) Iterator.empty
        else mkvTracks(payload).iterator.map(t =>
          MkvRow(id, meta.doctype, t.track_number, t.track_type, t.codec,
            t.width, t.height, t.sample_rate, t.channels, meta.duration_ms))
      }
    }
  }

  // ---- fixture writer ----------------------------------------------------

  final case class MkvTrackSpec(number: Long, isVideo: Boolean,
      codec: String, width: Int = 0, height: Int = 0,
      sampleRate: Double = 0, channels: Int = 0)

  private def encodeId(id: Long): Array[Byte] = {
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def encodeSize(n: Long): Array[Byte] = {
    // 4-byte form everywhere: marker 0x10 in the top byte
    require(n < (1L << 28) - 1, s"fixture too big: $n")
    Array(((n >> 24) | 0x10).toByte, ((n >> 16) & 0xff).toByte,
      ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
  }

  private def el(id: Long, data: Array[Byte]): Array[Byte] =
    encodeId(id) ++ encodeSize(data.length) ++ data

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def floatBytes(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
  }

  /** From-spec authored Matroska fixture: EBML header + Segment with
    * Info (timescale, duration ticks) and one TrackEntry per spec.
    * `unknownSegmentSize` exercises the streamed-Segment path. */
  def writeMkv(doctype: String, timescaleNs: Long, durationTicks: Double,
      tracks: Seq[MkvTrackSpec],
      unknownSegmentSize: Boolean = false): Array[Byte] = {
    val header = el(EBML_HEADER, el(DOCTYPE,
      doctype.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val info = el(INFO,
      el(TIMESTAMP_SCALE, uintBytes(timescaleNs)) ++
        el(DURATION, floatBytes(durationTicks)))
    val trackEls = tracks.map { t =>
      val base = el(TRACK_NUMBER, uintBytes(t.number)) ++
        el(TRACK_TYPE, uintBytes(if (t.isVideo) 1 else 2)) ++
        el(CODEC_ID, t.codec.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val media =
        if (t.isVideo)
          el(VIDEO, el(PIXEL_WIDTH, uintBytes(t.width)) ++
            el(PIXEL_HEIGHT, uintBytes(t.height)))
        else
          el(AUDIO, el(SAMPLING_FREQ, floatBytes(t.sampleRate)) ++
            el(CHANNELS, uintBytes(t.channels)))
      el(TRACK_ENTRY, base ++ media)
    }
    val segBody = info ++ el(TRACKS, trackEls.flatten.toArray)
    val segment =
      if (unknownSegmentSize)
        encodeId(SEGMENT) ++ Array(0x1f.toByte, 0xff.toByte, 0xff.toByte,
          0xff.toByte) ++ segBody
      else el(SEGMENT, segBody)
    header ++ segment
  }
}
