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

  case class MediaMeta(mime: String, n_bytes: Long, width: Int, height: Int)
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

    def decode(p: Array[Byte]): MediaMeta = {
      val n = p.length.toLong
      if (p.length >= 24 && p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
        MediaMeta("image/png", n, u32be(p, 16), u32be(p, 20))
      else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
        MediaMeta("image/gif", n, u16le(p, 6), u16le(p, 8))
      else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
        MediaMeta("image/bmp", n, u32le(p, 18), math.abs(u32le(p, 22)))
      else if (p.length >= 28 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        MediaMeta("audio/wav", n, u32le(p, 24) /* sample rate */, u16le(p, 22) /* channels */)
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
