package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery (schema, batching, partitioning, UDF signature)
  * is real; the media decode itself is STUBBED deterministically — the
  * decode/resample libraries are not in this container, so `decodeStub`
  * derives plausible metadata from the bytes (documented; swap in a real
  * decoder behind the same signature in production). This mirrors running
  * `mapInPandas` batches in a Python pipeline: here the batch unit is the
  * partition iterator, which Spark feeds without materializing the whole
  * partition.
  */
object Multimodal {

  case class MediaMeta(mime: String, n_bytes: Long, width: Int, height: Int)
  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, width: Int, height: Int, histogram: Array[Long])

  /** STUB decode: deterministic fake dimensions from the payload hash.
    * Replace with a real image/audio decoder (same signature) when the
    * codec libraries are available. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(h) % 960).toInt
    val ht = 64 + (math.abs(h / 7) % 540).toInt
    MediaMeta("application/octet-stream", payload.length.toLong, w, ht)
  }

  /** Wrap raw binary payloads (e.g. from Spark's binaryFile source) with
    * decoded metadata. */
  def withMeta(spark: SparkSession, payloads: DataFrame,
      idCol: String = "id", payloadCol: String = "payload"): Dataset[MediaRow] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => MediaRow(id, p, decodeStub(p)) }
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
