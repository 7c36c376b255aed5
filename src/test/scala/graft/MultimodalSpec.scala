package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def payloads() =
    (0 until 40).map(i => (i.toLong, Array.fill[Byte](100 + i * 7)((i % 251).toByte)))
      .toDF("id", "payload")

  test("withMeta attaches deterministic decoded metadata") {
    val rows = Multimodal.withMeta(spark, payloads())
    val collected = rows.collect()
    assert(collected.length == 40)
    assert(collected.forall(r => r.meta.n_bytes == r.payload.length))
    assert(collected.forall(r => r.meta.width >= 64 && r.meta.height >= 64))
    // deterministic: same payload → same meta
    val again = Multimodal.withMeta(spark, payloads()).collect()
    assert(collected.map(_.meta).toSeq == again.map(_.meta).toSeq)
  }

  test("extractFeatures: partition-batched histograms sum to payload length") {
    val feats = Multimodal.extractFeatures(
      Multimodal.withMeta(spark, payloads()).repartition(3))
    val ok = feats.collect().forall(f => f.histogram.sum == 100 + f.id * 7)
    assert(ok)
  }

  test("frameSample: n frames per payload, bytes partition the payload") {
    val frames = Multimodal.frameSample(Multimodal.withMeta(spark, payloads()), 4)
    val byId = frames.collect().groupBy(_.id)
    assert(byId.size == 40)
    byId.foreach { case (id, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.map(_.frame_payload.length).sum == 100 + id * 7)
    }
  }

  test("resizeMeta caps dimensions preserving aspect") {
    val resized = Multimodal.resizeMeta(Multimodal.withMeta(spark, payloads()), 128)
    assert(resized.collect().forall(r =>
      r.meta.width <= 128 && r.meta.height <= 128 && r.meta.width >= 1))
  }
}
