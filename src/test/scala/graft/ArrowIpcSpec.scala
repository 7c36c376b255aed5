package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowIpc

/** Arrow IPC interchange: typed roundtrip with nulls, per-partition file
  * layout, corrupt-tail prefix recovery, and driver-side type fail-fast. */
class ArrowIpcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample = (0 until 50).map { i =>
    (i.toLong, if (i % 7 == 0) None else Some(s"s$i"), i * 0.5,
      i % 2 == 0, Array[Byte](i.toByte, 1, 2))
  }.toDF("id", "name", "score", "flag", "blob")

  test("write/read: typed roundtrip with nulls, one file per partition") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec")
      .toString + "/a"
    ArrowIpc.write(sample.repartition(3), dir, batchRows = 16)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(files.length == 3)
    val back = ArrowIpc.read(spark, s"$dir/*.arrows").drop("path")
    assert(back.count() == 50)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    val agg = back.agg(sum("id"), sum("score"),
      count(when(col("name").isNull, 1)),
      sum(when(col("flag"), 1).otherwise(0)),
      sum(length(col("blob")))).collect().head
    assert(agg.getLong(0) == 1225L && agg.getDouble(1) == 612.5)
    assert(agg.getLong(2) == 8L && agg.getLong(3) == 25L)
    assert(agg.getLong(4) == 150L)
    // byte-exact blob content, not just lengths
    val b7 = back.filter(col("id") === 7L).select("blob")
      .collect().head.getAs[Array[Byte]](0)
    assert(b7.toSeq == Seq[Byte](7, 1, 2))
  }

  test("corrupt tail yields the decoded prefix, never a throw") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec2")
      .toString + "/a"
    ArrowIpc.write(sample.coalesce(1), dir, batchRows = 10)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrows")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // truncate mid-stream: keep ~60% — some whole batches survive
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length * 6 / 10))
    val n = ArrowIpc.read(spark, s"$dir/*.arrows").count()
    assert(n > 0 && n < 50, s"expected a partial prefix, got $n")
    assert(n % 10 == 0, s"only whole batches can survive: $n")
  }

  test("unsupported Catalyst types fail fast on the driver") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    intercept[IllegalArgumentException] {
      ArrowIpc.write(df, java.nio.file.Files
        .createTempDirectory("arrowspec3").toString)
    }
  }

  test("empty glob fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec4").toString
    intercept[IllegalArgumentException] {
      ArrowIpc.read(spark, s"$dir/*.arrows")
    }
  }
}
