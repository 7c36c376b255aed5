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
    val df = Seq((1L, Map("k" -> 1L))).toDF("id", "m")
    intercept[IllegalArgumentException] {
      ArrowIpc.write(df, java.nio.file.Files
        .createTempDirectory("arrowspec3").toString)
    }
    // maps fail even when buried inside a list element
    val df2 = Seq((1L, Seq(Map("k" -> 1L)))).toDF("id", "xs")
    intercept[IllegalArgumentException] {
      ArrowIpc.write(df2, java.nio.file.Files
        .createTempDirectory("arrowspec3b").toString)
    }
  }

  test("nested struct / string-list / decimal roundtrip: chat shape with " +
    "null contents, empty transcripts, and null rows") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("arrowspec5").toString
    val base = Seq(
      (1L, Seq(("user", "hi"), ("assistant", "hello")), "12.34",
        Seq("a", "b")),
      (2L, Seq(("user", null.asInstanceOf[String])), "0.01", Seq("c")),
      (3L, Seq.empty[(String, String)], "99999.99", Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[(String, String)]], null, null))
      .toDF("id", "msgs0", "dec0", "tags")
      .select(col("id"),
        col("msgs0").cast("array<struct<role:string,content:string>>")
          .as("messages"),
        col("dec0").cast("decimal(12,2)").as("price"),
        col("tags"))
    ArrowIpc.write(base.repartition(2), dir)
    val back = ArrowIpc.read(spark, s"$dir/*.arrows").drop("path")
    assert(back.schema("messages").dataType ==
      base.schema("messages").dataType)
    assert(back.schema("price").dataType == base.schema("price").dataType)
    val got = back.collect().map(r => (r.getLong(0), r.get(1), r.get(2),
      r.get(3))).sortBy(_._1)
    val want = base.collect().map(r => (r.getLong(0), r.get(1), r.get(2),
      r.get(3))).sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("timestamp/date/array columns roundtrip exactly, nulls included") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec5")
      .toString + "/a"
    val df = (0 until 40).map { i =>
      (i.toLong,
        if (i % 5 == 0) None
        else Some(java.sql.Timestamp.valueOf(f"2024-03-0${i % 9 + 1}%d " +
          f"0${i % 9}%d:15:${i % 60}%02d.${i * 1237 % 1000000}%06d")),
        if (i % 7 == 0) None
        else Some(java.sql.Date.valueOf(f"2024-0${i % 9 + 1}%d-1${i % 9}%d")),
        if (i % 11 == 0) None else Some(Seq(i * 0.5f, -i * 0.25f)),
        Seq(i.toLong, i * 2L))
    }.toDF("id", "ts", "dt", "vecf", "vecl")
    ArrowIpc.write(df.repartition(2), dir, batchRows = 7)
    val back = ArrowIpc.read(spark, s"$dir/*.arrows").drop("path")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(b.length == 40)
    a.zip(b).foreach { case (x, y) =>
      assert(x.get(1) == y.get(1), s"ts mismatch at id ${x.getLong(0)}")
      assert(x.get(2) == y.get(2), s"date mismatch at id ${x.getLong(0)}")
      assert(Option(x.getSeq[Float](3)).map(_.toSeq) ==
        Option(y.getSeq[Float](3)).map(_.toSeq), s"vecf at ${x.getLong(0)}")
      assert(x.getSeq[Long](4).toSeq == y.getSeq[Long](4).toSeq)
    }
  }

  test("a file whose schema differs from the plan schema yields no rows " +
    "instead of corrupt ones") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec6")
      .toString + "/a"
    ArrowIpc.write(sample.coalesce(1), dir)
    // plant a second stream with a DIFFERENT schema into the same glob;
    // name it so binaryFile lists it first (schema probe may hit either)
    val alien = Seq((1.5, "x")).toDF("score", "name").coalesce(1)
    val alienDir = java.nio.file.Files.createTempDirectory("arrowspec6b")
      .toString + "/b"
    ArrowIpc.write(alien, alienDir)
    val alienFile = new java.io.File(alienDir).listFiles()
      .filter(_.getName.endsWith(".arrows")).head
    java.nio.file.Files.copy(alienFile.toPath,
      java.nio.file.Paths.get(dir, "zz-alien.arrows"))
    val back = ArrowIpc.read(spark, s"$dir/*.arrows")
    // exactly one of the two schemas was chosen; only its file's rows ride
    val n = back.count()
    assert(n == 50 || n == 1, s"mixed-schema read leaked rows: $n")
    assert(back.na.drop("all", back.columns.filter(_ != "path")).count() == n,
      "schema-mismatched file produced all-null or misaligned rows")
  }

  test("empty glob fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("arrowspec4").toString
    intercept[IllegalArgumentException] {
      ArrowIpc.read(spark, s"$dir/*.arrows")
    }
  }
}
