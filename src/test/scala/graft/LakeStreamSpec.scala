package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** The graft-lake streaming SOURCE: append commits stream exactly once
  * across restarts (version offsets through the checkpoint), rewrite
  * commits skip silently, change commits fail loudly unless opted out,
  * and schema-evolved history null-fills. */
class LakeStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base(): String =
    java.nio.file.Files.createTempDirectory("lakestream").toString

  /** Drain the lake stream into a parquet sink with AvailableNow and
    * wait; returns the sink path. */
  private def drain(dir: String, root: String,
      options: Map[String, String] = Map.empty): String = {
    val sink = s"$root/sink"
    val q = options.foldLeft(
        spark.readStream.format("graft-lake"))((r, kv) =>
        r.option(kv._1, kv._2))
      .load(dir)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sink
  }

  test("appends stream exactly once across restarts; optimize is " +
    "skipped silently") {
    val root = base()
    val dir = root + "/t"
    TableLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    TableLog.append(Seq((3L, "c")).toDF("id", "s"), dir)
    val sink = drain(dir, root)
    def ids() = spark.read.parquet(sink).select("id")
      .as[Long].collect().sorted.toSeq
    assert(ids() == Seq(1L, 2L, 3L))
    // compaction between appends must not re-emit rows
    TableLog.optimize(spark, dir, maxRows = 10)
    TableLog.append(Seq((4L, "d")).toDF("id", "s"), dir)
    drain(dir, root) // same checkpoint: resumes from version offset
    assert(ids() == Seq(1L, 2L, 3L, 4L), "restart must emit ONLY v4")
  }

  test("nested columns (array<struct>, map) stream bit-equal to the " +
    "batch read — the chat-shaped training table") {
    val root = base()
    val dir = root + "/t"
    val df = spark.range(500).selectExpr(
      "id as k",
      "array(named_struct('role', 'user', 'content', concat('q', id))," +
        " named_struct('role', 'assistant', 'content', concat('a', id)))" +
        " as msgs",
      "map('lang', concat('l', id % 3)) as meta")
    TableLog.append(df, dir)
    TableLog.append(
      spark.range(500L, 700L).selectExpr(
        "id as k",
        "array(named_struct('role', 'user', 'content', concat('q', id)))" +
          " as msgs",
        "cast(null as map<string,string>) as meta"),
      dir)
    val sink = drain(dir, root)
    val got = spark.read.parquet(sink)
      .selectExpr("k", "msgs[0].content", "size(msgs)", "meta['lang']")
      .orderBy("k").collect()
    val want = TableLog.read(spark, dir)
      .selectExpr("k", "msgs[0].content", "size(msgs)", "meta['lang']")
      .orderBy("k").collect()
    assert(got.length == 700 && got.toSeq == want.toSeq)
  }

  test("change commits fail loudly; skipChangeCommits streams around " +
    "them") {
    val root = base()
    val dir = root + "/t"
    TableLog.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), dir)
    TableLog.deleteVectored(spark, dir, "id = 1")
    val ex = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { drain(dir, root) }
    assert(ex.getMessage.contains("change commit") ||
      Option(ex.getCause).exists(_.getMessage.contains("change commit")))
    // opted out: the delete is skipped (appends-only view), later
    // appends still arrive
    TableLog.append(Seq((3L, 30L)).toDF("id", "v"), dir)
    val root2 = base()
    val sink = drain(dir, root2, Map("skipChangeCommits" -> "true"))
    val got = spark.read.parquet(sink).select("id").as[Long]
      .collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      s"append rows stream as appended (DV not replayed): $got")
  }

  test("maxVersionsPerTrigger bounds catch-up batches under " +
    "AvailableNow, result still exact") {
    val root = base()
    val dir = root + "/t"
    (1 to 4).foreach(i =>
      TableLog.append(Seq((i.toLong, i * 10L)).toDF("id", "v"), dir))
    val sink = s"$root/sink"
    val q = spark.readStream.format("graft-lake")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dataBatches = q.recentProgress
      .count(_.sources.exists(_.numInputRows > 0))
    assert(dataBatches >= 4,
      s"4 versions at 1/trigger must take >=4 data batches: $dataBatches")
    assert(spark.read.parquet(sink).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("startingVersion skips history; schema evolution null-fills " +
    "old files") {
    val root = base()
    val dir = root + "/t"
    TableLog.append(Seq((1L, "a")).toDF("id", "s"), dir) // v1 (old schema)
    TableLog.append(Seq((2L, "b", 7L), (3L, "c", 9L))
      .toDF("id", "s", "extra"), dir) // v2 evolved
    val sink = drain(dir, root)
    val rows = spark.read.parquet(sink)
      .select("id", "extra").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, -1L), (2L, 7L), (3L, 9L)),
      s"old file must null-fill the evolved column: $rows")
    // startingVersion=1: only v2 streams
    val root2 = base()
    val sink2 = drain(dir, root2, Map("startingVersion" -> "1"))
    assert(spark.read.parquet(sink2).select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L))
  }
}
