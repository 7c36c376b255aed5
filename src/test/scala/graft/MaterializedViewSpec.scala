package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MaterializedView, TableLog}

/** Incremental materialized-view maintenance: the view must equal a
  * from-scratch recompute after EVERY kind of source commit, refresh
  * must be incremental (change-feed-driven) when the window exists,
  * idempotent on replay, and self-healing when the window is vacuumed. */
class MaterializedViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"mv$tag").toString + "/t"

  private def viewState(dir: String): Map[Long, (Long, Long)] =
    TableLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(srcDir: String): Map[Long, (Long, Long)] =
    TableLog.read(spark, srcDir).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"v").as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("view tracks the source through appends, COW DML, DV deletes, " +
    "optimize, and restore — always equal to a full recompute") {
    val src = fresh("src")
    val view = fresh("view")
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 600).map(i =>
      (i.toLong, (i % 13).toLong, rnd.nextInt(1000).toLong))
    rows.grouped(200).foreach(c =>
      TableLog.append(c.toDF("id", "g", "v"), src))
    val (_, _, _, m1) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(m1 == "full")
    assert(viewState(view) == recompute(src))
    // replay is a no-op
    val (_, _, _, m2) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(m2 == "noop")
    // every commit kind, one refresh each, view == recompute after each
    def check(label: String): Unit = {
      val (_, _, _, mode) =
        MaterializedView.refresh(spark, view, src, "g", "v")
      assert(mode == "incremental", s"$label: mode $mode")
      assert(viewState(view) == recompute(src), s"$label diverged")
    }
    TableLog.append((600 until 700).map(i =>
      (i.toLong, (i % 13).toLong, 5L)).toDF("id", "g", "v"), src)
    check("append")
    TableLog.delete(spark, src, "id % 9 = 2")
    check("cow delete")
    TableLog.deleteVectored(spark, src, "id % 11 = 3")
    check("dv delete")
    TableLog.update(spark, src, "g = 4", Map("v" -> "v + 100"))
    check("cow update")
    TableLog.optimize(spark, src) // rewrite noise must net to zero
    check("optimize")
    val preV = TableLog.currentVersion(src)
    TableLog.append(Seq((9999L, 3L, 77L)).toDF("id", "g", "v"), src)
    TableLog.restore(src, preV) // un-insert via restore
    check("restore")
  }

  test("vacuumed-away incremental window falls back to a full rebuild " +
    "and re-anchors") {
    val src = fresh("src2")
    val view = fresh("view2")
    TableLog.append((1L to 100L).map(i => (i, i % 5, i)).toDF("id", "g", "v"),
      src)
    MaterializedView.refresh(spark, view, src, "g", "v")
    TableLog.append((101L to 150L).map(i => (i, i % 5, i))
      .toDF("id", "g", "v"), src)
    TableLog.overwrite(TableLog.read(spark, src), src) // v3
    TableLog.vacuum(src, keepFrom = TableLog.currentVersion(src),
      graceMs = 0L)
    val (_, _, _, mode) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(mode == "full", s"expected rebuild, got $mode")
    assert(viewState(view) == recompute(src))
    val (_, _, _, again) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(again == "noop")
  }

  test("NULL group keys merge through incremental refresh instead of " +
    "accumulating duplicate null-group rows") {
    val src = fresh("srcnull")
    val view = fresh("viewnull")
    def rows(ids: Seq[Long]) = ids.map(i =>
      (i, if (i % 3 == 0) None else Some(i % 5), i))
      .toDF("id", "g", "v")
    TableLog.append(rows(1L to 60L), src)
    MaterializedView.refresh(spark, view, src, "g", "v")
    // two incremental refreshes, each adding null-group rows
    TableLog.append(rows(61L to 90L), src)
    val (_, _, _, m1) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(m1 == "incremental")
    TableLog.append(rows(91L to 120L), src)
    val (_, _, _, m2) = MaterializedView.refresh(spark, view, src, "g", "v")
    assert(m2 == "incremental")
    val state = TableLog.read(spark, view).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (r.getLong(1), r.getLong(2)))
    assert(state.length == state.map(_._1).distinct.length,
      s"duplicate group rows: ${state.toSeq.sortBy(_._1)}")
    val expected = TableLog.read(spark, src).groupBy("g")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"v").as("total"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(state.toMap == expected)
  }
}
