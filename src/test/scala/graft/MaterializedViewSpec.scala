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

  // ===== refreshMulti: multi-aggregate, multi-group rollups ============

  import graft.operators.MaterializedView.AggSpec

  private val specs = Seq(AggSpec("sum", "v", "total"),
    AggSpec("avg", "v", "mean"), AggSpec("min", "v", "lo"),
    AggSpec("max", "v", "hi"))

  private def multiState(view: String, src: String)
      : Map[(Long, Long), (Long, Long, Option[Double], Long, Long)] =
    MaterializedView.readView(spark, view, Seq("g1", "g2"), specs)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getLong(5), r.getLong(6))
      }.toMap

  private def multiRecompute(src: String)
      : Map[(Long, Long), (Long, Long, Option[Double], Long, Long)] = {
    import org.apache.spark.sql.functions._
    TableLog.read(spark, src).groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"),
        avg($"v").as("mean"), min($"v").as("lo"), max($"v").as("hi"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getLong(5), r.getLong(6))
      }.toMap
  }

  test("refreshMulti: avg+min+max+sum over two group columns stays " +
    "incremental through insert-only windows and safe deletes, and " +
    "rebuilds when a delete invalidates an extreme") {
    val src = fresh("srcm")
    val view = fresh("viewm")
    def rows(ids: Seq[Long]) = ids.map(i =>
      (i, i % 3, i % 2, i * 7 % 101)).toDF("id", "g1", "g2", "v")
    TableLog.append(rows(1L to 200L), src)
    val (_, _, _, m0) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1", "g2"), specs)
    assert(m0 == "full")
    assert(multiState(view, src) == multiRecompute(src))
    // insert-only window: incremental, min/max via least/greatest
    TableLog.append(rows(201L to 300L), src)
    val (_, _, _, m1) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1", "g2"), specs)
    assert(m1 == "incremental")
    assert(multiState(view, src) == multiRecompute(src))
    // delete rows NOT at any group extreme: v = 50 is interior for every
    // group (0 and 100 both present per group in 1..300)
    TableLog.delete(spark, src, "v = 50")
    val (_, _, _, m2) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1", "g2"), specs)
    assert(m2 == "incremental", s"interior delete must not rebuild: $m2")
    assert(multiState(view, src) == multiRecompute(src))
    // delete the global max (v = 100): invalidates at least one group's
    // stored extreme -> rebuild fallback
    TableLog.delete(spark, src, "v = 100")
    val (_, _, _, m3) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1", "g2"), specs)
    assert(m3 == "rebuild", s"extreme delete must rebuild: $m3")
    assert(multiState(view, src) == multiRecompute(src))
    // replay is a noop
    val (_, _, _, m4) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1", "g2"), specs)
    assert(m4 == "noop")
  }

  test("refreshMulti: NULL values stay out of count/avg/min/max, and a " +
    "group updated across refreshes matches the recompute") {
    val src = fresh("srcn")
    val view = fresh("viewn")
    val specsN = Seq(AggSpec("count", "v", "nv"), AggSpec("avg", "v", "m"))
    def df(rows: Seq[(Long, Long, Option[Long])]) =
      rows.toDF("id", "g1", "v").withColumn("g2",
        org.apache.spark.sql.functions.lit(0L))
        .select("id", "g1", "g2", "v")
    TableLog.append(df(Seq((1L, 1L, Some(10L)), (2L, 1L, None),
      (3L, 2L, None))), src)
    MaterializedView.refreshMulti(spark, view, src, Seq("g1"), specsN)
    TableLog.append(df(Seq((4L, 1L, Some(20L)), (5L, 2L, None))), src)
    val (_, _, _, mode) = MaterializedView.refreshMulti(spark, view, src,
      Seq("g1"), specsN)
    assert(mode == "incremental")
    val got = MaterializedView.readView(spark, view, Seq("g1"), specsN)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // g1=1: 3 rows, 2 non-null, avg 15; g1=2: 2 rows, 0 non-null, NULL avg
    assert(got == Map(1L -> (3L, 2L, Some(15.0)),
      2L -> (2L, 0L, None)), got.toString)
  }
}
