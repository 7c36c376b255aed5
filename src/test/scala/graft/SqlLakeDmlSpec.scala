package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** SQL-text lake DML surface (SqlTableFunctions): every TableLog
  * mutation callable from `spark.sql` text, receipts as 1-row relations,
  * reads via graft_table — the parity the reference's all-SQL stance
  * requires. */
class SqlLakeDmlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("sqldml").toString + "/t"

  private def ids(dir: String): Set[Long] =
    spark.sql(s"SELECT id FROM graft_table('$dir')")
      .collect().map(_.getLong(0)).toSet

  test("graft_delete / graft_delete_vectored / graft_update receipts " +
    "and effects; graft_table reads any version") {
    val dir = freshDir()
    TableLog.append((1L to 100L).map(i => (i, i)).toDF("id", "v"), dir)
    val del = spark.sql(
      s"SELECT * FROM graft_delete('$dir', 'id > 90')").first()
    assert(del.getAs[Long]("rows_deleted") == 10L)
    assert(ids(dir) == (1L to 90L).toSet)
    val dv = spark.sql(
      s"SELECT * FROM graft_delete_vectored('$dir', 'id = 5')").first()
    assert(dv.getAs[Long]("rows_deleted") == 1L)
    assert(ids(dir) == (1L to 90L).toSet - 5L)
    // assignment expression CONTAINING '=' (CASE WHEN) parses: only the
    // FIRST '=' splits target from expression
    spark.sql(s"""SELECT * FROM graft_update('$dir', 'id <= 2',
      'v = CASE WHEN id = 1 THEN 100 ELSE 200 END')""").collect()
    val got = spark.sql(
      s"SELECT id, v FROM graft_table('$dir') WHERE id <= 2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 100L), (2L, 200L)))
    // time travel through the TVF's version argument
    assert(spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir', 1)")
      .first().getLong(0) == 100L)
  }

  test("graft_optimize collapses files, graft_restore rewinds forward, " +
    "graft_vacuum reports the sweep") {
    val dir = freshDir()
    (0 until 4).foreach(i => TableLog.append(
      (1L to 25L).map(j => (i * 25L + j, j)).toDF("id", "v")
        .coalesce(1), dir))
    val preV = TableLog.currentVersion(dir)
    val opt = spark.sql(s"SELECT * FROM graft_optimize('$dir')").first()
    assert(opt.getAs[Int]("files_after") < opt.getAs[Int]("files_before"))
    spark.sql(s"SELECT * FROM graft_delete('$dir', 'id <= 50')").collect()
    assert(ids(dir) == (51L to 100L).toSet)
    val res = spark.sql(
      s"SELECT * FROM graft_restore('$dir', $preV)").first()
    assert(res.getAs[Int]("version") > preV)
    assert(ids(dir) == (1L to 100L).toSet)
    // grace-less vacuum (writers quiesced) sweeps the pre-restore litter
    val vac = spark.sql(s"""SELECT * FROM graft_vacuum('$dir',
      ${TableLog.currentVersion(dir)}, 0)""").first()
    assert(vac.getAs[Int]("files_deleted") > 0)
    assert(ids(dir) == (1L to 100L).toSet)
  }

  test("graft_merge runs the clause ladder over views; malformed " +
    "update assignments fail loudly") {
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .createOrReplaceTempView("tgt_dml")
    Seq((2L, 99L), (4L, 40L)).toDF("k", "v")
      .createOrReplaceTempView("src_dml")
    val merged = spark.sql(
      """SELECT * FROM graft_merge('tgt_dml', 'src_dml', 'k')
         ORDER BY k""").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.toSeq == Seq((1L, 10L), (2L, 99L), (3L, 30L), (4L, 40L)))
    val dir = freshDir()
    TableLog.append(Seq((1L, 2L)).toDF("id", "v"), dir)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_update('$dir', 'id = 1', 'vee 7')")
        .collect()
    }
    assert(e.getMessage.contains("missing '='"), e.getMessage)
  }
  test("graft_select routes predicates through the indexes from SQL " +
    "text; the 4th argument pushes a projection into the scan") {
    val dir = freshDir()
    TableLog.append(
      spark.range(8000).selectExpr("id", "id * 3 as v",
          "concat('t', id % 7) as tag")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("id"))
        .sortWithinPartitions("id"),
      dir, options = Map("parquet.block.size" -> "16384",
        "parquet.page.size" -> "4096"))
    val got = spark.sql(
      s"SELECT id, v FROM graft_select('$dir', 'id BETWEEN 100 AND 105')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == (100L to 105L).map(k => (k, k * 3)))
    // projected form: only the listed columns come back
    val proj = spark.sql(s"SELECT * FROM graft_select('$dir', " +
      "'id = 4242', -1, 'tag,id')")
    assert(proj.columns.toSeq == Seq("tag", "id"))
    assert(proj.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("t" + (4242 % 7), 4242L)))
  }
  test("graft_build_index + graft_count: metadata-first COUNT from SQL " +
    "text — exact, and zero scans when the index proves every group") {
    val dir = freshDir()
    TableLog.append(
      spark.range(9000).selectExpr("id", "id * 3 as v")
        .repartitionByRange(2, org.apache.spark.sql.functions.col("id"))
        .sortWithinPartitions("id"),
      dir, options = Map("parquet.block.size" -> "16384",
        "parquet.page.size" -> "4096"))
    val v = spark.sql(s"SELECT * FROM graft_build_index('$dir')")
      .head().getInt(0)
    assert(v == TableLog.currentVersion(dir))
    val all = spark.sql(s"SELECT * FROM graft_count('$dir')").head()
    assert(all.getLong(0) == 9000L && all.getLong(2) == 0L)
    val mid = spark.sql(
      s"SELECT * FROM graft_count('$dir', 'id BETWEEN 3000 AND 5999')")
      .head()
    assert(mid.getLong(0) == 3000L)
    assert(mid.getInt(4) == 1, "prunable predicate must count exactly")
    assert(mid.getLong(2) < mid.getLong(3), "straddlers only")
    val odd = spark.sql(
      s"SELECT * FROM graft_count('$dir', 'id % 2 = 1')").head()
    assert(odd.getLong(0) == 4500L && odd.getInt(4) == 0)
  }

  test("graft_select_join prunes through a dim view; " +
    "graft_build_vecindex + graft_ann serve zero-training ANN") {
    val dir = freshDir()
    TableLog.append(
      spark.range(16000).selectExpr("id as fk", "id * 3 as v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("fk"))
        .sortWithinPartitions("fk"),
      dir, options = Map("parquet.block.size" -> "16384"))
    spark.range(100, 160).selectExpr("id as dk")
      .createOrReplaceTempView("dml_dim")
    val joined = spark.sql(
      s"SELECT * FROM graft_select_join('$dir', 'fk', 'dml_dim', 'dk')")
    assert(joined.count() == 60L)
    assert(joined.selectExpr("sum(v)").first().getLong(0) ==
      (100L until 160L).map(_ * 3).sum)

    // ANN through SQL text: build once, query through the stored index
    val vdir = freshDir()
    TableLog.append(
      spark.range(500).selectExpr("id as vec_id",
        "transform(sequence(0, 15), " +
          "j -> cast(sin(id * 37 + j * 11) as float)) as embedding")
        .repartition(2), vdir)
    val ver = spark.sql(
      s"SELECT * FROM graft_build_vecindex('$vdir')").first()
    assert(ver.getAs[Int]("version") >= 2)
    spark.range(3).selectExpr("id + 10000 as vec_id",
      "transform(sequence(0, 15), " +
        "j -> cast(sin(id * 37 + j * 11) as float)) as embedding")
      .createOrReplaceTempView("dml_q")
    val before = graft.operators.Similarity.trainingJobs.sum()
    val ann = spark.sql(
      s"SELECT * FROM graft_ann('$vdir', 'dml_q', 1, 4) ORDER BY qid")
      .collect()
    assert(graft.operators.Similarity.trainingJobs.sum() == before)
    assert(ann.length == 3)
    ann.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 10000, r.toString)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, r.toString)
    }
  }
}
