package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** CHECK constraints: validated on add, enforced on every new-row write
  * path, carried through every commit kind, revalidated on restore,
  * droppable, SQL-callable. */
class CheckConstraintSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("chk").toString + "/t"

  test("addCheck validates existing data; violating appends / updates " +
    "fail loudly with nothing committed; valid writes pass") {
    val dir = freshDir()
    TableLog.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), dir)
    TableLog.addCheck(spark, dir, "v_pos", "v > 0")
    // adding a check today's data violates: loud, nothing committed
    val vBefore = TableLog.currentVersion(dir)
    intercept[IllegalArgumentException] {
      TableLog.addCheck(spark, dir, "v_big", "v > 15")
    }
    assert(TableLog.currentVersion(dir) == vBefore)
    // valid append passes; violating append fails with state unchanged
    TableLog.append(Seq((3L, 30L)).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      TableLog.append(Seq((4L, -1L)).toDF("id", "v"), dir)
    }
    assert(TableLog.read(spark, dir).count() == 3L)
    // NULL violates (strict: unknown is not valid)
    intercept[IllegalArgumentException] {
      TableLog.append(Seq((5L, null.asInstanceOf[java.lang.Long]))
        .toDF("id", "v"), dir)
    }
    // UPDATE rewrites enforce; DELETE does not need to
    intercept[IllegalArgumentException] {
      TableLog.update(spark, dir, "id = 1", Map("v" -> "v - 100"))
    }
    assert(TableLog.read(spark, dir).filter(col("id") === 1L)
      .head().getLong(1) == 10L, "failed UPDATE must change nothing")
    TableLog.update(spark, dir, "id = 1", Map("v" -> "v + 100"))
    val (_, nDel, _, _) = TableLog.delete(spark, dir, "id = 2")
    assert(nDel == 1L)
  }

  test("checks survive append, optimize, DV delete, and COW update " +
    "commits; overwrite enforces and keeps them") {
    val dir = freshDir()
    TableLog.append(spark.range(100).selectExpr("id", "id + 1 as v"), dir)
    TableLog.addCheck(spark, dir, "v_pos", "v > 0")
    TableLog.append(spark.range(100, 200)
      .selectExpr("id", "id + 1 as v"), dir)
    TableLog.deleteVectored(spark, dir, "id = 5")
    TableLog.optimize(spark, dir, maxRows = 50)
    TableLog.update(spark, dir, "id = 7", Map("v" -> "v + 1"))
    assert(TableLog.snapshot(dir).checks == Map("v_pos" -> "v > 0"),
      "checks must ride every commit kind")
    intercept[IllegalArgumentException] {
      TableLog.overwrite(Seq((1L, 0L)).toDF("id", "v"), dir)
    }
    TableLog.overwrite(Seq((1L, 1L)).toDF("id", "v"), dir)
    assert(TableLog.snapshot(dir).checks.contains("v_pos"))
  }

  test("restore revalidates: resurrecting pre-constraint violations " +
    "fails loudly; dropCheck unblocks") {
    val dir = freshDir()
    TableLog.append(Seq((1L, -5L), (2L, 20L)).toDF("id", "v"), dir) // v1
    TableLog.delete(spark, dir, "v < 0") // v2: now all-positive
    TableLog.addCheck(spark, dir, "v_pos", "v > 0") // v3
    intercept[IllegalArgumentException] {
      TableLog.restore(dir, 1) // would resurrect v = -5
    }
    assert(TableLog.read(spark, dir).count() == 1L, "failed restore " +
      "must leave the head untouched")
    TableLog.dropCheck(dir, "v_pos")
    TableLog.restore(dir, 1)
    assert(TableLog.read(spark, dir).count() == 2L)
    intercept[IllegalArgumentException] {
      TableLog.dropCheck(dir, "nope")
    }
  }

  test("partitioned appends and CDC lake apply enforce; the SQL surface " +
    "adds and drops") {
    val dir = freshDir()
    TableLog.appendPartitioned(Seq((1L, "a", 5L), (2L, "b", 6L))
      .toDF("id", "p", "v"), dir, "p")
    spark.sql(s"SELECT * FROM graft_add_check('$dir', 'v_pos', 'v > 0')")
      .collect()
    intercept[Exception] { // analysis wraps the require
      TableLog.appendPartitioned(Seq((3L, "c", -1L))
        .toDF("id", "p", "v"), dir, "p")
    }
    assert(TableLog.read(spark, dir).count() == 2L)
    val ch = Seq((2L, "b", -7L, 1L, "U")).toDF("id", "p", "v", "seq", "op")
    intercept[Exception] {
      graft.operators.Changelog.applyToLakeVersioned(dir, ch, "p",
        Seq("id"), "seq", "op")
    }
    spark.sql(s"SELECT * FROM graft_drop_check('$dir', 'v_pos')")
      .collect()
    assert(TableLog.snapshot(dir).checks.isEmpty)
  }
}
