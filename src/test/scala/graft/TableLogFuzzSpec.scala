package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLog

/** Protocol-level fuzz of the checkpointed delta log: a seeded random
  * sequence of append / DV-delete / overwrite / optimize / restore /
  * vacuum ops, cross-validated after every step against a driver-side
  * shadow model — so every entry-form transition (full→delta,
  * checkpoint boundary, churn-forced checkpoint, rescue checkpoint
  * after vacuum) is exercised by realistic op interleavings rather
  * than hand-picked cases. Time travel is re-validated for every
  * retained version at the end. */
class TableLogFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("120 random ops: reads, time travel, and vacuum stay exact " +
    "across checkpoint boundaries and rescue checkpoints") {
    val rnd = new scala.util.Random(4242)
    val dir = java.nio.file.Files.createTempDirectory("tlfuzz")
      .toString + "/t"
    var expected = Map.empty[Long, Long]
    val byVersion = scala.collection.mutable.Map[Int, Map[Long, Long]]()
    var keepFloor = 1 // versions below this may be vacuumed
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, Long)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1; id -> id * 7
      }
    def state(v: Int = -1): Map[Long, Long] =
      TableLog.read(spark, dir, v).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    TableLog.append(freshRows(3).toDF("id", "v").coalesce(1), dir)
    expected ++= (0L until 3L).map(id => id -> id * 7)
    byVersion(1) = expected

    (2 to 120).foreach { step =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 | 4 | 5 =>
          val rows = freshRows(1 + rnd.nextInt(3))
          TableLog.append(rows.toDF("id", "v").coalesce(1), dir)
          expected ++= rows
        case 6 | 7 =>
          if (expected.nonEmpty) {
            val id = expected.keys.toVector(rnd.nextInt(expected.size))
            TableLog.deleteVectored(spark, dir, s"id = $id")
            expected -= id
          } else {
            val rows = freshRows(1)
            TableLog.append(rows.toDF("id", "v").coalesce(1), dir)
            expected ++= rows
          }
        case 8 =>
          val rows = freshRows(2)
          TableLog.overwrite(rows.toDF("id", "v").coalesce(1), dir)
          expected = rows.toMap
        case 9 =>
          TableLog.optimize(spark, dir, maxRows = 1000000L)
        case 10 =>
          // restore to a random still-retained version
          val cur = TableLog.currentVersion(dir)
          val candidates = (keepFloor to cur)
            .filter(byVersion.contains)
          val target = candidates(rnd.nextInt(candidates.size))
          TableLog.restore(dir, target)
          expected = byVersion(target)
        case 11 =>
          // vacuum most of the history (keep the last few versions so
          // restore still has targets); grace 0 exercises the rescue
          // checkpoints hardest
          val cur = TableLog.currentVersion(dir)
          val kf = math.max(1, cur - 2)
          if (kf > keepFloor) {
            TableLog.vacuum(dir, keepFrom = kf, graceMs = 0L)
            keepFloor = kf
          }
      }
      val cur = TableLog.currentVersion(dir)
      byVersion(cur) = expected
      if (step % 8 == 0)
        assert(state() == expected, s"drift at step $step (v$cur)")
    }
    assert(state() == expected, "final state drift")
    // every retained recorded version still time-travels exactly
    val cur = TableLog.currentVersion(dir)
    val checked = (keepFloor to cur).filter(byVersion.contains)
    assert(checked.size >= 3, s"fuzz retained too little: $checked")
    checked.foreach { v =>
      assert(state(v) == byVersion(v), s"time travel drift at v$v")
    }
    // structural sanity: the log contains BOTH entry forms
    val ld = java.nio.file.Paths.get(dir, "_graft_log")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val s0 = java.nio.file.Files.list(ld)
    val nodes = try {
      import scala.jdk.CollectionConverters._
      s0.iterator.asScala
        .filter(_.getFileName.toString.matches("v\\d{5,}\\.json"))
        .map(p => om.readTree(java.nio.file.Files.readAllBytes(p)))
        .toVector
    } finally s0.close()
    assert(nodes.exists(_.has("base")) && nodes.exists(_.has("files")),
      "fuzz never produced both entry forms")
  }
}
