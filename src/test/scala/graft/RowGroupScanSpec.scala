package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RowGroupScan, TableLog}

/** Row-group-level data skipping: index shape, selective-scan fidelity
  * across the flat scalar type surface, conservative keeps, pruning
  * ratios, and the deletion-vector interplay in the TableLog read. */
class RowGroupScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val smallRg = Map(
    "parquet.block.size" -> "16384", "parquet.page.size" -> "4096")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeSorted(dir: String, n: Int): Unit =
    spark.range(n.toLong).selectExpr("id as k", "id * 7 as v")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite")
      .options(smallRg).parquet(dir)

  private def parquets(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted.toSeq

  test("index: one row per row group, bounds tight, counts add up") {
    val dir = tmp("rgidx")
    writeSorted(dir, 20000)
    val files = parquets(dir)
    val idx = RowGroupScan.rowGroupIndexFiles(spark, files, "k").collect()
    assert(idx.length > files.size, "expected multiple row groups per file")
    assert(idx.map(_.getLong(4)).sum == 20000L)
    // sorted writes make per-group ranges disjoint within each file
    idx.groupBy(_.getString(0)).foreach { case (_, rgs) =>
      val byRg = rgs.sortBy(_.getInt(1))
      byRg.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
        case _ =>
      }
    }
  }

  test("selective scan returns exactly the kept row groups' rows and " +
    "prunes a narrow range") {
    val dir = tmp("rgscan")
    writeSorted(dir, 20000)
    val files = parquets(dir)
    val idx = RowGroupScan.rowGroupIndexFiles(spark, files, "k")
    val (df, opened, total, filesOpened) =
      RowGroupScan.readRowGroupsPruned(spark, idx, 100L, 700L)
    assert(opened < total, s"no pruning: $opened/$total")
    assert(filesOpened == 1, "narrow low range must touch one file")
    val got = df.filter(col("k").between(100, 700))
      .agg(count(lit(1)), sum("v"), min("k"), max("k")).first()
    assert(got.getLong(0) == 601L)
    assert(got.getLong(1) == (100L to 700L).map(_ * 7).sum)
    assert((got.getLong(2), got.getLong(3)) == (100L, 700L))
    // the UNFILTERED selective frame holds full row groups (supersets of
    // the range, never missing a matching row)
    val ks = df.select("k").as[Long].collect().toSet
    assert((100L to 700L).forall(ks))
  }

  test("zero matching row groups: empty frame with the table schema") {
    val dir = tmp("rgempty")
    writeSorted(dir, 5000)
    val idx = RowGroupScan.rowGroupIndexFiles(spark, parquets(dir), "k")
    val (df, opened, total, filesOpened) =
      RowGroupScan.readRowGroupsPruned(spark, idx, 900000L, 990000L)
    assert(opened == 0L && total > 0L && filesOpened == 0)
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.count() == 0L)
  }

  test("type surface: bool/int/long/float/double/string/binary/decimal/" +
    "date/timestamp survive the selective scan bit-for-bit") {
    val dir = tmp("rgtypes")
    val df = spark.range(4000).selectExpr(
      "id as k",
      "id % 2 = 0 as b",
      "cast(id as int) as i",
      "cast(id as float) as f",
      "cast(id as double) as d",
      "concat('s', id) as s",
      "cast(concat('b', id) as binary) as bin",
      "cast(id as decimal(12,2)) / 3 as dec",
      "date_add(date'2020-01-01', cast(id % 300 as int)) as dt",
      "timestamp_millis(1500000000000 + id * 1000) as ts",
      "case when id % 97 = 0 then null else id end as maybe")
    df.repartitionByRange(1, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").options(smallRg).parquet(dir)
    val files = parquets(dir)
    val idx = RowGroupScan.rowGroupIndexFiles(spark, files, "k")
    // open EVERYTHING: full fidelity against Spark's own reader
    val (got, opened, total, _) =
      RowGroupScan.readRowGroupsPruned(spark, idx, Long.MinValue,
        Long.MaxValue)
    assert(opened == total && total > 1)
    val want = spark.read.parquet(files: _*)
    assert(got.schema == want.schema,
      s"schema drift:\n${got.schema}\n${want.schema}")
    val key = got.columns.sorted.toSeq
    assert(got.orderBy("k").collect().toSeq ==
      want.orderBy("k").collect().toSeq, s"row drift on $key")
  }

  test("TableLog.readRowGroupPruned: prunes row groups, DV files scan " +
    "selectively with deletes applied, aggregates match the full read") {
    val dir = tmp("rgdv") + "/table"
    val d1 = spark.range(10000).selectExpr("id as k", "id * 3 as v")
    TableLog.append(
      d1.repartitionByRange(2, col("k")).sortWithinPartitions("k"),
      dir, options = smallRg)
    // DV-delete a slice that lives in the SECOND half (k in [9000,9100))
    val (_, nDel, _, _) = TableLog.deleteVectored(spark, dir,
      "k >= 9000 AND k < 9100")
    assert(nDel == 100L)
    val (pr, rgOpened, rgTotal, filesOpened, filesTotal) =
      TableLog.readRowGroupPruned(spark, dir, "k", 100L, 700L)
    assert(rgTotal > 0L && rgOpened < rgTotal,
      s"no row-group pruning: $rgOpened/$rgTotal")
    assert(filesOpened < filesTotal,
      s"the DV'd high file must zone-prune away: $filesOpened/$filesTotal")
    val cnt = pr.filter(col("k").between(100, 700)).count()
    assert(cnt == 601L)
    // a range over the DV'd file: rows deleted stay deleted
    val (pr2, _, _, _, _) =
      TableLog.readRowGroupPruned(spark, dir, "k", 8900L, 9200L)
    val ks = pr2.filter(col("k").between(8900, 9200))
      .select("k").as[Long].collect().toSet
    assert(ks == ((8900L to 9200L).toSet -- (9000L until 9100L)))
    // full-range read equals the canonical log read
    val (all, _, _, _, _) = TableLog.readRowGroupPruned(spark, dir, "k",
      Long.MinValue, Long.MaxValue)
    assert(all.count() == TableLog.read(spark, dir).count())
  }

  test("optimize materializes DVs away and restores row-group pruning " +
    "on every file") {
    val dir = tmp("rgopt") + "/table"
    val d1 = spark.range(8000).selectExpr("id as k", "id as v")
    TableLog.append(
      d1.repartitionByRange(2, col("k")).sortWithinPartitions("k"),
      dir, options = smallRg)
    TableLog.deleteVectored(spark, dir, "k % 1000 = 7")
    TableLog.optimize(spark, dir, maxRows = 2000, clusterBy = Seq("k"))
    val snap = TableLog.snapshot(dir)
    assert(snap.dvs.isEmpty, "optimize must materialize DVs away")
    val (pr, rgOpened, rgTotal, _, _) =
      TableLog.readRowGroupPruned(spark, dir, "k", 0L, 300L)
    // post-optimize files are 128 MB-row-group singletons at this size,
    // so pruning here is FILE-level via the rg index (each file = 1 rg)
    assert(rgOpened < rgTotal, s"no pruning after optimize")
    // 301 keys in [0,300] minus k=7 (deleted by k % 1000 = 7, then
    // materialized away by optimize)
    assert(pr.filter(col("k").between(0, 300)).count() == 300L)
  }

  test("string row-group pruning: lexicographic day-string range opens " +
    "a strict subset and matches the full read") {
    val dir = tmp("rgstr") + "/table"
    val df = spark.range(12000).selectExpr(
      "date_format(date_add(date'2024-01-01', cast(id % 400 as int)), " +
        "'yyyy-MM-dd') as day",
      "id as v")
    TableLog.append(
      df.repartitionByRange(2, col("day")).sortWithinPartitions("day"),
      dir, options = smallRg)
    val (pr, rgOpened, rgTotal, fOpened, fTotal) =
      TableLog.readRowGroupPrunedString(spark, dir, "day",
        "2024-03-01", "2024-03-99")
    assert(rgOpened < rgTotal, s"no pruning: $rgOpened/$rgTotal")
    assert(fOpened < fTotal)
    val got = pr.filter(col("day").between("2024-03-01", "2024-03-99"))
      .agg(count(lit(1)), sum("v")).first()
    val want = TableLog.read(spark, dir)
      .filter(col("day").between("2024-03-01", "2024-03-99"))
      .agg(count(lit(1)), sum("v")).first()
    assert(got == want)
    assert(got.getLong(0) > 0L)
  }

  test("point lookup composes bloom file-prune with row-group prune; " +
    "absent keys read nothing") {
    val dir = tmp("rgpoint") + "/table"
    val df = spark.range(20000).selectExpr("id as k", "id * 11 as v")
    TableLog.append(
      df.repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      dir, options = smallRg)
    TableLog.computeBlooms(spark, dir, "k")
    // three present keys in the first file's range
    val keys = Seq(10L, 777L, 2400L)
    val (pr, rgOpened, rgTotal, fOpened, fTotal) =
      TableLog.readPointLookup(spark, dir, "k", keys)
    assert(fOpened < fTotal, s"bloom must reject files: $fOpened/$fTotal")
    assert(rgOpened < rgTotal, s"no rg pruning: $rgOpened/$rgTotal")
    val got = pr.filter(col("k").isin(keys: _*))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == keys.sorted.map(k => (k, k * 11)))
    // absent everywhere: bloom answers definitely-absent, zero opens
    val (none, _, _, fo2, _) =
      TableLog.readPointLookup(spark, dir, "k", Seq(900000L))
    assert(fo2 == 0 && none.count() == 0L)
    assert(none.columns.toSeq == Seq("k", "v"))
  }

  test("point lookup on strings and with deletion vectors: DV'd file " +
    "scans selectively, deleted key stays invisible") {
    val dir = tmp("rgpstr") + "/table"
    val df = spark.range(9000).selectExpr(
      "concat('id-', lpad(cast(id as string), 6, '0')) as key",
      "id as v")
    TableLog.append(
      df.repartitionByRange(3, col("key")).sortWithinPartitions("key"),
      dir, options = smallRg)
    TableLog.computeBlooms(spark, dir, "key")
    TableLog.deleteVectored(spark, dir, "key = 'id-000500'")
    val keys = Seq("id-000500", "id-000501", "id-008000")
    val (pr, _, _, fOpened, fTotal) =
      TableLog.readPointLookup(spark, dir, "key", keys)
    assert(fOpened <= fTotal)
    val got = pr.filter(col("key").isin(keys: _*))
      .select("key").as[String].collect().toSet
    assert(got == Set("id-000501", "id-008000"),
      s"deleted key must stay invisible: $got")
  }

  test("projection pushdown: the selective scan reads only the wanted " +
    "columns and both DV and fallback legs match its schema") {
    val dir = tmp("rgproj") + "/table"
    val wide = spark.range(8000).selectExpr(
      "id as k", "id * 2 as a", "id * 3 as b",
      "concat('x', id) as s", "id * 5 as c")
    TableLog.append(
      wide.repartitionByRange(2, col("k")).sortWithinPartitions("k"),
      dir, options = smallRg)
    val (pr, rgOpened, rgTotal, _, _) = TableLog.readRowGroupPruned(
      spark, dir, "k", 100L, 300L, columns = Seq("k", "s"))
    assert(rgOpened < rgTotal)
    assert(pr.columns.toSeq == Seq("k", "s"))
    val got = pr.filter(col("k").between(100, 300))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 201 && got.head == ((100L, "x100")))
    // with a DV: projected union across the two legs stays consistent
    TableLog.deleteVectored(spark, dir, "k = 150")
    val (pr2, _, _, _, _) = TableLog.readRowGroupPruned(
      spark, dir, "k", 100L, 300L, columns = Seq("k", "s"))
    assert(pr2.columns.toSeq == Seq("k", "s"))
    assert(pr2.filter(col("k").between(100, 300)).count() == 200L)
    // point lookup with projection
    TableLog.computeBlooms(spark, dir, "k")
    val (pl, _, _, _, _) = TableLog.readPointLookup(
      spark, dir, "k", Seq(4242L), columns = Seq("s", "k"))
    assert(pl.columns.toSeq == Seq("s", "k"))
    assert(pl.filter(col("k") === 4242L).head().getString(0) == "x4242")
    // unknown projected column fails loudly
    intercept[IllegalArgumentException] {
      TableLog.readRowGroupPruned(spark, dir, "k", 0L, 1L,
        columns = Seq("nope"))
    }
  }

  test("property: random tables × random ranges — the selective scan " +
    "always equals Spark's own filtered reader") {
    val rnd = new scala.util.Random(0x512L)
    (0 until 6).foreach { round =>
      val n = 1000 + rnd.nextInt(7000)
      val nullEvery = 11 + rnd.nextInt(90)
      val valueCol = rnd.nextInt(5) match {
        case 0 => "cast(id as double) / 7 as v"
        case 1 => "concat('s', id % 97) as v"
        case 2 => "cast(id as int) as v"
        case 3 => "cast(cast(id as decimal(14,3)) / 9 as decimal(14,3)) as v"
        case _ => "id % 2 = 0 as v"
      }
      val blockSize = 8192 << rnd.nextInt(3)
      val dir = tmp(s"rgprop$round")
      spark.range(n.toLong).selectExpr(
          "id as k", valueCol,
          s"case when id % $nullEvery = 0 then null else id * 2 end " +
            "as maybe")
        .repartitionByRange(1 + rnd.nextInt(3), col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", blockSize.toString)
        .option("parquet.page.size", "4096").parquet(dir)
      val files = parquets(dir)
      val idx = RowGroupScan.rowGroupIndexFiles(spark, files, "k")
      val a = rnd.nextInt(n).toLong
      val b = a + rnd.nextInt(n / 3 + 1)
      val (sel, opened, total, _) =
        RowGroupScan.readRowGroupsPruned(spark, idx, a, b)
      assert(opened <= total)
      val got = sel.filter(col("k").between(a, b))
        .orderBy("k").collect().toSeq
      val want = spark.read.parquet(files: _*)
        .filter(col("k").between(a, b)).orderBy("k").collect().toSeq
      assert(got == want,
        s"round $round drift (n=$n block=$blockSize range=[$a,$b])")
    }
  }

  test("schema drift across files fails loudly") {
    val dir = tmp("rgdrift")
    spark.range(100).selectExpr("id as k", "id as v")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/a")
    spark.range(100).selectExpr("id as k", "cast(id as string) as v")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/b")
    val files = parquets(dir + "/a") ++ parquets(dir + "/b")
    val ex = intercept[org.apache.spark.SparkException] {
      RowGroupScan.readRowGroups(spark,
        files.map(_ -> Seq(0))).count()
    }
    assert(ex.getMessage != null)
  }
}
