package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketching (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005): estimate per-key counts from a d×w counter table
  * whose size is INDEPENDENT of key cardinality — the primitive for
  * frequency questions over 100 TB of URLs/shingles/ids where even the
  * distinct-key set dwarfs executor memory. Estimates only ever
  * OVER-count (est ≥ true; error ≤ εN with w = ⌈e/ε⌉ at confidence
  * 1−e^−d).
  *
  * Hashing is the repo's portable md5-hex-prefix arithmetic (row i uses
  * `md5("i:" ∥ key)`), so tables and estimates are deterministic,
  * engine-independent, and SQL-replayable — the same sketch built by
  * this code and by the DuckDB oracle is bucket-for-bucket identical.
  *
  * Scale shape: the build is ONE pass (a d-way per-row explode, then a
  * combinable (i, bucket) count — map-side partials collapse to ≤ d·w
  * rows per task); the estimate side broadcasts the ≤ d·w-row table and
  * is map-only until a per-key min. No state proportional to keys
  * anywhere. */
object Sketch {

  private def bucketSql(tok: String, hexChars: Int): String =
    (1 to hexChars).map(c =>
      s"(instr('0123456789abcdef', substr(md5(cast($tok AS binary)), $c, 1)) - 1)")
      .reduceLeft((acc, h) => s"($acc * 16 + $h)")

  private def md5Bucket(tok: String, hexChars: Int): Column =
    expr(bucketSql(tok, hexChars)).cast("int")

  /** The d-way (row, bucket) entry array for one key — the building
    * block [[countMinTable]] and the streaming form
    * (`streaming/EventStreams.countMinWindowTable`) share. */
  private[graft] def cmEntries(keyCol: String, d: Int,
      hexChars: Int): Column = entries(keyCol, d, hexChars)

  private def entries(keyCol: String, d: Int, hexChars: Int): Column =
    array((0 until d).map(i => struct(lit(i).as("i"),
      md5Bucket(s"concat('$i:', $keyCol)", hexChars).as("bucket"))): _*)

  /** Build the d×w sketch (`w = 16^hexChars`) over one key per input
    * row: returns `(i, bucket, cnt)` — at most `d·w` rows total. */
  def countMinTable(df: DataFrame, keyCol: String, d: Int = 4,
      hexChars: Int = 3): DataFrame = {
    require(d >= 1 && d <= 8, s"d in [1,8]: $d")
    require(hexChars >= 1 && hexChars <= 5, s"hexChars in [1,5]: $hexChars")
    df.select(explode(entries(keyCol, d, hexChars)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  // ---- HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, AofA 2007) ------

  /** `alpha_256 · m² · 2^49` as identical CAST-explicit double arithmetic
    * in BOTH engines (bare decimal literals are DECIMAL in Spark AND
    * DuckDB — the casts force the same IEEE double op sequence, so the
    * constant, and every estimate derived from it, is bit-identical). */
  private val hllASql =
    "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
      "CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)) * " +
      "CAST(65536.0 AS DOUBLE) * CAST(562949953421312.0 AS DOUBLE))"

  /** HyperLogLog register table over a STRING key column: 256 registers
    * (p = 8) from the first two md5 hex chars, rank = leading-zero count
    * of the next 48 hash bits + 1 (∈ [1, 49]). Returns `(reg, mx)` — only
    * touched registers, ≤ 256 rows. Same portability contract as
    * [[countMinTable]]: md5-hex arithmetic, so the oracle rebuilds the
    * register table bucket-for-bucket.
    *
    * Scale shape: map-only projection + a combinable 256-group MAX —
    * partials collapse to ≤ 256 rows per task before the one tiny
    * exchange. Mergeable by construction: union two register tables and
    * re-MAX to sketch the union of the inputs (SketchSpec pins it). */
  /** The (register, rank) column pair for a STRING key column — the
    * building block [[hllRegisters]]/[[hllRegistersBy]] and the streaming
    * form (`streaming/EventStreams.hllWindowRegisters`) all share. */
  def hllRegRho(keyCol: String): (Column, Column) = {
    val h = s"md5(cast($keyCol AS binary))"
    val reg = expr(
      s"(instr('0123456789abcdef', substr($h, 1, 1)) - 1) * 16 + " +
        s"(instr('0123456789abcdef', substr($h, 2, 1)) - 1)").cast("int")
    // rank: 4 bits per leading-zero nibble + the partial nibble's high bits
    val rest = s"trim(LEADING '0' FROM substr($h, 3, 12))"
    val hv = s"(instr('0123456789abcdef', substr($rest, 1, 1)) - 1)"
    val rho = expr(
      s"""CASE WHEN length($rest) = 0 THEN 49
          ELSE 4 * (12 - length($rest)) +
            (CASE WHEN $hv >= 8 THEN 0 WHEN $hv >= 4 THEN 1
                  WHEN $hv >= 2 THEN 2 ELSE 3 END) + 1 END""").cast("int")
    (reg, rho)
  }

  def hllRegisters(df: DataFrame, keyCol: String): DataFrame = {
    val (reg, rho) = hllRegRho(keyCol)
    df.select(reg.as("reg"), rho.as("rho"))
      .groupBy("reg").agg(max("rho").as("mx"))
  }

  /** One-row distinct-count estimate from a [[hllRegisters]] table:
    * `(n_present, n_zero, est)`. The power sum runs integer-exact
    * (Σ 2^(49−mx) as BIGINT — absent registers contribute 2^49), the raw
    * estimate is ONE double division by the engine-identical alpha
    * constant, and the standard small-range correction (`E ≤ 2.5m`,
    * zeros present → linear counting `m·ln(m/V)`) applies. The 48-bit
    * hash space makes the large-range correction irrelevant below ~10^13
    * distincts. Standard error ≈ 1.04/√256 = 6.5%. */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers.agg(
        count(lit(1)).as("n_present"),
        sum(expr("shiftleft(cast(1 AS bigint), 49 - mx)")).as("sp"))
      .select(col("n_present"), (lit(256) - col("n_present")).as("n_zero"),
        expr(s"$hllASql / (coalesce(sp, cast(0 AS bigint)) + " +
          "(256 - n_present) * shiftleft(cast(1 AS bigint), 49))").as("raw"))
      .select(col("n_present"), col("n_zero"),
        expr("""CASE WHEN raw <= CAST(2.5 AS DOUBLE) * 256 AND n_zero > 0
                THEN 256 * ln(CAST(256.0 AS DOUBLE) / n_zero)
                ELSE raw END""").as("est"))

  /** Grouped [[hllRegisters]]: `(group, reg, mx)` — ≤ 256 rows per group.
    * The scalable "distinct keys per group" shape: per-(group, reg) MAX is
    * combinable, so a billion-row group costs its 256 partial rows per
    * task, never a per-group distinct set. */
  def hllRegistersBy(df: DataFrame, grpCol: String,
      keyCol: String): DataFrame = {
    val (reg, rho) = hllRegRho(keyCol)
    df.select(col(grpCol), reg.as("reg"), rho.as("rho"))
      .groupBy(col(grpCol), col("reg")).agg(max("rho").as("mx"))
  }

  /** Per-group estimates from an [[hllRegistersBy]] table: one row per
    * group with `(n_present, n_zero, est)` — same arithmetic as
    * [[hllEstimate]], grouped. */
  def hllEstimateBy(registers: DataFrame, grpCol: String): DataFrame =
    registers.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(cast(1 AS bigint), 49 - mx)")).as("sp"))
      .select(col(grpCol), col("n_present"),
        (lit(256) - col("n_present")).as("n_zero"),
        expr(s"$hllASql / (sp + (256 - n_present) * " +
          "shiftleft(cast(1 AS bigint), 49))").as("raw"))
      .select(col(grpCol), col("n_present"), col("n_zero"),
        expr("""CASE WHEN raw <= CAST(2.5 AS DOUBLE) * 256 AND n_zero > 0
                THEN 256 * ln(CAST(256.0 AS DOUBLE) / n_zero)
                ELSE raw END""").as("est"))

  // ---- Theta / KMV sketch (Beyer et al., SIGMOD 2007; the
  // ---- DataSketches theta family) --------------------------------------

  /** 48-bit hash value of a key column: the first 12 md5 hex chars as a
    * BIGINT in [0, 2^48) — the same portable instr arithmetic as
    * [[countMinTable]], so a DuckDB oracle rebuilds hash-for-hash. */
  private[graft] def hv48(keyCol: String): Column = {
    val hexVal = (c: Int) =>
      s"(instr('0123456789abcdef', substr(md5(cast($keyCol AS binary)), $c, 1)) - 1)"
    expr((2 to 12).map(hexVal).foldLeft(s"CAST(${hexVal(1)} AS BIGINT)")(
      (acc, h) => s"($acc * 16 + $h)"))
  }

  /** KMV ("k minimum values") theta sketch: the k SMALLEST DISTINCT
    * 48-bit hashes of a key column — a fixed-k mergeable distinct-count
    * summary that, unlike HLL, also supports set INTERSECTION estimates
    * (the contamination-overlap question at corpus scale).
    *
    * Scale shape: a bounded per-partition TreeSet (≤ k entries) keeps
    * each task's k smallest distinct hashes — the only imperative step,
    * the same bounded-state build the DataSketches library uses — then
    * the global k-smallest-distinct reduces over ≤ k·partitions rows.
    * Any global top-k hash is necessarily in its partition's top-k, so
    * the result is EXACTLY `SELECT DISTINCT hv ORDER BY hv LIMIT k` —
    * which is how the oracle replays it. Merge two sketches by unioning
    * and re-taking the k smallest ([[thetaUnion]]). */
  def thetaSketch(df: DataFrame, keyCol: String, k: Int = 1024): DataFrame = {
    require(k >= 16 && k <= 65536, s"k in [16, 65536]: $k")
    val sp = df.sparkSession
    import sp.implicits._
    val partial = df.select(hv48(keyCol).as("hv")).as[Long]
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h =>
          if (set.size < k) set.add(h)
          else if (h < set.last()) { if (set.add(h)) set.pollLast() }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
          .asScala.map(_.longValue())
      }
    partial.toDF("hv").distinct().orderBy("hv").limit(k)
  }

  /** Merge two [[thetaSketch]] tables built with the same k. */
  def thetaUnion(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).distinct().orderBy("hv").limit(k)

  /** One-row distinct estimate from a [[thetaSketch]]: when the sketch
    * is not full the count IS exact; otherwise `est = (k-1) / θ` with
    * `θ = kv / 2^48` (the kth smallest hash, exclusive). CAST-explicit
    * double arithmetic so the oracle's division is bit-identical. */
  def thetaEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_sk"), max("hv").as("kv"))
      .select(col("n_sk"), col("kv"),
        expr(s"""CASE WHEN n_sk < $k THEN CAST(n_sk AS DOUBLE)
                 ELSE CAST($k - 1 AS DOUBLE) *
                   CAST(281474976710656.0 AS DOUBLE) / CAST(kv AS DOUBLE)
                 END""").as("est"))

  /** Intersection estimate from two [[thetaSketch]] tables (same k):
    * θ = min of the two kth-value bounds (2^48 when a sketch holds its
    * whole set), candidates are shared hashes below θ, and
    * `est = |shared| · 2^48 / θ`. One tiny broadcast per side. */
  def thetaIntersectEstimate(a: DataFrame, b: DataFrame,
      k: Int): DataFrame = {
    val full = "CAST(281474976710656 AS BIGINT)"
    def bound(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"), max("hv").as("kv"))
        .select(expr(s"CASE WHEN n < $k THEN $full ELSE kv END").as("theta"))
    val th = bound(a).crossJoin(bound(b).withColumnRenamed("theta", "tb"))
      .select(least(col("theta"), col("tb")).as("theta"))
    val common = a.join(b, Seq("hv")).crossJoin(broadcast(th))
      .filter(col("hv") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    common.crossJoin(broadcast(th))
      .select(col("n_common"), col("theta"),
        expr("""CAST(n_common AS DOUBLE) *
          CAST(281474976710656.0 AS DOUBLE) / CAST(theta AS DOUBLE)""")
          .as("est"))
  }

  // ---- Bloom filter (Bloom, CACM 1970) ---------------------------------

  /** Bloom filter as a distinct `(i, bucket)` table: d hash rows over
    * `m = 16^hexChars` buckets — at most `d·m` rows regardless of key
    * count (the count-min layout with set-bits instead of counters).
    * Build is one pass with map-side combine; same md5 arithmetic, so
    * the oracle rebuilds the table bit-for-bit. */
  def bloomTable(df: DataFrame, keyCol: String, d: Int = 3,
      hexChars: Int = 4): DataFrame = {
    require(d >= 1 && d <= 8, s"d in [1,8]: $d")
    require(hexChars >= 1 && hexChars <= 5, s"hexChars in [1,5]: $hexChars")
    df.select(explode(entries(keyCol, d, hexChars)).as("e"))
      .select(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .distinct()
  }

  /** Collapse a [[bloomTable]] to d hex-string bitmaps (bounded driver
    * state: d · 16^hexChars bits). Row i's bitmap has hex digit
    * `bucket >> 2` carrying bit `bucket & 3` — the big-endian-nibble
    * layout `substr` can probe in both engines. */
  def bloomBitmaps(table: DataFrame, d: Int, hexChars: Int): Array[String] = {
    val m = math.pow(16, hexChars).toInt
    val bits = Array.fill(d)(new Array[Int](m / 4))
    table.collect().foreach { r =>
      val i = r.getInt(0); val b = r.getInt(1)
      bits(i)(b >> 2) |= 1 << (b & 3)
    }
    bits.map(_.map("0123456789abcdef".charAt(_)).mkString)
  }

  /** MAP-ONLY membership probe against [[bloomBitmaps]]: a pure
    * expression over the key column — the 100 TB join-prune shape (no
    * shuffle, no join; the filter rides into the scan). False positives
    * possible, false negatives impossible. */
  def bloomMightContain(keyCol: String, bitmaps: Array[String],
      hexChars: Int): Column = {
    val tests = bitmaps.indices.map { i =>
      val bucket = bucketSql(s"concat('$i:', $keyCol)", hexChars)
      // hex digit at bucket>>2 (1-based substr), test bit bucket&3 —
      // integer-only arithmetic (div is double division in SQL)
      s"""((instr('0123456789abcdef', substr('${bitmaps(i)}',
            CAST($bucket AS INT) div 4 + 1, 1)) - 1)
          & (CASE ($bucket % 4) WHEN 0 THEN 1 WHEN 1 THEN 2
             WHEN 2 THEN 4 ELSE 8 END)) > 0"""
    }
    expr(tests.mkString("(", ") AND (", ")"))
  }

  /** Estimate the count of each key in `keys` from a [[countMinTable]]
    * built with the SAME (d, hexChars): `est = min_i table[i][h_i(key)]`
    * (0 for rows whose bucket was never touched). Returns the `keys`
    * columns plus `est`. */
  def countMinEstimate(table: DataFrame, keys: DataFrame, keyCol: String,
      d: Int = 4, hexChars: Int = 3): DataFrame = {
    require(d >= 1 && d <= 8, s"d in [1,8]: $d")
    require(hexChars >= 1 && hexChars <= 5, s"hexChars in [1,5]: $hexChars")
    keys.select(col(keyCol), explode(entries(keyCol, d, hexChars)).as("e"))
      .select(col(keyCol), col("e.i").as("i"), col("e.bucket").as("bucket"))
      .join(broadcast(table), Seq("i", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(keyCol)).agg(min(col("cnt")).as("est"))
  }

  // ---- heavy hitters (Misra-Gries / space-saving) --------------------------

  /** Exact heavy hitters — every key with global count >= `threshold` and
    * its exact count — via the two-pass candidate/recount shape that makes
    * the problem tractable at 100 TB cardinality:
    *
    *  pass 1: each partition runs a bounded-memory Misra-Gries summary of
    *    `k` counters (`mapPartitions`, no pre-shuffle). The MG guarantee:
    *    a key can only be absent from a partition's summary if its local
    *    count <= n_p / (k+1), so summing over partitions any key with
    *    GLOBAL count > N/(k+1) survives in at least one summary. The
    *    emitted candidates (<= k per partition) shuffle as a tiny set.
    *  pass 2: exact recount of only the candidate keys — a broadcast
    *    semi-join filter on the corpus, then groupBy count. The shuffle
    *    carries only rows whose key is a candidate.
    *
    * Result is EXACT (candidates are a superset; the recount filter takes
    * `>= threshold`) provided `threshold > N/(k+1)`; the operator
    * validates that bound at runtime from the observed row count and
    * fails loudly instead of silently under-reporting. Output:
    * (`keyCol`, `cnt`), one row per heavy hitter. */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
      k: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(keyCol).cast("string").as("k"))
    // pass 1: per-partition Misra-Gries. Decrement phase subtracts 1 from
    // every counter when a new key arrives at capacity — the classical
    // frequent-items algorithm (Misra & Gries 1982), bounded at k entries.
    val perPart = keyed.as[String].mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]
      var n = 0L
      it.foreach { key =>
        n += 1
        if (key != null) {
          counters.get(key) match {
            case Some(c) => counters.update(key, c + 1)
            case None =>
              if (counters.size < k) counters.update(key, 1L)
              else {
                // decrement all; drop zeros (amortized O(1) per arrival)
                val dead = new scala.collection.mutable.ArrayBuffer[String]
                counters.foreach { case (kk, c) =>
                  if (c == 1L) dead += kk else counters.update(kk, c - 1)
                }
                dead.foreach(counters.remove)
              }
          }
        }
      }
      // candidates plus ONE total row per partition (null key) — N for the
      // exactness bound comes from the summaries, no extra corpus pass
      counters.keysIterator.map(kk => (kk, 0L)) ++
        Iterator((null: String, n))
    }.toDF("k", "part_n")
      .localCheckpoint(true) // tiny (<= k+1 rows/partition); both consumers
    val totalN = perPart.filter(col("k").isNull)
      .agg(coalesce(sum("part_n"), lit(0L))).first().getLong(0)
    // the MG exactness bound: threshold must exceed N/(k+1), else the
    // candidate set is not a guaranteed superset — fail loudly instead of
    // silently under-reporting heavy hitters
    require(threshold.toDouble > totalN.toDouble / (k + 1).toDouble,
      s"threshold=$threshold is not > N/(k+1) = ${totalN.toDouble / (k + 1)}" +
        s" (N=$totalN, k=$k): raise k or threshold")
    val cands = perPart.filter(col("k").isNotNull).select("k").distinct()
    keyed.join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("k").as(keyCol), col("cnt"))
  }
}
