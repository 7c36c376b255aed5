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

  private def md5Bucket(tok: String, hexChars: Int): Column = {
    val hexVal = (c: Int) =>
      s"(instr('0123456789abcdef', substr(md5(cast($tok AS binary)), $c, 1)) - 1)"
    expr((1 to hexChars).map(hexVal)
      .reduceLeft((acc, h) => s"($acc * 16 + $h)")).cast("int")
  }

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
}
