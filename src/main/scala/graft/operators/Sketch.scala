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
