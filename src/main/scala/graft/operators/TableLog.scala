package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned table log — the transaction-log core of the
  * Delta/Iceberg table formats, reduced to what a single-writer pipeline
  * needs: atomic version commits, snapshot-isolated reads, time travel,
  * and vacuum. Pairs with [[Changelog]]: CDC apply produces the new file
  * set, the log makes it visible atomically.
  *
  * Layout under the table root:
  * {{{
  *   data/v00001-part-*.parquet     -- immutable data files
  *   _graft_log/v00001.json         -- {"version":1,"files":[...]}
  * }}}
  * Each log entry lists the COMPLETE file set visible at that version
  * (relative paths) — O(files) per commit, the simple-correct form; the
  * manifest-delta encoding real formats use is an optimization of this.
  *
  * Concurrency: a commit stages its JSON and publishes it with an atomic
  * rename to `v{N}.json`; two writers racing to the same N — one wins,
  * the loser gets a loud conflict (optimistic concurrency, the Delta
  * protocol's essence). Readers resolve a version by reading ONE json —
  * never by listing data files, so stale/orphaned files are invisible
  * until vacuumed.
  *
  * Scale: log entries are driver-side metadata (one small JSON per
  * commit); data reads/writes stay fully distributed. Local-fs renames —
  * object stores swap via conditional PUT, same logic. */
object TableLog {

  final case class Snapshot(version: Int, files: Seq[String])

  private def logDir(dir: String) = Paths.get(dir, "_graft_log")
  private def vJson(v: Int) = f"v$v%05d.json"

  /** Latest committed version; 0 = empty table (no commits). */
  def currentVersion(dir: String): Int = {
    val ld = logDir(dir)
    if (!Files.exists(ld)) 0
    else {
      val s = Files.list(ld)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.matches("v\\d{5}\\.json"))
        .map(_.substring(1, 6).toInt).foldLeft(0)(math.max)
      finally s.close()
    }
  }

  /** The file set visible at `version` (time travel); latest if -1. */
  def snapshot(dir: String, version: Int = -1): Snapshot = {
    val v = if (version == -1) currentVersion(dir) else version
    require(v >= 1, s"no committed version in $dir (asked $version)")
    val p = logDir(dir).resolve(vJson(v))
    require(Files.exists(p), s"version $v not found in $dir (vacuumed?)")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(Files.readAllBytes(p))
    val files = node.get("files").elements().asScala
      .map(_.asText()).toSeq
    Snapshot(node.get("version").asInt(), files)
  }

  /** Publish `files` (relative paths) as the next version. Atomic:
    * stage + rename; a concurrent committer to the same version makes
    * exactly one winner and one loud conflict. `expectedVersion` is the
    * optimistic-concurrency handle: a writer that planned its commit
    * against version N−1 passes N and conflicts if someone else
    * published N first; -1 re-reads the log at publish time. Returns
    * the committed version. */
  def commit(dir: String, files: Seq[String],
      expectedVersion: Int = -1): Int = {
    val ld = logDir(dir)
    Files.createDirectories(ld)
    val v = if (expectedVersion > 0) expectedVersion
            else currentVersion(dir) + 1
    val json = s"""{"version":$v,"files":[${
      files.map(f => "\"" + f.replace("\"", "\\\"") + "\"").mkString(",")}]}"""
    val tmp = Files.createTempFile(ld, s".tmp-v$v-", ".json")
    Files.write(tmp, json.getBytes("UTF-8"))
    // createLink, not move: POSIX rename() REPLACES an existing target
    // (ATOMIC_MOVE included — last-writer-wins, the wrong winner), while
    // hard-link creation is atomic AND fails with EEXIST — exactly the
    // first-committer-wins primitive optimistic concurrency needs.
    try {
      Files.createLink(ld.resolve(vJson(v)), tmp)
      Files.deleteIfExists(tmp)
      v
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent commit conflict on version $v of $dir")
    }
  }

  /** Write `df` as this version's new data files (staged, then moved
    * under `data/` with version-prefixed names) and return their
    * relative paths — not yet committed. */
  private def writeData(df: DataFrame, dir: String, v: Int): Seq[String] = {
    val staging = Files.createTempDirectory("graft_tablelog").toString
    df.write.mode("overwrite").parquet(staging)
    val dataDir = Paths.get(dir, "data")
    Files.createDirectories(dataDir)
    val s = Files.list(Paths.get(staging))
    try s.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val rel = f"data/v$v%05d-${p.getFileName.toString}"
        Files.move(p, Paths.get(dir).resolve(rel),
          StandardCopyOption.ATOMIC_MOVE)
        rel
      }.toSeq
    finally s.close()
  }

  /** Append `df` as a new version (previous files + the new ones). */
  def append(df: DataFrame, dir: String): Int = {
    val prev = if (currentVersion(dir) >= 1) snapshot(dir).files
               else Seq.empty[String]
    val v = currentVersion(dir) + 1
    commit(dir, prev ++ writeData(df, dir, v))
  }

  /** Replace the table contents with `df` as a new version. Old files
    * stay on disk (still referenced by older versions) until [[vacuum]]. */
  def overwrite(df: DataFrame, dir: String): Int = {
    val v = currentVersion(dir) + 1
    commit(dir, writeData(df, dir, v))
  }

  /** Snapshot-isolated read at `version` (latest if -1): resolves the
    * file set from ONE log json, never from directory listing. */
  def read(spark: SparkSession, dir: String, version: Int = -1): DataFrame = {
    val snap = snapshot(dir, version)
    val abs = snap.files.map(f => Paths.get(dir).resolve(f).toString)
    spark.read.parquet(abs: _*)
  }

  /** Drop versions < `keepFrom` and delete data files no retained
    * version references. Returns the deleted file paths (relative). */
  def vacuum(dir: String, keepFrom: Int): Seq[String] = {
    val cur = currentVersion(dir)
    require(keepFrom >= 1 && keepFrom <= cur,
      s"keepFrom $keepFrom out of range [1, $cur]")
    val referenced = (keepFrom to cur)
      .flatMap(v => snapshot(dir, v).files).toSet
    val dataDir = Paths.get(dir, "data")
    val doomed =
      if (!Files.exists(dataDir)) Seq.empty[String]
      else {
        val s = Files.list(dataDir)
        try s.iterator.asScala.map(p => "data/" + p.getFileName.toString)
          .filterNot(referenced).toSeq
        finally s.close()
      }
    doomed.foreach(f => Files.deleteIfExists(Paths.get(dir).resolve(f)))
    (1 until keepFrom).foreach(v =>
      Files.deleteIfExists(logDir(dir).resolve(vJson(v))))
    doomed
  }
}
