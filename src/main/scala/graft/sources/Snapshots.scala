package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Table-format-lite: versioned immutable snapshots over plain parquet
  * with file-level manifests — the time-travel / isolation core of the
  * lakehouse formats (Iceberg/Delta), reduced to the part an engine
  * must get right. Each commit writes ONLY its new data files and a
  * manifest listing the full file set of that version (previous
  * version's files + the new ones — appends reuse existing files,
  * nothing is rewritten); a `_latest` pointer names the current
  * version. Readers resolve a manifest and read exactly its files, so
  * an old version stays byte-stable no matter how many commits land
  * after it, and a reader never sees a half-written commit: the
  * manifest is staged to a temp name and atomically renamed into
  * place, and files are referenced by the manifest only after they are
  * fully written (the parquet job completed).
  *
  * Deliberately NOT here: file-level deletes (q112 covers merge
  * semantics over immutable files; a production format tracks delete
  * files) and concurrent-writer conflict detection (a single-writer
  * commit protocol; formats add optimistic retry on the pointer
  * swap). Compaction IS here (r8, [[compact]]): N-small-files →
  * few-rewritten-files as a new version whose manifest drops the old
  * files — while every prior manifest keeps referencing them, so time
  * travel survives the rewrite (Iceberg `rewrite_data_files` /
  * Delta OPTIMIZE semantics, reduced to the manifest move).
  */
object Snapshots {

  private def manifestPath(root: Path, v: Int): Path =
    root.resolve("_manifests").resolve(s"$v.txt")

  /** Files of snapshot `v`, in manifest order. */
  def files(root: String, v: Int): Seq[String] = {
    val p = manifestPath(Paths.get(root), v)
    require(Files.exists(p), s"snapshot $v does not exist under $root")
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Latest committed version, 0 if the table is empty. */
  def latestVersion(root: String): Int = {
    val p = Paths.get(root).resolve("_latest")
    if (Files.exists(p)) Files.readAllLines(p).asScala.head.trim.toInt else 0
  }

  /** Write `df` into this version's data dir and return the new data
    * files, sorted. Files.list holds a DirectoryStream fd until closed
    * — a long-lived driver committing many snapshots would otherwise
    * exhaust fds.
    */
  private def writeDataFiles(df: DataFrame, rootP: Path, v: Int): Seq[String] = {
    val dataDir = rootP.resolve(s"data_v$v")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val listing = Files.list(dataDir)
    try listing.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath.toString).toSeq.sorted
    finally listing.close()
  }

  /** Atomically publish version `v` with exactly `fileSet` as its file
    * list: manifest staged under a temp name and renamed into place,
    * `_latest` swapped last — a reader never resolves a half-written
    * commit.
    */
  private def commit(rootP: Path, v: Int, fileSet: Seq[String]): Unit = {
    val tmp = rootP.resolve("_manifests").resolve(s"_tmp_$v.txt")
    Files.write(tmp, fileSet.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, manifestPath(rootP, v), StandardCopyOption.ATOMIC_MOVE)
    val latestTmp = rootP.resolve(s"_tmp_latest_$v")
    Files.write(latestTmp, v.toString.getBytes("UTF-8"))
    Files.move(latestTmp, rootP.resolve("_latest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Commit `df` as an APPEND snapshot; returns the new version. */
  def append(df: DataFrame, root: String): Int = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP.resolve("_manifests"))
    val prev = latestVersion(root)
    val v = prev + 1
    val newFiles = writeDataFiles(df, rootP, v)
    commit(rootP, v,
      (if (prev == 0) Nil else files(root, prev)) ++ newFiles)
    v
  }

  /** COMPACTION — the small-file management every append-only snapshot
    * store accumulates a need for: rewrite the LATEST version's file
    * set into `targetFiles` consolidated files and commit them as a
    * new version whose manifest references ONLY the rewritten files.
    * The original data files are never modified or deleted, and every
    * prior manifest still lists them — so time travel to any
    * pre-compaction version reads exactly the bytes it always did,
    * while readers of the new version scan `targetFiles` files instead
    * of the append-accumulated many (at 100 TB the difference is task
    * scheduling and footer overhead: thousands of splits per manifest
    * resolve vs the write-amplification of one bounded rewrite).
    * Content is byte-identical by construction — one read of the prior
    * manifest, one round-robin redistribution, no row logic on the
    * path. Returns the new version.
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int): Int = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    val rootP = Paths.get(root)
    val prev = latestVersion(root)
    require(prev > 0, s"nothing to compact under $root")
    val v = prev + 1
    // round-robin repartition: balances output file sizes regardless of
    // the key distribution that shaped the appends (the production
    // default for a pure file-count rewrite)
    val newFiles = writeDataFiles(
      read(spark, root, prev).repartition(targetFiles), rootP, v)
    commit(rootP, v, newFiles)
    v
  }

  /** Time-travel read of snapshot `v` (defaults to latest). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version == -1) latestVersion(root) else version
    spark.read.parquet(files(root, v): _*)
  }

  /** SNAPSHOT EXPIRATION — the garbage-collection half of the
    * compaction story (Iceberg `expire_snapshots` / Delta VACUUM):
    * drop every version < `keepFrom` and delete the data files no
    * retained manifest references. Until expiration runs, a compacted
    * table holds BOTH the original small files (for time travel) and
    * the rewritten ones; expire is the explicit, destructive decision
    * to give the history up. Retention is manifest-driven: a file
    * shared between an expired and a retained version survives
    * (appends reuse files across versions, so reference counting, not
    * version age, decides deletion). Time travel to any version ≥
    * `keepFrom` is untouched; reading an expired version fails loudly
    * at manifest resolution. Returns the number of data files deleted.
    */
  def expire(root: String, keepFrom: Int): Int = {
    val rootP = Paths.get(root)
    val latest = latestVersion(root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom must be in [1, $latest]: $keepFrom")
    val retained = (keepFrom to latest).flatMap(files(root, _)).toSet
    // a version expired by an earlier sweep has no manifest — skip it
    // (expire is idempotent and re-runnable with a larger keepFrom)
    val expiredVersions = (1 until keepFrom)
      .filter(v => Files.exists(manifestPath(rootP, v)))
    val doomed = expiredVersions.flatMap(files(root, _)).distinct
      .filterNot(retained.contains)
    // files first, manifests second: an interrupted expire leaves a
    // manifest naming missing files (a LOUD read failure) rather than
    // an orphaned file set no manifest can reach silently leaking disk
    doomed.foreach(f => Files.deleteIfExists(Paths.get(f)))
    expiredVersions.foreach(v => Files.deleteIfExists(manifestPath(rootP, v)))
    doomed.size
  }
}
