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
  def compact(spark: SparkSession, root: String, targetFiles: Int,
              sortBy: Option[String] = None): Int = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    val rootP = Paths.get(root)
    val prev = latestVersion(root)
    require(prev > 0, s"nothing to compact under $root")
    val v = prev + 1
    val prevData = read(spark, root, prev)
    // sortBy: CLUSTERED compaction (Iceberg sort-order rewrite / Delta
    // OPTIMIZE ZORDER's 1-column case) — range-partition + sort within,
    // so each output file covers a disjoint key range and footer
    // min/max stats turn [[readPruned]] into genuine file skipping.
    // Without it: round-robin, balancing file sizes regardless of the
    // key distribution that shaped the appends (the production default
    // for a pure file-count rewrite).
    val reshaped = sortBy match {
      case Some(c) => prevData
        .repartitionByRange(targetFiles, org.apache.spark.sql.functions.col(c))
        .sortWithinPartitions(c)
      case None => prevData.repartition(targetFiles)
    }
    val newFiles = writeDataFiles(reshaped, rootP, v)
    commit(rootP, v, newFiles)
    v
  }

  /** Per-file (path, min, max) statistics of a LONG column, read from
    * the parquet FOOTERS of snapshot `v`'s manifest — the stand-in for
    * the column stats a lakehouse manifest stores beside each data
    * file. Driver-side metadata reads only (one footer per file, no
    * data pages); a rowless file yields no stats and is omitted (it
    * can never match a predicate). At production scale these values
    * are written into the manifest at commit time rather than
    * re-derived per query; deriving from footers keeps the manifest
    * format plain here while exercising the same pruning algebra.
    */
  def fileStats(spark: SparkSession, root: String, version: Int,
                column: String): Seq[(String, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files(root, version).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val chunks = reader.getFooter.getBlocks.asScala.flatMap(
          _.getColumns.asScala.filter(
            _.getPath.toDotString == column))
        val stats = chunks.map(_.getStatistics).filter(s =>
          s != null && s.hasNonNullValue)
        if (stats.isEmpty) None
        else Some((f,
          stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max))
      } finally reader.close()
    }
  }

  /** The manifest files of snapshot `v` whose [column min, max] range
    * overlaps [lo, hi] — the file-skipping half of stats-based pruning.
    */
  def prunedFiles(spark: SparkSession, root: String, version: Int,
                  column: String, lo: Long, hi: Long): Seq[String] =
    fileStats(spark, root, version, column)
      .collect { case (f, mn, mx) if mx >= lo && mn <= hi => f }

  /** Stats-pruned time-travel read: scan ONLY the files whose footer
    * min/max overlap [lo, hi], then apply the exact row predicate
    * (stats prune files; the predicate keeps correctness — exactly a
    * lakehouse reader's split-planning contract). After a clustered
    * [[compact]] on `column`, a narrow range touches one file of N.
    */
  def readPruned(spark: SparkSession, root: String, version: Int,
                 column: String, lo: Long, hi: Long): DataFrame = {
    val keep = prunedFiles(spark, root, version, column, lo, hi)
    val base =
      if (keep.nonEmpty) spark.read.parquet(keep: _*)
      // all files skipped: empty relation, original schema
      else read(spark, root, version)
        .where(org.apache.spark.sql.functions.lit(false))
    base.where(org.apache.spark.sql.functions.col(column).between(lo, hi))
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
