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
  * Deliberately NOT here: file-level deletes/compaction (q112 covers
  * merge semantics over immutable files; a production format tracks
  * delete files or rewrites data files and drops the old ones from the
  * next manifest) and concurrent-writer conflict detection (a
  * single-writer commit protocol; formats add optimistic retry on the
  * pointer swap).
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

  /** Commit `df` as an APPEND snapshot; returns the new version. */
  def append(df: DataFrame, root: String): Int = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP.resolve("_manifests"))
    val prev = latestVersion(root)
    val v = prev + 1
    val dataDir = rootP.resolve(s"data_v$v")
    df.write.mode("overwrite").parquet(dataDir.toString)
    // Files.list holds a DirectoryStream fd until closed — a long-lived
    // driver committing many snapshots would otherwise exhaust fds
    val listing = Files.list(dataDir)
    val newFiles =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath.toString).toSeq.sorted
      finally listing.close()
    val all = (if (prev == 0) Nil else files(root, prev)) ++ newFiles
    val tmp = rootP.resolve("_manifests").resolve(s"_tmp_$v.txt")
    Files.write(tmp, all.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, manifestPath(rootP, v), StandardCopyOption.ATOMIC_MOVE)
    val latestTmp = rootP.resolve(s"_tmp_latest_$v")
    Files.write(latestTmp, v.toString.getBytes("UTF-8"))
    Files.move(latestTmp, rootP.resolve("_latest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Time-travel read of snapshot `v` (defaults to latest). */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version == -1) latestVersion(root) else version
    spark.read.parquet(files(root, v): _*)
  }
}
