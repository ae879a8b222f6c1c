package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped PARQUET materialization for derived artifacts with
  * more than one consumer — the near-dup pair list, the per-doc bigram
  * multiset, the tf-postings table.
  *
  * Why parquet and not a persisted/`localCheckpoint`ed plan: a
  * corpus-sized artifact pinned at MEMORY_AND_DISK competes with every
  * later query's execution memory (the r7 battery-tail drift), and at
  * DISK_ONLY each consumer pays a java-serialized row-by-row block read
  * per run (the r8 q139 9.9 s constant — the serialized rows are bigger
  * than the source text). A parquet artifact is written ONCE and every
  * re-read is a columnar, compressed, vectorized scan with column
  * pruning and predicate pushdown — strictly the production shape: at
  * 100 TB a shared artifact (near-dup pairs, an inverted index's
  * postings) is a written table beside the corpus that downstream
  * reports scan like any other input, not an executor-memory resident.
  *
  * The memo key is (session, input dir, artifact name): each scale
  * factor gets its own materialization, nothing leaks across sessions,
  * and repeat consumers get the SAME DataFrame (plan reuse on top of
  * the file reuse). The backing directory is a [[Staging.tempDir]] —
  * reaped at JVM exit, same lifetime the localCheckpoint blocks had.
  */
object ArtifactStore {

  // The map memoizes a LAZY holder, not the built value: the
  // multi-second Spark write action must execute OUTSIDE the CHM bin
  // lock (advisor r9 — an eager computeIfAbsent body blocks unrelated
  // keys hashing to the same bin for the whole build, and a build that
  // itself resolves another artifact recursively would deadlock or
  // throw IllegalStateException). computeIfAbsent only ALLOCATES the
  // lazy cell under the lock; the first thread to force it runs the
  // build, later threads block on the cell's own initializer — the
  // exact once-per-key guarantee, minus the map-wide lock hold.
  private val memo =
    new ConcurrentHashMap[(SparkSession, String, String), () => DataFrame]()

  /** Build `df` once per (session, dir, name), write it as parquet to a
    * reaped temp directory, and return a reader over the written files.
    * The build runs EAGERLY on first call (the write is an action);
    * every subsequent call — and every plan branch of every consumer —
    * scans the columnar files instead of recomputing or
    * java-deserializing the lineage.
    */
  def parquet(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val cell = memo.computeIfAbsent((spark, dir, name), _ => {
      lazy val built: DataFrame = {
        val path = Staging.tempDir(s"graft_artifact_${name}_")
          .resolve("data").toString
        build.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      () => built
    })
    cell()
  }
}
