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

  // ONE memo protocol, not a second hand-rolled copy of it (r18
  // review): the evict-stopped-sessions + per-key-monitor +
  // double-check machinery lives in [[SessionMemo]] — the "one
  // spelling" this file itself established — and this object only
  // contributes the parquet staging. A FAILED build deletes its
  // staged directory before rethrowing, so retries don't accumulate
  // orphan temp trees; the build thunk is released once the artifact
  // materializes.
  private val memo =
    new SessionMemo[(SparkSession, String, String), DataFrame](_._1)

  /** Build `df` once per (session, dir, name), write it as parquet to a
    * reaped temp directory, and return a reader over the written files.
    * The build runs EAGERLY on first call (the write is an action);
    * every subsequent call — and every plan branch of every consumer —
    * scans the columnar files instead of recomputing or
    * java-deserializing the lineage.
    */
  def parquet(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame =
    memo.get((spark, dir, name)) {
      val stage = Staging.tempDir(s"graft_artifact_${name}_")
      val path = stage.resolve("data").toString
      try build.write.mode("overwrite").parquet(path)
      catch { case e: Throwable => Staging.delTree(stage); throw e }
      spark.read.parquet(path)
    }
}

/** Session-keyed memo with [[ArtifactStore.parquet]]'s concurrency and
  * lifecycle contract, for the in-memory artifacts (checkpointed
  * doc-/vocab-sized tables, broadcast model rows, metering baselines)
  * that don't warrant a parquet write: entries of STOPPED sessions are
  * evicted on every access (a static map would otherwise pin the
  * session, its DataFrames and their plans for the JVM lifetime — the
  * r16 ArtifactStore finding, found again in indexStatsMemo by the r17
  * review), and the multi-second build runs under a PER-KEY monitor,
  * never inside a ConcurrentHashMap bin lock (an eager computeIfAbsent
  * body blocks unrelated keys hashing to the same bin and deadlocks on
  * recursive resolution). One spelling for every query-module memo —
  * the per-file CHMs this replaces each re-decided eviction (none did)
  * and lock scope (all built inside the bin lock).
  *
  * `sessionOf` extracts the owning session from the key (keys vary:
  * (session, dir), (session, dir, name)).
  */
final class SessionMemo[K, V](sessionOf: K => SparkSession) {
  private val done = new ConcurrentHashMap[K, Any]()
  private val locks = new ConcurrentHashMap[K, Object]()

  def get(k: K)(build: => V): V = {
    done.keySet.removeIf(key => sessionOf(key).sparkContext.isStopped)
    locks.keySet.removeIf(key => sessionOf(key).sparkContext.isStopped)
    val hit = done.get(k)
    if (hit != null) return hit.asInstanceOf[V]
    val lock = locks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      val again = done.get(k)
      if (again != null) again.asInstanceOf[V]
      else { val v = build; done.put(k, v.asInstanceOf[AnyRef]); v }
    }
  }
}
