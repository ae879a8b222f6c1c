package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.Tables

/** SemDeDup machinery checks at sf0.001 (cluster-bucketed semantic
  * near-dup pairs + keep-canonical dedup).
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding")

  test("single cluster + one replica degrades to the exact all-pairs result") {
    val oneCenter = Similarity.kmeansCenters(embs, numCentroids = 1)
    val sem = Similarity.semanticPairs(embs, threshold = 0.4,
        centers = oneCenter, replicas = 1)
      .select($"id_a", $"id_b", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.thresholdPairs(
        embs.withColumn("one", lit(1)), blockCol = "one", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sem == exact)
    assert(sem.nonEmpty || exact.isEmpty)
  }

  test("planted near-identical copies are paired and deduped to one survivor each") {
    val planted = embs.filter($"vec_id" < 20)
      .select((-$"vec_id" - lit(1L)).as("vec_id"),
        transform($"embedding", (x, i) =>
          (x * when(pmod(i, lit(2)) === 0, lit(1.005)).otherwise(lit(0.995)))
            .cast("float")).as("embedding"))
    val aug = embs.unionByName(planted)
    val centers = Similarity.kmeansCenters(embs, numCentroids = 16)
    val pairs = Similarity.semanticPairs(aug, threshold = 0.95, centers = centers)
    val plantedPairs = pairs
      .filter($"id_a" === -$"id_b" - lit(1L) && $"id_b" < 20).count()
    assert(plantedPairs == 20L, "every planted pair must share a cluster and score >= 0.95")

    val survivors = Similarity.semanticDedup(aug, threshold = 0.95, centers = centers)
    assert(survivors.count() == embs.count(),
      "each 2-node planted component loses exactly one member")
    // canonical = min id = the negative planted copy
    assert(survivors.filter($"vec_id" < 0).count() == 20L)
  }

  test("empty centers and empty corpus yield empty results") {
    assert(Similarity.semanticPairs(embs, 0.9, centers = Nil).count() == 0L)
    val empty = embs.filter(lit(false))
    val c = Similarity.kmeansCenters(empty)
    assert(c.isEmpty)
    assert(Similarity.semanticPairs(empty, 0.9, centers = Nil).count() == 0L)
  }
}
