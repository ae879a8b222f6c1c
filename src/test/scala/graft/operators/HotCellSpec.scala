package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Hot-cell contract of the centroid-bucketed similarity joins (r15):
  * a planted dense cluster — the clustered-corpus reality the
  * "balanced cells" sizing premise ignores — must be CAPPED out of
  * candidate generation (bounding the per-cell join fan-in) and
  * REPORTED via [[Similarity.droppedCells]], never silently joined or
  * silently lost. Pinning the cap off restores the cap-free ideal the
  * gate oracles model.
  */
class HotCellSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // three well-separated 2-d centers; assignment is unambiguous
  private val ctrs: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))
  // dense cluster: 30 near-identical vectors in cell 0 (cos ≈ 1)
  private def dense = (0 until 30).map(i =>
    (i.toLong, Seq(1.0, 0.0001 * i)))
  // sparse cluster: 5 vectors in cell 1
  private def sparse = (100 until 105).map(i =>
    (i.toLong, Seq(0.0001 * (i - 100), 1.0)))
  private def corpus = (dense ++ sparse).toDF("vec_id", "embedding")

  test("droppedCells reports exactly the over-cap cell with its population") {
    val rep = Similarity.droppedCells(corpus, ctrs, replicas = 1,
        maxCellSize = 10)
      .as[(Int, Long)].collect().toSeq
    assert(rep == Seq((0, 30L)),
      s"expected the dense cell (0, 30) and nothing else, got $rep")
    assert(Similarity.droppedCells(corpus, ctrs, replicas = 1,
      maxCellSize = 30).count() == 0, "cap at the population is not over-cap")
  }

  test("knnJoin caps the hot index cell: candidates bounded, drop scoped, cap-off restores") {
    val left = Seq((1000L, Seq(1.0, 0.0)), (1001L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    def run(cap: Long) = Similarity.knnJoin(left, corpus, k = 3,
        centers = Some(ctrs), nProbe = 1, replicas = 1, maxCellSize = cap)
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toSet
    val capped = run(10)
    // the dense cell dropped: the probe into it finds nothing, and NO
    // dense-cluster id appears anywhere — the fan-in bound in action
    assert(!capped.exists(_._2 < 100), s"dense-cell candidate leaked: $capped")
    // recall loss is SCOPED to the reported cell: the sparse probe is whole
    assert(capped.count(_._1 == 1001L) == 3)
    val uncapped = run(Long.MaxValue)
    assert(uncapped.count(_._1 == 1000L) == 3 &&
      uncapped.filter(_._1 == 1000L).forall(_._2 < 100),
      "cap off must restore the dense cell's neighbors")
    assert(uncapped.filter(_._1 == 1001L) == capped.filter(_._1 == 1001L))
  }

  test("semanticPairs caps the hot cell: quadratic pair set suppressed and reported, cap-off restores") {
    def pairs(cap: Long) = Similarity.semanticPairs(corpus, threshold = 0.9,
        centers = ctrs, replicas = 1, maxCellSize = cap)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val capped = pairs(10)
    // the 30·29/2 dense pairs are suppressed; the sparse cell's 10 survive
    assert(capped == (for (a <- 100 until 105; b <- a + 1 until 105)
      yield (a.toLong, b.toLong)).toSet,
      s"capped pair set must be exactly the sparse cell's, got ${capped.size}")
    val uncapped = pairs(Long.MaxValue)
    assert(uncapped.size == capped.size + 30 * 29 / 2,
      "cap off must restore the dense cluster's full pair set")
  }
}
