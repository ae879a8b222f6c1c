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

  test("knnJoin salts the hot index cell: bit-identical results, no candidate lost") {
    val left = Seq((1000L, Seq(1.0, 0.0)), (1001L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    def run(cap: Long) = Similarity.knnJoin(left, corpus, k = 3,
        centers = Some(ctrs), nProbe = 1, replicas = 1, maxCellSize = cap)
      .select($"left_id", $"right_id", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    // the dense cell (30 rows) splits over ⌈30/4⌉ sub-keys at cap 4;
    // the salted join must return EXACTLY the unsalted join's rows —
    // per-pair work is inherent, only its shuffle placement changes
    val salted = run(4)
    val unsalted = run(Long.MaxValue)
    assert(salted == unsalted,
      s"salting lost/invented candidates: ${salted diff unsalted} / ${unsalted diff salted}")
    // the dense probe found its neighbors INSIDE the hot cell
    assert(salted.count(_._1 == 1000L) == 3 &&
      salted.filter(_._1 == 1000L).forall(_._2 < 100))
    // a cap larger than every cell is a true no-op path too
    assert(run(1000) == unsalted)
  }

  test("knnJoin salting composes with replicas dedup and dropSameId") {
    // self-join over the corpus itself: replicas = 2 makes pairs
    // reachable through two cells, dropSameId excludes the trivial hit
    def run(cap: Long) = Similarity.knnJoin(corpus, corpus, k = 2,
        centers = Some(ctrs), nProbe = 2, replicas = 2,
        dropSameId = true, maxCellSize = cap)
      .select($"left_id", $"right_id", $"rn").as[(Long, Long, Int)]
      .collect().toSet
    assert(run(4) == run(Long.MaxValue),
      "salting must stay invisible under multi-replica dedup")
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

  test("semanticPairs Distribute: hot cell triangle-split, bit-identical to cap-off") {
    def pairs(cap: Long, policy: Similarity.HotCellPolicy) =
      Similarity.semanticPairs(corpus, threshold = 0.9, centers = ctrs,
          replicas = 1, maxCellSize = cap, hotCells = policy)
        .select($"id_a", $"id_b", $"cosine")
        .as[(Long, Long, Double)].collect().toSet
    val ideal = pairs(Long.MaxValue, Similarity.HotCellPolicy.Drop)
    // the 30-row dense cell splits into ⌈30/4⌉ = 8 blocks at cap 4 —
    // 36 block-pair keys — and must reproduce EVERY pair bit-for-bit
    val distributed = pairs(4, Similarity.HotCellPolicy.Distribute)
    assert(distributed == ideal,
      s"distribute lost/invented pairs: ${ideal diff distributed} / ${distributed diff ideal}")
    assert(ideal.count { case (a, b, _) => a < 100 && b < 100 } == 30 * 29 / 2,
      "fixture sanity: the dense cluster's full triangle is in the ideal")
    // no hot cell ⇒ Distribute is the plain self-join (cap above all)
    assert(pairs(1000, Similarity.HotCellPolicy.Distribute) == ideal)
  }

  test("semanticPairs Distribute drops NULL-id and duplicate-id pairs exactly like the plain join") {
    // the plain join's a.id < b.id silently never pairs a NULL id or
    // two rows sharing an id; Distribute's least/greatest spelling
    // must not resurrect them as invented (x, x) self-pairs when the
    // cap engages (r16 review finding)
    val tainted = corpus.unionByName(Seq(
        (Option.empty[Long], Seq(1.0, 0.0011)),   // NULL id in the hot cell
        (Option(7L), Seq(1.0, 0.0012))            // duplicates dense id 7
      ).toDF("vec_id", "embedding"))
    def pairs(cap: Long, policy: Similarity.HotCellPolicy) =
      Similarity.semanticPairs(tainted, threshold = 0.9, centers = ctrs,
          replicas = 1, maxCellSize = cap, hotCells = policy)
        .select($"id_a", $"id_b", $"cosine")
        .as[(Option[Long], Option[Long], Double)].collect().toSet
    val ideal = pairs(Long.MaxValue, Similarity.HotCellPolicy.Drop)
    val dist = pairs(4, Similarity.HotCellPolicy.Distribute)
    assert(dist == ideal,
      s"distribute diverged under NULL/dup ids: ${ideal diff dist} / ${dist diff ideal}")
    assert(!ideal.exists { case (a, b, _) => a.isEmpty || b.isEmpty || a == b },
      "fixture sanity: the plain join never emits NULL-id or self pairs")
  }

  test("semanticPairs Distribute composes with replicas > 1 (cross-cell dedup intact)") {
    def run(cap: Long, policy: Similarity.HotCellPolicy) =
      Similarity.semanticPairs(corpus, threshold = 0.9, centers = ctrs,
          replicas = 2, maxCellSize = cap, hotCells = policy)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    val ideal = run(Long.MaxValue, Similarity.HotCellPolicy.Drop)
    val dist = run(4, Similarity.HotCellPolicy.Distribute)
    assert(dist.toSet == ideal.toSet, "pair set must match cap-off")
    assert(dist.size == dist.toSet.size,
      "a pair reachable through two cells (or two block keys) must emit once")
  }
}
