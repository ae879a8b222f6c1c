package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Q-digest published contracts, asserted directly on the Aggregator
  * (rank-error bound, merge associativity of the bound, state size)
  * and once through the Spark path at two partitionings.
  */
class QDigestSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val log2U = 16
  private val k = 256
  private val probes = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
  private def agg = new QDigest.Quantiles(log2U, k, probes)

  // deterministic skewed stream: squares mod 2^16 with heavy repeats
  private val xs: Seq[Long] =
    (0 until 20000).map(i => ((i.toLong * i) % 7919) * 8 % (1L << 16))

  private def checkBounds(est: Array[Long], data: Seq[Long]): Unit = {
    val n = data.size.toLong
    val eps = math.ceil(n.toDouble * log2U / k).toLong
    val sorted = data.sorted
    for ((p, e) <- probes.zip(est)) {
      val target = math.max(1L, math.ceil(p * n).toLong)
      val lt = sorted.count(_ < e).toLong
      val le = sorted.count(_ <= e).toLong
      assert(lt <= target + eps && le >= target - eps,
        s"probe $p: est $e has lt=$lt le=$le target=$target eps=$eps")
    }
  }

  test("rank-error bound holds on a one-shot build") {
    val st = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    checkBounds(agg.finish(st), xs)
  }

  test("bound survives arbitrary merge shapes; state stays digest-sized") {
    for (ways <- Seq(2, 7, 32)) {
      val parts = xs.grouped(math.max(1, xs.size / ways)).toSeq
      val states = parts.map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val merged = states.reduce((a, b) => agg.merge(a, b))
      assert(merged.n == xs.size)
      assert(merged.m.size <= 8 * k,
        s"merged state not digest-sized: ${merged.m.size} nodes")
      checkBounds(agg.finish(merged), xs)
    }
  }

  test("mass is conserved through compression") {
    val st = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    val total = {
      var s = 0L
      val it = st.m.values().iterator()
      while (it.hasNext) s += it.next()
      s
    }
    assert(total == xs.size.toLong && st.n == xs.size.toLong)
  }

  test("spark path: bounds hold at two partitionings") {
    for (parts <- Seq(3, 17)) {
      val est = xs.toDF("x").repartition(parts)
        .agg(QDigest.qdigest_quantiles(
          org.apache.spark.sql.functions.col("x"), log2U, k, probes).as("q"))
        .as[Array[Long]].head()
      checkBounds(est, xs)
    }
  }

  test("empty input yields the -1 sentinel") {
    assert(agg.finish(agg.zero).toSeq == probes.map(_ => -1L))
  }

  test("NULL inputs are skipped like percentile (not crashed, not counted as 0)") {
    import spark.implicits._
    val withNulls = (xs.map(Option(_)) ++ Seq(None, None)).toDF("x")
    val est = withNulls
      .agg(QDigest.qdigest_quantiles(
        org.apache.spark.sql.functions.col("x"), log2U, k, probes).as("q"))
      .as[Array[Long]].head()
    checkBounds(est, xs)  // bounds over the NON-NULL values only
  }
}
