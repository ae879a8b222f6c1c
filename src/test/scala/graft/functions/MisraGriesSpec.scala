package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Misra–Gries published contracts on the Aggregator directly
  * (undercount bound, heavy-hitter completeness, ≤ k counters, bound
  * stability across merge shapes) and once through the Spark path.
  */
class MisraGriesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val k = 8
  private def agg = new MisraGries.Summary(k)

  // skewed stream: item i appears ~ 3000/i times (Zipf-ish), plus a
  // long tail of singletons
  private val xs: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(3000 / i)(s"w$i")) ++
      (0 until 2000).map(i => s"tail$i")

  private def exact: Map[String, Long] =
    xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  private def check(sum: Map[String, Long]): Unit = {
    val n = xs.size.toLong
    val thr = n / (k + 1)
    assert(sum.size <= k, s"summary over budget: ${sum.size}")
    for ((w, c) <- exact) {
      val est = sum.getOrElse(w, 0L)
      assert(est <= c, s"$w overestimated: $est > $c")
      assert(est >= c - thr, s"$w undercut past the bound: $est < $c - $thr")
      if (c > thr) assert(sum.contains(w), s"heavy hitter $w missing")
    }
  }

  test("bounds and completeness on a one-shot build") {
    val st = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    check(agg.finish(st))
  }

  test("bounds survive arbitrary merge shapes") {
    for (ways <- Seq(2, 5, 16)) {
      val states = xs.grouped(math.max(1, xs.size / ways)).toSeq
        .map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val merged = states.reduce((a, b) => agg.merge(a, b))
      assert(merged.n == xs.size)
      check(agg.finish(merged))
    }
  }

  test("spark path: bounds hold at two partitionings") {
    for (parts <- Seq(3, 17)) {
      val sum = xs.toDF("w").repartition(parts)
        .agg(MisraGries.mg_summary(
          org.apache.spark.sql.functions.col("w"), k).as("mg"))
        .as[Map[String, Long]].head()
      check(sum)
    }
  }

  test("NULL values are skipped like built-in aggregates (no null map key crash)") {
    // a null key would survive to finish() and Catalyst's map encoder
    // throws "Cannot use null as map key" — far from the cause (r16)
    val withNulls = (xs.map(Option(_)) ++ Seq.fill(5)(Option.empty[String]))
      .toDF("w")
    val sum = withNulls
      .agg(MisraGries.mg_summary(
        org.apache.spark.sql.functions.col("w"), k).as("mg"))
      .as[Map[String, Long]].head()
    check(sum)
    assert(!sum.contains(null))
  }
}
