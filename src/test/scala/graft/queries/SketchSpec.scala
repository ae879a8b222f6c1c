package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Sketch error bounds against exact answers (sketches can't be
  * oracle-hash-checked; they CAN be bounded).
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3 sigma of its rsd contract") {
    // rsd is a RELATIVE STANDARD DEVIATION, not a hard bound: allow 3σ
    SketchQ.approxDistinct(spark, dir).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_customers").toDouble
      val a1 = r.getAs[Long]("approx_customers").toDouble
      val a2 = r.getAs[Long]("approx_customers_1pct").toDouble
      assert(math.abs(a1 - exact) / exact < 0.15, s"default rsd too far: $a1 vs $exact")
      assert(math.abs(a2 - exact) / exact < 0.03, s"rsd=0.01 too far: $a2 vs $exact")
    }
  }

  test("approx_percentile lands inside the ±0.005-quantile rank bounds") {
    val rows = SketchQ.approxPercentiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the query carries its own error-bound verdicts (the hash-gated
      // contract with the oracle); they must hold on real data
      assert(r.getAs[Boolean]("approx_p50_in_bounds"), r.toString)
      assert(r.getAs[Boolean]("approx_p95_in_bounds"), r.toString)
      assert(r.getAs[Double]("exact_p50") > 0.0)
      assert(r.getAs[Double]("exact_p95") >= r.getAs[Double]("exact_p50"))
    }
  }
}
