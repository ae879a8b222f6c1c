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

  test("approx_percentile within 1% of exact at p50/p95") {
    SketchQ.approxPercentiles(spark, dir).collect().foreach { r =>
      val approx = r.getAs[scala.collection.Seq[Double]]("approx_p")
      val exact = r.getAs[scala.collection.Seq[Double]]("exact_p")
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
      }
    }
  }
}
