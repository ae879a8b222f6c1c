package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Sketch error bounds against exact answers (sketches can't be
  * oracle-hash-checked; they CAN be bounded).
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3 sigma of its rsd contract") {
    // rsd is a RELATIVE STANDARD DEVIATION, not a hard bound: allow 3σ.
    // The query itself carries the verdicts (the hash-gated contract).
    val rows = SketchQ.approxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_3sigma"), r.toString)
      assert(r.getAs[Boolean]("approx_1pct_within_3sigma"), r.toString)
      assert(r.getAs[Long]("exact_customers") > 0)
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

  test("CMS heavy hitters: guarantees hold for EVERY token, not just the top-10") {
    import org.apache.spark.sql.functions._
    import graft.functions.CmsFunctions.cms_estimate
    import graft.functions.TextFunctions.tokens
    val spark2 = spark
    val toks = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(tokens(col("text"))).as("tok"))
    val sketch = toks.agg(
      expr("count_min_sketch(tok, 0.001D, 0.99D, 42)").as("sk"),
      count(lit(1)).as("n_total"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val checked = exact.crossJoin(sketch)
      .select(col("tok"), col("n"),
        cms_estimate(col("sk"), col("tok")).as("est"), col("n_total"))
    assert(checked.filter(col("est") < col("n")).count() == 0L,
      "CMS must never underestimate")
    val over = checked
      .filter(col("est") > col("n") + ceil(lit(0.001) * col("n_total")).cast("long"))
      .count()
    assert(over == 0L, s"eps-bound violations: $over")
  }
}
