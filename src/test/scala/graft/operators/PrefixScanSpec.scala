package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[PrefixScan.strictPrefixMax]] must reproduce the single-partition
  * window it replaces, bit for bit, including the empty-prefix null —
  * checked across bucket counts that exercise the degenerate (1
  * bucket), balanced, and more-buckets-than-rows layouts.
  */
class PrefixScanSpec extends AnyFunSuite with SparkTestSession {

  private def fixture = {
    import spark.implicits._
    // keys deliberately non-contiguous and out of insertion order;
    // values non-monotone so the running max actually changes hands
    Seq((40L, 7), (10L, 3), (25L, 9), (17L, 1), (60L, 2), (55L, 9),
        (31L, 4), (12L, 8), (90L, 5), (77L, 6), (44L, 2), (23L, 3))
      .toDF("k", "v")
  }

  private def reference = {
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fixture.withColumn("pm", max(col("v")).over(w))
      .orderBy(col("k")).collect().map(r =>
        (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.get(2)))
  }

  for (buckets <- Seq(1, 3, 32)) {
    test(s"matches the global-window reference with buckets=$buckets") {
      val got = PrefixScan
        .strictPrefixMax(fixture, col("k"), col("v"), "pm", buckets)
        .orderBy(col("k")).collect().map(r =>
          (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.get(2)))
      assert(got.toSeq == reference.toSeq)
    }
  }

  test("globally-first key carries a null (empty-prefix) max") {
    val first = PrefixScan
      .strictPrefixMax(fixture, col("k"), col("v"), "pm", 4)
      .orderBy(col("k")).limit(1).collect()(0)
    assert(first.isNullAt(first.fieldIndex("pm")))
  }

  test("empty input returns empty with the output column present") {
    val out = PrefixScan.strictPrefixMax(
      fixture.filter(lit(false)), col("k"), col("v"), "pm", 8)
    assert(out.columns.contains("pm") && out.count() == 0)
  }

  private def sumReference = {
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fixture.withColumn("ps", sum(col("v")).over(w))
      .orderBy(col("k")).collect().map(r =>
        (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.get(2)))
  }

  for (buckets <- Seq(1, 3, 32)) {
    test(s"sum matches the global-window reference with buckets=$buckets") {
      val got = PrefixScan
        .strictPrefixSum(fixture, col("k"), col("v"), "ps", buckets)
        .orderBy(col("k")).collect().map(r =>
          (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.get(2)))
      assert(got.toSeq == sumReference.toSeq)
    }
  }

  test("sum: globally-first key carries a null (empty-prefix) sum") {
    val first = PrefixScan
      .strictPrefixSum(fixture, col("k"), col("v"), "ps", 4)
      .orderBy(col("k")).limit(1).collect()(0)
    assert(first.isNullAt(first.fieldIndex("ps")))
  }

  test("strict prefix ops refuse caller _ps_* columns (r18 scratch guard)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5).select(col("id"), lit(1L).as("_ps_in"))
    val e = intercept[IllegalArgumentException] {
      PrefixScan.strictPrefixMax(df, col("id"), col("id"), "out")
    }
    assert(e.getMessage.contains("_ps_in"))
    intercept[IllegalArgumentException] {
      PrefixScan.strictPrefixSum(df, col("id"), col("id"), "out")
    }
  }
}
