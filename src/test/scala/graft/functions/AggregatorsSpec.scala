package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.Tables

class AggregatorsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("Welford variance matches var_samp across grouped, partitioned data") {
    val got = Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(7)   // force multi-partition merge path
      .groupBy($"o_orderstatus")
      .agg(Aggregators.welford_variance($"o_totalprice").as("wv"),
        var_samp($"o_totalprice").as("vs"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val wv = r.getAs[Double]("wv")
      val vs = r.getAs[Double]("vs")
      assert(math.abs(wv - vs) / vs < 1e-9, s"$wv vs $vs")
    }
  }

  test("typed Dataset aggregation with the same Aggregator") {
    val ds = spark.range(1, 101).map(_.toDouble)
    val v = ds.select(Aggregators.welfordVarianceTyped).collect()(0)
    // variance of 1..100 = n(n+1)/12 = 841.666…
    assert(math.abs(v.get - 841.6666666666666) < 1e-9)
  }

  test("fewer than two rows yields no variance (None), not NaN") {
    val one = spark.range(1).map(_.toDouble)
    assert(one.select(Aggregators.welfordVarianceTyped).collect()(0).isEmpty)
  }

  test("NULL inputs are skipped like var_samp (not crashed, not counted as 0)") {
    val df = Seq(Some(10.0), None, Some(20.0), None, Some(30.0))
      .toDF("x")
    val r = df.agg(Aggregators.welford_variance($"x").as("wv"),
      var_samp($"x").as("vs")).collect()(0)
    assert(math.abs(r.getAs[Double]("wv") - r.getAs[Double]("vs")) < 1e-9)
    // all-NULL input: no variance, like the built-in's NULL
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    assert(allNull.agg(Aggregators.welford_variance($"x")).collect()(0).isNullAt(0))
  }
}
