package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("deterministic: same rows every run, membership is repartition-stable") {
    val a = Sampling.deterministicSample(ids, $"id", 0.3).as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids.repartition(13), $"id", 0.3)
      .as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("rate accuracy within sampling noise at n=10000") {
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val n = Sampling.deterministicSample(ids, $"id", f).count().toDouble
      assert(math.abs(n / 10000 - f) < 0.02, s"fraction $f got ${n / 10000}")
    }
  }

  test("binary-inexact fractions round to the decimal threshold, not truncate") {
    // 0.29 * 1e6 = 289999.99999999994 in doubles; the selected set must
    // equal the natural decimal threshold bk < 290000
    val viaFraction = Sampling.deterministicSample(ids, $"id", 0.29)
      .as[Long].collect().toSet
    val viaThreshold = ids.filter(Sampling.bucket($"id", "s0") < 290000)
      .as[Long].collect().toSet
    assert(viaFraction == viaThreshold)
  }

  test("nested fractions nest: the 10% sample is a subset of the 30% sample") {
    val small = Sampling.deterministicSample(ids, $"id", 0.1).as[Long].collect().toSet
    val big = Sampling.deterministicSample(ids, $"id", 0.3).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("different salts decorrelate") {
    val a = Sampling.deterministicSample(ids, $"id", 0.5, salt = "a").as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids, $"id", 0.5, salt = "b").as[Long].collect().toSet
    val overlap = (a intersect b).size.toDouble / a.size
    assert(overlap > 0.4 && overlap < 0.6, s"salted samples should overlap ~50%, got $overlap")
  }

  test("stratified drops unlisted strata and honors per-stratum rates") {
    val df = (0L until 6000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val got = Sampling.stratified(df, $"src", $"id", Map("s0" -> 1.0, "s1" -> 0.2))
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(got("s0") == 2000L)
    assert(!got.contains("s2"))
    assert(math.abs(got("s1") / 2000.0 - 0.2) < 0.04)
  }

  test("fixedSizePerStratum: exactly k per stratum, deterministic, nested in k") {
    import org.apache.spark.sql.functions._
    val spark2 = graft.SparkTestSession.spark
    import spark2.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"s${i % 5}")).toDF("id", "g")
    val k20 = Sampling.fixedSizePerStratum(df, col("g"), col("id"), 20)
    val counts = k20.groupBy(col("g")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 20L) && counts.size == 5)
    // deterministic and nested: the k=5 set is a subset of the k=20 set
    val k5 = Sampling.fixedSizePerStratum(df, col("g"), col("id"), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val k20ids = k20.select("id").collect().map(_.getLong(0)).toSet
    assert(k5.subsetOf(k20ids))
    val again = Sampling.fixedSizePerStratum(df, col("g"), col("id"), 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == k20ids)
    // strata smaller than k keep everything
    val tiny = Sampling.fixedSizePerStratum(df.filter(col("id") <= 3), col("g"), col("id"), 20)
    assert(tiny.count() == 3)
  }

  test("fixedSizePerStratum refuses a caller _rk column (r18 scratch guard)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5).select($"id", lit(1).as("_rk"))
    val e = intercept[IllegalArgumentException] {
      Sampling.fixedSizePerStratum(df, lit(1), $"id", 2)
    }
    assert(e.getMessage.contains("_rk"))
  }
}
