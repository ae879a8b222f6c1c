package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.SparkTestSession

/** Round-5 custom expressions (BloomMightContain, PqEncode/PqTable/
  * PqAdcDot, CmsEstimate) must return identical results on the
  * codegen and interpreted paths — the 64KB-method fallback switches
  * paths silently in production, so both are load-bearing.
  */
class Round5ExpressionModesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def withSQLConf[T](kv: (String, String))(f: => T): T = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
  private def bothModes[T](f: => T): (T, T) = (
    withSQLConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY")(f),
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(f))

  test("BloomMightContain: same verdicts on both paths, no false negatives") {
    val bf = BloomFilter.create(1000, 0.01)
    (1L to 100L).foreach(bf.putLong)
    val df = (1L to 200L).toDF("h")
    val (cg, interp) = bothModes {
      df.select($"h", BloomFunctions.bloom_might_contain($"h", bf).as("hit"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    assert(cg == interp)
    assert((1L to 100L).forall(cg(_)), "added keys must always probe true")
  }

  test("PQ kernels: encode/table/adc identical on both paths") {
    val vecs = Seq(
      (1L, Array.tabulate(8)(_.toDouble)),
      (2L, Array.tabulate(8)(i => 8.0 - i)),
      (3L, Array.fill(8)(0.5))).toDF("vec_id", "embedding")
    val cb = graft.operators.ProductQuantization.train(vecs, m = 2, ksub = 2)
    val (cg, interp) = bothModes {
      vecs.select($"vec_id",
          PqFunctions.pq_encode($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub).as("codes"),
          PqFunctions.pq_adc_dot(
            PqFunctions.pq_table($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub),
            PqFunctions.pq_encode($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub),
            cb.ksub).as("selfEst"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
    }
    assert(cg == interp)
    assert(cg.forall { case (_, codes, est) =>
      codes.length == 2 && codes.forall(c => c >= 0 && c < 2) && !est.isNaN })
  }

  test("CmsEstimate: alternating between two same-config sketches never serves stale cache") {
    // the collision trap: same (eps, confidence, seed) → same length,
    // same constant header bytes; only the counter grid differs. A
    // fingerprint that samples constant bytes would serve sketch A's
    // counts for sketch B.
    val a = Seq.fill(100)("alpha").toDF("s")
      .agg(expr("count_min_sketch(s, 0.01D, 0.99D, 7)").as("sk_a"))
    val b = Seq.fill(7)("alpha").toDF("s")
      .agg(expr("count_min_sketch(s, 0.01D, 0.99D, 7)").as("sk_b"))
    val both = a.crossJoin(b)
      .select(
        CmsFunctions.cms_estimate($"sk_a", lit("alpha")).as("ea"),
        CmsFunctions.cms_estimate($"sk_b", lit("alpha")).as("eb"))
      .collect()(0)
    assert(both.getLong(0) >= 100L && both.getLong(0) < 107L)
    assert(both.getLong(1) >= 7L && both.getLong(1) < 14L,
      s"sketch B served ${both.getLong(1)} — stale cache from sketch A")
    // the harder trap: EQUAL totalCount, different tokens — every
    // header byte identical, only grid cells differ (a strided-sample
    // fingerprint collided here)
    val c = Seq.fill(50)("left").toDF("s")
      .agg(expr("count_min_sketch(s, 0.01D, 0.99D, 7)").as("sk_c"))
    val d = Seq.fill(50)("right").toDF("s")
      .agg(expr("count_min_sketch(s, 0.01D, 0.99D, 7)").as("sk_d"))
    val cd = c.crossJoin(d)
      .select(
        CmsFunctions.cms_estimate($"sk_c", lit("left")).as("cl"),
        CmsFunctions.cms_estimate($"sk_d", lit("left")).as("dl"),
        CmsFunctions.cms_estimate($"sk_d", lit("right")).as("dr"))
      .collect()(0)
    assert(cd.getLong(0) >= 50L)
    assert(cd.getLong(2) >= 50L)
    assert(cd.getLong(1) < 50L,
      s"sketch D claims ${cd.getLong(1)} 'left' items — stale cache from C")
  }

  test("CmsEstimate: same estimates on both paths, never underestimates") {
    val items = (Seq.fill(50)("hot") ++ Seq.fill(5)("warm") ++ Seq("cold")).toDF("s")
    val sk = items.agg(expr("count_min_sketch(s, 0.01D, 0.99D, 7)").as("sk"))
    val probes = Seq("hot", "warm", "cold", "absent").toDF("item")
    val (cg, interp) = bothModes {
      probes.crossJoin(sk)
        .select($"item", CmsFunctions.cms_estimate($"sk", $"item").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(cg == interp)
    assert(cg("hot") >= 50L && cg("warm") >= 5L && cg("cold") >= 1L)
  }
}
