package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class IntervalJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("pointInInterval equals the nested-loop range join, any bucket width") {
    val points = (0L to 50L).map(i => (i, i * 7 % 40)).toDF("pid", "p")
    val ivs = (0L to 15L).map(i => (i, i * 3 - 5, i * 3 + 4)).toDF("iid", "lo", "hi")
    val expected = points.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 3L, 10L, 100L)) {
      val got = IntervalJoin.pointInInterval(points, ivs, "p", "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.toSet == expected, s"width $w wrong pairs")
      assert(got.length == got.distinct.length, s"width $w emitted duplicates")
    }
  }

  test("overlap equals the nested-loop overlap join, exactly once per pair") {
    val a = (0L to 30L).map(i => (i, i * 5 - 3, i * 5 + 9)).toDF("aid", "as", "ae")
    val b = (0L to 20L).map(i => (i, i * 8, i * 8 + 14)).toDF("bid", "bs", "be")
    val expected = a.join(b, $"as" <= $"be" && $"bs" <= $"ae")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(2L, 7L, 50L)) {
      val got = IntervalJoin.overlap(a, b, "as", "ae", "bs", "be", w)
        .select($"aid", $"bid").as[(Long, Long)].collect()
      assert(got.toSet == expected, s"width $w wrong pairs")
      assert(got.length == got.distinct.length, s"width $w emitted duplicates")
    }
  }

  test("negative coordinates: floor bucketing, not truncate-toward-zero") {
    val points = Seq((1L, -7L), (2L, -1L), (3L, 0L)).toDF("pid", "p")
    val ivs = Seq((10L, -8L, -6L), (11L, -2L, 1L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin.pointInInterval(points, ivs, "p", "lo", "hi", 5)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("plan is an equi-join: no nested loop, no cartesian") {
    val points = (0L to 50L).map(i => (i, i)).toDF("pid", "p")
    val ivs = (0L to 15L).map(i => (i, i * 3, i * 3 + 4)).toDF("iid", "lo", "hi")
    val plan = IntervalJoin.pointInInterval(points, ivs, "p", "lo", "hi", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded join fell back to a non-equi plan:\n$plan")
  }
}
