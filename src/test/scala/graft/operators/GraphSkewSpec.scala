package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Hub handling for the iterative graph family (r11): a planted
  * high-degree vertex must not ride a skewed shuffle key. With
  * auto-broadcast disabled (so nothing is accidentally broadcast at
  * test scale), the hub-enabled plan must still route hub edges
  * through an explicit BroadcastHashJoin — the documented no-straggler
  * mechanism — and produce BIT-IDENTICAL results to the plain plan.
  */
class GraphSkewSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // star: hub 0 → 1..120, plus a chain 1→2→…→30 for structure
  private def edges = {
    val star = (1 to 120).map(i => (0L, i.toLong))
    val chain = (1 until 30).map(i => (i.toLong, (i + 1).toLong))
    (star ++ chain).toDF("src", "dst")
  }

  private def withoutAutoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("PageRank: hub split is bit-identical and broadcasts the hub ranks") {
    withoutAutoBroadcast {
      val e = edges.localCheckpoint(false)
      val nodes = e.select($"src".as("node"))
        .unionByName(e.select($"dst".as("node"))).distinct()
        .localCheckpoint(false)
      val plain = PageRank.ranksPrepared(e, nodes, iters = 3)
      val hubbed = PageRank.ranksPrepared(e, nodes, iters = 3,
        hubDegreeCutoff = 100)
      assert(!plain.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "test precondition: the plain plan must not broadcast anything")
      assert(hubbed.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "hub edges must join a broadcast of the hub ranks, not shuffle " +
          "on the skewed src key")
      // sorted SEQ equality, not toMap (r17 review): a duplicate-node
      // regression would collapse in a map and still "match"
      assert(plain.as[(Long, Long)].collect().sorted.toSeq ==
        hubbed.as[(Long, Long)].collect().sorted.toSeq)
    }
  }

  test("PageRank: hub path stays linear in iterations (no exponential plan growth)") {
    // before the r11 per-round checkpoint, the two consumers of the
    // rank iterate doubled the plan per round — 2^12 embedded copies
    // here would hang analysis long before any task ran
    val e = edges.localCheckpoint(false)
    val nodes = e.select($"src".as("node"))
      .unionByName(e.select($"dst".as("node"))).distinct()
      .localCheckpoint(false)
    val plain = PageRank.ranksPrepared(e, nodes, iters = 12)
      .as[(Long, Long)].collect().sorted.toSeq
    val hubbed = PageRank.ranksPrepared(e, nodes, iters = 12,
      hubDegreeCutoff = 100).as[(Long, Long)].collect().sorted.toSeq
    assert(plain == hubbed)
  }

  test("PageRank: cutoff above every degree degenerates to the plain plan") {
    val e = edges.localCheckpoint(false)
    val nodes = e.select($"src".as("node"))
      .unionByName(e.select($"dst".as("node"))).distinct()
      .localCheckpoint(false)
    assert(PageRank.ranksPrepared(e, nodes, 2).as[(Long, Long)]
      .collect().sorted.toSeq ==
      PageRank.ranksPrepared(e, nodes, 2, hubDegreeCutoff = 100000L)
        .as[(Long, Long)].collect().sorted.toSeq)
  }

  test("LPA: hub split is bit-identical and broadcasts the hub labels") {
    withoutAutoBroadcast {
      val eu = edges.select($"src", $"dst")
        .unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
        .distinct().localCheckpoint(false)
      val nodes = eu.select($"src".as("node")).distinct()
        .localCheckpoint(false)
      val plain = LabelPropagation.labelsPrepared(eu, nodes, iters = 2)
      val hubbed = LabelPropagation.labelsPrepared(eu, nodes, iters = 2,
        hubDegreeCutoff = 100)
      // same precondition the PageRank twin asserts (r17 review): the
      // broadcast below must come from the explicit hint, not AQE
      assert(!plain.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "test precondition: the plain plan must not broadcast anything")
      assert(hubbed.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "hub edges must join a broadcast of the hub labels")
      assert(plain.as[(Long, Long)].collect().sorted.toSeq ==
        hubbed.as[(Long, Long)].collect().sorted.toSeq)
    }
  }
}
