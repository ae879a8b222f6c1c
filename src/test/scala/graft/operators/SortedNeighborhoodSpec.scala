package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SortedNeighborhoodSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("globalRank is the deterministic total-order position") {
    val df = Seq(("b", 2L), ("a", 9L), ("b", 1L), ("a", 3L)).toDF("k", "id")
    val ranked = SortedNeighborhood.globalRank(df, Seq($"k", $"id"))
      .orderBy($"rnk").select($"k", $"id").as[(String, Long)].collect().toSeq
    assert(ranked == Seq(("a", 3L), ("a", 9L), ("b", 1L), ("b", 2L)))
    // stable across invocations (range boundaries must not leak in)
    val again = SortedNeighborhood.globalRank(df, Seq($"k", $"id"))
      .orderBy($"rnk").select($"k", $"id").as[(String, Long)].collect().toSeq
    assert(again == ranked)
  }

  test("candidatePairs emits each in-window same-block pair exactly once") {
    val df = (1L to 10L).map(i => ("g", i)).toDF("blk", "id")
    val pairs = SortedNeighborhood.candidatePairs(df, Seq("blk"), Seq($"id"), window = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    // a is the later element, b one of its 3 predecessors
    val expected = for { a <- 1L to 10L; b <- math.max(1L, a - 3) until a } yield (a, b)
    assert(pairs.sorted == expected.sorted)
    assert(pairs.distinct.size == pairs.size)
  }

  test("candidatePairs never crosses a block boundary") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("y", 4L)).toDF("blk", "id")
    val pairs = SortedNeighborhood.candidatePairs(df, Seq("blk"), Seq($"blk", $"id"), window = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.sorted == Seq((2L, 1L), (4L, 3L)))
  }

  test("a NULL-valued block pairs within itself and never across (r18)") {
    // null-safe block keys: the NULL block sorts contiguously
    // (asc_nulls_first) and its in-window pairs must be emitted — the
    // old name-based equi-join silently dropped every one of them
    val df = Seq((Some("x"), 1L), (Some("x"), 2L),
      (Option.empty[String], 3L), (Option.empty[String], 4L))
      .toDF("blk", "id")
    val pairs = SortedNeighborhood.candidatePairs(df, Seq("blk"), Seq($"id"), window = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.sorted == Seq((2L, 1L), (4L, 3L)),
      s"null block must pair within itself only: $pairs")
  }

  test("the probe explode stays skinny: no payload column rides the Generate") {
    // r16 verdict #3: the old spelling selected every payload column
    // into the exploded b-side, replicating it `window` times through
    // the candidate exchange. The contract is structural — the
    // optimized plan's Generate (explode) output carries only the
    // block/rank bookkeeping, never a payload column — so payload
    // creep fails here at build time, not in a 100 TB shuffle.
    val df = Seq(("x", 1L, "wide payload", 0.5))
      .toDF("blk", "id", "text", "score")
    val pairs = SortedNeighborhood.candidatePairs(
      df, Seq("blk"), Seq($"id"), window = 4)
    val gens = pairs.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "expected the probe-sequence Generate in the plan")
    gens.foreach { g =>
      val leaked = g.output.map(_.name)
        .filter(n => n.contains("text") || n.contains("score") || n == "id")
      assert(leaked.isEmpty,
        s"payload columns leaked into the probe explode: $leaked")
    }
    // and the operator still answers correctly with the skinny shape
    assert(pairs.count() == 0)
  }

  test("q43 SNM recall vs exhaustive char-Jaccard at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.documents(spark, dir).select(
      col("lang"), col("source"), col("doc_id"),
      array_distinct(split(lower(col("text")), "")).as("chars"))
    val exhaustive = d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("a.chars"), col("b.chars"))).cast("double") /
          size(array_union(col("a.chars"), col("b.chars"))), 6))
      .filter(col("jaccard") >= 0.9)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .as[(Long, Long)].collect().toSet

    val snm = graft.queries.TextQ.charJaccardPairs(spark, dir)
      .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

    val canonExhaustive = exhaustive.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    // precision 1 by construction: every SNM pair is exactly verified
    assert(snm.subsetOf(canonExhaustive))
    val recall =
      if (canonExhaustive.isEmpty) 1.0
      else snm.size.toDouble / canonExhaustive.size
    info(f"SNM recall at w=${graft.queries.TextQ.snmWindow}: $recall%.3f " +
      s"(${snm.size}/${canonExhaustive.size} pairs)")
    assert(recall >= 0.8, s"SNM recall $recall below 0.8")
  }
}
