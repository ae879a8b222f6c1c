package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class FuzzyJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def exhaustiveEd1(names: Seq[(Long, String)]): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib)).toSet
  }

  test("deletion blocking finds exactly the ED<=1 pairs (complete + sound)") {
    val names: Seq[(Long, String)] = Seq(
      1L -> "widget", 2L -> "wldget", // substitution
      3L -> "widgets", // insertion vs 1
      4L -> "idget", // deletion vs 1
      5L -> "wigdet", // transposition vs 1: distance 2, shares keys -> must be filtered
      6L -> "gadget", // distance 2 from widget
      7L -> "widget", // exact duplicate of 1 (distance 0)
      8L -> "a", 9L -> "", // degenerate lengths: "" is a 1-deletion of "a"
      10L -> "aa", 11L -> "ab") // run-of-equal-chars dedup + substitution
    val got = FuzzyJoin.ed1Pairs(names.toDF("id", "name"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == exhaustiveEd1(names))
    // the adversarial cases specifically
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((1L, 4L)) && got.contains((1L, 7L)) &&
      got.contains((8L, 9L)) && got.contains((10L, 11L)))
    assert(!got.contains((1L, 5L)) && !got.contains((1L, 6L)))
  }

  test("reported dist matches levenshtein and pairs are unique") {
    val names = Seq(1L -> "abc", 2L -> "abd", 3L -> "abc", 4L -> "ab")
    val rows = FuzzyJoin.ed1Pairs(names.toDF("id", "name"))
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect().toSeq
    assert(rows.distinct.size == rows.size)
    val byPair = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair((1L, 3L)) == 0)
    assert(byPair((1L, 2L)) == 1 && byPair((1L, 4L)) == 1)
  }
}
