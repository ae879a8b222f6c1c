package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class DistributedSelectionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.size + 1) / 2) - 1)
  }

  test("two-phase median equals the sort-based lower median on seeded random data") {
    val rnd = new scala.util.Random(42)
    // duplicates, negatives (trunc-div buckets stay ordered intervals),
    // group sizes 1 / even / odd, values straddling bucket boundaries
    val data = Seq.tabulate(5000) { i =>
      val g = s"g${i % 7}"
      val v = rnd.nextInt(200001).toLong - 100000L
      (g, v)
    } ++ Seq(("solo", 99999L), ("dup", 5L), ("dup", 5L), ("dup", 5L), ("dup", 7L))
    val df = data.toDF("g", "v")
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      g -> (rows.size.toLong, lowerMedian(rows.map(_._2)))
    }
    val got = DistributedSelection.medianByGroup(df, "g", "v", bucketWidth = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("multi-rank order statistics equal the sort-based reference on seeded random data") {
    val rnd = new scala.util.Random(99)
    val data = Seq.tabulate(4000) { i =>
      (s"g${i % 5}", rnd.nextInt(100001).toLong - 50000L)
    } ++ Seq(("solo", 42L))
    val df = data.toDF("g", "v")
    // min, lower quartile-ish rank, median rank, max — exercised as
    // rank expressions over n, two of which collide in small groups
    val rankSqls = Seq("1L", "1L + (n - 1L) div 4L", "(n + 1L) div 2L", "n")
    val got = DistributedSelection
      .orderStatsByGroup(df, "g", "v", rankSqls, bucketWidth = 777L)
      .collect()
      .map(r => (r.getString(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val s = rows.map(_._2).sorted
      val n = s.size.toLong
      val want = Seq(s(0), s(((n - 1) / 4).toInt), s((((n + 1) / 2) - 1).toInt),
        s(n.toInt - 1))
      want.zipWithIndex.foreach { case (v, i) =>
        assert(got((g, i)) == (n, v), s"group $g rank $i")
      }
    }
  }

  test("topFracByGroup keeps each group's top ceil(f*n) by value, ties kept") {
    val rnd = new scala.util.Random(7)
    // heavy ties on purpose: values drawn from a small range so the
    // threshold value repeats and the ties-kept contract is exercised
    val data = Seq.tabulate(3000) { i =>
      (s"g${i % 6}", rnd.nextInt(40).toLong - 20L)
    } ++ Seq(("solo", 5L))
    val df = data.toDF("g", "v")
    val got = DistributedSelection.topFracByGroup(df, "g", "v",
        keepFrac = 0.25, bucketWidth = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.size
      val k = math.ceil(0.25 * n).toLong.toInt
      val thr = vs(n - k) // value at ascending rank n-k+1 (0-based n-k)
      val want = rows.map(_._2).filter(_ >= thr).sorted
      assert(got(g) == want, s"group $g: threshold $thr")
      assert(want.size >= k, s"group $g must keep at least ceil(f*n)")
    }
    // keepFrac = 1.0 keeps everything; invalid fractions refuse
    assert(DistributedSelection.topFracByGroup(df, "g", "v", 1.0).count() ==
      data.size)
    intercept[IllegalArgumentException] {
      DistributedSelection.topFracByGroup(df, "g", "v", 0.0)
    }
  }

  test("topFracByGroup keeps the NULL group (null-safe threshold join, r18)") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L), (Some("a"), 2L),
      (Option.empty[String], 5L), (Option.empty[String], 6L))
      .toDF("g", "v")
    val kept = DistributedSelection.topFracByGroup(df, "g", "v", keepFrac = 1.0)
    assert(kept.count() == 4, "keepFrac=1.0 must keep every row, null group included")
    val halves = DistributedSelection.topFracByGroup(df, "g", "v", keepFrac = 0.5)
      .select($"v").as[Long].collect().toSet
    assert(halves == Set(2L, 6L), s"top half per group incl. null group: $halves")
  }

  test("empty input yields empty output; width 1 degenerates correctly") {
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(DistributedSelection.medianByGroup(empty, "g", "v").count() == 0)
    assert(DistributedSelection.topFracByGroup(empty, "g", "v", 0.5).count() == 0)
    val tiny = Seq(("a", 3L), ("a", 1L), ("a", 2L)).toDF("g", "v")
    val r = DistributedSelection.medianByGroup(tiny, "g", "v", bucketWidth = 1L)
      .collect()
    assert(r.length == 1 && r(0).getLong(2) == 2L)
  }

  test("NULLs are excluded like SQL aggregates; sentinel Long.MinValue buckets without ANSI overflow") {
    // r16 review findings: NULLs used to form a nulls-first bucket
    // that inflated n and could silently ERASE the group (NULL ===
    // NULL join mismatch); v - pmod(v, w) underflowed on the MinValue
    // sentinel and ANSI arithmetic killed the query
    val df = Seq(("a", Some(1L)), ("a", None), ("a", None), ("a", None),
        ("b", Some(Long.MinValue)), ("b", Some(5L)), ("b", Some(7L)))
      .toDF("g", "v")
    val byG = DistributedSelection.medianByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byG("a") == (1L, 1L), "n counts NON-NULL rows; the group survives")
    assert(byG("b") == (3L, 5L), "MinValue buckets cleanly and orders first")
    val kept = DistributedSelection.topFracByGroup(
        df.filter($"v".isNotNull), "g", "v", 0.5)
      .select($"g", $"v").as[(String, Long)].collect().toSet
    assert(kept.contains(("b", 7L)) && !kept.contains(("b", Long.MinValue)))
  }

  test("a rank expression outside [1, n] fails loudly instead of silently vanishing") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val e = intercept[Exception] {
      DistributedSelection.orderStatsByGroup(df, "g", "v", Seq("0L")).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("out of [1, n]"), msgs(e))
  }
}
