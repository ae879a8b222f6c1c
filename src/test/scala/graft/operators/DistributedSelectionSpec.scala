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

  test("empty input yields empty output; width 1 degenerates correctly") {
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(DistributedSelection.medianByGroup(empty, "g", "v").count() == 0)
    val tiny = Seq(("a", 3L), ("a", 1L), ("a", 2L)).toDF("g", "v")
    val r = DistributedSelection.medianByGroup(tiny, "g", "v", bucketWidth = 1L)
      .collect()
    assert(r.length == 1 && r(0).getLong(2) == 2L)
  }
}
