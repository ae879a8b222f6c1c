package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST 2000 chars of bench stdout. Since
  * r12 the machine line DEGRADES GRACEFULLY instead of being required
  * to fit whole: entries ride ascending by time and the battery total
  * sits at the line's end, so a clipped head eats only the fastest
  * entries' values while "value" and every slow entry stay inside the
  * kept window (round_report parses "value" position-independently and
  * recovers surviving pairs from a clipped head). This spec pins that
  * guarantee over the LIVE registry at pessimistic per-query values,
  * so registering a query that would push the SLOW half of the battery
  * out of the window fails here, at build time, not in the driver's
  * artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  private val tailWindow = 2000 - Bench.TailOverhead

  test("a tail-clipped worst-case line keeps the total and the slow entries") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // 0.42 is the WIDEST sub-second input (≥1 s values render ≤ its
    // width until 100 s); every entry equally slow is the worst case
    // for how many entries the window must hold
    val worst = Bench.machineLine(names.map(_ -> 0.42), "sf0.001")
    val kept = worst.takeRight(tailWindow)
    assert(kept.contains("\"value\":"),
      "the battery total must sit inside the driver's kept window")
    val keptEntries = "\"\\d+\":[0-9.]+[,}]".r.findAllIn(kept).size
    assert(keptEntries >= 150,
      s"only $keptEntries complete per-query entries survive the " +
        "2000-char tail at worst-case values — the artifact is losing " +
        "the battery's slow half; shorten the spelling (see " +
        "Bench.machineLine)")
  }

  test("within-budget lines are emitted whole and stay valid JSON") {
    val names = SparkEntry.queries.keys.toSeq.sorted.take(150)
    val line = Bench.machineLine(names.map(_ -> 0.42), "sf0.001")
    assert(line.length <= tailWindow, "150 entries must fit outright")
    // sanity-parse: balanced object with a trailing value field
    assert(line.startsWith("{\"metric\":\"total\",\"unit\":\"sec\",\"queries\":{"))
    assert(line.endsWith("}"))
    assert(line.contains("\"value\":63.00}"))
  }

  test("bare-number keys, ascending times, failures last, value at the end") {
    val line = Bench.machineLine(
      Seq("q01_agg" -> 0.4, "q100_bm25_topk" -> 1.0, "q13_x" -> -1.0), "sf0.1")
    // -1 failure markers sort PAST the slowest timing: clipping must
    // never eat the failure signal
    assert(line ==
      """{"metric":"total","unit":"sec","queries":{"1":0.4,"100":1,"13":-1},"sf":"sf0.1","value":1.40}""")
  }
}
