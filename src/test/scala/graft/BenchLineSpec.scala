package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST 2000 chars of bench stdout; if the
  * machine line plus sbt's prefix/epilogue outgrow that, the driver
  * records parsed:null and the round loses its per-query bench signal
  * (the r7 failure). This spec renders the line from the LIVE registry
  * under pessimistic per-query times, so REGISTERING a query that
  * would overflow the buffer fails here, at build time, not in the
  * driver's artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  test("machine line fits the driver tail buffer at worst-case values") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // 0.42 is the WIDEST sub-second input (≥1 s values render ≤ its
    // width until 100 s, "123.4" is +1 each); machineLine SELF-
    // DEGRADES sub-second precision to 1dp when the 2dp render would
    // overflow, so this asserts the degraded render of the live
    // registry still fits with a 45-char margin for hundred-second
    // outliers and sf-dir growth. Ceiling at 1dp: ~250 queries.
    val worst = Bench.machineLine(names.map(_ -> 0.42), "sf0.001")
    val budget = Bench.LineBudget
    assert(worst.length <= budget,
      s"machine line ${worst.length} chars exceeds the ${budget}-char " +
        "driver tail budget — shorten the spelling before registering " +
        "more queries (see Bench.machineLine)")
  }

  test("machine line is valid JSON with bare-number keys") {
    val line = Bench.machineLine(
      Seq("q01_agg" -> 0.4, "q100_bm25_topk" -> 1.0, "q13_x" -> -1.0), "sf0.1")
    assert(line ==
      """{"metric":"total","value":1.40,"unit":"sec","queries":{"1":0.4,"100":1,"13":-1},"sf":"sf0.1"}""")
  }
}
