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
    // 0.42 renders "0.42" — the WIDEST spelling any sub-second value
    // gets (≥1 s values render narrower under 1dp trimming: "1.2",
    // "12.3" — both ≤ the 4-char worst case already counted, so a
    // multi-second entry only widens the line at ≥100 s: "123.4" is
    // +1). The 45-char margin covers ~45 hundred-second outliers —
    // far beyond any real battery — plus sf-dir growth. Registry
    // ceiling under this spelling: ~184 queries; past that the next
    // lever is 1dp sub-second values (the driver envelope is fixed).
    val worst = Bench.machineLine(names.map(_ -> 0.42), "sf0.001")
    val budget = 2000 - Bench.TailOverhead - 45
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
