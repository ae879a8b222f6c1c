package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The ExactSubstr purge (Lee et al. 2022 §3): planted verbatim
  * cross-document overlaps must lose EXACTLY their duplicated span;
  * short collisions, sub-gram docs and unique docs pass through.
  * k = 8, minSpan = 12 throughout (the q199/q200 gate constants).
  */
class DupSpanPurgeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val K = 8
  private val MinSpan = 12

  private def purge(rows: Seq[(Long, String, String)]) =
    DupSpanPurge.purge(rows.toDF("doc_id", "source", "text"), K, MinSpan)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getString(4))).toMap

  test("a planted 20-token verbatim overlap is cut exactly, on both docs") {
    val span = (1 to 20).map(i => s"dup$i").mkString(" ")
    val a = s"alpha bravo charlie delta echo $span foxtrot golf hotel india juliet"
    val b = s"kilo lima mike november oscar papa $span quebec romeo sierra tango"
    val out = purge(Seq((1L, "s0", a), (2L, "s0", b)))
    // 20 duplicated positions >= minSpan: the whole span goes, the
    // distinct flanks stay verbatim
    assert(out(1L) == ((30, 10,
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet")))
    assert(out(2L) == ((30, 10,
      "kilo lima mike november oscar papa quebec romeo sierra tango")))
  }

  test("an isolated shared 8-gram (covered run 8 < minSpan) survives") {
    val g = (1 to K).map(i => s"g$i").mkString(" ")
    val a = s"one two three four $g five six seven eight"
    val b = s"nine ten eleven twelve $g thirteen fourteen fifteen sixteen"
    val out = purge(Seq((1L, "s0", a), (2L, "s0", b)))
    assert(out(1L)._1 == out(1L)._2, "run shorter than minSpan must be kept")
    assert(out(2L)._1 == out(2L)._2)
  }

  test("a doc fully contained in another empties; the superset keeps its flanks") {
    val span = (1 to 16).map(i => s"w$i").mkString(" ")
    val out = purge(Seq(
      (1L, "s0", span),
      (2L, "s0", s"pre1 pre2 pre3 pre4 pre5 $span post1 post2 post3 post4 post5")))
    assert(out(1L) == ((16, 0, "")), "the fully-duplicated doc empties")
    assert(out(2L) == ((26, 10, "pre1 pre2 pre3 pre4 pre5 post1 post2 post3 post4 post5")))
  }

  test("sub-gram and unique docs pass through verbatim (lowercased normal form)") {
    val out = purge(Seq(
      (1L, "s0", "Tiny Doc"),
      (2L, "s0", "a perfectly unique document with more than eight tokens in it"),
      (3L, "s0", "")))
    assert(out(1L) == ((2, 2, "tiny doc")))
    assert(out(2L)._3 == "a perfectly unique document with more than eight tokens in it")
    assert(out(3L) == ((0, 0, "")))
  }

  test("duplication within ONE document does not trigger removal (cross-doc only)") {
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val out = purge(Seq(
      (1L, "s0", s"$rep middle filler words here $rep"),
      (2L, "s0", "totally different content with no overlap at all whatsoever today")))
    assert(out(1L)._1 == out(1L)._2, "within-doc repetition is q76's business, not the purge's")
  }

  test("kernel fuzz: 500 random (tokens, starts, k, minSpan) cases match a brute-force reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def reference(ts: IndexedSeq[String], starts: Seq[Int], k: Int,
                  minSpan: Int): Seq[String] = {
      val covered = starts.filter(d => d >= 0 && d < ts.length)
        .flatMap(d => d until math.min(d + k, ts.length)).toSet
      val removed = scala.collection.mutable.Set.empty[Int]
      var i = 0
      while (i < ts.length) {
        if (covered(i)) {
          var j = i
          while (j < ts.length && covered(j)) j += 1
          if (j - i >= minSpan) (i until j).foreach(removed += _)
          i = j
        } else i += 1
      }
      ts.indices.filterNot(removed).map(ts)
    }
    val rnd = new scala.util.Random(4242)
    for (case_ <- 0 until 500) {
      val n = rnd.nextInt(61)
      val ts = IndexedSeq.tabulate(n)(i => s"t${rnd.nextInt(9)}_$i")
      val k = 1 + rnd.nextInt(8)
      val minSpan = k + rnd.nextInt(7)
      // random starts, incl. occasional out-of-range values to hit the
      // kernel's defensive clamp
      val starts = (0 until rnd.nextInt(n + 3))
        .map(_ => rnd.nextInt(n + 6) - 3).distinct.sorted
      val got = graft.functions.SpanRuntime.removeDupSpans(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(starts.toArray[Any]), k, minSpan)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      val want = reference(ts, starts, k, minSpan)
      assert(gotSeq == want,
        s"case $case_: n=$n k=$k minSpan=$minSpan starts=$starts")
    }
  }

  test("two overlapping dup spans chain into one maximal run") {
    // doc 1 shares its first 10 tokens with doc 2 and the NEXT 10 with
    // doc 3; coverage is contiguous 0..19 -> one 20-run, all removed
    val s1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val s2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val out = purge(Seq(
      (1L, "s0", s"$s1 $s2 tail1 tail2 tail3 tail4"),
      (2L, "s0", s"aa bb cc dd $s1 ee ff gg hh"),
      (3L, "s0", s"ii jj kk ll $s2 mm nn oo pp")))
    assert(out(1L)._2 == 4)
    assert(out(1L)._3 == "tail1 tail2 tail3 tail4")
  }
}
