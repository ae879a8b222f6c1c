package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class WinnowingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("portable hash matches the documented cross-engine value") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72; low 15 hex chars
    // as bigint = 474636617523494770 (verified in DuckDB)
    val got = Seq("abc").toDF("s")
      .select(Winnowing.portableHash($"s")).as[Long].head()
    assert(got == 474636617523494770L)
  }

  test("digest-byte fast path is bit-equal to the SQL hex form on many inputs") {
    val rows = (0 until 500).map(i => s"input $i é中${i * 31}")
    val df = rows.toDF("s")
    val fast = df.select(Winnowing.portableHash($"s")).as[Long].collect().toSeq
    val sqlForm = df.select(conv(substring(md5($"s"), 18, 15), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(fast == sqlForm)
  }

  test("the winnowing guarantee: a shared run of >= w+k-1 tokens shares a print") {
    val shared = "one two three four five six seven eight nine ten"  // 10 tokens >= 4+3-1
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"zz yy xx $shared qq")
    ).toDF("doc_id", "text")
    val prints = Winnowing.selectedPrints(docs, k = 3, w = 4)
    val p1 = prints.filter($"doc_id" === 1).select("print").as[Long].collect().toSet
    val p2 = prints.filter($"doc_id" === 2).select("print").as[Long].collect().toSet
    assert((p1 intersect p2).nonEmpty, "documents sharing a long run must share a fingerprint")
  }

  test("density is near the paper's 2/(w+1) expectation") {
    val text = (1 to 2000).map(i => s"tok${i * 7919 % 1499}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nPrints = Winnowing.selectedPrints(docs, k = 3, w = 8).count().toDouble
    val nKgrams = 2000 - 3 + 1 - 7   // windows start at pos w-1
    val density = nPrints / nKgrams
    // expected 2/(w+1) = 0.222 for random hashes; distinct() collapses
    // repeats so allow a generous band
    assert(density > 0.10 && density < 0.35, s"winnowing density $density out of band")
  }

  test("short documents (fewer than w k-grams) select nothing, empty selects nothing") {
    val docs = Seq((1L, "just three tokens"), (2L, ""), (3L, "a b c d e")).toDF("doc_id", "text")
    val prints = Winnowing.selectedPrints(docs, k = 3, w = 4)
    // doc 3 has 3 k-grams < w=4 → nothing; doc 1 has 1; doc 2 none
    assert(prints.count() == 0)
  }
}
