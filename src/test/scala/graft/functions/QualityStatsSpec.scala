package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.Tables

/** [[QualityStats]] must be bit-identical to the all-builtins composite
  * it replaced ([[TextFunctions.qualityScoreComposite]]) — four hash
  * gates (q45/q85/q86/q87) ride on that equality.
  */
class QualityStatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = df.select(
    QualityFunctions.quality_stats($"text").as("s"),
    TextFunctions.qualityScoreComposite($"text").as("q0"),
    TextFunctions.tokenCount($"text").as("n0"))

  test("bit-identical to the composite on the real corpus (sf0.01)") {
    val diff = both(Tables.documents(spark, "/root/testdata/sf0.01"))
      .filter($"s.q" =!= $"q0" || $"s.n_tok" =!= $"n0")
    assert(diff.count() == 0L)
  }

  test("edge cases: empty, whitespace-only, unicode, stopword-only, nulls") {
    val rows = Seq(
      "", "   ", "\t\n\r\f", "the the the", "THE A An oF",
      "一个 例子 中文", "xx", "word " * 200,
      "a\u00a0b",       // NBSP is NOT Java \s — one token
      "mixedCASE With Punct!!! 12345",
      "tabs\tand\nnewlines cr\rend")
    val df = both(rows.toDF("text"))
    val bad = df.filter($"s.q" =!= $"q0" || $"s.n_tok" =!= $"n0")
    assert(bad.count() == 0L)
    val n = both(Seq[String](null).toDF("text"))
      .filter($"s".isNull && $"q0".isNull).count()
    assert(n == 1L)
  }

  test("interpreted eval agrees with codegen") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val cg = df.select(QualityFunctions.quality_stats($"text").as("s"))
      .select($"s.n_tok", $"s.q").collect().toSeq
    val row = df.select($"text").collect().map { r =>
      val out = QualityStatsUtil.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
      (out.getInt(0), out.getDouble(1))
    }.toSeq
    assert(cg.map(r => (r.getInt(0), r.getDouble(1))) == row)
  }
}
