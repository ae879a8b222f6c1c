package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** DupGramStats must equal the explode → groupBy(doc, gram) → count
  * form it replaced, on both the codegen and interpreted paths.
  */
class DupGramStatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = Seq(
    (1, Seq("a", "b", "a", "b", "a", "b")),      // grams aba,bab,aba,bab,aba → 5 pos, all dup
    (2, Seq("x", "y", "z", "w")),                // 2 distinct grams, no dups
    (3, Seq("a", "a", "a", "a")),                // aaa,aaa → 2 pos, 2 dup
    (4, Seq("q", "r")),                          // < k tokens → one gram, never dup
    (5, Seq.empty[String]),                      // empty → zero-token gram path
    (6, Seq("solo", "solo", "solo"))             // single gram → 1 pos, 0 dup
  ).toDF("doc_id", "ts")

  private def viaExpression(codegen: Boolean) = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    withSQLConf("spark.sql.codegen.factoryMode" -> mode) {
      docs.select($"doc_id",
          ShingleFunctions.dup_gram_stats($"ts", 3).as("dg"))
        .select($"doc_id", element_at($"dg", 1).as("total"), element_at($"dg", 2).as("dup"))
        .as[(Int, Long, Long)].collect().map { case (k, t, d) => k -> (t, d) }.toMap
    }
  }

  private def viaExplode() =
    docs.select($"doc_id",
        explode(ShingleFunctions.shingle_hashes_all($"ts", 3)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("total"),
        sum(when($"c" > 1, $"c").otherwise(lit(0L))).as("dup"))
      .as[(Int, Long, Long)].collect().map { case (k, t, d) => k -> (t, d) }.toMap

  test("matches the explode+groupBy form it replaced (codegen path)") {
    val inRow = viaExpression(codegen = true)
    val shuffled = viaExplode()
    // the exploded form loses docs whose gram array is empty; compare on its keys
    shuffled.foreach { case (k, v) => assert(inRow(k) == v, s"doc $k") }
    assert(inRow(1) == (4L, 4L) && inRow(3) == (2L, 2L) && inRow(4) == (1L, 0L))
  }

  test("interpreted path agrees with codegen path") {
    assert(viaExpression(codegen = false) == viaExpression(codegen = true))
  }

  private def withSQLConf[T](kv: (String, String))(f: => T): T = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None    => spark.conf.unset(kv._1)
    }
  }
}
