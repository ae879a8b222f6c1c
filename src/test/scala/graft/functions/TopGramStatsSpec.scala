package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** TopGramStats must equal the explode → groupBy(doc, gram) →
  * max(struct(c, g)) form it replaced — count of the most frequent
  * k-gram, count ties broken by the lexicographically LARGEST gram
  * string, char_len = length(gram) — on both codegen and interpreted
  * paths.
  */
class TopGramStatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = Seq(
    (1, Seq("a", "b", "a", "b", "a")),        // "a b"×2 beats "b a"×2 on tie → ("a b" vs "b a": "b a" larger) count 2, gram "b a", len 3
    (2, Seq("x", "y", "z")),                  // all counts 1 → max gram "y z"
    (3, Seq("aa", "aa", "aa", "aa")),         // "aa aa"×3 → count 3, len 5
    (4, Seq("q", "r")),                       // exactly k tokens → one gram "q r"
    (5, Seq("solo")),                         // < k tokens → whole-array gram "solo"
    (6, Seq.empty[String]),                   // empty → one empty gram, len 0
    (7, Seq("zz", "a", "zz", "b", "zz", "a")) // "zz a"×2 vs others×1 → count 2 len 4
  ).toDF("doc_id", "ts")

  private def viaExpression(codegen: Boolean) = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    withSQLConf("spark.sql.codegen.factoryMode" -> mode) {
      docs.select($"doc_id",
          ShingleFunctions.top_gram_stats($"ts", 2).as("tg"))
        .select($"doc_id", element_at($"tg", 1).as("c"), element_at($"tg", 2).as("len"))
        .as[(Int, Long, Long)].collect().map { case (k, c, l) => k -> (c, l) }.toMap
    }
  }

  /** The old q76 shape: string grams (whole array when < k tokens),
    * groupBy, arg-max by (count, gram-string).
    */
  private def viaExplode() =
    docs.select($"doc_id",
        explode(when(size($"ts") <= 2, array(concat_ws(" ", $"ts")))
          .otherwise(transform(sequence(lit(0), size($"ts") - 2),
            i => concat_ws(" ", slice($"ts", i + 1, lit(2)))))).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max(struct($"c", $"g")).as("top"))
      .select($"doc_id", $"top.c", length($"top.g").cast("long"))
      .as[(Int, Long, Long)].collect().map { case (k, c, l) => k -> (c, l) }.toMap

  test("matches the explode+groupBy+argmax form it replaced (codegen path)") {
    val inRow = viaExpression(codegen = true)
    val shuffled = viaExplode()
    shuffled.foreach { case (k, v) => assert(inRow(k) == v, s"doc $k") }
    assert(inRow(1) == (2L, 3L), "tie must break to the larger gram string")
    assert(inRow(3) == (3L, 5L) && inRow(5) == (1L, 4L) && inRow(6) == (1L, 0L))
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
