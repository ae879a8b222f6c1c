package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Semantics of the round-3 curation operators on hand-built corpora
  * (the oracle gate checks them against DuckDB on the fixtures; these
  * pin the DEFINITIONS on inputs where the right answer is obvious).
  */
class CurationSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("ngram novelty: a verbatim repeat contributes zero novel grams") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base, "srcA"),
      (2L, base, "srcB"),                          // exact repeat, later id
      (3L, "iota kappa lambda mu nu xi", "srcB")   // all-new grams
    ).toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("curation_docs")
    val grams = docs.select(col("doc_id"), col("source"),
        explode(graft.functions.ShingleFunctions.shingle_hashes(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("h"))
      .withColumn("first_doc",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_grams"),
        sum(when(col("doc_id") === col("first_doc"), lit(1)).otherwise(lit(0)))
          .as("novel_grams"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // srcA: 6 grams, all first occurrences
    assert(grams("srcA") == ((6L, 6L)))
    // srcB: doc2's 6 grams all seen in doc1 → 0 novel; doc3's 4 grams novel
    assert(grams("srcB") == ((10L, 4L)))
  }

  test("curation funnel stages are monotone non-increasing and dedup keeps first") {
    val long = (1 to 60).map(i => s"the tok$i of").mkString(" ")
    val docs = Seq(
      (1L, long, "s"),                    // survives all stages
      (2L, long, "s"),                    // exact dup of 1 → dropped at dedup
      (3L, "too short", "s"),             // fails length band
      (4L, (1 to 60).map(_ => "x y").mkString(" "), "s")  // degenerate repetition
    ).toDF("doc_id", "text", "source")
    // run the same funnel body over a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("curation_spec")
    docs.write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val stages = TextQ.curationFunnel(spark, dir.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("1_all") == 4)
    assert(stages("2_length") == 3)       // doc3 out
    val after = Seq("2_length", "3_quality", "4_repetition", "5_dedup").map(stages)
    assert(after.zip(after.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: $stages")
    assert(stages("4_repetition") < stages("3_quality") ||
      stages("4_repetition") <= 2, "degenerate doc4 should fall out by repetition")
    assert(stages("5_dedup") == stages("4_repetition") - 1,
      "exact dup must collapse to the kept first doc")
  }

  test("line dedup: boilerplate shared by >2 docs drops everywhere, the rest survives in order") {
    // lineLen = 3 tokens per derived line; threshold = more than 2 DISTINCT docs
    val docs = Seq(
      (1L, "one two three aaa bbb ccc", "s"),  // boilerplate + unique line
      (2L, "one two three ddd eee fff", "s"),
      (3L, "one two three ggg hhh iii", "s"),
      (4L, "one two three", "s"),              // boilerplate only → emptied
      (5L, "jjj kkk lll jjj kkk lll", "s"),    // intra-doc repeat, single doc → kept twice
      (6L, "mmm nnn ooo zzz yyy xxx", "s"),
      (7L, "mmm nnn ooo www vvv uuu", "s")     // 2-doc shared line is AT the threshold → kept
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("line_dedup_spec")
    docs.write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val out = CurationQ.lineDedup(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((2L, 1L, "aaa bbb ccc")))
    assert(out(4L) == ((1L, 0L, "")), "all-boilerplate doc must empty, not vanish")
    assert(out(5L) == ((2L, 2L, "jjj kkk lll\njjj kkk lll")),
      "intra-doc repeats don't count toward the cross-doc threshold")
    assert(out(6L) == ((2L, 2L, "mmm nnn ooo\nzzz yyy xxx")))
    assert(out(7L)._2 == 2L, "a line in exactly 2 docs sits at the threshold and stays")
  }
}
