package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The q132 AUC decomposition (grouped counts + strict-prefix sum over
  * scores, ties in doubled units) must equal the textbook O(P·N)
  * pairwise definition; the q133 systematic sample must pick each
  * heavy item exactly once and be weight-proportional in aggregate.
  * The gate checks DuckDB parity of both; these check the MATH.
  */
class EvalQSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evalq")
    rows.toDF("doc_id", "lang", "text", "n_chars")
      .withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp.toString
  }

  test("AUC equals the pairwise Mann-Whitney definition, ties included") {
    // scores with cross-class ties (40 appears as both pos and neg)
    // and within-class ties; pos scores generally higher
    val rows = Seq[(Long, String, Long)](
      (1, "en", 50L), (2, "en", 40L), (3, "en", 70L), (4, "en", 40L),
      (5, "de", 40L), (6, "de", 30L), (7, "de", 20L), (8, "de", 30L),
      (9, "de", 60L))
      .map { case (id, lang, s) => (id, lang, "x", s) }
    val dir = writeDocs(rows)
    val got = EvalQ.aucExact(spark, dir).collect()(0)
    val pos = rows.filter(_._2 == "en").map(_._4)
    val neg = rows.filter(_._2 != "en").map(_._4)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(got.getAs[Long]("n_pos") == pos.size)
    assert(got.getAs[Long]("n_neg") == neg.size)
    assert(got.getAs[Long]("u_times2") == u2)
    assert(got.getAs[Long]("auc_micro") ==
      u2 * 1000000L / (2L * pos.size * neg.size))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("perfect separation gives AUC 1.0; inverted gives 0.0") {
    val sep = writeDocs(Seq[(Long, String, String, Long)](
      (1, "en", "x", 100L), (2, "en", "x", 90L),
      (3, "de", "x", 10L), (4, "de", "x", 20L)))
    assert(EvalQ.aucExact(spark, sep).collect()(0)
      .getAs[Long]("auc_micro") == 1000000L)
    val inv = writeDocs(Seq[(Long, String, String, Long)](
      (1, "en", "x", 1L), (2, "de", "x", 50L)))
    assert(EvalQ.aucExact(spark, inv).collect()(0)
      .getAs[Long]("auc_micro") == 0L)
    Seq(sep, inv).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("systematic sample: heavy rows picked once, aggregate is proportional") {
    // one row carries half the total weight; step = total/50 so its
    // interval crosses ~25 boundaries yet it must appear exactly once
    val rows = (1L to 100L).map(i => (i, "en", "x", 10L)) :+
      (101L, "en", "x", 1000L)
    val dir = writeDocs(rows)
    val picked = CurationQ.weightedSample(spark, dir).collect()
    assert(picked.count(_.getAs[Long]("doc_id") == 101L) == 1)
    // total weight 2000, step 40: the heavy row spans 25 of the 50
    // boundaries, the light rows land ~1 pick per 4 rows
    val n = picked.length
    assert(n >= 20 && n <= 30, s"pick count $n outside systematic bounds")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
