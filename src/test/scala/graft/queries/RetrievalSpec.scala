package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** BM25 semantics and determinism (the gate checks DuckDB parity; this
  * checks the operator behaves like BM25).
  */
class RetrievalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("ranking: more matched rare terms beats fewer on a planted corpus") {
    // probe 2 is "sample text with numbers"; plant docs where rank
    // order is unambiguous under any sane BM25: 101 matches three query
    // terms, 102 two, 103 one; 40 filler docs keep the dfs honest
    val rows = (1 to 40).map(i => (i.toLong, "filler words only")) ++ Seq(
      (101L, "sample text numbers"),
      (102L, "sample text padding padding"),
      (103L, "sample padding padding padding"))
    val docs = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_spec")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val all = RetrievalQ.bm25TopK(spark, tmp.toString).collect()
    // no document matches probe 3 ("quick brown fox")
    assert(!all.exists(_.getInt(0) == 3))
    val q2 = all.filter(_.getInt(0) == 2)
      .sortBy(_.getInt(4)).map(r => (r.getLong(1), r.getLong(3)))
    assert(q2.map(_._1).take(3).toSeq == Seq(101L, 102L, 103L),
      s"BM25 rank order wrong: ${q2.mkString(", ")}")
    assert(q2.map(_._2).take(3).toSeq == Seq(3L, 2L, 1L))
    // ranks are dense from 1 for every query
    all.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to rs.length).toSeq)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("deterministic under repartitioning (scaled-int sums)") {
    val dir = "/root/testdata/sf0.001"
    val a = RetrievalQ.bm25TopK(spark, dir).collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = RetrievalQ.bm25TopK(spark, dir).collect().map(_.toSeq).toSet
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
