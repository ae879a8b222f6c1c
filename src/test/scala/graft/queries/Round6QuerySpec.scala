package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariant checks for the round-6 battery additions, beyond the
  * DuckDB hash gate: structural properties the gate's value compare
  * can't articulate (chunk-coverage geometry, code-range bounds,
  * label exclusion in mined negatives).
  */
class Round6QuerySpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.001"

  test("q140 chunks: consecutive ids, stride starts, full coverage, no containment") {
    val rows = TextQ.chunkPlan(spark, dir)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getInt(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i)               // consecutive chunk ids
        assert(r.getLong(2) == 48L * i)        // stride-48 starts
        val w = r.getLong(3) - r.getLong(2)
        assert(w >= 1 && w <= 64)              // window width in (0, W]
        assert(r.getLong(4) == w)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) < a.getLong(3))  // overlap exists
          assert(b.getLong(3) > a.getLong(3))  // never contained
        case _ =>
      }
    }
  }

  test("q144 codes span [0,255], extremes are hit, bound column holds") {
    val rows = VectorQ.int8Quantize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 0 && r.getInt(3) <= 255)
      // a non-degenerate vector maps its min to 0 and max to 255
      assert(r.getInt(2) == 0 && r.getInt(3) == 255)
      assert(r.getBoolean(6), s"error bound violated for vec ${r.getLong(0)}")
    }
  }

  test("q146 SQL-registered functions equal their Column-API kernels") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_md5_low60('abc') AS h,
        |  graft_cosine_similarity(array(3.0D, 4.0D), array(4.0D, 3.0D)) AS c,
        |  graft_simhash60(array('a', 'b', 'c')) AS s""".stripMargin).head()
    val viaCol = Seq(("abc", Seq(3.0, 4.0), Seq(4.0, 3.0), Seq("a", "b", "c")))
      .toDF("t", "va", "vb", "toks")
      .select(graft.functions.Md5Functions.md5_low60(col("t")),
        graft.functions.VectorFunctions.cosine_similarity(col("va"), col("vb")),
        graft.functions.VectorFunctions.simhash60(col("toks")))
      .head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
    assert(viaSql.getLong(2) == viaCol.getLong(2))
  }

  test("q138 negatives never share the query's label; ranks are 1..5") {
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    val negs = VectorQ.hardNegatives(spark, dir)
    val joined = negs
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), Seq("query_id"))
      .join(labels.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("label", "nl"), Seq("neg_id"))
    assert(joined.filter(col("ql") === col("nl")).count() == 0)
    val ranks = negs.groupBy(col("query_id"))
      .agg(collect_set(col("rn")).as("rns")).collect()
    ranks.foreach(r =>
      assert(r.getSeq[Int](1).sorted == Seq(1, 2, 3, 4, 5)))
  }
}
