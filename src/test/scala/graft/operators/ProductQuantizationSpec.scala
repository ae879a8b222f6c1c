package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.Tables

class ProductQuantizationSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = Tables.embeddings(spark, dir)
    .select($"vec_id", $"embedding")
  private lazy val cb = ProductQuantization.train(embs, m = 16, ksub = 256)

  test("train skips NULL embeddings and refuses mixed dims loudly (r18)") {
    import org.apache.spark.sql.functions._
    // a null vector whose id hashes early must not NPE the seed collect
    val withNull = embs.limit(8).unionByName(
      embs.limit(1).select($"vec_id" + 1000000L as "vec_id",
        lit(null).cast("array<float>").as("embedding")))
    val cb1 = ProductQuantization.train(withNull, m = 2, ksub = 4)
    assert(cb1.centers.nonEmpty)
    // mixed dims: loud refusal, not an ArrayIndexOutOfBounds
    val mixed = embs.limit(4).unionByName(
      embs.limit(1).select($"vec_id" + 2000000L as "vec_id",
        expr("slice(embedding, 1, 8)").as("embedding")))
    val e = intercept[IllegalArgumentException] {
      ProductQuantization.train(mixed, m = 2, ksub = 8)
    }
    assert(e.getMessage.contains("mixes embedding dims"), e.getMessage)
  }

  test("codebook shape and deterministic rebuild") {
    assert(cb.m == 16 && cb.ksub == 256 && cb.dsub == 4)
    assert(cb.centers.length == 16 * 256 * 4)
    val cb2 = ProductQuantization.train(embs, m = 16, ksub = 256)
    assert(cb.centers.sameElements(cb2.centers))
  }

  test("ADC estimate equals the manual table lookup, row for row") {
    import graft.functions.PqFunctions._
    // expression self-estimate vs the same sum computed by hand from
    // the returned codes — an adcDot indexing bug cannot hide
    val rows = embs.limit(20)
      .select($"vec_id",
        $"embedding".cast("array<double>").as("v"),
        pq_encode($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub).as("codes"),
        pq_adc_dot(
          pq_table($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub),
          pq_encode($"embedding".cast("array<double>"), cb.centers, cb.m, cb.ksub),
          cb.ksub).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1); val codes = r.getSeq[Int](2)
      assert(codes.length == cb.m && codes.forall(c => c >= 0 && c < cb.ksub))
      val manual = (0 until cb.m).map { j =>
        val base = (j * cb.ksub + codes(j)) * cb.dsub
        (0 until cb.dsub).map(i => v(j * cb.dsub + i) * cb.centers(base + i)).sum
      }.sum
      assert(math.abs(r.getDouble(3) - manual) < 1e-9,
        s"vec ${r.getLong(0)}: est ${r.getDouble(3)} vs manual $manual")
    }
  }

  test("shortlist + re-rank reproduces the exact top-k on the fixture") {
    val queries = embs.filter($"vec_id" < 10)
    val pq = ProductQuantization.adcRerankTopK(embs, queries, 5, cb)
      .select($"query_id", $"corpus_id", $"sim", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = Similarity.bruteForceTopK(embs, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(pq == exact)
  }

  test("empty corpus yields an empty codebook; dim mismatch is rejected") {
    val empty = embs.filter(lit(false))
    assert(ProductQuantization.train(empty).isEmpty)
    intercept[IllegalArgumentException] {
      ProductQuantization.train(embs, m = 7) // 64 % 7 != 0
    }
  }

  test("pq kernels refuse wrong-length vectors instead of reading out of bounds") {
    import graft.functions.PqFunctions.{pq_encode, pq_table}
    val cb = ProductQuantization.train(embs)
    val bad = Seq((1L, Seq.fill(17)(0.5))).toDF("vec_id", "embedding")
    // UnsafeArrayData has no bounds checks — without the loud guard a
    // 17-dim vector against a 64-dim codebook read past the array and
    // produced garbage codes silently (r16 review finding)
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception] {
      bad.select(pq_encode($"embedding".cast("array<double>"),
        cb.centers, cb.m, cb.ksub)).collect()
    }
    assert(rootMsg(e1).contains("pq_encode"), rootMsg(e1))
    val e2 = intercept[Exception] {
      bad.select(pq_table($"embedding".cast("array<double>"),
        cb.centers, cb.m, cb.ksub)).collect()
    }
    assert(rootMsg(e2).contains("pq_table"), rootMsg(e2))
  }
}
