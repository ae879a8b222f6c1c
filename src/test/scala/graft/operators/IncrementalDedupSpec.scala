package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.Tables

class IncrementalDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)
  private lazy val history = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
  private lazy val batch = docs.filter(pmod($"doc_id", lit(10)) === 0)
  private lazy val bloom = IncrementalDedup.contentBloom(history)

  test("no false negatives: every true duplicate is bloom-positive and confirmed") {
    val ann = IncrementalDedup.annotateAgainst(batch, history, bloom)
    // truth by direct canonical-text semi-join
    val truth = batch
      .withColumn("ct", Dedup.canonicalText($"text"))
      .join(history.select(Dedup.canonicalText($"text").as("ct")).distinct(),
        Seq("ct"), "semi")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val confirmed = ann.filter($"is_dup").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(confirmed == truth)
    assert(ann.filter($"is_dup" && !$"bloom_hit").count() == 0L)
  }

  test("fp rate is bounded and newDocs drops exactly the dups") {
    val ann = IncrementalDedup.annotateAgainst(batch, history, bloom)
    val nBatch = batch.count()
    val nDup = ann.filter($"is_dup").count()
    val nHit = ann.filter($"bloom_hit").count()
    assert(nHit - nDup <= math.max(16L, (5 * 0.01 * nBatch).toLong))
    assert(IncrementalDedup.newDocs(batch, history, bloom).count() == nBatch - nDup)
  }

  test("empty batch and empty history behave") {
    val emptyB = batch.filter(lit(false))
    assert(IncrementalDedup.annotateAgainst(emptyB, history, bloom).count() == 0L)
    val emptyH = history.filter(lit(false))
    val b2 = IncrementalDedup.contentBloom(emptyH)
    val ann = IncrementalDedup.annotateAgainst(batch, emptyH, b2)
    assert(ann.filter($"is_dup").count() == 0L)
    assert(ann.count() == batch.count())
  }

  test("annotation-name collisions refuse loudly (r18 scratch guard)") {
    import org.apache.spark.sql.functions._
    val batch = Seq((1L, "a")).toDF("doc_id", "text").withColumn("is_dup", lit(false))
    val history = Seq((0L, "b")).toDF("doc_id", "text")
    val bloom = IncrementalDedup.contentBloom(history)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.annotateAgainst(batch, history, bloom)
    }
    assert(e.getMessage.contains("is_dup"))
  }
}
