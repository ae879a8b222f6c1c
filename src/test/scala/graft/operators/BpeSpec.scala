package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** BPE learn + apply against a hand-computed example (the hug/pug/hugs
  * corpus): merge selection order, tie-breaking, and the encode of an
  * UNSEEN word through the learned table. The gate (q128/q130) checks
  * engine parity and corpus invariants; this checks the algorithm.
  */
class BpeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // vocab: hug×10, pug×5, hugs×5
  // pair counts: (u,g)=20 → merge 1; (h,ug)=15 → merge 2;
  // then (p,ug)=5 ties (hug,s)=5 → "hug" < "p" lexically → (hug,s)
  private def vocab = Seq(("hug", 10L), ("pug", 5L), ("hugs", 5L))
    .toDF("term", "freq")
    .select(col("term"), BpeLearn.spaced(col("term")).as("s"), col("freq"))

  test("learn picks merges by weighted count with lexical tie-break") {
    val merges = BpeLearn.learn(vocab.select(col("s"), col("freq")), steps = 3)
    assert(merges.map(m => (m._2, m._3, m._4)) ==
      Seq(("u", "g", 20L), ("h", "ug", 15L), ("hug", "s", 5L)))
  }

  test("applyMerges reproduces training segmentation and encodes unseen words") {
    val merges = Seq(("u", "g"), ("h", "ug"), ("hug", "s"))
    val words = (Seq(("hug", 0L), ("pug", 0L), ("hugs", 0L), ("pugs", 0L),
        ("dog", 0L), ("gu", 0L)))
      .toDF("term", "freq")
      .select(col("term"), BpeLearn.spaced(col("term")).as("s"))
    val seg = BpeLearn.applyMerges(words, "s", merges)
      .select(col("term"), split(trim(col("s")), " ").as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seg("hug") == List("hug"))
    assert(seg("pug") == List("p", "ug"))
    assert(seg("hugs") == List("hugs"))
    // unseen word: merges fire in order where they apply
    assert(seg("pugs") == List("p", "ug", "s"))
    // no applicable merge → character-level fallback
    assert(seg("dog") == List("d", "o", "g"))
    // "gu" must NOT merge (order matters: (u,g) not (g,u))
    assert(seg("gu") == List("g", "u"))
  }
}
