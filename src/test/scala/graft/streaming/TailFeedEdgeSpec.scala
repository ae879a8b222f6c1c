package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** r18 review pins for the CDC tail's lifecycle edges: a rollback
  * whose abandoned chain was reaped by removeOrphans before the tail
  * caught up (was a permanent poison pill), and a feed that fell
  * behind expiry needing an expired parent for a delete preimage
  * (was an unrecoverable riddle from deep inside the read — now an
  * actionable error naming the remedy).
  */
class TailFeedEdgeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val S = graft.sources.Snapshots

  private def docs(ids: Long*) =
    ids.map(i => (i, s"text $i", 10L + i)).toDF("doc_id", "text", "n")

  test("rollback with a reaped abandoned chain resumes instead of poisoning the tail") {
    val root = graft.sources.Staging.tempDir("graft_tail_reap").toString
    val ck = graft.sources.Staging.tempDir("graft_tail_reap_ck").toString
    S.append(docs(1L, 2L).repartition(1), root)            // v1 main
    S.createBranch(root, "side")                           // refs exist now
    S.append(docs(3L).repartition(1), root)                // v2 main
    // a TWO-commit abandoned chain: after the reap the next append
    // reuses number 2, so the old tip (3) can never be resurrected by
    // number reuse and the old code's lineage(tip) walk is provably
    // empty — the poison-pill path, not an accidental pass
    S.append(docs(5L).repartition(1), root)                // v3 main
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    Streaming.tailChanges(spark, root, ck) { (_, v) => seen += v }
    assert(seen.toSeq == Seq(1, 2, 3), s"first run replays the chain: $seen")
    // rollback main to v1, abandon v2, and reap it BEFORE the tail
    // sees the rollback seq — the exact lifecycle the rollback
    // scaladoc documents
    S.rollback(root, "main", 1)
    S.removeOrphans(root, olderThanMillis = 0L)
    // with v2's manifest reaped, the store reuses its number for the
    // next commit — capture the actual version instead of assuming
    val vNew = S.append(docs(4L).repartition(1), root)     // new head from v1
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[Int]
    // old code: lineage(v2) walks nothing (manifest reaped), the
    // ancestor test fails, the divergence rethrows — and the same seq
    // replays on every restart. New code accepts the reaped-tip
    // rollback loudly and the feed advances.
    Streaming.tailChanges(spark, root, ck) { (_, v) => seen2 += v }
    assert(seen2.toSeq == Seq(vNew),
      s"the post-rollback commit v$vNew must flow (no retraction, no crash): $seen2")
  }

  test("a ref advance naming a dead version fails loudly, not silent absorption") {
    // r18 ADVICE: a missing tip manifest alone is not the rollback
    // signature — when the NEW head's manifest is missing too this is
    // manifest-store corruption (or a manual delete), and absorbing
    // it silently would let the tail skip history. The strengthened
    // arm requires a LIVE new head before accepting a reaped tip as
    // a rollback.
    val root = graft.sources.Staging.tempDir("graft_tail_corrupt").toString
    val ck = graft.sources.Staging.tempDir("graft_tail_corrupt_ck").toString
    S.append(docs(1L, 2L).repartition(1), root)            // v1 main
    S.createBranch(root, "side")                           // refs exist now
    S.append(docs(3L).repartition(1), root)                // v2 main
    S.append(docs(5L).repartition(1), root)                // v3 main
    Streaming.tailChanges(spark, root, ck) { (_, _) => () } // chainTip = 3
    S.rollback(root, "main", 1)
    S.removeOrphans(root, olderThanMillis = 0L)            // reaps 2, 3
    val vNew = S.append(docs(4L).repartition(1), root)     // new head + seq
    // corruption: the ref advance survives but the named manifest dies
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_manifests", s"$vNew.txt"))
    val e = intercept[Exception] {
      Streaming.tailChanges(spark, root, ck) { (_, _) => () }
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("manifest store corruption") ||
      msgs.contains("manifest is missing too"),
      s"expected the loud corruption refusal, got: $msgs")
  }

  test("a delete commit whose expired parent is gone fails with the re-sync remedy") {
    val root = graft.sources.Staging.tempDir("graft_tail_expired").toString
    val ck = graft.sources.Staging.tempDir("graft_tail_expired_ck").toString
    S.append(docs(1L, 2L, 3L).repartition(1), root)        // v1
    S.deleteWhere(spark, root, "doc_id", Seq(2L).toDF("doc_id"))  // v2 (needs v1 preimage)
    S.append(docs(9L).repartition(1), root)                // v3
    S.expire(root, keepFrom = 2)                           // reaps v1; v2 stays live
    val e = intercept[Exception] {
      Streaming.tailChanges(spark, root, ck) { (_, _) => () }
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("fell behind expiry") || msgs.contains("FRESH checkpoint")
      || msgs.contains("fresh checkpoint"),
      s"expected the actionable expiry error, got: $msgs")
  }
}
