package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Writable branches (r11): the ref/allocator split, parent-pointer
  * chains, Write-Audit-Publish fast-forward, branch-aware history /
  * CDC / expire, and orphan reaping of dropped branches.
  */
class BranchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select($"id").as[Long].collect().toSet

  test("branch commits are invisible to main and vice versa") {
    val root = Staging.tempDir("branch_spec1").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "audit")
    val vb = Snapshots.appendTo(Seq((2L, "b")).toDF("id", "s"), root, "audit")
    val vm = Snapshots.append(Seq((3L, "c")).toDF("id", "s"), root)
    // global allocator: distinct version numbers, shared counter
    assert(vb != vm && Set(vb, vm) == Set(2, 3))
    // each ref reads ONLY its own chain
    assert(ids(Snapshots.readBranch(spark, root, "main")) == Set(1L, 3L))
    assert(ids(Snapshots.readBranch(spark, root, "audit")) == Set(1L, 2L))
    // default read resolves main's ref, not the max version number
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 3L))
    // parent pointers: both children fork from v1
    assert(Snapshots.parentOf(root, vb) == 1)
    assert(Snapshots.parentOf(root, vm) == 1)
    assert(Snapshots.branchOf(root, vb) == "audit")
    assert(Snapshots.branchOf(root, vm) == "main")
  }

  test("history and CDC walk the branch chain, not the number range") {
    val root = Staging.tempDir("branch_spec2").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "wip")
    Snapshots.appendTo(Seq((2L, "b")).toDF("id", "s"), root, "wip") // v2 (wip)
    Snapshots.append(Seq((3L, "c")).toDF("id", "s"), root)          // v3 (main)
    Snapshots.appendTo(Seq((4L, "d")).toDF("id", "s"), root, "wip") // v4 (wip)
    val mainHist = Snapshots.history(spark, root)
      .select($"version").as[Int].collect().toSet
    val wipHist = Snapshots.history(spark, root, "wip")
      .select($"version").as[Int].collect().toSet
    assert(mainHist == Set(1, 3) && wipHist == Set(1, 2, 4))
    // CDC along wip's chain: (v1, v4] = commits v2 and v4 only
    val feed = Snapshots.changesBetween(spark, root, 1, 4)
    assert(feed.select($"id").as[Long].collect().toSet == Set(2L, 4L))
    // a window across diverged refs has no linear chain — loud failure
    intercept[IllegalArgumentException] {
      Snapshots.changesBetween(spark, root, 3, 4)
    }
  }

  test("fast-forward publishes an audit branch; diverged refs refuse") {
    val root = Staging.tempDir("branch_spec3").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "audit")
    Snapshots.appendTo(Seq((2L, "b")).toDF("id", "s"), root, "audit")
    Snapshots.appendTo(Seq((3L, "c")).toDF("id", "s"), root, "audit")
    // WAP: main untouched while the audit branch accumulates
    assert(ids(Snapshots.read(spark, root)) == Set(1L))
    val head = Snapshots.fastForward(root, "main", "audit")
    assert(Snapshots.headOf(root, "main") == head)
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 2L, 3L))
    // idempotent when already equal
    assert(Snapshots.fastForward(root, "main", "audit") == head)
    // diverge: a main commit makes audit non-fast-forwardable
    Snapshots.append(Seq((4L, "d")).toDF("id", "s"), root)
    Snapshots.appendTo(Seq((5L, "e")).toDF("id", "s"), root, "audit")
    intercept[IllegalArgumentException] {
      Snapshots.fastForward(root, "main", "audit")
    }
  }

  test("branch DML: merge and delete advance only their branch") {
    val root = Staging.tempDir("branch_spec4").toString
    Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    Snapshots.createBranch(root, "fix")
    Snapshots.merge(spark, root, "id",
      Seq((2L, "B!"), (9L, "i")).toDF("id", "s"), branch = "fix")
    Snapshots.deleteWhere(spark, root, "id",
      Seq(Tuple1(1L)).toDF("id"), branch = "fix")
    assert(Snapshots.readBranch(spark, root, "fix")
      .as[(Long, String)].collect().toSet == Set((2L, "B!"), (9L, "i")))
    assert(Snapshots.read(spark, root)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("expire keeps branch lineages; removeOrphans reaps dropped ones") {
    val root = Staging.tempDir("branch_spec5").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "keepme", from = 1)
    Snapshots.appendTo(Seq((2L, "b")).toDF("id", "s"), root, "keepme") // v2
    Snapshots.append(Seq((3L, "c")).toDF("id", "s"), root)          // v3
    Snapshots.append(Seq((4L, "d")).toDF("id", "s"), root)          // v4
    // main chain 1,3,4 — cutoff 4 would expire 1 and 3, but 1 anchors
    // keepme's lineage and survives
    Snapshots.expire(root, keepFrom = 4)
    assert(ids(Snapshots.readBranch(spark, root, "keepme")) == Set(1L, 2L))
    assert(ids(Snapshots.read(spark, root, 1)) == Set(1L))
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 3) }
    // main's history truncates at the expired v3, as after any expire
    assert(Snapshots.history(spark, root)
      .select($"version").as[Int].collect().toSet == Set(4))
    // drop the branch: v2 (and now-unanchored v1) become unreachable
    // manifests; the age-0 test sweep reaps them and their data files
    Snapshots.dropBranch(root, "keepme")
    assert(Snapshots.removeOrphans(root, 0L) > 0)
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 2) }
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 3L, 4L))
  }

  test("same-branch racers serialize through the head CAS") {
    val root = Staging.tempDir("branch_spec6").toString
    Snapshots.append(Seq((0L, "z")).toDF("id", "s"), root)
    Snapshots.createBranch(root, "hot")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = Snapshots.appendTo(
            Seq((i.toLong, s"r$i")).toDF("id", "s"), root, "hot")
        })
      }
      val versions = futs.map(_.get())
      assert(versions.distinct.size == 4)
      // all four rows landed, linear chain from the head
      assert(ids(Snapshots.readBranch(spark, root, "hot")) ==
        Set(0L, 1L, 2L, 3L, 4L))
      assert(Snapshots.lineage(root,
        Snapshots.headOf(root, "hot")).size == 5)
      // main never moved
      assert(ids(Snapshots.read(spark, root)) == Set(0L))
    } finally pool.shutdown()
  }

  test("cross-branch racers share the allocator but never each other's history") {
    val root = Staging.tempDir("branch_spec9").toString
    Snapshots.append(Seq((0L, "z")).toDF("id", "s"), root)
    Snapshots.createBranch(root, "left")
    Snapshots.createBranch(root, "right")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      val futs = (1 to 6).map { i =>
        val branch = if (i % 2 == 0) "left" else "right"
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = Snapshots.appendTo(
            Seq((i.toLong, branch)).toDF("id", "s"), root, branch)
        })
      }
      val versions = futs.map(_.get())
      // the global allocator never hands out the same number twice
      assert(versions.distinct.size == 6)
      assert(ids(Snapshots.readBranch(spark, root, "left")) ==
        Set(0L, 2L, 4L, 6L))
      assert(ids(Snapshots.readBranch(spark, root, "right")) ==
        Set(0L, 1L, 3L, 5L))
      assert(ids(Snapshots.read(spark, root)) == Set(0L))
      // each branch's chain is linear over its own commits only
      assert(Snapshots.lineage(root, Snapshots.headOf(root, "left"))
        .size == 4)
      assert(Snapshots.lineage(root, Snapshots.headOf(root, "right"))
        .size == 4)
    } finally pool.shutdown()
  }

  test("cherry-pick replays one append onto a diverged ref with a fresh sequence number") {
    val root = Staging.tempDir("branch_spec8").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "feat")
    Snapshots.appendTo(Seq((2L, "b"), (3L, "c")).toDF("id", "s"),
      root, "feat")                                                  // v2
    // main diverges: a tombstone for key 2 lands BEFORE the pick
    Snapshots.deleteWhere(spark, root, "id", Seq(Tuple1(2L)).toDF("id")) // v3
    intercept[IllegalArgumentException] {
      Snapshots.fastForward(root, "main", "feat") // diverged — refused
    }
    val w = Snapshots.cherryPick(spark, root, "main", 2)
    // sequence correctness: the picked rows carry the NEW commit's
    // number, so the older v3 tombstone must NOT kill key 2
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 2L, 3L))
    assert(Snapshots.parentOf(root, w) == 3)
    // feat untouched; double-pick of an ancestor refused
    assert(ids(Snapshots.readBranch(spark, root, "feat")) == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Snapshots.cherryPick(spark, root, "main", 2)
    }
    // non-append commits refuse
    intercept[IllegalArgumentException] {
      Snapshots.cherryPick(spark, root, "feat", 3)
    }
  }

  test("rollback moves a ref to an ancestor; the next commit forks there") {
    val root = Staging.tempDir("branch_spec12").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "dev")                             // refs on
    Snapshots.append(Seq((2L, "bad")).toDF("id", "s"), root)        // v2
    Snapshots.append(Seq((3L, "worse")).toDF("id", "s"), root)      // v3
    assert(Snapshots.rollback(root, "main", 1) == 1)
    assert(ids(Snapshots.read(spark, root)) == Set(1L))
    // abandoned commits stay time-travelable by explicit version
    assert(ids(Snapshots.read(spark, root, 3)) == Set(1L, 2L, 3L))
    // the next commit forks from the rollback point
    val w = Snapshots.append(Seq((4L, "good")).toDF("id", "s"), root)
    assert(Snapshots.parentOf(root, w) == 1)
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 4L))
    // rolling back to a non-ancestor (the abandoned v2) is refused
    intercept[IllegalArgumentException] {
      Snapshots.rollback(root, "main", 2)
    }
    // the abandoned suffix reaps as unreachable once aged
    assert(Snapshots.removeOrphans(root, 0L) > 0)
    intercept[IllegalArgumentException] { Snapshots.read(spark, root, 2) }
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 4L))
  }

  test("expire never eats a ref head, even when keepFrom outruns main's version number") {
    val root = Staging.tempDir("branch_spec11").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)          // v1
    Snapshots.createBranch(root, "exp")
    Snapshots.append(Seq((2L, "b")).toDF("id", "s"), root)          // v2 main (head)
    Snapshots.appendTo(Seq((3L, "c")).toDF("id", "s"), root, "exp") // v3
    Snapshots.appendTo(Seq((4L, "d")).toDF("id", "s"), root, "exp") // v4
    // the global allocator ran ahead of main's head (latest=4 > 2);
    // a cutoff above main's head must not delete the head manifest
    Snapshots.expire(root, keepFrom = 4)
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 2L))
    assert(ids(Snapshots.readBranch(spark, root, "exp")) == Set(1L, 3L, 4L))
    // and main still accepts commits
    Snapshots.append(Seq((5L, "e")).toDF("id", "s"), root)
    assert(ids(Snapshots.read(spark, root)) == Set(1L, 2L, 5L))
  }

  test("metadata defaults resolve main's ref on a branched table") {
    val root = Staging.tempDir("branch_spec10").toString
    Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root) // v1
    Snapshots.createBranch(root, "big")
    Snapshots.appendTo(Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "s"),
      root, "big")                                                    // v2
    // -1 means MAIN's head (2 rows), not the max version number's
    // 5-row branch state
    assert(Snapshots.metadataCount(root) == 2L)
    assert(Snapshots.filesTable(spark, root).count() ==
      Snapshots.files(root, 1).size.toLong)
    // explicit versions still time-travel anywhere, branch or not
    assert(Snapshots.metadataCount(root, 2) == 5L)
    assert(ids(Snapshots.read(spark, root, 2)) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("refsTable lists branches and tags") {
    val root = Staging.tempDir("branch_spec7").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)
    Snapshots.tag(root, "rel", 1)
    Snapshots.createBranch(root, "dev")
    val rows = Snapshots.refsTable(spark, root)
      .as[(String, String, Int)].collect().toSet
    assert(rows == Set(("main", "branch", 1), ("dev", "branch", 1),
      ("rel", "tag", 1)))
  }

  test("removeOrphans sweeps crash-debris _tmp_ files in every staging directory") {
    import java.nio.file.{Files, Paths}
    val root = Staging.tempDir("tmp_debris_spec").toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)
    Snapshots.createBranch(root, "wip")
    Snapshots.tag(root, "rel", 1)
    // a writer that died between staging and its finally-delete, in
    // each of the four staging sites
    val debris = Seq(
      Paths.get(root, "_refs", "wip", "_tmp_deadbeef"),
      Paths.get(root, "_tags", "_tmp_rel_cafe"),
      Paths.get(root, "_manifests", "_tmp_9_feed.txt"),
      Paths.get(root, "_tmp_latest_9_f00d"))
    debris.foreach(p => Files.write(p, "9".getBytes("UTF-8")))
    // age-guarded: a fresh file (in-flight writer) survives a 1h sweep
    Snapshots.removeOrphans(root, olderThanMillis = 3600L * 1000)
    assert(debris.forall(Files.exists(_)), "young tmp files are an in-flight writer's")
    Snapshots.removeOrphans(root, olderThanMillis = 0)
    assert(debris.forall(!Files.exists(_)), "aged tmp debris must be reaped")
    // the sweep touched nothing real: refs, tags and data still read
    assert(ids(Snapshots.readBranch(spark, root, "wip")) == Set(1L))
    assert(Snapshots.tags(root).toSet == Set(("rel", 1)))
  }

  // ---- per-ref retention (r12): expireRefs ----

  private def chainOf5(name: String): String = {
    val root = Staging.tempDir(name).toString
    Snapshots.append(Seq((1L, "a")).toDF("id", "s"), root)            // v1 main
    Snapshots.createBranch(root, "logs")
    for (i <- 2 to 5)
      Snapshots.appendTo(Seq((i.toLong, "b")).toDF("id", "s"), root, "logs")
    root                                                              // logs: 1..5
  }

  private def manifest(root: String, v: Int) =
    java.nio.file.Paths.get(root, "_manifests", s"$v.txt")

  test("count-based ref retention sweeps aged branch history, spares tag/main/head") {
    val root = chainOf5("retain_spec1")
    Snapshots.tag(root, "pin", 3)
    assert(Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 1,
      maxAgeMillis = 0L) == 0)   // append-only: all files carried forward
    // v2/v4 swept; v1 (main), v3 (tag), v5 (head) survive
    assert(!java.nio.file.Files.exists(manifest(root, 2)))
    assert(!java.nio.file.Files.exists(manifest(root, 4)))
    assert(ids(Snapshots.read(spark, root, 3)) == Set(1L, 2L, 3L))
    assert(ids(Snapshots.readBranch(spark, root, "logs")) == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(Snapshots.read(spark, root)) == Set(1L))
    // the branch walk truncates at the expired parent
    assert(Snapshots.lineage(root, Snapshots.headOf(root, "logs")) == Seq(5))
  }

  test("minSnapshotsToKeep bounds the sweep window from the head") {
    val root = chainOf5("retain_spec2")
    Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 3, maxAgeMillis = 0L)
    // candidates {1, 2}; v1 is main's lineage -> only v2 goes
    assert(!java.nio.file.Files.exists(manifest(root, 2)))
    (3 to 5).foreach(v => assert(java.nio.file.Files.exists(manifest(root, v))))
  }

  test("maxAgeMillis keeps young snapshots; an aged one expires") {
    val root = chainOf5("retain_spec3")
    // everything is seconds old: an hour-long age guard expires nothing
    Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 1,
      maxAgeMillis = 3600L * 1000)
    (1 to 5).foreach(v => assert(java.nio.file.Files.exists(manifest(root, v))))
    // age v2 two hours into the past -> it alone crosses the guard
    java.nio.file.Files.setLastModifiedTime(manifest(root, 2),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600L * 1000))
    Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 1,
      maxAgeMillis = 3600L * 1000)
    assert(!java.nio.file.Files.exists(manifest(root, 2)))
    (3 to 5).foreach(v => assert(java.nio.file.Files.exists(manifest(root, v))))
  }

  test("another ref's lineage is untouchable; a headless keep-count is refused") {
    val root = chainOf5("retain_spec4")
    Snapshots.createBranch(root, "fork", from = 3)    // fork pins 1..3
    Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 1, maxAgeMillis = 0L)
    // only v4 is sweepable: 1..3 are fork's lineage, 5 is the head
    assert(!java.nio.file.Files.exists(manifest(root, 4)))
    (1 to 3).foreach(v => assert(java.nio.file.Files.exists(manifest(root, v))))
    assert(ids(Snapshots.readBranch(spark, root, "fork")) == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Snapshots.expireRefs(root, "logs", minSnapshotsToKeep = 0, maxAgeMillis = 0L)
    }
  }
}
