package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Randomized DML invariants for the snapshot store: arbitrary
  * interleavings of append / merge / equality-delete / row-update /
  * compact must keep the live table equal to a trivial reference
  * interpreter (a driver-side Map), and every REMEMBERED version must
  * read back byte-stably no matter what lands after it — the
  * sequence-scoping contract (a key re-inserted after its delete
  * survives; an update's post-image outlives its own commit's
  * tombstones; compaction changes bytes, never rows) exercised down
  * random paths instead of the hand-picked gate choreographies.
  */
class SnapshotDmlPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private sealed trait Op
  private case class Append(keys: Seq[Long], delta: Long) extends Op
  private case class Merge(keys: Seq[Long], delta: Long) extends Op
  private case class Delete(keys: Seq[Long]) extends Op
  private case class Update(mod: Long, delta: Long) extends Op
  private case object Compact extends Op
  private case object CompactManifests extends Op
  // r15: the CHECKED commit paths join the interleavings — a clean
  // checked write behaves exactly like its unchecked twin; a violating
  // one must refuse leaving NO version, NO model drift, NO debris
  private case class CheckedAppend(keys: Seq[Long], delta: Long,
                                   violate: Boolean) extends Op
  private case class CheckedMerge(keys: Seq[Long], delta: Long,
                                  violate: Boolean) extends Op
  private case class CheckedUpdate(mod: Long, delta: Long,
                                   violate: Boolean) extends Op
  // r15: stats-clustered rewrite — entry reordering must be invisible
  // to rows, delete scoping, and every remembered version
  private case object CompactManifestsClustered extends Op
  // r16: the delete side of the checked-DML surface — a delete that
  // orphans a referenced key must refuse leaving NO version, NO model
  // drift; a clean one behaves exactly like deleteWhere
  private case class CheckedDelete(keys: Seq[Long], violate: Boolean) extends Op
  // r16: the clustered rewrite FORCED down the distributed (Spark-job)
  // path — must be row-, scoping-, and history-invisible exactly like
  // the driver-sort spelling it replaces above the memory threshold
  private case object RewriteManifestsDistributed extends Op

  private val keysGen = Gen.nonEmptyListOf(Gen.choose(0L, 39L)).map(_.distinct)
  private val opGen: Gen[Op] = Gen.frequency(
    4 -> (for { k <- keysGen; d <- Gen.choose(1L, 9L) } yield Append(k, d)),
    4 -> (for { k <- keysGen; d <- Gen.choose(1L, 9L) } yield Merge(k, d)),
    3 -> keysGen.map(Delete(_)),
    2 -> (for { m <- Gen.choose(2L, 5L); d <- Gen.choose(1L, 9L) }
      yield Update(m, d)),
    1 -> Gen.const(Compact),
    // r14: metadata-only manifest rewrite — rows, delete scoping, and
    // every remembered version must be bit-identical through it
    1 -> Gen.const(CompactManifests),
    2 -> (for { k <- keysGen; d <- Gen.choose(1L, 9L); bad <- Gen.oneOf(true, false) }
      yield CheckedAppend(k, d, bad)),
    2 -> (for { k <- keysGen; d <- Gen.choose(1L, 9L); bad <- Gen.oneOf(true, false) }
      yield CheckedMerge(k, d, bad)),
    1 -> (for { m <- Gen.choose(2L, 5L); d <- Gen.choose(1L, 9L); bad <- Gen.oneOf(true, false) }
      yield CheckedUpdate(m, d, bad)),
    1 -> Gen.const(CompactManifestsClustered),
    2 -> (for { k <- keysGen; bad <- Gen.oneOf(true, false) }
      yield CheckedDelete(k, bad)),
    1 -> Gen.const(RewriteManifestsDistributed))

  // every value any clean op writes is ≥ 0, so the range check passes
  // exactly when no violation was planted
  private val vChecks = Seq(
    graft.operators.QualityChecks.RowPredicate("v_nonneg", col("v") < 0L))

  test("random DML interleavings match the reference interpreter; remembered versions stay stable") {
    (1 to 5).foreach { i =>
      val ops = Gen.listOfN(12, opGen)
        .pureApply(Gen.Parameters.default, Seed(7000L + i))
      val root = Staging.tempDir(s"dml_prop_$i").toString
      val S = Snapshots

      // model: MULTISET of (id, v) — appends may duplicate ids; merge
      // and delete act on ALL rows of a key; update rewrites matching
      // rows in place
      var model = Vector.empty[(Long, Long)]
      var snapshots = List.empty[(Int, Vector[(Long, Long)])]
      def df(rows: Seq[(Long, Long)]) = rows.toDF("id", "v")

      S.append(df((0L to 9L).map(k => k -> k)), root)
      model = (0L to 9L).map(k => k -> k).toVector
      snapshots ::= (1, model)

      ops.foreach { op =>
        val ver = op match {
          case Append(keys, d) =>
            val rows = keys.map(k => k -> (k + d))
            model = model ++ rows
            S.append(df(rows).repartition(2), root)
          case Merge(keys, d) =>
            val rows = keys.map(k => k -> (k * 10 + d))
            model = model.filterNot(r => keys.contains(r._1)) ++ rows
            S.merge(spark, root, "id", df(rows).repartition(1))
          case Delete(keys) =>
            model = model.filterNot(r => keys.contains(r._1))
            S.deleteWhere(spark, root, "id", keys.toDF("id"))
          case Update(m, d) =>
            model = model.map { case (k, v) =>
              if (v % m == 0) (k, v + d) else (k, v) }
            S.updateWhere(spark, root, pmod(col("v"), lit(m)) === 0,
              Map("v" -> (col("v") + d)))
          case Compact =>
            S.compact(spark, root, targetFiles = 2)
          case CompactManifests =>
            S.compactManifests(root)
          case CheckedAppend(keys, d, bad) =>
            val rows = keys.map(k => k -> (if (bad) -(k + d) else k + d))
            if (bad) {
              val head = S.latestVersion(root)
              intercept[IllegalStateException] {
                S.appendChecked(df(rows).repartition(2), root, vChecks)
              }
              assert(S.latestVersion(root) == head,
                s"seed $i: refused checked append minted a version")
              head
            } else {
              model = model ++ rows
              S.appendChecked(df(rows).repartition(2), root, vChecks)
            }
          case CheckedMerge(keys, d, bad) =>
            val rows = keys.map(k => k -> (if (bad) -(k * 10 + d) else k * 10 + d))
            if (bad) {
              val head = S.latestVersion(root)
              intercept[IllegalStateException] {
                S.mergeChecked(spark, root, "id", df(rows).repartition(1), vChecks)
              }
              assert(S.latestVersion(root) == head,
                s"seed $i: refused checked merge minted a version")
              head
            } else {
              model = model.filterNot(r => keys.contains(r._1)) ++ rows
              S.mergeChecked(spark, root, "id", df(rows).repartition(1), vChecks)
            }
          case CheckedUpdate(m, d, bad) =>
            val set = Map("v" -> (if (bad) lit(-1L) else col("v") + d))
            if (bad) {
              // refused only if some row MATCHES; an empty match set
              // stages no files and commits a (valid) empty update
              val matches = model.exists(_._2 % m == 0)
              val head = S.latestVersion(root)
              if (matches) {
                intercept[IllegalStateException] {
                  S.updateChecked(spark, root,
                    pmod(col("v"), lit(m)) === 0, set, vChecks)
                }
                assert(S.latestVersion(root) == head,
                  s"seed $i: refused checked update minted a version")
                head
              } else
                S.updateChecked(spark, root,
                  pmod(col("v"), lit(m)) === 0, set, vChecks)
            } else {
              model = model.map { case (k, v) =>
                if (v % m == 0) (k, v + d) else (k, v) }
              S.updateChecked(spark, root,
                pmod(col("v"), lit(m)) === 0, set, vChecks)
            }
          case CompactManifestsClustered =>
            S.compactManifests(root, targetLines = 3,
              clusterBy = Some("id"))
          case CheckedDelete(keys, bad) =>
            // violate: reference the delete keys themselves — none can
            // resolve in the post-image, so a nonempty key set always
            // orphans. clean: reference only keys that SURVIVE the
            // delete (or nothing, when the table empties) — the
            // post-image resolves them all
            val live = model.map(_._1).distinct
            val refKeys =
              if (bad) keys else live.filterNot(keys.contains).take(3)
            val ri = Seq(graft.operators.QualityChecks.InboundRef(
              "ri_orphans", refKeys.toDF("rid"), col("rid"), col("id")))
            if (bad) {
              val head = S.latestVersion(root)
              intercept[IllegalStateException] {
                S.deleteChecked(spark, root, "id", keys.toDF("id"), ri)
              }
              assert(S.latestVersion(root) == head,
                s"seed $i: refused checked delete minted a version")
              head
            } else {
              model = model.filterNot(r => keys.contains(r._1))
              S.deleteChecked(spark, root, "id", keys.toDF("id"), ri)
            }
          case RewriteManifestsDistributed =>
            S.rewriteManifests(spark, root, targetLines = 3,
              clusterBy = Some("id"), maxDriverSortLines = 0L)
        }
        val got = S.read(spark, root)
          .as[(Long, Long)].collect().toVector.sorted
        assert(got == model.sorted,
          s"seed $i after $op: got $got\nwant ${model.sorted}")
        snapshots ::= (ver, model)
      }

      // every remembered version reads back exactly its frozen state
      snapshots.foreach { case (v, want) =>
        val got = S.read(spark, root, v)
          .as[(Long, Long)].collect().toVector.sorted
        assert(got == want.sorted, s"seed $i: v$v drifted")
      }

      // two-level manifest invariants (r13), down the same random
      // paths: every pointer resolves to an existing segment whose
      // line count matches its advertisement, and after an orphan
      // sweep the on-disk segment set equals the referenced set (a
      // CAS-retried commit may strand a content-addressed segment;
      // nothing referenced may vanish)
      segmentInvariants(root, i)
      S.removeOrphans(root, olderThanMillis = 0L)
      segmentInvariants(root, i)
      assert(diskSegments(root) == referencedSegments(root).keySet,
        s"seed $i: orphan sweep must leave exactly the referenced segments")
      snapshots.foreach { case (v, want) =>
        val got = S.read(spark, root, v)
          .as[(Long, Long)].collect().toVector.sorted
        assert(got == want.sorted, s"seed $i: v$v drifted after orphan sweep")
      }

      // r15: commit stamps strictly monotone down the same random
      // paths, and timestamp travel resolves EVERY remembered version
      // exactly from its own commit time
      val head = S.latestVersion(root)
      val tss = (1 to head).map(v => S.commitTimeOf(root, v))
      assert(tss == tss.sorted && tss.distinct == tss,
        s"seed $i: commit stamps not strictly monotone: $tss")
      snapshots.map(_._1).distinct.foreach { v =>
        assert(S.versionAsOf(root, S.commitTimeOf(root, v)) == v,
          s"seed $i: versionAsOf(ts(v$v)) must resolve v$v")
      }
    }
  }

  private def manifestsDir(root: String) =
    java.nio.file.Paths.get(root).resolve("_manifests")

  /** (segment file name → advertised line count) across LIVE lists. */
  private def referencedSegments(root: String): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val md = manifestsDir(root)
    val s = java.nio.file.Files.list(md)
    val lists = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.matches("\\d+\\.txt")).toSeq finally s.close()
    lists.flatMap { l =>
      java.nio.file.Files.readAllLines(md.resolve(l)).asScala
        .filter(_.startsWith("#segment\t"))
        .map { p => val t = p.split('\t'); t(1) -> t(2).toInt }
    }.toMap
  }

  private def diskSegments(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(manifestsDir(root))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_seg_")).toSet finally s.close()
  }

  private def segmentInvariants(root: String, seed: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val md = manifestsDir(root)
    referencedSegments(root).foreach { case (name, n) =>
      val p = md.resolve(name)
      assert(java.nio.file.Files.exists(p), s"seed $seed: dangling segment $name")
      val lines = java.nio.file.Files.readAllLines(p).asScala.count(_.nonEmpty)
      assert(lines == n,
        s"seed $seed: $name advertises $n lines, holds $lines")
    }
  }
}
