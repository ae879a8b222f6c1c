package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestSession

/** Randomized branch-protocol invariants: arbitrary interleavings of
  * appends (on random refs), branch creations, fast-forwards and
  * cherry-picks must preserve —
  *  - allocator uniqueness (every commit a fresh version number);
  *  - chain linearity (each ref's lineage strictly ascending, ending
  *    at its head);
  *  - isolation (a ref's rows = exactly the batches committed to it,
  *    plus fork inheritance, fast-forward adoptions and picked
  *    commits — modeled by a reference interpreter over the same op
  *    sequence);
  *  - global read stability (an explicit version read never changes
  *    as later ops land).
  */
class BranchPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // one op per step; values chosen so every generated sequence is
  // legal by construction (ff/pick fall back to no-ops when their
  // preconditions don't hold — mirrored in the model)
  private sealed trait Op
  private case class Append(ref: Int, batch: Int) extends Op
  private case class Branch(from: Int) extends Op // new ref forked from ref `from`
  private case class FastForward(target: Int, source: Int) extends Op
  private case class Pick(target: Int, commit: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    6 -> (for { r <- Gen.choose(0, 3); b <- Gen.choose(0, 999) }
      yield Append(r, b)),
    2 -> Gen.choose(0, 3).map(Branch(_)),
    1 -> (for { t <- Gen.choose(0, 3); s <- Gen.choose(0, 3) }
      yield FastForward(t, s)),
    1 -> (for { t <- Gen.choose(0, 3); c <- Gen.choose(1, 12) }
      yield Pick(t, c)))

  private def seqGen: Gen[List[Op]] = Gen.listOfN(14, opGen)

  test("random op interleavings preserve allocator, chain and isolation invariants") {
    (1 to 6).foreach { i =>
      val ops = seqGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val root = Staging.tempDir(s"branch_prop_$i").toString
      val S = Snapshots

      // model: refName -> set of batch ids its state holds; commit
      // version -> (batch id if append-like, branch). Ref 0 = main.
      var refs = Vector("main")
      var model = Map("main" -> Set.empty[Int])
      var commitBatch = Map.empty[Int, Int]
      var committed = List.empty[(Int, Set[Int])] // (version, expected id set at that version)
      def df(b: Int) = Seq((b.toLong, s"b$b")).toDF("id", "s")

      // seed main so every ref resolves
      val v0 = S.append(df(0), root)
      model += ("main" -> Set(0)); commitBatch += (v0 -> 0)
      committed ::= (v0, Set(0))
      S.createBranch(root, "r1")
      refs :+= "r1"; model += ("r1" -> model("main"))

      ops.foreach {
        case Append(r, b) =>
          val ref = refs(r % refs.size)
          val v = S.appendTo(df(b), root, ref)
          model += (ref -> (model(ref) + b)); commitBatch += (v -> b)
          committed ::= (v, model(ref))
        case Branch(from) =>
          val src = refs(from % refs.size)
          val name = s"r${refs.size}"
          S.createBranch(root, name, from = S.headOf(root, src))
          refs :+= name; model += (name -> model(src))
        case FastForward(t, s0) =>
          val (tn, sn) = (refs(t % refs.size), refs(s0 % refs.size))
          if (tn != sn && model(tn).subsetOf(model(sn)) &&
              scala.util.Try(S.fastForward(root, tn, sn)).isSuccess)
            model += (tn -> model(sn))
        case Pick(t, c) =>
          val tn = refs(t % refs.size)
          commitBatch.get(c).foreach { b =>
            if (scala.util.Try(S.cherryPick(spark, root, tn, c)).isSuccess)
              model += (tn -> (model(tn) + b))
          }
      }

      // allocator uniqueness: every manifest number minted exactly once
      val latest = S.latestVersion(root)
      assert(commitBatch.keys.toSeq.distinct.size == commitBatch.size)
      // per-ref: lineage strictly ascending, state matches the model
      refs.foreach { ref =>
        val head = S.headOf(root, ref)
        val chain = S.lineage(root, head)
        assert(chain == chain.sorted && chain.distinct == chain,
          s"seed $i: non-linear chain for $ref: $chain")
        assert(chain.lastOption.getOrElse(0) == head)
        val got = S.readBranch(spark, root, ref)
          .select($"id").as[Long].collect().toSet
        assert(got == model(ref).map(_.toLong),
          s"seed $i: $ref state mismatch: got $got, want ${model(ref)}")
      }
      // explicit-version reads stable after all later activity
      committed.foreach { case (v, want) =>
        val got = S.read(spark, root, v)
          .select($"id").as[Long].collect().toSet
        assert(got == want.map(_.toLong),
          s"seed $i: v$v drifted: got $got, want $want")
      }
      assert(latest >= committed.size)
    }
  }
}
