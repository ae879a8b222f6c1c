package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import java.sql.Timestamp

/** Property-based invariants from SURVEY.md §5 item 4:
  *  - PSW constant per UID; TSW constant per treatment
  *  - WIR ≥ 1 for every surviving row with a non-null weigh-in
  *  - filters only remove rows
  *  - dedup idempotent
  *  - pipeline deterministic under input permutation (sort keys are
  *    unique in generated data, so the total order is well-defined)
  */
class PipelinePropertySpec extends AnyFunSuite with SparkTestSession {

  /** scalatest-scalacheck bridge is not on the offline classpath; drive
    * the generator directly with deterministic seeds instead.
    */
  private def forAllSeeded(n: Int)(body: Fixture => Unit): Unit =
    (1 to n).foreach { i =>
      body(fixtureGen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }
  import spark.implicits._

  private val base = Timestamp.valueOf("2023-01-01 00:00:00").getTime

  case class Fixture(users: Seq[(String, String, Long, Long)],
      weighs: Seq[(String, Double, Long)])

  /** Small random corpus: n users, each with k weigh-ins at unique
    * minute offsets (unique sort keys by construction).
    */
  private val fixtureGen: Gen[Fixture] = for {
    nUsers <- Gen.choose(1, 8)
    users <- Gen.sequence[Seq[(String, String, Long, Long)], (String, String, Long, Long)](
      (0 until nUsers).map { i =>
        for {
          gender <- Gen.oneOf("Male", "Female")
          age <- Gen.choose(10L, 90L)
          clinic <- Gen.oneOf(5066L, 5067L)
        } yield (f"u$i%03d", gender, age, clinic)
      })
    weighs <- Gen.sequence[Seq[Seq[(String, Double, Long)]], Seq[(String, Double, Long)]](
      (0 until nUsers).map { i =>
        for {
          k <- Gen.choose(1, 6)
          ws <- Gen.listOfN(k, Gen.choose(50.0, 150.0))
        } yield ws.zipWithIndex.map { case (w, j) =>
          (f"u$i%03d", math.rint(w * 10) / 10, j.toLong)
        }
      })
  } yield Fixture(users, weighs.flatten)

  private def toTables(fx: Fixture) = {
    val users = fx.users.map { case (uid, g, age, clinic) =>
      (uid, "N", "L", g, 1L, new Timestamp(base), age, 170L,
        new Timestamp(base), true, clinic, Option.empty[Double], true)
    }.toDF(Schemas.users.fieldNames: _*)
    val weights = fx.weighs.map { case (uid, w, j) =>
      val ts = new Timestamp(base + j * 60000 + 86400000L)
      (uid, w, 25.0, 20.0, 55.0, 2.9, 9.7, 1500.0, 47.4, ts, ts, true, false)
    }.toDF(Schemas.weights.fieldNames: _*)
    val treatments = fx.users.map { case (uid, _, _, _) =>
      (uid, 1L, new Timestamp(base))
    }.toDF(Schemas.treatments.fieldNames: _*)
    (users, weights, treatments)
  }

  private val wideCfg = PipelineConfig(minAge = 0, maxAge = 200, clinicId = 5066)

  test("PSW constant per UID; TSW constant per treatment; WIR >= 1") {
    forAllSeeded(8) { fx =>
      val (u, w, t) = toTables(fx)
      val out = Pipeline.run(u, w, t, wideCfg).cache()
      val pswCard = out.filter($"Weight".isNotNull)
        .groupBy($"UID").agg(countDistinct($"PSW").as("n"))
        .filter($"n" =!= 1).count()
      assert(pswCard == 0)
      val tswCard = out.filter($"Weight".isNotNull)
        .groupBy($"UID", $"TreatmentTypeID", $"Tmt_StartDate")
        .agg(countDistinct($"TSW").as("n")).filter($"n" =!= 1).count()
      assert(tswCard == 0)
      assert(out.filter($"Wts_UpdatedDate".isNotNull && $"WIR" < 1).count() == 0)
      out.unpersist()
    }
  }

  test("filters only remove rows; dedup idempotent") {
    forAllSeeded(8) { fx =>
      val (u, w, t) = toTables(fx)
      val all = Pipeline.run(u, w, t, wideCfg)
      val male = Pipeline.run(u, w, t, wideCfg.copy(gender = "Male"))
      assert(male.count() <= all.count())
      assert(all.dropDuplicates().count() == all.count())
    }
  }

  test("pipeline deterministic under input permutation") {
    forAllSeeded(6) { fx =>
      val (u, w, t) = toTables(fx)
      val shuffledWeights = w.orderBy(rand(seed = 7))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(canon(Pipeline.run(u, w, t, wideCfg)) ==
        canon(Pipeline.run(u, shuffledWeights, t, wideCfg)))
    }
  }
}
