package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Window => LWindow, LogicalPlan}
import graft.SparkTestSession
import graft.clinical.{Pipeline, PipelineConfig}

/** The custom optimizer rule must (1) move user-constant predicates
  * below UID-partitioned windows, (2) STOP at the bug-compatible global
  * diff window (unpartitioned — removing users there changes neighbor
  * rows), and (3) never change results.
  */
class PushdownSpec extends AnyFunSuite with SparkTestSession {

  private val fixtureDir = "fixtures/clinical"

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(UserConstantPredicatePushdown)
    try f finally { spark.experimental.extraOptimizations = Nil }
  }

  /** Number of Window nodes strictly above the topmost Filter that
    * touches Gender (plan is a tree; the clinical plan is a chain).
    */
  private def windowsAboveGenderFilter(plan: LogicalPlan): Int = {
    var windows = 0
    var found = -1
    def walk(p: LogicalPlan, depthWindows: Int): Unit = p match {
      case w: LWindow => w.children.foreach(walk(_, depthWindows + 1))
      case f: LFilter if f.condition.references.exists(_.name == "Gender") =>
        if (found < 0) found = depthWindows
        f.children.foreach(walk(_, depthWindows))
      case other => other.children.foreach(walk(_, depthWindows))
    }
    walk(plan, 0)
    windows = found
    windows
  }

  test("strict mode: gender filter crosses every window down to the scan side") {
    val cfg = PipelineConfig(gender = "Male", minAge = 10, maxAge = 80, strictCohorts = true)
    val without = Pipeline.runFromCsv(spark, fixtureDir, cfg)
      .queryExecution.optimizedPlan
    val withPlan = withRule {
      Pipeline.runFromCsv(spark, fixtureDir, cfg).queryExecution.optimizedPlan
    }
    val before = windowsAboveGenderFilter(without)
    val after = windowsAboveGenderFilter(withPlan)
    assert(before == 0, s"baseline keeps the filter above all windows (saw $before above)")
    assert(after >= 3, s"rule must push below the window stack (only $after windows above)")
  }

  test("bug-compatible mode: pushdown stops at the unpartitioned diff window") {
    val cfg = PipelineConfig(gender = "Male", minAge = 10, maxAge = 80, strictCohorts = false)
    val withPlan = withRule {
      Pipeline.runFromCsv(spark, fixtureDir, cfg).queryExecution.optimizedPlan
    }
    // the global-lead Window and everything below it must stay above the
    // filter… i.e. the filter sits under SOME windows (those partitioned
    // by UID above the diff) but not under all of them
    val after = windowsAboveGenderFilter(withPlan)
    val total = { var n = 0; withPlan.foreach { case _: LWindow => n += 1; case _ => }; n }
    assert(after >= 1, "at least the patient_TBWL window is crossed")
    assert(after < total, s"must NOT cross the unpartitioned diff window ($after vs $total)")
  }

  for (strict <- Seq(true, false)) {
    test(s"results are identical with and without the rule (strict=$strict)") {
      val cfg = PipelineConfig(gender = "Female", minAge = 10, maxAge = 80,
        strictCohorts = strict)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val plain = canon(Pipeline.runFromCsv(spark, fixtureDir, cfg))
      val ruled = withRule { canon(Pipeline.runFromCsv(spark, fixtureDir, cfg)) }
      assert(plain == ruled)
    }
  }
}
