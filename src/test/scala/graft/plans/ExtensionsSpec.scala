package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.SparkTestSession
import graft.clinical.{Pipeline, PipelineConfig}

/** The documented registration path — `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` — must inject the pushdown
  * rule into a session's optimizer.
  */
class ExtensionsSpec extends AnyFunSuite with SparkTestSession {

  test("GraftExtensions injects the pushdown rule into a new session") {
    spark // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(extended ne spark)
      val cfg = PipelineConfig(gender = "Male", minAge = 10, maxAge = 80,
        strictCohorts = true)
      val plan = Pipeline.runFromCsv(extended, "fixtures/clinical", cfg)
        .queryExecution.optimizedPlan
      // with the rule active, a Window node must have a Filter on Gender below it
      var pushedBelowWindow = false
      plan.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.child.foreach {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter
                if f.condition.references.exists(_.name == "Gender") =>
              pushedBelowWindow = true
            case _ =>
          }
        case _ =>
      }
      assert(pushedBelowWindow, s"no Gender filter below any Window:\n$plan")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
