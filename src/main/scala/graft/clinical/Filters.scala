package graft.clinical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** Presentation filters (pandas_DataModel.py:6-31).
  *
  * Deliberately applied AFTER the window metrics: PSW/TSW/TBWL are
  * defined over the user's full unfiltered history (SURVEY.md §4). The
  * three predicates are per-user-constant, so pushing them below the
  * UID-partitioned windows is semantics-preserving — done by
  * [[graft.plans.UserConstantPredicatePushdown]] as an optimizer rule
  * in strict mode, and by [[Pipeline]] handing [[predicate]] to the
  * bug-compatible path as an early main-branch filter (the optimizer
  * rule cannot see through that path's boundary join, so the pipeline
  * exploits the same user-constant property structurally).
  */
object Filters {

  /** The three demographic predicates as one user-constant conjunction. */
  def predicate(cfg: PipelineConfig): Column = {
    val gender =
      if (cfg.gender == "all") lit(true) else col("Gender") === cfg.gender
    gender && col("Age").between(cfg.minAge, cfg.maxAge) &&
      col("ClinicID") === cfg.clinicId
  }

  def apply(df: DataFrame, cfg: PipelineConfig): DataFrame =
    df.filter(predicate(cfg))
}
