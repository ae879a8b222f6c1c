package graft.clinical

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Presentation filters (pandas_DataModel.py:6-31).
  *
  * Deliberately applied AFTER the window metrics: PSW/TSW/TBWL are
  * defined over the user's full unfiltered history (SURVEY.md §4). The
  * three predicates are per-user-constant, so pushing them below the
  * UID-partitioned windows is semantics-preserving — done by
  * [[graft.plans.UserConstantPredicatePushdown]] as an optimizer rule,
  * not by reordering here.
  */
object Filters {

  def apply(df: DataFrame, cfg: PipelineConfig): DataFrame = {
    val afterGender =
      if (cfg.gender == "all") df
      else df.filter(col("Gender") === cfg.gender)
    afterGender
      .filter(col("Age").between(cfg.minAge, cfg.maxAge))
      .filter(col("ClinicID") === cfg.clinicId)
  }
}
