package graft.clinical

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-metric definitions — the heart of the data model.
  *
  * The reference establishes one global 6-key sort
  * (pandas_DataModel.py:85-90) and then computes every metric with
  * order-sensitive `groupby(...).transform(...)` calls. In Spark the
  * ordering moves INTO each window spec (`partitionBy(...).orderBy(...)`)
  * so the work distributes per-partition instead of requiring a global
  * sort to survive the whole plan.
  *
  * Two Spark-specific correctness traps handled here (SURVEY.md §7.4):
  *  - ordered windows default to frame `unboundedPreceding → currentRow`;
  *    `last` (and `first`-with-nulls) need the explicit FULL frame;
  *  - pandas `transform('first'/'last'/'max'/'count')` skip nulls, so
  *    every aggregate here uses ignoreNulls / null-skipping forms.
  */
object Metrics {

  /** The reference's global sort order (pandas_DataModel.py:85-90).
    * pandas `sort_values` places NaT/NaN last — hence asc_nulls_last.
    */
  val sortKeys: Seq[Column] = Seq(
    col("UID").asc_nulls_last,
    col("UIDCreatedDate").asc_nulls_last,
    col("TreatmentTypeID").asc_nulls_last,
    col("Tmt_StartDate").asc_nulls_last,
    col("Wts_CreatedDate").asc_nulls_last,
    col("Wts_UpdatedDate").asc_nulls_last)

  private val treatmentKeys = Seq(col("UID"), col("TreatmentTypeID"), col("Tmt_StartDate"))
  private def cohortKeys(cohort: String) = treatmentKeys :+ col(cohort)

  private def fullFrame(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  /** Whole-partition, unordered — for count/max broadcasts. */
  private def byCohort(cohort: String): WindowSpec =
    Window.partitionBy(cohortKeys(cohort): _*)

  private val byUserOrdered: WindowSpec =
    fullFrame(Window.partitionBy(col("UID")).orderBy(sortKeys: _*))
  private val byTreatmentOrdered: WindowSpec =
    fullFrame(Window.partitionBy(treatmentKeys: _*).orderBy(sortKeys: _*))
  private def byCohortOrdered(cohort: String): WindowSpec =
    fullFrame(Window.partitionBy(cohortKeys(cohort): _*).orderBy(sortKeys: _*))

  /** Days between two timestamps with pandas semantics:
    * `(a - b).dt.days` floors the true timedelta toward -inf
    * (pandas_DataModel.py:97), which differs from Spark's `datediff`
    * (day-boundary count) whenever the times-of-day differ. Computed
    * over MICROSECONDS — `unix_timestamp` truncates each side to whole
    * seconds first, which breaks the floor-of-timedelta parity on
    * sub-second times (0.5 s short of a full day truncated UP to a
    * day). INTEGER floor (r18 review): the earlier double division was
    * only exact while the micro delta stayed within double's 2^53 —
    * beyond ~2^17-day spans a delta one microsecond short of a whole
    * day rounded UP to the next day, off-by-one vs pandas .dt.days.
    * Subtracting the non-negative pmod makes the numerator an exact
    * multiple of a day (true floor for negative deltas too, matching
    * timedelta.days' floor-toward−∞); the final double quotient of
    * that multiple has relative error ~1e-16 over a quotient ≤ ~1e8,
    * so round() recovers the exact integer (the IntervalJoin/Tables
    * div discipline, spelled with Column ops). No underflow risk: the
    * delta of two representable timestamps is ≤ ~2e17 µs.
    */
  def dayDiff(a: Column, b: Column): Column = {
    val us = unix_micros(a) - unix_micros(b)
    val day = 86400000000L
    round((us - pmod(us, lit(day))).cast("double") / lit(day.toDouble))
      .cast("long")
  }

  /** Months since treatment start: floor(days / 30.417) — pandas whole-day
    * truncation semantics (SURVEY.md §2.8 decision 1;
    * pandas_DataModel.py:97-99). Int per the polars cast
    * (polars_DataModel.py:102-103).
    */
  def monthCol: Column =
    floor(dayDiff(col("Wts_CreatedDate"), col("Tmt_StartDate")) / lit(30.417)).cast("int")

  /** Weeks since treatment start: floor(days / 7) (pandas_DataModel.py:102-103). */
  def weekCol: Column =
    floor(dayDiff(col("Wts_CreatedDate"), col("Tmt_StartDate")) / lit(7.0)).cast("int")

  /** Weigh-in rate: count of non-null Wts_UpdatedDate per cohort,
    * broadcast to every row (pandas_DataModel.py:112-114). `count(col)`
    * is null-skipping, matching pandas `transform('count')`.
    */
  def wir(cohort: String): Column =
    count(col("Wts_UpdatedDate")).over(byCohort(cohort))

  /** Patient starting weight: first Weight per user in global sort order
    * (pandas_DataModel.py:117). ignoreNulls matches pandas first().
    */
  def psw: Column = first(col("Weight"), ignoreNulls = true).over(byUserOrdered)

  /** Treatment starting weight (pandas_DataModel.py:120-121). */
  def tsw: Column = first(col("Weight"), ignoreNulls = true).over(byTreatmentOrdered)

  /** Treatment ending weight (pandas_DataModel.py:129-131). The FULL
    * frame is load-bearing: with Spark's default ordered frame, `last`
    * degenerates to "current row".
    */
  def tew: Column = last(col("Weight"), ignoreNulls = true).over(byTreatmentOrdered)

  /** First Weight of the row's cohort, broadcast to each row — the
    * `transform('first')` half of the patient-TBWL computation
    * (pandas_DataModel.py:139-142).
    */
  def cohortFirstWeight(cohort: String): Column =
    first(col("Weight"), ignoreNulls = true).over(byCohortOrdered(cohort))

  /** A column wrapped so struct-MIN ordering matches `asc_nulls_last`:
    * the leading isNull flag makes every null sort after every value.
    */
  private def nullsLast(c: Column): Column = struct(c.isNull.as("n"), c.as("v"))

  /** Each user's within-user global-sort key as one orderable struct
    * (the [[sortKeys]] after UID, each null-last). Lets MIN-aggregates
    * stand in for "first row in sort order" without a window sort.
    */
  private val userOrd: Column = struct(
    nullsLast(col("UIDCreatedDate")).as("k1"),
    nullsLast(col("TreatmentTypeID")).as("k2"),
    nullsLast(col("Tmt_StartDate")).as("k3"),
    nullsLast(col("Wts_CreatedDate")).as("k4"),
    nullsLast(col("Wts_UpdatedDate")).as("k5"))

  /** One row per user: (`_b_uid`, `_ufw`) where `_ufw` is the fw
    * ([[cohortFirstWeight]]) of the user's globally-FIRST row — i.e. the
    * first non-null Weight of the user's first cohort. Formulated as two
    * partial-aggregating GROUP BYs (per-cohort argmin, then per-user
    * argmin over cohort groups) instead of a window: no sort, map-side
    * combine on both levels, and Catalyst prunes the input to the six
    * key/weight columns. Validated value-identical to the window
    * formulation on all three sfs.
    */
  def boundaryTable(src: org.apache.spark.sql.DataFrame,
                    cohort: String): org.apache.spark.sql.DataFrame = {
    src
      .groupBy(cohortKeys(cohort): _*)
      .agg(
        // the cohort-group's first-row key...
        min(userOrd).as("_k"),
        // ...and its first non-null Weight in sort order (null when the
        // whole cohort has no weights — matching first(ignoreNulls))
        min(when(col("Weight").isNotNull,
          struct(userOrd.as("o"), col("Weight").as("w")))).as("_fwp"))
      .groupBy(col("UID"))
      // the user's first row lives in the cohort-group with minimal _k;
      // ties are impossible (_k embeds every within-user sort key and
      // the cohort keys are functions of them).
      // Tie semantics WITHIN a cohort group (_fwp): rows with identical
      // sort keys but different Weights resolve to the SMALLEST weight
      // (struct-min), deterministically. The window/pandas forms are
      // no better there — Spark window order and pandas stable sort
      // both depend on physical row order, which a distributed engine
      // cannot reproduce; the fixtures are tie-free (validated
      // value-identical to the window form at all three sfs).
      .agg(min(struct(col("_k").as("k"), col("_fwp").getField("w").as("w")))
        .as("_m"))
      .select(col("UID").as("_b_uid"), col("_m").getField("w").as("_ufw"))
  }

  /** The reference's `.diff(-1)`: x[i] − x[i+1] over the WHOLE frame in
    * global sort order — it deliberately(?) crosses cohort, treatment and
    * even user boundaries (verified empirically; SURVEY.md §2.9).
    *
    * Strict mode partitions the lead by UID: the diff never crosses
    * users and the window distributes. Choose via
    * [[PipelineConfig.strictCohorts]].
    *
    * Bug-compatible mode reproduces the cross-user quirk WITHOUT the
    * unpartitioned window it used to cost (a single-partition cliff —
    * round-1's only clinical scale flaw): only each user's globally-LAST
    * row sees a cross-user lead, and because UID is the leading global
    * sort key, that lead is exactly the NEXT UID's first-row fw. So:
    * per-user lead (distributed window) + a one-row-per-user boundary
    * table ranked in UID order ([[graft.operators.SortedNeighborhood
    * .globalRank]] — range-partitioned, no single task) self-joined at
    * rank+1 to fetch each user's successor fw, joined back on UID.
    *
    * The boundary table is built from `boundarySource` — the UNFILTERED
    * frame — by [[boundaryTable]], a pure two-level aggregate (no window
    * sort at all). The cross-user dependence lives entirely in that
    * one-row-per-user table, so callers may pre-filter the main frame
    * with user-constant predicates (they commute with every per-user
    * window) and the full-width five-metric stack never runs over rows
    * the filter will discard. Round 2 built the boundary from the
    * post-metric frame instead, re-running the window stack — the
    * bench's only regression.
    */
  def withWgtDiff(df: org.apache.spark.sql.DataFrame, cohort: String,
                  strict: Boolean,
                  boundarySource: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val fw = cohortFirstWeight(cohort)
    val wUser = Window.partitionBy(col("UID")).orderBy(sortKeys: _*)
    if (strict) df.withColumn("wgt_diff", fw - lead(fw, 1).over(wUser))
    else {
      // One row per user: the first row's fw verbatim (NOT ignoreNulls —
      // global diff(-1) takes the next row's value null included; the
      // rn==1 row's own fw IS first(fw) over the user). Each user's
      // successor fw comes from [[graft.operators.DistributedLead]]'s
      // rank-idiom self-join — its two construction-time driver jobs
      // (range sampling + zipWithIndex count) run over THIS cheap
      // aggregate, not the window stack, and buy partition-consistent
      // ranks that no lazy per-partition-id formulation can guarantee
      // at scale (see the operator's scaladoc).
      val bnd = boundaryTable(boundarySource.getOrElse(df), cohort)
      val succ = graft.operators.DistributedLead
        .withSuccessorValue(bnd, col("_b_uid"), col("_ufw"), "_next_ufw")
        .select(col("_b_uid").as("UID"), col("_next_ufw"))
      df.withColumn("_fw", fw)
        .withColumn("_lead_u", lead(col("_fw"), 1).over(wUser))
        .withColumn("_rn", row_number().over(wUser))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("UID"))))
        .join(succ, Seq("UID"), "left")
        .withColumn("wgt_diff",
          when(col("_rn") === col("_n"), col("_fw") - col("_next_ufw"))
            .otherwise(col("_fw") - col("_lead_u")))
        .drop("_fw", "_lead_u", "_rn", "_n", "_next_ufw")
    }
  }

  /** Patient TBWL: max of wgt_diff per cohort (pandas_DataModel.py:146-149).
    * `max` skips nulls, matching pandas NaN-skip on the frame's last row.
    */
  def patientTbwl(cohort: String): Column =
    max(col("wgt_diff")).over(byCohort(cohort))
}
