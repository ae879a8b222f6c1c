package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table — the validation
  * layer a pipeline runs before promoting a batch (deequ-style, thin):
  * each check reduces to counts inside ONE pass over the table (plus
  * one anti-join per referential check), and the report is a tiny
  * (check_name, violations, passed) table safe to gate, alert on, or store
  * as a run ledger.
  *
  * Scale shape: all row-level predicates share a single scan — they
  * compute as conditional-sum aggregates, never separate jobs; a
  * uniqueness check is a two-level aggregate on the key (count −
  * distinct); referential integrity is an anti-join that ships ONLY
  * the key columns. Nothing here collects to the driver.
  */
object QualityChecks {

  sealed trait Check { def name: String }
  /** Rows where `violated` is true fail the check. */
  final case class RowPredicate(name: String, violated: Column) extends Check
  /** More than one row per `key` value fails. */
  final case class Unique(name: String, key: Column) extends Check
  /** Values of `key` absent from `refKey` of `ref` fail (nulls pass —
    * pair with a RowPredicate completeness check to forbid them).
    */
  final case class RefIntegrity(name: String, key: Column,
                                ref: DataFrame, refKey: Column) extends Check
  /** The INBOUND mirror of [[RefIntegrity]] (r16): values of `refKey`
    * in the external `referencing` table absent from `key` of the
    * CHECKED table fail (nulls pass). Declared on the REFERENCED
    * (parent) side, it holds the checked table responsible for
    * covering a referencing table's keys — the constraint a
    * parent-side DELETE can break, and the reason
    * [[graft.sources.Snapshots.deleteChecked]] exists. Post-image-
    * scoped BY NATURE: it must be evaluated against the table's full
    * surviving rows, never a lone batch (the checked-write paths do
    * this; [[report]] checks whatever `df` it is handed). Cost: one
    * anti-join shipping key columns only.
    */
  final case class InboundRef(name: String, referencing: DataFrame,
                              refKey: Column, key: Column) extends Check

  /** The report: one row per check — (check_name, n_violations, passed),
    * ordered by check name for deterministic output.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val rowPreds = checks.collect { case c: RowPredicate => c }
    // ALL row predicates share one scan: one conditional sum each in a
    // single aggregate, then unpivoted to (check, n_violations) rows
    val rowLeg: Seq[DataFrame] =
      if (rowPreds.isEmpty) Nil
      else {
        // coalesce: a zero-row table must report 0 violations (a bare
        // sum over no rows is NULL, which would poison `passed`)
        val sums = rowPreds.zipWithIndex.map { case (c, i) =>
          coalesce(sum(when(c.violated, 1L).otherwise(0L)), lit(0L)).as(s"_c$i")
        }
        val agg = df.agg(sums.head, sums.tail: _*)
        val structs = rowPreds.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"), col(s"_c$i").as("n_violations"))
        }
        Seq(agg.select(explode(array(structs: _*)).as("r"))
          .select(col("r.check_name"), col("r.n_violations")))
      }
    val uniqueLegs = checks.collect { case c: Unique =>
      // NULL keys never violate uniqueness (r18 review): SQL UNIQUE
      // does not compare nulls, and the sibling RefIntegrity /
      // InboundRef checks document the same nulls-pass policy —
      // forbidding nulls is a completeness RowPredicate's job. The
      // old groupBy counted two null keys as duplicates of each other.
      df.select(c.key.as("_k")).filter(col("_k").isNotNull)
        .groupBy(col("_k")).agg(count(lit(1)).as("_cnt"))
        .agg(coalesce(sum(col("_cnt") - 1L), lit(0L)).as("n_violations"))
        .select(lit(c.name).as("check_name"), col("n_violations"))
    }
    val refLegs = checks.collect { case c: RefIntegrity =>
      df.select(c.key.as("_k")).filter(col("_k").isNotNull)
        .join(c.ref.select(c.refKey.as("_k")), Seq("_k"), "anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(c.name).as("check_name"), col("n_violations"))
    }
    val inboundLegs = checks.collect { case c: InboundRef =>
      c.referencing.select(c.refKey.as("_k")).filter(col("_k").isNotNull)
        .join(df.select(c.key.as("_k")), Seq("_k"), "anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(c.name).as("check_name"), col("n_violations"))
    }
    (rowLeg ++ uniqueLegs ++ refLegs ++ inboundLegs)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }
}
