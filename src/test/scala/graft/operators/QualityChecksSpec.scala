package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Planted-violation checks: the q115 gate runs on clean data for most
  * checks, so this spec proves every check KIND actually counts.
  */
class QualityChecksSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  import QualityChecks._

  private lazy val dirty = Seq(
    (Some(1L), "A", 10.0),
    (Some(2L), "B", -5.0),   // range violation
    (Some(2L), "A", 3.0),    // duplicate key
    (None, "Z", 1.0),        // null key + bad enum
    (Some(9L), "A", 2.0)     // dangling ref (ref table has 1,2)
  ).toDF("k", "status", "v")

  private lazy val ref = Seq(1L, 2L).toDF("rk")

  test("each check kind counts its planted violations") {
    val rep = report(dirty, Seq(
      RowPredicate("null_key", $"k".isNull),
      RowPredicate("enum", !$"status".isin("A", "B")),
      RowPredicate("range", !($"v" > 0.0)),
      Unique("unique_k", $"k"),
      RefIntegrity("ref_k", $"k", ref, $"rk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("null_key") == ((1L, false)))
    assert(rep("enum") == ((1L, false)))
    assert(rep("range") == ((1L, false)))
    // duplicate key 2 appears twice -> one extra row; null keys group
    // together (one group of 1) and don't count
    assert(rep("unique_k") == ((1L, false)))
    // non-null keys {1,2,2,9}: only 9 dangles
    assert(rep("ref_k") == ((1L, false)))
  }

  test("clean data passes everything; empty table passes row checks") {
    val clean = Seq((Some(1L), "A", 1.0)).toDF("k", "status", "v")
    val rep = report(clean, Seq(
      RowPredicate("range", !($"v" > 0.0)),
      Unique("unique_k", $"k"),
      RefIntegrity("ref_k", $"k", ref, $"rk")))
      .collect()
    assert(rep.forall(_.getBoolean(2)))
    val empty = dirty.filter(lit(false))
    val rep2 = report(empty, Seq(
      RowPredicate("range", !($"v" > 0.0)),
      Unique("unique_k", $"k")))
      .collect()
    assert(rep2.forall(r => r.getLong(1) == 0L && r.getBoolean(2)))
  }

  test("Unique does not count NULL keys as duplicates (SQL UNIQUE semantics, r18)") {
    import org.apache.spark.sql.functions._
    val df = Seq(Some(1L), None, None, Some(2L)).toDF("k")
    val rep = report(df, Seq(Unique("u", $"k"))).collect()
    assert(rep.length == 1 && rep.head.getAs[Long]("n_violations") == 0L &&
      rep.head.getAs[Boolean]("passed"),
      s"two NULL keys must pass UNIQUE: ${rep.toSeq}")
  }
}
