package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Differential test against the REFERENCE implementation itself: the
  * CSVs under fixtures/clinical/golden are produced by executing
  * /root/reference/pandas_DataModel.py on fixtures/clinical/ (see
  * tools/gen_clinical_fixture.py). Our pipeline must reproduce them
  * cell-for-cell, including the §2.9 diff(-1) boundary quirk.
  */
class PipelineGoldenSpec extends AnyFunSuite with SparkTestSession {

  private val fixtureDir = "fixtures/clinical"
  private val keep = Seq("UID", "Gender", "Age", "ClinicID", "Weight",
    "Wts_CreatedDate", "month", "week", "WIR", "PSW", "TSW",
    "treatment_TBWL", "patient_TBWL")
  private val doubleCols = Set("Weight", "PSW", "TSW", "treatment_TBWL", "patient_TBWL")

  /** Canonical string matrix: columns in `keep` order, doubles rounded to
    * 6dp and rendered via Spark's double→string cast on BOTH sides (the
    * golden side re-parses the CSV as double first), nulls as "", rows
    * sorted — so the comparison is representation-independent.
    */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val normalized = keep.foldLeft(df) { (d, c) =>
      if (doubleCols(c)) d.withColumn(c, round(col(c).cast("double"), 6).cast("string"))
      else d.withColumn(c, col(c).cast("string"))
    }
    normalized.select(keep.map(col): _*).collect()
      .map(r => keep.indices.map(i => if (r.isNullAt(i)) "" else r.getString(i)))
      .toSeq.sortBy(_.mkString(""))
  }

  private def golden(name: String): Seq[Seq[String]] =
    canon(spark.read.option("header", "true").csv(s"$fixtureDir/golden/$name.csv"))

  private def run(cfg: PipelineConfig): Seq[Seq[String]] =
    canon(Pipeline.runFromCsv(spark, fixtureDir, cfg))

  private val configs = Seq(
    "default_week" -> PipelineConfig(),
    "male_u18_week" -> PipelineConfig(gender = "Male", minAge = 18, maxAge = 18),
    "female_month" -> PipelineConfig(cohort = "month", gender = "Female", minAge = 10, maxAge = 80),
    "clinic_cohort" -> PipelineConfig(cohort = "ClinicID", minAge = 10, maxAge = 80, clinicId = 5067))

  configs.foreach { case (name, cfg) =>
    test(s"golden parity: $name") {
      val got = run(cfg)
      val exp = golden(name)
      assert(got.size == exp.size, s"row count ${got.size} vs golden ${exp.size}")
      got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"row $i differs:\n  got    $g\n  golden $e")
      }
    }
  }

  test("dedup removes the fixture's duplicated full row; idempotent") {
    val cfg = PipelineConfig(minAge = 10, maxAge = 80)
    val withDedup = Pipeline.runFromCsv(spark, fixtureDir, cfg)
    val noDedup = Pipeline.runFromCsv(spark, fixtureDir, cfg.copy(dedup = false))
    // the duplicated weights row joins BOTH treatments of its (1:many)
    // user → two duplicate wide rows
    assert(noDedup.count() == withDedup.count() + 2)
    assert(withDedup.dropDuplicates().count() == withDedup.count())
  }

  test("orphan user (no weights/treatments) survives the left joins with null metrics") {
    import spark.implicits._
    // the reference CRASHES on this input (math.floor(NaN), py:99);
    // our engine degrades to null month/week and null-skipping metrics.
    val users = Sources.usersCsv(spark, fixtureDir)
      .limit(0).unionByName(Seq(
        ("orphan", "O", "O", "Male", 1L, "2020-01-01 00:00:00", 30L, 170L,
         "2023-01-01 00:00:00", true, 5066L, null.asInstanceOf[java.lang.Double], true))
        .toDF(Schemas.users.fieldNames: _*)
        .withColumn("Birthday", col("Birthday").cast("timestamp"))
        .withColumn("CreatedDate", col("CreatedDate").cast("timestamp")))
    val weights = Sources.weightsCsv(spark, fixtureDir).limit(0)
    val treatments = Sources.treatmentsCsv(spark, fixtureDir).limit(0)
    val out = Pipeline.run(users, weights, treatments, PipelineConfig(minAge = 10, maxAge = 80))
    assert(out.count() == 1)
    val row = out.select("UID", "month", "week", "WIR", "PSW").collect()(0)
    assert(row.getString(0) == "orphan")
    assert(row.isNullAt(1) && row.isNullAt(2))
    assert(row.getLong(3) == 0L)   // count of zero non-null dates
    assert(row.isNullAt(4))
  }
}
