package graft.clinical

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Source-table schemas for the clinical weight data model.
  *
  * Reconstructed from the reference's `.info()` dumps
  * (pandas_DataModel.ipynb:cell 2-4 outputs; see FIXTURES.md). Explicit
  * `StructType`s: fail-fast typed ingestion instead of the reference's
  * CSV inference + imperative `to_datetime` re-typing
  * (pandas_DataModel.py:51-53,77-81).
  */
object Schemas {

  val users: StructType = StructType(Seq(
    StructField("UID", StringType),
    StructField("Name", StringType),
    StructField("LastName", StringType),
    StructField("Gender", StringType),
    StructField("Unit", LongType),
    StructField("Birthday", TimestampType),
    StructField("Age", LongType),
    StructField("Height", LongType),
    StructField("CreatedDate", TimestampType),
    StructField("IsActive", BooleanType),
    StructField("ClinicID", LongType),
    StructField("loginId", DoubleType),
    StructField("success", BooleanType)))

  val weights: StructType = StructType(Seq(
    StructField("MasterUserID", StringType),
    StructField("Weight", DoubleType),
    StructField("BMI", DoubleType),
    StructField("BodyFat", DoubleType),
    StructField("BodyWater", DoubleType),
    StructField("Bone", DoubleType),
    StructField("VisceralFat", DoubleType),
    StructField("BMR", DoubleType),
    StructField("MuscleMass", DoubleType),
    StructField("CreatedDate", TimestampType),
    StructField("UpdatedDate", TimestampType),
    StructField("IsActive", BooleanType),
    StructField("IsDelete", BooleanType)))

  val treatments: StructType = StructType(Seq(
    StructField("MasterUserID", StringType),
    StructField("TreatmentTypeID", LongType),
    StructField("StartDate", TimestampType)))
}

/** Typed rows for the three source tables — type-safe ingestion surface
  * (`Dataset[User]` etc.); the post-join wide table stays a DataFrame
  * because the `cohort` grouping column is chosen at runtime.
  */
case class User(
    UID: String, Name: String, LastName: String, Gender: String,
    Unit: Long, Birthday: Timestamp, Age: Long, Height: Long,
    CreatedDate: Timestamp, IsActive: Boolean, ClinicID: Long,
    loginId: Option[Double], success: Boolean)

case class WeightRecord(
    MasterUserID: String, Weight: Double, BMI: Double, BodyFat: Double,
    BodyWater: Double, Bone: Double, VisceralFat: Double, BMR: Double,
    MuscleMass: Double, CreatedDate: Timestamp, UpdatedDate: Timestamp,
    IsActive: Boolean, IsDelete: Boolean)

case class Treatment(
    MasterUserID: String, TreatmentTypeID: Long, StartDate: Timestamp)
