package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestSession

/** The r19 norm-precompute split ([[VectorFunctions.cosine_from_parts6]]
  * = dot_product + two SumSquares) must be BIT-IDENTICAL to the fused
  * [[VectorFunctions.cosine_similarity6]] — the O(pairs) similarity
  * joins now ship the parts spelling, and the oracle gate hashes the
  * result to the last bit. Pinned here over doubles (all call sites
  * cast), zero norms, empty arrays, NaN/Inf values, null arrays and
  * null ELEMENTS, on both the codegen and interpreted paths.
  */
class CosinePartsSpec extends AnyFunSuite with SparkTestSession {

  private def withSQLConf[T](kv: (String, String))(f: => T): T = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
  private def bothModes[T](f: => T): (T, T) = (
    withSQLConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY")(f),
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(f))

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("a", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("b", ArrayType(DoubleType, containsNull = true), nullable = true)))

  private def frame(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("parts cosine6 is bit-identical to fused cosine6 (values, zero norms, NaN/Inf)") {
    val rnd = new scala.util.Random(7)
    def vec(n: Int) = Array.fill(n)(rnd.nextDouble() * 2 - 1).map(Double.box)
    val rows: Seq[Row] =
      (1L to 200L).map(i => Row(i, vec(16), vec(16))) ++ Seq(
        Row(300L, Array.fill(8)(Double.box(0.0)), vec(8)),          // zero left norm
        Row(301L, vec(8), Array.fill(8)(Double.box(0.0))),          // zero right norm
        Row(302L, Array.empty[java.lang.Double], Array.empty[java.lang.Double]), // n = 0
        Row(303L, Array(Double.box(Double.NaN), Double.box(1.0)),
          Array(Double.box(0.5), Double.box(0.5))),                 // NaN value
        Row(304L, Array(Double.box(Double.PositiveInfinity), Double.box(1.0)),
          Array(Double.box(0.5), Double.box(0.5))))                 // Inf value
    val df = frame(rows)
    val (cg, interp) = bothModes {
      df.select(col("id"),
          VectorFunctions.cosine_similarity6(col("a"), col("b")).as("fused"),
          VectorFunctions.cosine_from_parts6(
            VectorFunctions.dot_product(col("a"), col("b")),
            VectorFunctions.norm_sq(col("a")),
            VectorFunctions.norm_sq(col("b"))).as("parts"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None
          else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1))),
          if (r.isNullAt(2)) None
          else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(2)))))
        .toSeq
    }
    for (modeRows <- Seq(cg, interp); (id, fused, parts) <- modeRows)
      assert(fused == parts, s"id=$id fused=$fused parts=$parts")
    assert(cg == interp)
  }

  test("null semantics match the fused expression, including null-norm-vs-zero-norm") {
    val rows: Seq[Row] = Seq(
      Row(1L, null, Array(Double.box(1.0))),                        // null left array
      Row(2L, Array(Double.box(1.0)), null),                        // null right array
      Row(3L, Array(Double.box(1.0), null), Array(Double.box(1.0), Double.box(2.0))), // null elem left
      Row(4L, Array(Double.box(1.0), Double.box(2.0)), Array(null, Double.box(1.0))), // null elem right
      // the when-guard case: a null-element LEFT against a ZERO right —
      // fused returns null (null elem wins); a naive zero-norm-first
      // parts spelling would return 0.0
      Row(5L, Array(Double.box(1.0), null), Array(Double.box(0.0), Double.box(0.0))))
    val df = frame(rows)
    val out = df.select(col("id"),
        VectorFunctions.cosine_similarity6(col("a"), col("b")).as("fused"),
        VectorFunctions.cosine_from_parts6(
          VectorFunctions.dot_product(col("a"), col("b")),
          VectorFunctions.norm_sq(col("a")),
          VectorFunctions.norm_sq(col("b"))).as("parts"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1), s"id=${r.getLong(0)}: fused should be null")
      assert(r.isNullAt(2), s"id=${r.getLong(0)}: parts should be null")
    }
  }

  test("dot_product throws on length mismatch like the fused expression") {
    val df = frame(Seq(Row(1L, Array(Double.box(1.0)),
      Array(Double.box(1.0), Double.box(2.0)))))
    val eFused = intercept[Exception] {
      df.select(VectorFunctions.cosine_similarity6(col("a"), col("b"))).collect()
    }
    val eParts = intercept[Exception] {
      df.select(VectorFunctions.cosine_from_parts6(
        VectorFunctions.dot_product(col("a"), col("b")),
        VectorFunctions.norm_sq(col("a")),
        VectorFunctions.norm_sq(col("b")))).collect()
    }
    assert(eFused.getMessage.contains("length mismatch") ||
      eFused.getCause != null)
    assert(eParts.getMessage.contains("length mismatch") ||
      eParts.getCause != null)
  }
}
