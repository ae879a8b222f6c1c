package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.VectorFunctions.nearest_centroids

class NearestCentroidsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val centroids: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(2.0, 2.0))

  test("returns top-p centroid indices by cosine, descending") {
    val df = Seq(Tuple1(Array(0.9, 0.1))).toDF("v")
    val got = df.select(nearest_centroids($"v".cast("array<double>"), centroids, 3))
      .as[Seq[Int]].head()
    // cos vs: c0=0.994, c3=0.781, c1=0.110, c2=-0.994
    assert(got == Seq(0, 3, 1))
  }

  test("scale-invariance: centroid magnitude does not change ranking") {
    val scaled = centroids.map(_.map(_ * 37.0))
    val df = Seq(Tuple1(Array(0.3, -0.7)), Tuple1(Array(5.0, 5.0))).toDF("v")
    val a = df.select(nearest_centroids($"v".cast("array<double>"), centroids, 4)).as[Seq[Int]].collect().toSeq
    val b = df.select(nearest_centroids($"v".cast("array<double>"), scaled, 4)).as[Seq[Int]].collect().toSeq
    assert(a == b)
  }

  test("ties keep the lower centroid index") {
    val dup = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(Tuple1(Array(1.0, 0.0))).toDF("v")
    val got = df.select(nearest_centroids($"v".cast("array<double>"), dup, 2))
      .as[Seq[Int]].head()
    assert(got == Seq(0, 1))
  }

  test("nProbe larger than centroid count returns all centroids") {
    val df = Seq(Tuple1(Array(1.0, 1.0))).toDF("v")
    val got = df.select(nearest_centroids($"v".cast("array<double>"), centroids.take(2), 10))
      .as[Seq[Int]].head()
    assert(got.toSet == Set(0, 1) && got.size == 2)
  }

  test("interpreted eval matches codegen over many rows") {
    val rows = (0 until 200).map(i =>
      Tuple1(Array.tabulate(2)(d => math.sin(i * 7 + d * 3))))
    val df = rows.toDF("v").select(nearest_centroids($"v".cast("array<double>"), centroids, 2).as("nc"))
    val viaCodegen = df.as[Seq[Int]].collect().toSeq
    // force the interpreted path through a non-codegen context: eval on literals
    val expr = NearestCentroids(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(null).cast("array<double>")),
      centroids, 2)
    val interp = rows.map { case Tuple1(v) =>
      expr.nullSafeEval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    }
    assert(viaCodegen == interp)
  }
}
