package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Bucketed tables: the co-located-join primitive for repeated
  * fact-to-fact joins at scale — both sides pre-hashed into the same
  * bucket layout, so the join runs with NO shuffle exchange.
  */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("bucketed saveAsTable join plans without a shuffle on the bucketed sides") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse directories persist — clear them or CTAS refuses
    Seq("orders_b", "lineitem_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() ==
      Tables.orders(spark, dir).join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey")).count())
  }
}
