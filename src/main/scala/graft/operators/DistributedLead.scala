package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed successor lookup over a one-row-per-key table: for each
  * row, the VALUE carried by the next-higher key — `lead(value) OVER
  * (ORDER BY key)` without the single-partition window that global
  * ORDER BY implies, and without the eager driver jobs of the
  * rank-and-self-join idiom (RDD `zipWithIndex` launches its count job
  * at CONSTRUCTION time; a range exchange's sampling pass re-runs the
  * upstream plan).
  *
  * Shape (all lazy, single planning pass, zero `Exchange
  * SinglePartition`):
  *
  *  1. range-repartition by key — consecutive keys land in the same or
  *     adjacent partitions, partition index ascends with key;
  *  2. stamp the partition index (`spark_partition_id`), then one
  *     ordered window PER PARTITION INDEX gives every row its
  *     within-partition lead, row number, and partition size;
  *  3. the only rows still missing their lead are each partition's LAST
  *     row (≤ numPartitions of them — bounded by CONFIG, not data).
  *     Their successor is the FIRST row of the next non-empty
  *     partition: a broadcast join between the two ≤numPartitions-row
  *     side tables (heads × lasts, `head.p > last.p`, keep the min) —
  *     a deliberate, bounded non-equi join;
  *  4. broadcast the per-partition fix row back and patch the last
  *     rows.
  *
  * At 100 TB the per-key table is one row per entity (e.g. per user);
  * every exchange here is hash/range-partitioned over it, the only
  * driver-held structure is the range sampler, and the non-equi join's
  * both sides are ≤ `spark.sql.shuffle.partitions` rows by
  * construction.
  *
  * Contract: `df` must have at most one row per `key` (it is an
  * aggregate output); `key` ordering is ascending, nulls last.
  */
object DistributedLead {

  /** Returns `df` plus column `out` = value of the successor key's
    * `value` column (null for the globally-last key).
    */
  def withSuccessorValue(df: DataFrame, key: Column, value: Column,
                         out: String): DataFrame = {
    val r = df
      .repartitionByRange(key.asc_nulls_last)
      .withColumn("_dl_p", spark_partition_id())
    val byP = Window.partitionBy(col("_dl_p"))
    val wAsc = byP.orderBy(key.asc_nulls_last)
    val led = r
      .withColumn("_dl_lead", lead(value, 1).over(wAsc))
      .withColumn("_dl_rn", row_number().over(wAsc))
      .withColumn("_dl_n", count(lit(1)).over(byP))
    // ≤ numPartitions rows each: the first and last row of every
    // non-empty partition
    val heads = led.where(col("_dl_rn") === 1)
      .select(col("_dl_p").as("_dl_hp"), value.as("_dl_hv"))
    val lasts = led.where(col("_dl_rn") === col("_dl_n"))
      .select(col("_dl_p"))
    // successor head per partition: min partition index above ours that
    // has rows (range partitions can be empty when rows < partitions)
    val fix = lasts
      .join(broadcast(heads), col("_dl_hp") > col("_dl_p"), "left")
      .groupBy(col("_dl_p"))
      .agg(min(struct(col("_dl_hp").as("p"), col("_dl_hv").as("v")))
        .getField("v").as("_dl_fixv"))
    led
      .join(broadcast(fix), Seq("_dl_p"), "left")
      .withColumn(out,
        when(col("_dl_rn") === col("_dl_n"), col("_dl_fixv"))
          .otherwise(col("_dl_lead")))
      .drop("_dl_p", "_dl_lead", "_dl_rn", "_dl_n", "_dl_fixv")
  }
}
