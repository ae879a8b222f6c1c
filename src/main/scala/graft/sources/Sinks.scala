package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** File sinks. The reference never writes (pandas_DataModel.py prints
  * and returns); a usable engine needs durable, scalable outputs:
  *
  *  - parquet is the default (columnar, splittable, statistics,
  *    predicate pushdown on re-read);
  *  - `partitionBy` lays out a hive-style directory tree so downstream
  *    reads prune whole directories (see SinksSpec: re-reads show
  *    PartitionFilters, not data filters);
  *  - CSV/JSON for interchange.
  *
  * At cluster scale add `.option("maxRecordsPerFile", …)` and size
  * `repartition(n, partitionCols)` so each output file lands near the
  * HDFS/S3 block size; both knobs pass straight through this API.
  */
object Sinks {

  def parquet(df: DataFrame, path: String,
              partitionBy: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String,
           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
