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

  /** CSV with RFC-4180 quoting (quote chars escaped by doubling, not
    * the Univocity backslash default) and NO write-side whitespace
    * trimming — the writer must be byte-faithful so the matching
    * reader can reproduce the exact text. The FULL reader recipe is
    * `header` + `multiLine` + `escape="` + **`nullValue` remapped to
    * a sentinel that cannot occur in the data** (both working readers
    * use `.option("nullValue", "\\u0000")`): the reader's DEFAULT
    * nullValue is the empty string, which silently folds a written
    * `""` cell back to NULL — without the remap the documented
    * byte-fidelity contract is unsatisfiable for empty strings (r19
    * review; SinkQ's roundtrip md5 leg breaks exactly there).
    * CsvFidelitySpec roundtrips hostile content (quotes, newlines,
    * backslashes, edge whitespace, unicode, empty-vs-null) through
    * this pair; q110 gates the corpus roundtrip.
    */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", header.toString)
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def json(df: DataFrame, path: String,
           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC — Spark's second built-in columnar format (predicate pushdown
    * + column pruning on read, same as parquet). Binary-faithful for
    * strings by construction; the q151 gate proves the full
    * write→reread fidelity the way q109/q110 do for JSONL/CSV.
    */
  def orc(df: DataFrame, path: String,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
