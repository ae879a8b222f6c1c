package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's parquet scan
  * (vectorized reader, predicate pushdown, column pruning) applies. At
  * cluster scale the same call reads a partitioned directory tree; nothing
  * here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * TimestampType (µs) cannot represent; Spark 4 refuses the file
    * outright under schema inference. A user-specified schema typing the
    * column as plain LongType reads the raw INT64 nanos without touching
    * the session-global `nanosAsLong` legacy conf (a read-time conf
    * mutation was round-1 advice). Exposes both the exact `ts_ns` and a
    * µs-truncated `ts` TimestampType column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    s.read.schema(schema).parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // integer `div` — a double division would lose precision above 2^53
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  /** Heavy per-row compute (token/gram hashing, quality scoring,
    * winnowing, codecs, vector math) runs on the SCAN's map side, so
    * its parallelism equals the split count. The gate fixtures are
    * single-row-group files — one split, one task, 31 idle cores —
    * whereas a production read of a partitioned tree gets thousands of
    * splits and needs nothing. Spread a split-starved read across the
    * configured shuffle parallelism; a read with enough splits passes
    * through untouched, so no full-corpus exchange is ever added at
    * real scale. (The explicit partition count also keeps AQE from
    * coalescing the tiny shuffle straight back to one task.)
    */
  private def spread(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    // hash-partition on the table's unique id: unlike round-robin
    // repartition(n), no full-row determinism sort rides the exchange
    else df.repartition(target, df.col(key))
  }

  /** documents/embeddings host the per-row-compute-heavy operators
    * (text curation, dedup sketches, vector search) — their loaders
    * spread split-starved reads; the relational tables' map sides are
    * cheap scans/filters where an unconditional exchange would only
    * add cost.
    */
  def documents(s: SparkSession, d: String): DataFrame  = spread(s, load(s, d, "documents"), "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, load(s, d, "embeddings"), "vec_id")
}
