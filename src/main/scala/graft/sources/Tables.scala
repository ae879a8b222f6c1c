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

  // keyed on (path, mtime, length) — NOT path alone (r17 review): a
  // path-only key returned a stale nanos/micros verdict after the file
  // was re-encoded in place within one JVM lifetime, silently
  // reintroducing the 1000x corruption the probe exists to prevent.
  // For a directory the dir's own mtime only moves on child add/remove/
  // rename, so the max direct-child (mtime, length) is folded in too
  // (r17 ADVICE): an in-place rewrite of an existing part file under
  // the same name now changes the key. One level is enough — every
  // writer in this repo (Spark parquet commit, the snapshot store)
  // lands data files as direct children of the probed path.
  private val probeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      java.lang.Boolean]()

  private def probeKey(s: SparkSession, path: String): (String, Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(hPath)
    if (!st.isDirectory) (path, st.getModificationTime, st.getLen)
    else {
      val kids = fs.listStatus(hPath)
      val maxM = (st.getModificationTime +: kids.map(_.getModificationTime)).max
      (path, maxM, kids.map(_.getLen).sum)
    }
  }

  /** The nanos→micros factor for the events file/directory at `path`,
    * memoized ONCE per (JVM, file state) — shared by the batch loader
    * and [[graft.streaming.Streaming.eventStream]] (r17 review: the
    * stream re-probed every footer on every definition while batch
    * callers paid once).
    */
  def eventsTsFactor(s: SparkSession, path: String): Long =
    if (probeMemo.computeIfAbsent(probeKey(s, path),
      _ => eventsTsIsMicros(s, path))) 1000L else 1L

  /** events schema as stored on disk under EITHER ts encoding (`ts` is
    * read as the raw physical INT64; the probe decides the unit) — ONE
    * spelling shared with the streaming source.
    */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** The (ts_raw → ts_ns, µs TimestampType ts) derivation — ONE
    * spelling shared by the batch and streaming loaders (r17 review:
    * the 4-line triplet existed verbatim in both and could drift).
    * Integer arithmetic only (a double product/division would lose
    * precision above 2^53 — epoch-ns is ~2^60); the µs truncation is a
    * true FLOOR (`div` truncates toward zero, which for a NEGATIVE
    * pre-1970 ts_ns with a sub-µs remainder landed 1 µs late —
    * subtracting pmod first floors for every sign).
    */
  def deriveEventTs(df: DataFrame, factor: Long): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    df.withColumnRenamed("ts", "ts_raw")
      .withColumn("ts_ns", expr(s"ts_raw * ${factor}L"))
      .withColumn("ts",
        timestamp_micros(expr("(ts_ns - pmod(ts_ns, 1000)) div 1000")))
      .drop("ts_raw")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet has shipped in TWO physical encodings across driver
    * rounds: INT64 TIMESTAMP(NANOS) (rounds 1–6; Spark's TimestampType
    * is µs-only, so schema inference refuses the file and a
    * user-specified LongType schema reads the raw nanos), and INT64
    * TIMESTAMP(MICROS) (round 7+; plain TimestampType under inference).
    * Assuming either encoding corrupts the other by 1000× — the r7
    * regeneration silently shifted every event to 1970 under the
    * nanos-era reader — so the loader PROBES the footer (one schema
    * inference; throws on the nanos file, types `ts` TimestampType on
    * the micros file) and adapts. Both paths expose the same surface:
    * exact integer `ts_ns` plus a µs TimestampType `ts`, derived with
    * integer arithmetic only (a double division would lose precision
    * above 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    // raw-long read works for BOTH encodings (it bypasses the logical
    // type and reads the physical INT64); the probe only decides the
    // unit. Timestamp semantics are then derived identically for both:
    // timestamp_micros = UTC-epoch micros, matching the oracle's naive
    // TIMESTAMP under the battery's pinned UTC session. The verdict is
    // memoized per file STATE so a battery's ~200 events() calls pay
    // the footer probe once per JVM, not once per gate entry.
    deriveEventTs(s.read.schema(eventsRawSchema).parquet(path),
      eventsTsFactor(s, path))
  }

  /** True iff the events file at `path` stores `ts` as TIMESTAMP(MICROS)
    * — footer-level probe. Inference THROWS on the legacy
    * TIMESTAMP(NANOS) encoding (which is itself the discriminator:
    * `AnalysisException` with error class `PARQUET_TYPE_ILLEGAL`,
    * Spark's TimestampType being µs-only) and yields TimestampType or
    * TimestampNTZType (tz-naive writers, e.g. pandas/pyarrow) on the
    * micros encoding. Shared with the streaming source, which needs
    * the verdict before picking its readStream schema.
    *
    * ONLY the nanos-inference failure selects the nanos verdict
    * (r8, advisor finding): a missing path, an empty directory, or
    * any other error throws — a catch-all here silently read later
    * micros files as nanos (1970-era timestamps), the exact
    * corruption the probe exists to prevent. When `path` is a
    * directory (the streaming source probes one), EVERY leaf parquet
    * footer is probed and the verdicts must agree — default schema
    * inference reads a single footer, so a merged probe could pin one
    * arbitrary file's encoding on a mixed directory; a mixed
    * directory now fails loudly instead. (Per-file footer probes are
    * a test-scale robustness device: a production deployment pins the
    * encoding in table metadata rather than re-deriving it from
    * footers per session.)
    */
  def eventsTsIsMicros(s: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath), s"events ts probe: path does not exist: $path")
    val files: Seq[String] =
      if (fs.getFileStatus(hPath).isDirectory) {
        val it = fs.listFiles(hPath, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
              !f.getName.startsWith("."))
            buf += f.toString
        }
        require(buf.nonEmpty, s"events ts probe: no parquet files under: $path")
        buf.toSeq
      } else Seq(path)
    val verdicts = files.map(f => probeOneFooter(s, f)).distinct
    require(verdicts.size == 1,
      s"events ts probe: mixed nanos/micros encodings under: $path — " +
        "re-encode to one unit before reading (a single verdict would " +
        "corrupt the other encoding by 1000x)")
    verdicts.head
  }

  /** Single-footer probe: TimestampType/TimestampNTZType → micros;
    * the TIMESTAMP(NANOS) inference failure (`PARQUET_TYPE_ILLEGAL`)
    * → nanos; anything else (corrupt footer, schema without `ts`)
    * propagates.
    */
  private def probeOneFooter(s: SparkSession, file: String): Boolean =
    try {
      val dt = s.read.parquet(file).schema("ts").dataType
      dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType
    } catch {
      // classify by ERROR CLASS first (r17 review: a reworded/localized
      // message would stop matching, breaking every nanos-era read);
      // the message substrings stay as a fallback for Spark versions
      // whose condition is null on this path
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.contains("PARQUET_TYPE_ILLEGAL")) ||
            e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
            e.getMessage.contains("TIMESTAMP(NANOS") =>
        false
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
  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[((String, Long, Long), Int),
      java.lang.Boolean]()

  private def spread(s: SparkSession, df: DataFrame, key: String,
                     path: String): DataFrame = {
    val target = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // keyed on (probeKey, target) — NOT path alone (r19 review, the
    // exact staleness class probeMemo was converted away from in r17):
    // a file regenerated in place within one JVM lifetime must re-take
    // the starvation verdict, or a now single-split file never spreads
    // (all per-row compute on one task) / a well-split one pays a
    // pointless full repartition
    val starved = spreadMemo.computeIfAbsent((probeKey(s, path), target),
      _ => df.rdd.getNumPartitions < math.max(2, target / 2))
    if (!starved) df
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
  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, load(s, d, "documents"), "doc_id", s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, load(s, d, "embeddings"), "vec_id", s"$d/embeddings.parquet")
}
