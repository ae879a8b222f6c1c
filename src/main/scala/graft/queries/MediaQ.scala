package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal plumbing queries: binary media columns synthesized from
  * the documents table (see [[graft.multimodal.Multimodal]]). Byte
  * accounting and decoded dimensions are SQL-checkable (container
  * arithmetic, all three REAL codecs); decoded feature VALUES are
  * engine-defined → rows-only check.
  */
object MediaQ {

  /** Byte accounting per modality (oracle-checked: modality mapping and
    * UTF-8 byte lengths are engine-independent).
    */
  def mediaBytes(spark: SparkSession, dir: String): DataFrame =
    Multimodal.syntheticMedia(Tables.documents(spark, dir))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("bytes"))).as("total_bytes"),
        min(length(col("bytes"))).as("min_bytes"),
        max(length(col("bytes"))).as("max_bytes"))

  /** Full decode → features → per-modality stats. All three modalities
    * are REAL containers (BMP/WAV/AVI) parsed by the pure-JVM codec —
    * and with the round-3 AVI codec, every OUTPUT column (counts,
    * bytes, dims, frames) is container arithmetic DuckDB can derive
    * from the source text lengths, so the query is fully hash-gated;
    * only the 16-dim feature vectors (not emitted here) stay
    * engine-defined.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.featureStats(Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(Tables.documents(spark, dir))))

  /** Resize-spec plan (pure metadata math, but modality synthesis +
    * struct access is the point; oracle-checked).
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeSpec(
        Multimodal.syntheticMedia(Tables.documents(spark, dir)), maxDim = 320)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"), min(col("target_w")).as("min_tw"),
        max(col("target_h")).as("max_th"))

  /** Hash-gated leg of the REAL codec path: decoded dimensions of ALL
    * THREE modalities must equal what DuckDB derives independently from
    * container arithmetic over the source text lengths — image width is
    * the fixed encode width, height = payload rows; audio width is the
    * sample rate, n_frames = payload bytes; video dims are the fixed
    * frame box, n_frames = payload frames. Goes through the actual
    * mapPartitions decode (header/chunk/frame parse), not metadata.
    */
  def mediaRealDims(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
        Multimodal.syntheticMedia(Tables.documents(spark, dir)))
      .toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"),
        min(col("height")).as("min_h"), max(col("height")).as("max_h"),
        max(col("n_frames")).as("max_frames"),
        sum(col("byte_len")).as("total_bytes"))

  /** Frame-sample plan over the REAL decode path: every 3rd frame
    * index of each video row, where n_frames comes from the actual AVI
    * chunk walk (not metadata). Row-level gate: DuckDB re-derives
    * frames from container arithmetic over the source text and the
    * stride-3 sample count as (frames+2)//3.
    */
  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSamplePlan(
        Multimodal.decodeFeatures(
          Multimodal.syntheticMedia(Tables.documents(spark, dir))),
        stride = 3)
      .select(col("media_id"), col("n_frames"), col("n_sampled"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_frame_sample" -> (mediaFrameSample _),
    "q55_media_bytes" -> (mediaBytes _),
    "q56_media_features" -> (mediaFeatures _),
    "q57_media_resize" -> (mediaResize _),
    "q69_media_real_dims" -> (mediaRealDims _))

  // ---- the ONE spelling of the synthetic-container arithmetic ----
  // (the OracleSql.tokens rule applied to the media gates): modality
  // assignment and the per-modality container length / dims / frame
  // formulas appear in every media oracle — one builder, four
  // consumers, so a codec change (BMP row padding 192, WAV 44-byte
  // header, AVI 224+392n frame layout) cannot drift between gates.
  // strlen = BYTES, correct here: the containers encode text.getBytes.
  private val modalityCase =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'" +
      " ELSE 'video' END"
  private val framesVideo = "greatest(1, (strlen(text) + 383) // 384)"
  private val containerLenCase =
    s"""CASE doc_id % 3
        |      WHEN 0 THEN 54 + 192 * greatest(1, (strlen(text) + 191) // 192)
        |      WHEN 1 THEN 44 + strlen(text)
        |      ELSE 224 + 392 * $framesVideo
        |    END""".stripMargin
  private val mediaCte =
    s"""WITH m AS (
        |  SELECT $modalityCase AS modality,
        |    CASE doc_id % 3 WHEN 0 THEN 64 WHEN 1 THEN 16000 ELSE 16 END AS w,
        |    CASE doc_id % 3 WHEN 0 THEN greatest(1, (strlen(text) + 191) // 192)
        |         WHEN 1 THEN 1 ELSE 8 END AS h,
        |    CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN strlen(text)
        |         ELSE $framesVideo END AS frames,
        |    $containerLenCase AS len
        |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q104_frame_sample" ->
      s"""SELECT doc_id AS media_id,
        |  CAST($framesVideo AS INT) AS n_frames,
        |  CAST(($framesVideo + 2) // 3 AS INT)
        |    AS n_sampled
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    "q55_media_bytes" ->
      s"""$mediaCte
        |SELECT modality, count(*) AS n,
        |  CAST(sum(len) AS BIGINT) AS total_bytes,
        |  CAST(min(len) AS INT) AS min_bytes,
        |  CAST(max(len) AS INT) AS max_bytes
        |FROM m GROUP BY 1""".stripMargin,
    "q56_media_features" ->
      s"""$mediaCte
        |SELECT modality, count(*) AS n, CAST(sum(len) AS BIGINT) AS total_bytes,
        |  round(avg(w), 4) AS avg_w, round(avg(h), 4) AS avg_h,
        |  CAST(max(frames) AS INT) AS max_frames
        |FROM m GROUP BY modality""".stripMargin,
    "q57_media_resize" ->
      s"""SELECT $modalityCase AS modality,
        |  count(*) AS n, 320 AS min_tw, 240 AS max_th
        |FROM documents GROUP BY 1""".stripMargin,
    "q69_media_real_dims" ->
      s"""$mediaCte
        |SELECT modality, count(*) AS n,
        |  CAST(min(w) AS INT) AS min_w, CAST(max(w) AS INT) AS max_w,
        |  CAST(min(h) AS INT) AS min_h, CAST(max(h) AS INT) AS max_h,
        |  CAST(max(frames) AS INT) AS max_frames,
        |  CAST(sum(len) AS BIGINT) AS total_bytes
        |FROM m GROUP BY modality""".stripMargin)
}
