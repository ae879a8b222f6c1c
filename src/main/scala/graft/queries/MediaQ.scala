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
          // filter BEFORE the typed decode (r18 review): the modality
          // filter inside frameSamplePlan sits past mapPartitions,
          // where Catalyst cannot push it — two-thirds of the corpus
          // paid full BMP/WAV decode only to be dropped
          Multimodal.syntheticMedia(Tables.documents(spark, dir))
            .filter(col("modality") === "video")),
        stride = 3)
      .select(col("media_id"), col("n_frames"), col("n_sampled"))

  /** The perceptual-signature INDEX of the still-media corpus — image
    * dHash and audio energy fingerprint computed in ONE decode pass and
    * written once per (session, dir) (r13): perceptual hashes are
    * ingest-time state a production pipeline stores beside the corpus,
    * not something every dedup query re-decodes containers for. All of
    * q201-q204 and q209 read this table; the codec runs once per
    * session, not once per consumer.
    */
  private def mediaSigs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ArtifactStore.parquet(spark, dir, "media_sigs") {
      import graft.multimodal.PerceptualHashFunctions.{bmp_dhash, wav_fingerprint}
      Multimodal.syntheticMedia(Tables.documents(spark, dir))
        .select(col("media_id"), col("modality"),
          when(col("modality") === "image", bmp_dhash(col("bytes")))
            .when(col("modality") === "audio", wav_fingerprint(col("bytes")))
            .as("sig"))
        .filter(col("sig").isNotNull)
    }

  private def sigsOf(spark: SparkSession, dir: String, modality: String): DataFrame =
    mediaSigs(spark, dir).filter(col("modality") === modality)
      .select(col("media_id"), col("sig"))

  /** q201 — perceptual image hash over DECODED pixels: the 64-bit
    * integer-arithmetic dHash ([[graft.multimodal.MediaHash.dhashBmp]])
    * of every image row's real BMP container, emitted as 16-hex-char
    * strings. The oracle replays the ENTIRE hash — header geometry,
    * bottom-up row order, 9×8 block luma sums, cross-multiplied
    * gradient comparisons — from the source text bytes (byte access
    * via `hex(encode(text))` pairs), so the pixel decode and the hash
    * arithmetic are both under the gate.
    */
  def imageDHash(spark: SparkSession, dir: String): DataFrame =
    sigsOf(spark, dir, "image")
      .select(col("media_id"), format_string("%016x", col("sig")).as("dh"))

  /** Near-dup PAIR artifacts (r14): each modality's pair list has two
    * battery consumers — its own gate (q202/q204/q208) and the q209
    * cleaned corpus — so the two-consumer ArtifactStore rule applies:
    * the capped bucket join + verify runs ONCE per (session, dir) and
    * q209 reads three small parquet tables instead of re-running all
    * three candidate pipelines (the r13 bench priced that re-run at
    * 3.9 s battery — ~25 small stages, job-count bound).
    */
  private def stillPairsArtifact(spark: SparkSession, dir: String,
                                 modality: String): DataFrame =
    graft.sources.ArtifactStore.parquet(spark, dir, s"${modality}_near_dup_pairs") {
      graft.operators.MediaDedup.nearDupPairs(sigsOf(spark, dir, modality))
    }

  private def videoPairsArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ArtifactStore.parquet(spark, dir, "video_near_dup_pairs") {
      graft.operators.MediaDedup.frameJaccardPairs(
        videoFrames(spark, dir), minJaccard = 0.5)
    }

  /** q202 — near-duplicate IMAGES: Hamming ≤ 3 dHash pairs via the
    * 4×16-bit pigeonhole bucket join ([[graft.operators.MediaDedup]]).
    * The oracle brute-forces `bit_count(xor)` over its independently
    * replayed hashes — exhaustive reference vs banded candidate
    * generation, the q82 completeness pattern.
    */
  def imageNearDups(spark: SparkSession, dir: String): DataFrame =
    stillPairsArtifact(spark, dir, "image")

  /** q203 — audio fingerprints: 65-block integer energy gradient over
    * the real WAV sample data ([[graft.multimodal.MediaHash.fingerprintWav]]);
    * same full replay discipline as q201.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame =
    sigsOf(spark, dir, "audio")
      .select(col("media_id"), format_string("%016x", col("sig")).as("fp"))

  /** q204 — near-duplicate AUDIO, the q202 shape over WAV fingerprints.
    *
    * 0 rows at sf0.01 is the CORRECT answer, not a vacuous gate (the
    * r18-verdict audit measured min pairwise Hamming 14 across the 167
    * gate-corpus fingerprints — the synthetic WAVs are genuinely all
    * distinct, and 14/64 bits is noise, not near-duplication): the
    * audio KERNEL is gated non-trivially by q203 (167 hash-matched
    * fingerprints) and the shared pigeonhole pair join by q202's 30
    * image pairs, so every code path this query runs is exercised
    * with data elsewhere in the battery.
    */
  def audioNearDups(spark: SparkSession, dir: String): DataFrame =
    stillPairsArtifact(spark, dir, "audio")

  /** Per-frame video signatures, the video half of the [[mediaSigs]]
    * index (one row per decoded AVI frame, frame order preserved) —
    * shared by q206/q207/q208/q209.
    */
  private def videoFrames(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ArtifactStore.parquet(spark, dir, "video_frame_sigs") {
      import graft.multimodal.PerceptualHashFunctions.avi_frame_dhash
      Multimodal.syntheticMedia(Tables.documents(spark, dir))
        .filter(col("modality") === "video")
        .select(col("media_id"),
          posexplode(avi_frame_dhash(col("bytes"))).as(Seq("frame_idx", "sig")))
    }

  /** q206 — per-FRAME video dHash: the image kernel applied to every
    * decoded AVI DIB frame ([[graft.multimodal.MediaHash.dhashAviFrames]]),
    * in frame order. Same full-replay gate discipline as q201: the
    * oracle re-derives the movi chunk layout (frame f's pixels at
    * payload bytes f·384 + bottom-up 48-byte rows) and the whole grid
    * arithmetic from the source text bytes.
    */
  def videoFrameHash(spark: SparkSession, dir: String): DataFrame =
    videoFrames(spark, dir)
      .select(col("media_id"), col("frame_idx"),
        format_string("%016x", col("sig")).as("dh"))

  /** q207 — frame-level duplicate groups ACROSS videos (the q68
    * fingerprint-group convention): which frame hashes appear in ≥ 2
    * distinct videos, with their video/frame fan-out — the
    * shared-scene signal a near-dup video detector buckets on.
    */
  def frameDupGroups(spark: SparkSession, dir: String): DataFrame =
    // two partial-agg layers instead of countDistinct+count in one
    // aggregate — the mixed form runs Spark's Expand-based distinct
    // rewrite (2× the stream; the q63 lesson), the layered form
    // map-side-combines both hops
    videoFrames(spark, dir)
      .groupBy(col("sig"), col("media_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_videos"), sum(col("c")).as("n_frames"))
      .filter(col("n_videos") >= 2)
      .select(format_string("%016x", col("sig")).as("dh"),
        col("n_videos"), col("n_frames"))

  /** q208 — near-duplicate VIDEOS: frame-set Jaccard ≥ 0.5 over the
    * q206 per-frame hashes ([[graft.operators.MediaDedup.frameJaccardPairs]]),
    * completing the modality set (images q202, audio q204). The 0.5
    * floor sits cleanly above the corpus' single-shared-frame noise
    * band (two 2-frame videos sharing one frame score 1/3). Oracle:
    * the same set arithmetic over its independently replayed hashes.
    */
  def videoNearDups(spark: SparkSession, dir: String): DataFrame =
    videoPairsArtifact(spark, dir)

  /** q209 — the CLEANED media corpus, closing the perceptual family the
    * way q72 closed text: the three modalities' near-dup pair lists
    * (q202 images, q204 audio, q208 videos — id spaces disjoint by the
    * doc_id%3 modality split, so one component pass serves all three)
    * feed [[graft.operators.Dedup.connectedComponents]], each cluster
    * keeps its minimum media_id, and the report states what SURVIVES
    * per modality — docs, bytes, min id. The production deliverable of
    * perceptual dedup is this corpus, not the pair list: pairs are
    * intermediate evidence, the anti-join is what ships. Oracle: DuckDB
    * replays all three pair lists from container bytes, recomputes
    * component minima by recursive reachability (the q72 pattern) and
    * aggregates the survivors independently.
    */
  def mediaCleanedCorpus(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val pairs = stillPairsArtifact(spark, dir, "image")
      .unionByName(stillPairsArtifact(spark, dir, "audio"))
      .select(col("id_a"), col("id_b"))
      .unionByName(videoPairsArtifact(spark, dir)
        .select(col("id_a"), col("id_b")))
    Dedup.keepCanonical(
        Multimodal.syntheticMedia(Tables.documents(spark, dir))
          .select(col("media_id"), col("modality"),
            length(col("bytes")).as("len")),
        pairs, idCol = "media_id")
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("len").cast("long")).as("total_bytes"),
        min(col("media_id")).as("min_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_frame_sample" -> (mediaFrameSample _),
    "q55_media_bytes" -> (mediaBytes _),
    "q56_media_features" -> (mediaFeatures _),
    "q57_media_resize" -> (mediaResize _),
    "q69_media_real_dims" -> (mediaRealDims _),
    "q201_image_dhash" -> (imageDHash _),
    "q202_image_near_dups" -> (imageNearDups _),
    "q203_audio_fingerprint" -> (audioFingerprint _),
    "q204_audio_near_dups" -> (audioNearDups _),
    "q206_video_frame_hash" -> (videoFrameHash _),
    "q207_frame_dup_groups" -> (frameDupGroups _),
    "q208_video_near_dups" -> (videoNearDups _),
    "q209_media_cleaned_corpus" -> (mediaCleanedCorpus _))

  // ---- gate-corpus cap preflight (r14, ADVICE) ----
  // The capped gates (q202/q204/q208/q209) run with the bucket-df cap
  // ON while their DuckDB oracles model the cap-free ideal; the
  // convention is sound only while gate corpora sit below the cap. A
  // future sf corpus crossing the threshold would hash-diverge with no
  // pointer to the cause — so Verify evaluates these guards BEFORE the
  // gated query and fails it loudly, naming the cap. Each guard
  // returns (cap description, over-cap bucket count) pairs; all sig
  // inputs come from the session ArtifactStore tables the queries
  // themselves read, so the preflight costs one rollup, not a decode.
  // guard results memoized per (session, dir): q209's guard reuses
  // q202/q204/q208's counts instead of re-running three rollups
  private val guardMemo =
    new graft.sources.SessionMemo[(SparkSession, String, String), Long](_._1)
  private def memoGuard(key: String, s: SparkSession, d: String)
                       (eval: => Long): (String, Long) =
    (s"$key buckets (Dedup.DefaultMaxBucketDf=" +
      s"${graft.operators.Dedup.DefaultMaxBucketDf})",
      guardMemo.get((s, d, key))(eval))
  private def imageDrops(s: SparkSession, d: String) =
    memoGuard("image dHash pigeonhole", s, d)(
      graft.operators.MediaDedup.droppedBuckets(sigsOf(s, d, "image")).count())
  private def audioDrops(s: SparkSession, d: String) =
    memoGuard("audio fingerprint pigeonhole", s, d)(
      graft.operators.MediaDedup.droppedBuckets(sigsOf(s, d, "audio")).count())
  private def frameDrops(s: SparkSession, d: String) =
    memoGuard("video frame-sig", s, d)(
      graft.operators.MediaDedup.droppedFrameSigs(videoFrames(s, d)).count())

  private[graft] val capGuards: Map[String,
      (SparkSession, String) => Seq[(String, Long)]] = Map(
    "q202_image_near_dups" -> ((s, d) => Seq(imageDrops(s, d))),
    "q204_audio_near_dups" -> ((s, d) => Seq(audioDrops(s, d))),
    "q208_video_near_dups" -> ((s, d) => Seq(frameDrops(s, d))),
    "q209_media_cleaned_corpus" -> ((s, d) =>
      Seq(imageDrops(s, d), audioDrops(s, d), frameDrops(s, d))))

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

  // ---- perceptual-hash replay (q201-q204): byte p of the payload is
  // hex pair p of encode(text) — '0x'||pair casts to its value; beyond
  // strlen the containers zero-pad. The dHash/fingerprint arithmetic
  // is ALL integer (milli-luma 299R+587G+114B, cross-multiplied block
  // means), so the replay is exact, not approximate. The 64-bit value
  // assembles from two 32-bit halves (a BIGINT shift at bit 63 would
  // wrap the sign) printf'd to the same %016x the engine emits.
  private val imageHashCte =
    """WITH img AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len,
      |    greatest(1, (strlen(text) + 191) // 192) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |blocks AS (
      |  SELECT doc_id, hx, len, h,
      |    CAST(r.r AS INT) AS r, CAST(c.c AS INT) AS c,
      |    CAST((r.r * h) // 8 AS INT) AS y0,
      |    greatest(CAST(((r.r + 1) * h) // 8 AS INT),
      |             CAST((r.r * h) // 8 AS INT) + 1) AS y1,
      |    CAST((c.c * 64) // 9 AS INT) AS x0,
      |    CAST(((c.c + 1) * 64) // 9 AS INT) AS x1
      |  FROM img, (SELECT unnest(range(8)) AS r) r,
      |       (SELECT unnest(range(9)) AS c) c),
      |px AS (
      |  SELECT doc_id, r, c, x1 - x0 AS wblk,
      |    (h - 1 - CAST(y.y AS INT)) * 192 + 3 * CAST(x.x AS INT) AS o,
      |    hx, len
      |  FROM blocks, unnest(range(y0, y1)) y(y), unnest(range(x0, x1)) x(x)),
      |lum AS (
      |  SELECT doc_id, r, c, wblk,
      |    sum(299 * (CASE WHEN o + 2 < len
      |          THEN ('0x' || substring(hx, 2*(o+2)+1, 2))::BIGINT ELSE 0 END)
      |      + 587 * (CASE WHEN o + 1 < len
      |          THEN ('0x' || substring(hx, 2*(o+1)+1, 2))::BIGINT ELSE 0 END)
      |      + 114 * (CASE WHEN o < len
      |          THEN ('0x' || substring(hx, 2*o+1, 2))::BIGINT ELSE 0 END)) AS s
      |  FROM px GROUP BY ALL),
      |bits AS (
      |  SELECT a.doc_id, a.r, a.c,
      |    CASE WHEN b.s * a.wblk > a.s * b.wblk
      |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM lum a JOIN lum b ON a.doc_id = b.doc_id AND a.r = b.r
      |    AND b.c = a.c + 1
      |  WHERE a.c < 8),
      |halves AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN r < 4 THEN bit << (31 - (r*8 + c)) ELSE 0 END)
      |      AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN r >= 4 THEN bit << (63 - (r*8 + c)) ELSE 0 END)
      |      AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id),
      |hashes AS (SELECT doc_id, printf('%08x%08x', hi, lo) AS dh FROM halves)""".stripMargin
  private val audioHashCte =
    """WITH aud AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
      |  FROM documents WHERE doc_id % 3 = 1 AND strlen(text) > 0),
      |blocks AS (
      |  SELECT doc_id, hx, CAST(b.b AS INT) AS blk,
      |    CAST((b.b * n) // 65 AS INT) AS s0,
      |    least(greatest(CAST(((b.b + 1) * n) // 65 AS INT),
      |                   CAST((b.b * n) // 65 AS INT) + 1), n) AS s1
      |  FROM aud, (SELECT unnest(range(65)) AS b) b),
      |en AS (
      |  SELECT doc_id, blk, s1 - s0 AS cnt,
      |    sum((('0x' || substring(hx, 2*CAST(i.i AS INT)+1, 2))::BIGINT - 128)
      |      * (('0x' || substring(hx, 2*CAST(i.i AS INT)+1, 2))::BIGINT - 128)) AS e
      |  FROM blocks, unnest(range(s0, s1)) i(i)
      |  GROUP BY ALL),
      |bits AS (
      |  SELECT a.doc_id, a.blk,
      |    CASE WHEN b.e * a.cnt > a.e * b.cnt
      |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
      |  WHERE a.blk < 64),
      |halves AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN blk < 32 THEN bit << (31 - blk) ELSE 0 END)
      |      AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN blk >= 32 THEN bit << (63 - blk) ELSE 0 END)
      |      AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id),
      |hashes AS (SELECT doc_id, printf('%08x%08x', hi, lo) AS dh FROM halves)""".stripMargin
  // frame f of the synthetic AVI carries payload bytes [f·384, (f+1)·384)
  // as a 16×8 bottom-up DIB (48-byte rows); same byte-replay + 9×8 grid
  // as the BMP, per frame
  private val videoHashCte =
    """WITH vid AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len,
      |    greatest(1, (strlen(text) + 383) // 384) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |blocks AS (
      |  SELECT doc_id, hx, len, CAST(f.f AS INT) AS f,
      |    CAST(r.r AS INT) AS r, CAST(c.c AS INT) AS c,
      |    CAST((c.c * 16) // 9 AS INT) AS x0,
      |    CAST(((c.c + 1) * 16) // 9 AS INT) AS x1
      |  FROM vid, unnest(range(nf)) f(f),
      |       (SELECT unnest(range(8)) AS r) r,
      |       (SELECT unnest(range(9)) AS c) c),
      |px AS (
      |  SELECT doc_id, f, r, c, x1 - x0 AS wblk,
      |    f * 384 + (7 - r) * 48 + 3 * CAST(x.x AS INT) AS o, hx, len
      |  FROM blocks, unnest(range(x0, x1)) x(x)),
      |lum AS (
      |  SELECT doc_id, f, r, c, wblk,
      |    sum(299 * (CASE WHEN o + 2 < len
      |          THEN ('0x' || substring(hx, 2*(o+2)+1, 2))::BIGINT ELSE 0 END)
      |      + 587 * (CASE WHEN o + 1 < len
      |          THEN ('0x' || substring(hx, 2*(o+1)+1, 2))::BIGINT ELSE 0 END)
      |      + 114 * (CASE WHEN o < len
      |          THEN ('0x' || substring(hx, 2*o+1, 2))::BIGINT ELSE 0 END)) AS s
      |  FROM px GROUP BY ALL),
      |bits AS (
      |  SELECT a.doc_id, a.f, a.r, a.c,
      |    CASE WHEN b.s * a.wblk > a.s * b.wblk
      |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM lum a JOIN lum b ON a.doc_id = b.doc_id AND a.f = b.f
      |    AND a.r = b.r AND b.c = a.c + 1
      |  WHERE a.c < 8),
      |halves AS (
      |  SELECT doc_id, f,
      |    CAST(sum(CASE WHEN r < 4 THEN bit << (31 - (r*8 + c)) ELSE 0 END)
      |      AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN r >= 4 THEN bit << (63 - (r*8 + c)) ELSE 0 END)
      |      AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id, f),
      |hashes AS (
      |  SELECT doc_id, f, printf('%08x%08x', hi, lo) AS dh FROM halves)""".stripMargin

  private def hashPairsSelect =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(('0x' || a.dh)::UBIGINT, ('0x' || b.dh)::UBIGINT))
      |    AS INT) AS hamming
      |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(('0x' || a.dh)::UBIGINT, ('0x' || b.dh)::UBIGINT)) <= 3""".stripMargin

  // the three pair-list replays, hoisted so q202/q204/q208 and q209's
  // component pass quote the SAME text — one spelling, four gates
  private val imagePairsSql = s"$imageHashCte\n$hashPairsSelect"
  private val audioPairsSql = s"$audioHashCte\n$hashPairsSelect"
  private val videoPairsSql =
    s"""$videoHashCte,
      |d AS (SELECT DISTINCT doc_id, dh FROM hashes),
      |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM d a JOIN d b ON a.dh = b.dh AND a.doc_id < b.doc_id
      |  GROUP BY id_a, id_b)
      |SELECT id_a, id_b,
      |  (i * 1000000) // (sa.n + sb.n - i) AS jaccard_micro
      |FROM inter JOIN sz sa ON id_a = sa.doc_id
      |  JOIN sz sb ON id_b = sb.doc_id
      |WHERE i * 2 >= (sa.n + sb.n - i)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q201_image_dhash" ->
      s"""$imageHashCte
        |SELECT doc_id AS media_id, dh FROM hashes""".stripMargin,
    "q202_image_near_dups" -> imagePairsSql,
    "q203_audio_fingerprint" ->
      s"""$audioHashCte
        |SELECT doc_id AS media_id, dh AS fp FROM hashes""".stripMargin,
    "q204_audio_near_dups" -> audioPairsSql,
    "q206_video_frame_hash" ->
      s"""$videoHashCte
        |SELECT doc_id AS media_id, f AS frame_idx, dh FROM hashes""".stripMargin,
    "q207_frame_dup_groups" ->
      s"""$videoHashCte
        |SELECT dh, count(DISTINCT doc_id) AS n_videos,
        |  count(*) AS n_frames
        |FROM hashes GROUP BY dh
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "q208_video_near_dups" -> videoPairsSql,
    "q209_media_cleaned_corpus" ->
      s"""WITH RECURSIVE pairs AS (
        |  SELECT id_a, id_b FROM (
        |$imagePairsSql
        |  ) ip
        |  UNION ALL SELECT id_a, id_b FROM (
        |$audioPairsSql
        |  ) ap
        |  UNION ALL SELECT id_a, id_b FROM (
        |$videoPairsSql
        |  ) vp),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT rc.u, e.v FROM reach rc JOIN edges e ON rc.v = e.u),
        |comp AS (SELECT u AS node, least(u, min(v)) AS component
        |         FROM reach GROUP BY u),
        |m AS (SELECT doc_id, $modalityCase AS modality,
        |        $containerLenCase AS len
        |      FROM documents)
        |SELECT modality, count(*) AS n_media,
        |  CAST(sum(len) AS BIGINT) AS total_bytes,
        |  min(doc_id) AS min_id
        |FROM m
        |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
        |GROUP BY modality""".stripMargin,
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
