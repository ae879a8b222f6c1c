package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, "/root/testdata/sf0.001"))

  test("synthetic media table carries binary bytes + typed metadata struct") {
    val schema = media.schema
    assert(schema("bytes").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    assert(media.count() == 500)
    val mods = media.select("modality").distinct().as[String].collect().toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("decode stage is deterministic, partition-count preserving, typed") {
    val feats = Multimodal.decodeFeatures(media)
    val a = feats.filter($"media_id" === 7).collect()(0)   // 7 % 3 = 1 → audio/WAV
    val b = Multimodal.decodeFeatures(media).filter($"media_id" === 7).collect()(0)
    assert(a.content_hash == b.content_hash)
    assert(a.feature.toSeq == b.feature.toSeq)
    assert(a.feature.length == Multimodal.MediaCodec.featureDim)
    assert(a.width == MediaContainers.WavSampleRate && a.height == 1)
    // repartition upstream must not change results, only parallelism
    val c = Multimodal.decodeFeatures(media.repartition(7))
    assert(c.count() == 500)
    assert(c.filter($"media_id" === 7).collect()(0).content_hash == a.content_hash)
  }

  // ---- real-container fixtures ----

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  test("BMP decode: hand-built 2x2 24bpp fixture with known pixels") {
    // rows stored bottom-up, 8-byte row stride (2*3 padded to 4)
    // image: top row = red, green; bottom row = blue, white
    val bottomRow = Array[Byte](-1, 0, 0, /* blue  B,G,R */ -1, -1, -1 /* white */) ++ Array[Byte](0, 0)
    val topRow = Array[Byte](0, 0, -1, /* red */ 0, -1, 0 /* green */) ++ Array[Byte](0, 0)
    val bmp = "BM".getBytes ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      bottomRow ++ topRow
    val Some((w, h, feat)) = MediaContainers.decodeBmp(bmp)
    assert(w == 2 && h == 2)
    // each channel is on in exactly 2 of 4 pixels → mean 0.5
    assert(math.abs(feat(0) - 0.5f) < 1e-6 && math.abs(feat(1) - 0.5f) < 1e-6 &&
      math.abs(feat(2) - 0.5f) < 1e-6)
    // luma histogram fractions sum to 1
    assert(math.abs(feat.slice(4, 16).sum - 1.0f) < 1e-6)
  }

  test("WAV decode: chunk walk survives an extra chunk before fmt") {
    val samples = Array[Byte](-128, 0, 127, 0)   // u8: 128, 0, 255(? as unsigned), 0
    val junk = "LIST".getBytes ++ le32(4) ++ "info".getBytes
    val body = junk ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(4) ++ samples
    val wav = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
    val Some((rate, channels, n, feat)) = MediaContainers.decodeWav(wav)
    assert(rate == 8000 && channels == 1 && n == 4)
    // bytes (-128, 0, 127, 0) are u8 (128, 0, 127, 0) → centered
    // (0, -1, -1/128, -1); mean = -0.501953125
    assert(math.abs(feat(0) - (0.0 - 1.0 - 1.0 / 128 - 1.0) / 4) < 1e-6)
  }

  test("encode→decode roundtrip ties dims to payload size") {
    val payload = Array.tabulate(500)(i => (i % 251).toByte)
    val Some((w, h, _)) = MediaContainers.decodeBmp(MediaContainers.encodeBmp(payload))
    assert(w == MediaContainers.BmpWidth)
    assert(h == (500 + 191) / 192)   // = 3 rows
    val Some((rate, _, n, _)) = MediaContainers.decodeWav(MediaContainers.encodeWav(payload))
    assert(rate == MediaContainers.WavSampleRate && n == 500)
    val avi = MediaContainers.encodeAvi(payload)
    assert(avi.length == MediaContainers.AviHeaderBytes +
      2 * MediaContainers.AviChunkBytes)   // 500 bytes → 2 frames
    val Some((aw, ah, frames, _)) = MediaContainers.decodeAvi(avi)
    assert(aw == MediaContainers.AviFrameW && ah == MediaContainers.AviFrameH)
    assert(frames == 2)
  }

  test("AVI decode: frame pixels drive the features; known 1-frame fixture") {
    // a single all-white frame: payload of 0xFF filling exactly one frame
    val white = Array.fill(MediaContainers.AviFrameBytes)(-1: Byte)
    val Some((w, h, frames, feat)) = MediaContainers.decodeAvi(MediaContainers.encodeAvi(white))
    assert(w == 16 && h == 8 && frames == 1)
    // all channels at 255 → means 1.0; luma 255 → variance 0, top hist bin = 1
    assert(math.abs(feat(0) - 1.0f) < 1e-6 && math.abs(feat(1) - 1.0f) < 1e-6 &&
      math.abs(feat(2) - 1.0f) < 1e-6)
    assert(math.abs(feat(3)) < 1e-6)
    assert(math.abs(feat(15) - 1.0f) < 1e-6)
  }

  test("hostile AVI bytes fail clean") {
    // negative chunk size in the top-level walk
    val evil = "RIFF".getBytes ++ le32(300) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(-8) ++ new Array[Byte](220)
    assert(MediaContainers.decodeAvi(evil).isEmpty)
    // valid header but movi chunk declaring a size beyond the list end
    val good = MediaContainers.encodeAvi(Array.fill(10)(1: Byte))
    val truncated = java.util.Arrays.copyOf(good, good.length - 50)
    // RIFF size now exceeds the byte array: walker must bail, not index out
    assert(MediaContainers.decodeAvi(truncated).isEmpty)
    // decode() falls back to the stub rather than crashing
    val f = Multimodal.MediaCodec.decode(1L, "video", evil)
    assert(f.byte_len == evil.length)
  }

  test("hostile container bytes fail clean: no hang, no negative index") {
    // WAV whose first chunk declares size -8: a naive walk would never
    // advance its cursor
    val evilWav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(-8) ++ new Array[Byte](32)
    assert(MediaContainers.decodeWav(evilWav).isEmpty)
    // WAV whose chunk size is near Int.MaxValue: cursor must not overflow
    val bigWav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(Int.MaxValue - 4) ++ new Array[Byte](32)
    assert(MediaContainers.decodeWav(bigWav).isEmpty)
    // BMP with a negative pixel-data offset: must be None, not AIOOBE
    val evilBmp = "BM".getBytes ++ le32(70) ++ le32(0) ++ le32(-1000) ++
      le32(40) ++ le32(1) ++ le32(1) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(4) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ new Array[Byte](16)
    assert(MediaContainers.decodeBmp(evilBmp).isEmpty)
    // BMP with an int-overflowing width
    val hugeBmp = "BM".getBytes ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(1 << 30) ++ le32(1) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(4) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ new Array[Byte](16)
    assert(MediaContainers.decodeBmp(hugeBmp).isEmpty)
  }

  test("unsupported container flavors fall back to the stub, not crash") {
    // 32bpp BMP header → decodeBmp declines; decode() stubs it
    val bmp32 = "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(1) ++ le32(1) ++ le16(1) ++ le16(32) ++ le32(0) ++
      le32(0) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    assert(MediaContainers.decodeBmp(bmp32).isEmpty)
    val f = Multimodal.MediaCodec.decode(1L, "image", bmp32)
    assert(f.byte_len == bmp32.length)   // stub path still yields features
  }

  test("null payload decodes to a clean zero row, not an NPE (r19)") {
    val f = Multimodal.MediaCodec.decode(7L, "image", null)
    assert(f.media_id == 7L && f.n_frames == 0 && f.byte_len == 0L &&
      f.content_hash == 0L && f.feature.forall(_ == 0f))
    // distinct from an EMPTY payload (nonzero rolling-hash seed)
    val e = Multimodal.MediaCodec.decode(8L, "image", Array.empty[Byte])
    assert(e.content_hash != 0L)
  }

  test("frame plan refuses pathological frame counts with an empty plan (r19)") {
    import spark.implicits._
    // a video-LABELED row whose bytes decoded as long audio: n_frames
    // = nSamples, far past any real clip — must not materialize a
    // hundreds-of-MB per-row sequence
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "video", 8, 8, 5, 100L, 1L, Array.fill(16)(0f)),
      Multimodal.MediaFeatures(2L, "video", 16000, 1, 200000000, 9L, 2L, Array.fill(16)(0f)))
      .toDS()
    val plan = Multimodal.frameSamplePlan(feats, stride = 2)
      .select($"media_id", $"n_sampled").as[(Long, Int)].collect().toMap
    assert(plan(1L) == 3)
    assert(plan(2L) == 0, "over-bound count must yield the empty plan")
  }

  test("frame sampling plan emits stride-spaced indices for videos only") {
    val feats = Multimodal.decodeFeatures(media)
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    val row = plan.orderBy($"media_id").first()
    val frames = row.getAs[scala.collection.Seq[Int]]("sample_frames")
    assert(frames.zipWithIndex.forall { case (f, i) => f == i * 10 })
    assert(row.getAs[Int]("n_sampled") == frames.length)
    assert(plan.filter($"n_frames" < 1).count() == 0)
  }

  test("resize spec downscales only when needed and preserves aspect") {
    val spec = Multimodal.resizeSpec(media, maxDim = 320)
    val r = spec.first()
    assert(r.getAs[Int]("target_w") == 320)  // 640x480 → 320x240
    assert(r.getAs[Int]("target_h") == 240)
    val noop = Multimodal.resizeSpec(media, maxDim = 1000).first()
    assert(noop.getAs[Int]("target_w") == 640 && noop.getAs[Int]("target_h") == 480)
  }

  test("feature stats aggregate per modality") {
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(media))
      .orderBy($"modality").collect()
    assert(stats.map(_.getAs[String]("modality")).toSeq == Seq("audio", "image", "video"))
    assert(stats.forall(_.getAs[Long]("n") > 100))
    val video = stats(2)
    assert(video.getAs[Int]("max_frames") > 1)
  }

  test("frame plan yields an empty sample list for frameless video rows (r18)") {
    import org.apache.spark.sql.functions._
    // a row LABELED video whose bytes decode frameless must not crash
    // the stage with sequence(0, -1)
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "video", 0, 0, 0, 100L, 7L, Array.fill(16)(0.0f)),
      Multimodal.MediaFeatures(2L, "video", 2, 2, 3, 100L, 8L, Array.fill(16)(0.0f))
    ).toDS()
    val plan = Multimodal.frameSamplePlan(feats, stride = 2)
      .orderBy(col("media_id"))
      .select(col("n_sampled")).as[Int].collect().toSeq
    assert(plan == Seq(0, 2), s"frameless row samples nothing: $plan")
  }
}
