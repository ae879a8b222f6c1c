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
    val a = feats.filter($"media_id" === 7).collect()(0)
    val b = Multimodal.decodeFeatures(media).filter($"media_id" === 7).collect()(0)
    assert(a.content_hash == b.content_hash)
    assert(a.feature.toSeq == b.feature.toSeq)
    assert(a.feature.length == Multimodal.MediaCodec.featureDim)
    assert(a.width >= 64 && a.height >= 64)
    // repartition upstream must not change results, only parallelism
    val c = Multimodal.decodeFeatures(media.repartition(7))
    assert(c.count() == 500)
    assert(c.filter($"media_id" === 7).collect()(0).content_hash == a.content_hash)
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
}
