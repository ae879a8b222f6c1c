package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.MediaDedup

/** Perceptual near-dup detection over planted payload-perturbed
  * containers (the q83 fixture pattern): a perturbed copy must land
  * within the Hamming threshold, unrelated content outside it, and the
  * banded candidate join must equal the brute-force reference at t=3
  * (the 4×16 pigeonhole guarantee).
  */
class MediaDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def rndPayload(seed: Int, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  private def perturb(p: Array[Byte], at: Seq[Int]): Array[Byte] = {
    val q = p.clone()
    at.foreach(i => q(i) = (q(i) + 40).toByte)
    q
  }

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) =
    rows.toDF("media_id", "modality", "bytes")

  test("identical image payloads hash identically; a perturbed copy lands at small Hamming") {
    val p = rndPayload(1, 600)   // 4-row BMP
    val bmp = MediaContainers.encodeBmp(p)
    assert(MediaHash.dhashBmp(bmp) == MediaHash.dhashBmp(MediaContainers.encodeBmp(p.clone())))
    val near = MediaHash.dhashBmp(MediaContainers.encodeBmp(perturb(p, Seq(10, 300))))
    val ham = java.lang.Long.bitCount(MediaHash.dhashBmp(bmp) ^ near)
    assert(ham <= 3, s"2-byte perturbation moved dHash by $ham bits")
    val far = MediaHash.dhashBmp(MediaContainers.encodeBmp(rndPayload(99, 600)))
    assert(java.lang.Long.bitCount(MediaHash.dhashBmp(bmp) ^ far) > 3,
      "unrelated images must not collide inside the threshold")
  }

  test("nearDupPairs finds the planted perturbed image pair and nothing else") {
    val p = rndPayload(2, 500)
    val rows = mediaDf(Seq(
      (1L, "image", MediaContainers.encodeBmp(p)),
      (2L, "image", MediaContainers.encodeBmp(perturb(p, Seq(42)))),
      (3L, "image", MediaContainers.encodeBmp(rndPayload(7, 500))),
      (4L, "audio", MediaContainers.encodeWav(p))))   // wrong modality: excluded
    val pairs = MediaDedup.nearDupPairs(MediaDedup.signatures(rows, "image"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("undecodable bytes drop out of the signature stream") {
    val rows = mediaDf(Seq(
      (1L, "image", Array[Byte](1, 2, 3)),
      (2L, "image", MediaContainers.encodeWav(rndPayload(3, 100))),  // WAV under image modality
      (3L, "image", MediaContainers.encodeBmp(rndPayload(4, 100)))))
    assert(MediaDedup.signatures(rows, "image").count() == 1)
  }

  test("audio: a perturbed copy lands inside the threshold, unrelated audio outside") {
    val p = rndPayload(5, 520)
    val rows = mediaDf(Seq(
      (1L, "audio", MediaContainers.encodeWav(p)),
      (2L, "audio", MediaContainers.encodeWav(perturb(p, Seq(100)))),
      (3L, "audio", MediaContainers.encodeWav(rndPayload(11, 520)))))
    val pairs = MediaDedup.nearDupPairs(MediaDedup.signatures(rows, "audio"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("banded candidates equal the brute-force reference at t = 3 (pigeonhole completeness)") {
    val payloads = (0 until 40).map(i => rndPayload(100 + i, 400)) ++
      (0 until 8).map(i => perturb(rndPayload(100 + i, 400), Seq(i * 17 + 5)))
    val rows = mediaDf(payloads.zipWithIndex.map { case (p, i) =>
      (i.toLong, "image", MediaContainers.encodeBmp(p))
    })
    val sigs = MediaDedup.signatures(rows, "image")
    val banded = MediaDedup.nearDupPairs(sigs)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    val flat = sigs.as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- flat; (ib, sb) <- flat
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb))).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture must actually plant near pairs")
  }

  test("AVI frame hashes: shared frames collide, perturbed frames diverge, frame order holds") {
    val f0 = rndPayload(20, 384)   // exactly one frame each
    val f1 = rndPayload(21, 384)
    // a heavy localized edit (one flattened block region) so at least
    // one gradient comparison provably flips for this fixed seed
    val f1p = f1.clone(); (192 until 240).foreach(i => f1p(i) = 0)
    // video A = [f0, f1], video B = [f1, f1p]: B shares A's second
    // frame verbatim and carries a perturbed copy of it
    val a = MediaContainers.encodeAvi(f0 ++ f1)
    val bv = MediaContainers.encodeAvi(f1 ++ f1p)
    val ha = MediaHash.dhashAviFrames(a)
    val hb = MediaHash.dhashAviFrames(bv)
    assert(ha.length == 2 && hb.length == 2)
    assert(ha(1) == hb(0), "an identical frame must hash identically across videos")
    assert(hb(0) != hb(1),
      "zeroing a whole pixel row region must change the hash")
    assert(java.lang.Long.bitCount(hb(0) ^ hb(1)) <= 16,
      "a one-row edit must stay perceptually near (localized bits only)")
    assert(MediaHash.dhashAviFrames(MediaContainers.encodeBmp(f0)) == null,
      "non-AVI bytes must yield null, not garbage")
  }

  test("video frame-set Jaccard: shared-majority videos pair, single-frame overlap stays below") {
    import graft.multimodal.PerceptualHashFunctions.avi_frame_dhash
    import org.apache.spark.sql.functions.posexplode
    val fA = rndPayload(30, 384); val fB = rndPayload(31, 384)
    val fC = rndPayload(32, 384); val fD = rndPayload(33, 384)
    val rows = mediaDf(Seq(
      (1L, "video", MediaContainers.encodeAvi(fA ++ fB)),         // {A,B}
      (2L, "video", MediaContainers.encodeAvi(fA ++ fB ++ fC)),   // {A,B,C} — J=2/3
      (3L, "video", MediaContainers.encodeAvi(fB ++ fD))))        // {B,D} — J(1,3)=1/3
    val frames = rows.select($"media_id",
      posexplode(avi_frame_dhash($"bytes")).as(Seq("frame_idx", "sig")))
    val pairs = MediaDedup.frameJaccardPairs(frames, minJaccard = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      "only the majority-overlap pair clears the 0.5 floor")
  }

  test("null-sig frame rows do not deflate Jaccard denominators") {
    // r19 review: a caller's undecodable-frame marker (null sig) can
    // never match in the self-join yet counted into na/nb, silently
    // deflating every Jaccard its video participates in
    val shared = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    val withNulls = (shared.map { case (m, s) => (m, Some(s)) } ++
      Seq((1L, None: Option[Long]), (2L, None)))
      .toDF("media_id", "sig")
    val pairs = MediaDedup.frameJaccardPairs(withNulls, minJaccard = 0.9)
      .select($"id_a", $"id_b", $"jaccard_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1000000L)),
      s"identical frame SETS must read J=1.0 despite null markers: $pairs")
  }

  test("viral image bucket: the df cap bounds candidates and the drop report names it") {
    // 8 uniform-black images — every gradient bit zero by construction,
    // so all four 16-bit blocks of all eight land in the same (b, 0)
    // buckets — plus one planted near pair that must SURVIVE the cap
    val black = (0 until 8).map(i =>
      (10L + i, "image", MediaContainers.encodeBmp(Array.fill(400)(0.toByte))))
    val p = rndPayload(40, 500)
    val rows = mediaDf(black ++ Seq(
      (1L, "image", MediaContainers.encodeBmp(p)),
      (2L, "image", MediaContainers.encodeBmp(perturb(p, Seq(42))))))
    val sigs = MediaDedup.signatures(rows, "image")
    assert(sigs.filter($"sig" === 0L).count() == 8,
      "a uniform frame must dHash to exactly 0")
    // default cap: nothing viral at this scale — all 28 black pairs out
    val uncapped = MediaDedup.nearDupPairs(sigs)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 28 + 1)
    // cap below the viral bucket's population: black candidates vanish,
    // the planted pair survives (its buckets hold 2 rows each)
    val capped = MediaDedup.nearDupPairs(sigs, maxBucketDf = 5L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)),
      s"capped candidates must be exactly the planted pair, got $capped")
    val dropped = MediaDedup.droppedBuckets(sigs, maxBucketDf = 5L)
      .as[(Int, Long, Long)].collect().toSet
    assert(dropped == (0 until 4).map(b => (b, 0L, 8L)).toSet,
      "the drop report must name all four all-zero blocks with df=8")
    assert(MediaDedup.droppedBuckets(sigs).count() == 0,
      "no bucket is viral at the default cap")
  }

  test("viral frame sig: capped out of Jaccard evidence, reported, denominators stay consistent") {
    import graft.multimodal.PerceptualHashFunctions.avi_frame_dhash
    import org.apache.spark.sql.functions.posexplode
    val black = Array.fill(384)(0.toByte)
    val fA = rndPayload(50, 384); val fB = rndPayload(51, 384)
    // five videos all share the black frame; videos 1/2 also share both
    // real frames (J = 1 on the surviving vocabulary), video 3 shares
    // ONLY the black frame with them
    val rows = mediaDf(Seq(
      (1L, "video", MediaContainers.encodeAvi(black ++ fA ++ fB)),
      (2L, "video", MediaContainers.encodeAvi(fA ++ black ++ fB)),
      (3L, "video", MediaContainers.encodeAvi(black ++ rndPayload(52, 384))),
      (4L, "video", MediaContainers.encodeAvi(black ++ rndPayload(53, 384))),
      (5L, "video", MediaContainers.encodeAvi(black ++ rndPayload(54, 384)))))
    val frames = rows.select($"media_id",
      posexplode(avi_frame_dhash($"bytes")).as(Seq("frame_idx", "sig")))
    // uncapped: the black frame alone lifts J(3,4) to 1/3 < 0.5 — no
    // spurious pair — but it IS candidate fan-in: 5 videos meet there
    val capped = MediaDedup.frameJaccardPairs(frames, minJaccard = 0.5, maxSigDf = 4L)
      .select($"id_a", $"id_b", $"jaccard_micro").as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 1000000L)),
      s"videos 1/2 must score J=1 on the surviving vocabulary, got $capped")
    val dropped = MediaDedup.droppedFrameSigs(frames, maxSigDf = 4L)
      .as[(Long, Long)].collect().toSet
    assert(dropped == Set((0L, 5L)),
      "the drop report must name the black frame sig with its video df")
    assert(MediaDedup.droppedFrameSigs(frames).count() == 0)
  }

  test("the engine dHash matches a straight reimplementation of the documented grid") {
    // independent spelling: floats for the mean, but comparison done on
    // the same cross-multiplied integers — guards the bit layout
    val p = rndPayload(6, 700)
    val bmp = MediaContainers.encodeBmp(p)
    val h = math.max(1, (p.length + 191) / 192)
    def byteAt(o: Int): Int = if (o < p.length) p(o) & 0xFF else 0
    def lum(x: Int, y: Int): Long = {
      val o = (h - 1 - y) * 192 + 3 * x
      114L * byteAt(o) + 587L * byteAt(o + 1) + 299L * byteAt(o + 2)
    }
    var expect = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      def cell(cc: Int): (Long, Long) = {
        val x0 = cc * 64 / 9; val x1 = math.max((cc + 1) * 64 / 9, x0 + 1)
        val y0 = r * h / 8; val y1 = math.max((r + 1) * h / 8, y0 + 1)
        var s = 0L
        for (y <- y0 until y1; x <- x0 until x1) s += lum(x, y)
        (s, (x1 - x0).toLong)
      }
      val (s0, w0) = cell(c); val (s1, w1) = cell(c + 1)
      if (s1 * w0 > s0 * w1) expect |= 1L << (63 - (r * 8 + c))
    }
    assert(MediaHash.dhashBmp(bmp) == expect)
  }
}
