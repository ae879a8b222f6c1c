package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The shared layout core (r16 verdict #4): decoders and perceptual
  * hashes consume ONE parse, so a hardening fix can no longer land in
  * one copy and miss the other — which is exactly what happened to the
  * WAV ≥32 MiB block-math overflow. This spec pins the overflow on the
  * shared path and the decode/hash layout agreement.
  */
class MediaLayoutSpec extends AnyFunSuite {

  test("WAV fingerprint is overflow-safe at >= 32 MiB data chunks (shared path)") {
    // 33 MiB of samples: blk * n wrapped Int in the pre-extraction
    // copy (negative block start → AIOOBE or a silently wrong hash)
    val n = 33 * 1024 * 1024
    val payload = new Array[Byte](n)
    var i = 0
    while (i < n) { payload(i) = ((i * 31 + 7) & 0xFF).toByte; i += 1 }
    val wav = MediaContainers.encodeWav(payload)
    val fp = MediaHash.fingerprintWav(wav)
    assert(fp != null, "a valid 33 MiB PCM u8 WAV must fingerprint")
    // and the layout both consumers see is the same object contract
    val lay = MediaLayout.wav(wav).get
    assert(lay.dataLen == n && lay.fmtOk && lay.channels == 1)
    assert(MediaContainers.decodeWav(wav).exists(_._3 == n))
  }

  test("decoder and hash accept/reject IDENTICAL layouts for hostile bytes") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "RIFF".getBytes ++ new Array[Byte](60),              // no WAVE tag
      { // negative chunk size inside a valid WAVE header
        val w = MediaContainers.encodeWav(Array[Byte](1, 2, 3, 4))
        w(16) = -1; w(17) = -1; w(18) = -1; w(19) = -1; w
      },
      { // fmt chunk too small to hold its fields (sz < 16)
        val w = MediaContainers.encodeWav(Array[Byte](1, 2, 3, 4))
        w(16) = 8; w
      },
      MediaContainers.encodeBmp(new Array[Byte](12)),      // BMP, not WAV
      MediaContainers.encodeWav(Array[Byte](9, 8, 7))      // valid
    )
    for ((bytes, i) <- cases.zipWithIndex) {
      val dec = MediaContainers.decodeWav(bytes).isDefined
      val lay = MediaLayout.wav(bytes).isDefined
      assert(dec == lay, s"case $i: decodeWav=$dec but MediaLayout.wav=$lay")
      // fingerprint additionally refuses empty data; otherwise agrees
      val fp = MediaHash.fingerprintWav(bytes) != null
      assert(fp == (lay && MediaLayout.wav(bytes).get.dataLen > 0),
        s"case $i: fingerprint/layout disagree")
    }
  }

  test("BMP and AVI layout parses agree between decoder and hash") {
    val px = new Array[Byte](600)
    new scala.util.Random(7).nextBytes(px)
    val bmp = MediaContainers.encodeBmp(px)
    assert(MediaContainers.decodeBmp(bmp).isDefined ==
      (MediaHash.dhashBmp(bmp) != null))
    val avi = MediaContainers.encodeAvi(px)
    assert(MediaContainers.decodeAvi(avi).isDefined ==
      (MediaHash.dhashAviFrames(avi) != null))
    // garbage rejects on both
    val junk = new Array[Byte](300)
    assert(MediaContainers.decodeBmp(junk).isEmpty &&
      MediaHash.dhashBmp(junk) == null)
    assert(MediaContainers.decodeAvi(junk).isEmpty &&
      MediaHash.dhashAviFrames(junk) == null)
  }
}
