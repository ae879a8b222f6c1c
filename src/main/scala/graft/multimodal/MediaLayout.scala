package graft.multimodal

/** Shared binary-layout core for the three pure-JVM containers — ONE
  * spelling of magic checks, little-endian readers, header parsing and
  * RIFF chunk walking, consumed by BOTH the decoders
  * ([[MediaContainers]]) and the perceptual hashes ([[MediaHash]]).
  *
  * r16 verdict #4: the two copies this replaces had already drifted
  * once — `fingerprintWav`'s block math wrapped Int at ≥32 MiB data
  * chunks while `decodeWav`'s sibling math was overflow-safe, because
  * the same layout logic lived in two files and a fix landed in one.
  * Layout ONLY lives here now: no pixel math, no feature extraction,
  * no hashing — those stay with their operators.
  *
  * Hostile-bytes contract (unchanged from the r15 hardening): parsers
  * are fed arbitrary corpus bytes and must fail CLEAN (None) — never a
  * negative array index, an Int-overflowed offset, a stalled walk on a
  * negative chunk size, or fields read past a chunk's declared size.
  */
object MediaLayout {

  private[multimodal] def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private[multimodal] def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'
  def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
  def isAvi(b: Array[Byte]): Boolean =
    b.length >= MediaContainers.AviHeaderBytes &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** 24bpp uncompressed bottom-up BMP: image row y starts at byte
    * `dataOffset + (h−1−y)·rowSize`.
    */
  final case class Bmp(dataOffset: Int, w: Int, h: Int, rowSize: Int)

  /** PCM WAV: `fmtOk` = the one encoding the operators accept
    * (audioFormat 1, 8-bit, mono). `dataLen` is clamped to the bytes
    * actually present (a truncated data chunk reads short, not past
    * the buffer). May be 0 — the decoder returns zero features for an
    * empty data chunk while the fingerprint refuses; callers decide.
    */
  final case class Wav(sampleRate: Int, channels: Int, fmtOk: Boolean,
                       dataOff: Int, dataLen: Int)

  /** Uncompressed-DIB AVI: `frameOffsets` are the byte offsets of the
    * pixel data of each '00db'/'00dc' chunk whose size is EXACTLY one
    * frame (bottom-up 24bpp, same row layout as [[Bmp]]), in stream
    * order. Bounded by b.length/frameBytes entries.
    */
  final case class Avi(w: Int, h: Int, rowSize: Int, frameBytes: Int,
                       frameOffsets: Array[Int])

  /** Header parse + bounds for a 24bpp uncompressed BMP; None for any
    * other flavor or any header field that would index out of bounds.
    */
  def bmp(b: Array[Byte]): Option[Bmp] = {
    if (!isBmp(b)) return None
    val dataOffset = rdLe32(b, 10)
    val w = rdLe32(b, 18); val h = rdLe32(b, 22)
    val bpp = rdLe16(b, 28); val compression = rdLe32(b, 30)
    // bound every header field: negative offsets and int-overflowing
    // row sizes from garbage bytes must yield a clean None, never a
    // negative array index
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0 ||
      w > (1 << 20) || h > (1 << 20) || dataOffset < 54) return None
    val rowSize = (w * 3 + 3) & ~3
    if (dataOffset.toLong + rowSize.toLong * h > b.length) return None
    Some(Bmp(dataOffset, w, h, rowSize))
  }

  /** RIFF chunk walk for WAVE: finds `fmt ` and `data`. Long cursor +
    * non-negative-size guard — a hostile size field must neither stall
    * the walk (negative sz) nor overflow the offset (sz near
    * Int.MaxValue). The fmt fields must lie INSIDE the chunk's
    * declared size: a garbage fmt chunk with sz < 16 would otherwise
    * parse the NEXT chunk's bytes as format fields.
    */
  def wav(b: Array[Byte]): Option[Wav] = {
    if (!isWav(b)) return None
    var off = 12L
    var fmtOk = false; var sampleRate = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    var bad = false
    while (!bad && off + 8 <= b.length) {
      val io = off.toInt
      val id = new String(b, io, 4, "US-ASCII")
      val sz = rdLe32(b, io + 4)
      if (sz < 0) bad = true
      else {
        if (id == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
          val audioFormat = rdLe16(b, io + 8)
          channels = rdLe16(b, io + 10)
          sampleRate = rdLe32(b, io + 12)
          val bits = rdLe16(b, io + 22)
          fmtOk = audioFormat == 1 && bits == 8 && channels == 1
        } else if (id == "data") {
          dataOff = io + 8; dataLen = math.min(sz, b.length - dataOff)
        }
        off += 8L + sz + (sz & 1)         // chunks are word-aligned
      }
    }
    if (bad || !fmtOk || dataOff < 0) None
    else Some(Wav(sampleRate, channels, fmtOk, dataOff, dataLen))
  }

  /** Top-level RIFF walk for AVI: LIST hdrl (avih → dims) and LIST
    * movi (frame chunks). Same hostile-bytes guards as [[wav]]; a walk
    * that goes bad ANYWHERE — including mid-movi after valid frames —
    * returns None, exactly as both pre-extraction copies did.
    */
  def avi(b: Array[Byte]): Option[Avi] = {
    if (!isAvi(b)) return None
    var w = -1; var h = -1
    var moviOff = -1L; var moviEnd = -1L
    var off = 12L
    var bad = false
    while (!bad && off + 8 <= b.length) {
      val io = off.toInt
      val id = new String(b, io, 4, "US-ASCII")
      val sz = rdLe32(b, io + 4)
      if (sz < 0 || off + 8 + sz > b.length) bad = true
      else {
        if (id == "LIST" && sz >= 4) {
          val listType = new String(b, io + 8, 4, "US-ASCII")
          if (listType == "hdrl") {
            // scan the list body for the avih chunk
            var o2 = off + 12
            val end2 = off + 8 + sz
            while (!bad && o2 + 8 <= end2) {
              val i2 = o2.toInt
              val cid = new String(b, i2, 4, "US-ASCII")
              val csz = rdLe32(b, i2 + 4)
              if (csz < 0 || o2 + 8 + csz > end2) bad = true
              else {
                if (cid == "avih" && csz >= 40) {
                  w = rdLe32(b, i2 + 8 + 32); h = rdLe32(b, i2 + 8 + 36)
                }
                // LISTs (strl) are skipped whole — dims come from avih
                o2 += 8L + csz + (csz & 1)
              }
            }
          } else if (listType == "movi") {
            moviOff = off + 12; moviEnd = off + 8 + sz
          }
        }
        off += 8L + sz + (sz & 1)
      }
    }
    if (bad || w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) || moviOff < 0)
      return None
    val rowSize = (w * 3 + 3) & ~3
    val frameBytes = rowSize.toLong * h
    if (frameBytes > Int.MaxValue) return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Int]
    var fo = moviOff
    while (!bad && fo + 8 <= moviEnd) {
      val io = fo.toInt
      val cid = new String(b, io, 4, "US-ASCII")
      val csz = rdLe32(b, io + 4)
      if (csz < 0 || fo + 8 + csz > moviEnd) bad = true
      else {
        if ((cid == "00db" || cid == "00dc") && csz == frameBytes.toInt)
          frames += io + 8
        fo += 8L + csz + (csz & 1)
      }
    }
    if (bad) None
    else Some(Avi(w, h, rowSize, frameBytes.toInt, frames.toArray))
  }
}
