package graft.multimodal

/** A decoded PCM stream: interleaved SIGNED samples (8-bit WAV's unsigned
  * convention is normalized to signed here, so stats mean the same thing
  * for every profile).
  */
case class PcmAudio(format: String, channels: Int, sampleRate: Int,
                    bits: Int, samples: Array[Int])

/** REAL PCM sample decode for the two container profiles a pure JVM can
  * open with no codecs — the audio mirror of [[PixelCodec]]:
  *
  *  - WAV (RIFF): PCM format tag 1 only; `data` chunk holds interleaved
  *    little-endian frames — 8-bit stores UNSIGNED (0..255, signed =
  *    b − 128 per the spec), 16-bit signed LE.
  *  - AIFF (IFF): `SSND` holds offset(u32be) + blockSize + interleaved
  *    BIG-endian frames; 8-bit is signed (unlike WAV), 16-bit signed BE.
  *
  * Chunk walks apply the even-padding rule (same as [[AudioMeta.sniff]]);
  * anything truncated, non-PCM, or outside the 8/16-bit profiles returns
  * None — never throws, never yields wrong samples (crawl-garbage
  * contract). Sample count is guarded before allocation.
  */
object AudioPcm {

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val MaxSamples = 1 << 26 // hostile headers must not OOM a task

  def decode(b: Array[Byte]): Option[PcmAudio] = {
    if (b == null || b.length < 12) return None
    if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE") wav(b)
    else if (fourcc(b, 0) == "FORM" && fourcc(b, 8) == "AIFF") aiff(b)
    else None
  }

  private def wav(b: Array[Byte]): Option[PcmAudio] = {
    var i = 12
    var fmtTag = -1; var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataSize = -1L
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        bits = le16(b, i + 22)
      } else if (id == "data") { dataOff = i + 8; dataSize = size }
      i += 8 + size.toInt
      if ((size & 1L) == 1L) i += 1
    }
    if (fmtTag != 1 || channels <= 0 || rate <= 0 || dataOff < 0) return None
    if (bits != 8 && bits != 16) return None
    val n = (dataSize / (bits / 8)).toInt
    if (n < 0 || n > MaxSamples) return None
    val out = new Array[Int](n)
    var k = 0
    if (bits == 8) {
      while (k < n) { out(k) = (b(dataOff + k) & 0xff) - 128; k += 1 }
    } else {
      while (k < n) { out(k) = le16(b, dataOff + 2 * k).toShort.toInt; k += 1 }
    }
    Some(PcmAudio("wav", channels, rate, bits, out))
  }

  private def aiff(b: Array[Byte]): Option[PcmAudio] = {
    var i = 12
    var channels = -1; var bits = -1; var rate = -1; var frames = -1L
    var sndOff = -1; var sndSize = -1L
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = be32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "COMM") {
        if (size < 18) return None
        channels = be16(b, i + 8)
        frames = be32(b, i + 10)
        bits = be16(b, i + 14)
        rate = AudioMeta.extended80ToInt(b, i + 16)
      } else if (id == "SSND") {
        if (size < 8) return None
        val offset = be32(b, i + 8) // samples start offset past the header
        if (offset < 0 || offset > size - 8) return None
        sndOff = i + 16 + offset.toInt
        sndSize = size - 8 - offset
      }
      i += 8 + size.toInt
      if ((size & 1L) == 1L) i += 1
    }
    if (channels <= 0 || rate <= 0 || sndOff < 0) return None
    if (bits != 8 && bits != 16) return None
    val n = math.min(frames * channels, sndSize / (bits / 8)).toInt
    if (n < 0 || n > MaxSamples) return None
    val out = new Array[Int](n)
    var k = 0
    if (bits == 8) {
      while (k < n) { out(k) = b(sndOff + k).toInt; k += 1 } // AIFF 8-bit is signed
    } else {
      while (k < n) { out(k) = be16(b, sndOff + 2 * k).toShort.toInt; k += 1 }
    }
    Some(PcmAudio("aiff", channels, rate, bits, out))
  }
}
