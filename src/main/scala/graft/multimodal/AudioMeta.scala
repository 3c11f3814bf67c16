package graft.multimodal

/** Sniffed container metadata for one audio payload. */
case class AudioInfo(format: String, channels: Int, sampleRate: Int,
                     bitsPerSample: Int, nFrames: Long)

/** Byte-level audio container parsing — the audio leg of the multimodal
  * surface, same contract as [[ImageMeta]]: REAL header metadata from the
  * binary column, no native decoders, everything from public format specs:
  *
  *  - WAV (RIFF, Microsoft/IBM 1991 spec): `RIFF <u32le size> WAVE`, then a
  *    CHUNK WALK — `<4cc id> <u32le size> <data> [pad]` with every chunk
  *    padded to an EVEN boundary (the rule naive fixed-offset readers
  *    break on). `fmt ` carries u16le format/channels, u32le sampleRate,
  *    u16le blockAlign/bitsPerSample; frames = `data` size / blockAlign.
  *    Fixed offsets do NOT work: JUNK/LIST/bext chunks of arbitrary length
  *    legally precede `fmt `, so the walk is mandatory (the same lesson as
  *    JPEG's marker scan).
  *  - AIFF (Apple EA IFF 85): the big-endian mirror — `FORM <u32be> AIFF`,
  *    chunks `<4cc> <u32be size>` with the same even-padding rule. `COMM`
  *    carries u16be channels, u32be numSampleFrames, u16be sampleSize, and
  *    the sample rate as an 80-bit IEEE 754 EXTENDED float (1 sign + 15
  *    exponent, bias 16383 + 64-bit mantissa with an explicit integer
  *    bit) — a real decode, not a fixed-point shortcut.
  *
  * Truncated or corrupt payloads return None — never throw — because at
  * 100 TB a crawl batch always contains garbage and one bad byte must not
  * kill a task. Only the leading header bytes are touched; the sound data
  * stays opaque.
  */
object AudioMeta {

  def sniff(b: Array[Byte]): Option[AudioInfo] = {
    if (b == null || b.length < 12) return None
    if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE") wav(b)
    else if (fourcc(b, 0) == "FORM" && fourcc(b, 8) == "AIFF") aiff(b)
    else if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)) mp3(b)
    else None
  }

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
  private def be64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
    v
  }

  private def wav(b: Array[Byte]): Option[AudioInfo] = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return None
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") dataSize = size
      i += 8 + size.toInt
      if ((size & 1L) == 1L) i += 1 // RIFF even-padding rule
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0 ||
        dataSize < 0) None
    else Some(AudioInfo("wav", channels, rate, bits, dataSize / blockAlign))
  }

  private def aiff(b: Array[Byte]): Option[AudioInfo] = {
    var i = 12
    var found: Option[AudioInfo] = None
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = be32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "COMM") {
        if (size < 18) return None
        val channels = be16(b, i + 8)
        val frames = be32(b, i + 10)
        val bits = be16(b, i + 14)
        val rate = extended80ToInt(b, i + 16)
        if (channels <= 0 || bits <= 0 || rate <= 0) return None
        found = Some(AudioInfo("aiff", channels, rate, bits, frames))
      }
      i += 8 + size.toInt
      if ((size & 1L) == 1L) i += 1 // IFF even-padding rule
    }
    found
  }

  // MPEG audio Layer III tables (ISO/IEC 11172-3 Table B.2 / 13818-3):
  // bitrate kbps by 4-bit index (0 = free format — refused; 15 = bad).
  private val Mp3Br1 = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, -1)
  private val Mp3Br2 = Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160, -1)
  private val Mp3Sr1 = Array(44100, 48000, 32000, -1)
  private val Mp3Sr2 = Array(22050, 24000, 16000, -1)
  private val Mp3Sr25 = Array(11025, 12000, 8000, -1)

  /** MPEG-1/2/2.5 Layer III (MP3) FRAME-HEADER WALK — the compressed-audio
    * leg of the metadata surface (the sound data stays opaque; the header
    * chain carries the signal): optional ID3v2 container skipped via its
    * syncsafe length, then every frame header validated (sync, version,
    * layer III, bitrate/sample-rate indices) and stepped over by the
    * exact Layer III frame length ⌊spf/8 · bitrate / rate⌋ + padding
    * (spf = 1152 samples MPEG-1 / 576 MPEG-2/2.5). `nFrames` reports
    * total SAMPLE frames (frames × spf) so duration arithmetic is shared
    * with WAV/AIFF; bitsPerSample is 0 — compressed audio has none.
    *
    * Strict by design: free-format bitrate, reserved indices, a
    * mixed-sample-rate chain, a mid-frame truncation, or trailing bytes
    * after the last frame all refuse with None — at 100 TB "mostly a
    * valid MP3" is garbage, not data.
    */
  private def mp3(b: Array[Byte]): Option[AudioInfo] = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2: "ID3" u8 ver u8 rev u8 flags, then a 28-bit SYNCSAFE size
      // (4 bytes, high bit of each clear) counting the tag body only
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + tagSize
    }
    var frames = 0L
    var sampleFrames = 0L
    var rate = -1
    var channels = -1
    while (i + 4 <= b.length) {
      val h = be32(b, i)
      if (((h >> 21) & 0x7ff) != 0x7ff) return None // lost sync
      val ver = ((h >> 19) & 3).toInt  // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layer = ((h >> 17) & 3).toInt // 1 = Layer III
      val brIdx = ((h >> 12) & 0xf).toInt
      val srIdx = ((h >> 10) & 3).toInt
      val padding = ((h >> 9) & 1).toInt
      val mode = ((h >> 6) & 3).toInt
      if (ver == 1 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return None
      val mpeg1 = ver == 3
      val bitrate = (if (mpeg1) Mp3Br1 else Mp3Br2)(brIdx) * 1000L
      val sr = (if (mpeg1) Mp3Sr1 else if (ver == 2) Mp3Sr2 else Mp3Sr25)(srIdx)
      val spf = if (mpeg1) 1152 else 576
      val frameLen = (spf / 8 * bitrate / sr + padding).toInt
      if (rate < 0) { rate = sr; channels = if (mode == 3) 1 else 2 }
      else if (sr != rate) return None // mixed-rate chain: refuse
      if (i + frameLen > b.length) return None // truncated mid-frame
      frames += 1
      sampleFrames += spf
      i += frameLen
    }
    if (frames == 0 || i != b.length) None
    else Some(AudioInfo("mp3", channels, rate, 0, sampleFrames))
  }

  /** Decode an 80-bit IEEE extended float at offset `i` to the nearest
    * integer (sample rates are integral in practice). Layout: u16be
    * sign+exponent (bias 16383), u64be mantissa with EXPLICIT integer bit
    * (no hidden bit, unlike float32/64). value = mantissa · 2^(exp−16383−63).
    */
  private[multimodal] def extended80ToInt(b: Array[Byte], i: Int): Int = {
    val se = be16(b, i)
    val mant = be64(b, i + 2)
    if ((se & 0x8000) != 0) return -1 // negative rate: corrupt
    val exp = se & 0x7fff
    if (exp == 0 || mant == 0L) return 0
    val shift = exp - 16383 - 63
    val v =
      if (shift >= 0) { if (shift > 31) return -1; mant << shift }
      else if (shift < -63) 0L
      else mant >>> -shift
    if (v < 0 || v > Int.MaxValue) -1 else v.toInt
  }

  // ---- builders ----------------------------------------------------------
  // Spec-correct minimal files for synthesizing test corpora (the fixtures
  // carry no real audio). Container structure is valid per the specs; the
  // sound data is opaque deterministic filler.

  /** Minimal WAV: RIFF/WAVE + a JUNK chunk carrying `filler` forced to an
    * ODD payload length (so the parse MUST apply the even-padding rule and
    * MUST chunk-walk past a variable-length chunk to reach `fmt `) +
    * canonical 16-byte PCM `fmt ` + `data` sized nFrames·blockAlign.
    */
  def makeWav(channels: Int, sampleRate: Int, bits: Int, nFrames: Int,
              filler: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0 &&
      (bits == 8 || bits == 16 || bits == 24 || bits == 32),
      s"wav params: ch=$channels sr=$sampleRate bits=$bits n=$nFrames")
    val blockAlign = channels * bits / 8
    val junk = {
      val f = if (filler.isEmpty) Array[Byte](0) else filler.take(199)
      if (f.length % 2 == 0) f :+ 0x6a.toByte else f // force ODD
    }
    val dataSize = nFrames * blockAlign
    val riffSize = 4 + (8 + junk.length + 1) + (8 + 16) + (8 + dataSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("JUNK".getBytes("US-ASCII")).putInt(junk.length)
      .put(junk).put(0.toByte) // pad byte (junk length is odd)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) { bb.put(((i * 31) & 0xff).toByte); i += 1 }
    bb.array()
  }

  /** Minimal AIFF: FORM/AIFF + an ANNO chunk carrying `filler` (odd,
    * padded — same walk requirement as WAV) + COMM with the 80-bit
    * extended sample rate + SSND with nFrames·blockAlign sound bytes.
    */
  def makeAiff(channels: Int, sampleRate: Int, bits: Int, nFrames: Int,
               filler: Array[Byte]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nFrames >= 0 && bits > 0,
      s"aiff params: ch=$channels sr=$sampleRate bits=$bits n=$nFrames")
    val anno = {
      val f = if (filler.isEmpty) Array[Byte](0) else filler.take(199)
      if (f.length % 2 == 0) f :+ 0x61.toByte else f // force ODD
    }
    val blockAlign = channels * ((bits + 7) / 8)
    val sndSize = 8 + nFrames * blockAlign // offset + blockSize + data
    val formSize = 4 + (8 + anno.length + 1) + (8 + 18) + (8 + sndSize)
    val bb = java.nio.ByteBuffer.allocate(8 + formSize) // big-endian default
    bb.put("FORM".getBytes("US-ASCII")).putInt(formSize)
      .put("AIFF".getBytes("US-ASCII"))
    bb.put("ANNO".getBytes("US-ASCII")).putInt(anno.length)
      .put(anno).put(0.toByte) // pad byte (anno length is odd)
    bb.put("COMM".getBytes("US-ASCII")).putInt(18)
      .putShort(channels.toShort)
      .putInt(nFrames)
      .putShort(bits.toShort)
      .put(intToExtended80(sampleRate))
    bb.put("SSND".getBytes("US-ASCII")).putInt(sndSize)
      .putInt(0).putInt(0) // offset, blockSize
    var i = 0
    while (i < nFrames * blockAlign) { bb.put(((i * 37) & 0xff).toByte); i += 1 }
    bb.array()
  }

  /** Minimal spec-correct MP3: optional ID3v2 tag (syncsafe length,
    * filler body) + `nFrames` Layer III frames with correct per-frame
    * lengths and zeroed audio payloads. `brIdx` indexes the version's
    * bitrate table (1–14), `srIdx` the sample-rate table (0–2), `mode`
    * is the 2-bit channel mode (3 = mono).
    */
  def makeMp3(mpeg1: Boolean, brIdx: Int, srIdx: Int, mode: Int,
              nFrames: Int, padding: Int, id3Size: Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2 &&
      mode >= 0 && mode <= 3 && nFrames >= 1 && (padding == 0 || padding == 1),
      s"mp3 params: br=$brIdx sr=$srIdx mode=$mode n=$nFrames pad=$padding")
    val bitrate = (if (mpeg1) Mp3Br1 else Mp3Br2)(brIdx) * 1000L
    val sr = (if (mpeg1) Mp3Sr1 else Mp3Sr2)(srIdx)
    val spf = if (mpeg1) 1152 else 576
    val frameLen = (spf / 8 * bitrate / sr + padding).toInt
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      var k = 0
      while (k < id3Size) { out.write((k * 31) & 0x7f); k += 1 } // never 0xFF
    }
    val ver = if (mpeg1) 3 else 2
    val h = (0x7ffL << 21) | (ver.toLong << 19) | (1L << 17) | (1L << 16) |
      (brIdx.toLong << 12) | (srIdx.toLong << 10) | (padding.toLong << 9) |
      (mode.toLong << 6)
    var f = 0
    while (f < nFrames) {
      out.write(((h >> 24) & 0xff).toInt); out.write(((h >> 16) & 0xff).toInt)
      out.write(((h >> 8) & 0xff).toInt); out.write((h & 0xff).toInt)
      var k = 4
      while (k < frameLen) { out.write(0); k += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Encode a positive integer as an 80-bit IEEE extended float:
    * exponent = bias + bitLength − 1, mantissa = value normalized so the
    * explicit integer bit is the mantissa's MSB.
    */
  private[graft] def intToExtended80(v: Int): Array[Byte] = {
    require(v > 0, s"extended80 encode expects positive, got $v")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(v.toLong)
    val exp = 16383 + bl - 1
    val mant = v.toLong << (64 - bl)
    val bb = java.nio.ByteBuffer.allocate(10)
    bb.putShort(exp.toShort).putLong(mant)
    bb.array()
  }
}
