package graft

import graft.multimodal.{AudioMeta, AudioPcm, Multimodal => MM}

/** PCM sample decode: golden fixtures are hand-built bytes from the
  * WAV/AIFF specs (independent of the builders), pinning the two contracts
  * a naive decoder gets wrong — WAV 8-bit is UNSIGNED while AIFF 8-bit is
  * signed, and the 16-bit endianness differs (LE vs BE).
  */
class AudioPcmSpec extends SparkTestBase {

  // spec-local minimal WAV around explicit data bytes
  private def wavBytes(channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(8000)
      .putInt(8000 * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  test("golden WAV 8-bit: unsigned storage decodes to signed samples") {
    // bytes 0x00, 0x80, 0xFF -> samples -128, 0, 127
    val a = AudioPcm.decode(wavBytes(1, 8,
      Array(0x00, 0x80, 0xff).map(_.toByte))).get
    assert(a.format == "wav" && a.samples.toSeq == Seq(-128, 0, 127))
  }

  test("golden WAV 16-bit: little-endian signed") {
    // frames: 0x0100 -> 256; 0xFF7F -> 32767; 0x0080 -> -32768
    val a = AudioPcm.decode(wavBytes(1, 16,
      Array(0x00, 0x01, 0xff, 0x7f, 0x00, 0x80).map(_.toByte))).get
    assert(a.samples.toSeq == Seq(256, 32767, -32768))
  }

  test("golden AIFF: 8-bit SIGNED and 16-bit big-endian, SSND offset honored") {
    // AIFF with a 2-byte SSND offset the decoder must skip
    def aiff(bits: Int, offset: Int, data: Array[Byte]): Array[Byte] = {
      val sndSize = 8 + offset + data.length
      val formSize = 4 + (8 + 18) + (8 + sndSize)
      val bb = java.nio.ByteBuffer.allocate(8 + formSize) // BE default
      bb.put("FORM".getBytes("US-ASCII")).putInt(formSize)
        .put("AIFF".getBytes("US-ASCII"))
      bb.put("COMM".getBytes("US-ASCII")).putInt(18)
        .putShort(1).putInt(data.length / (bits / 8)).putShort(bits.toShort)
        .put(ext80(8000))
      bb.put("SSND".getBytes("US-ASCII")).putInt(sndSize)
        .putInt(offset).putInt(0)
      bb.put(new Array[Byte](offset)).put(data)
      bb.array()
    }
    val a8 = AudioPcm.decode(aiff(8, 2, Array(0x00, 0x80, 0x7f).map(_.toByte))).get
    assert(a8.format == "aiff" && a8.samples.toSeq == Seq(0, -128, 127))
    val a16 = AudioPcm.decode(aiff(16, 0,
      Array(0x01, 0x00, 0x80, 0x00).map(_.toByte))).get
    assert(a16.samples.toSeq == Seq(256, -32768)) // BE, not LE
    assert(a16.sampleRate == 8000) // extended-float rate round-trips
  }

  private def ext80(rate: Int): Array[Byte] = {
    // 80-bit extended float for an integral rate: exponent 16383+63,
    // mantissa = rate << (63 - floor(log2 rate)) … easiest correct form:
    // normalize rate into the explicit-integer-bit mantissa
    var exp = 16383 + 63
    var mant = rate.toLong
    while ((mant & Long.MinValue) == 0) { mant <<= 1; exp -= 1 }
    java.nio.ByteBuffer.allocate(10).putShort(exp.toShort).putLong(mant).array()
  }

  test("garbage, truncation, non-PCM, and 24-bit profiles return None") {
    assert(AudioPcm.decode("not audio".getBytes).isEmpty)
    assert(AudioPcm.decode(Array.emptyByteArray).isEmpty)
    val good = wavBytes(1, 16, Array[Byte](1, 2, 3, 4))
    for (cut <- Seq(4, 11, 20, 40, good.length - 1))
      assert(AudioPcm.decode(good.take(cut)).isEmpty, s"cut=$cut")
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE-float format tag
    assert(AudioPcm.decode(nonPcm).isEmpty)
    val b24 = AudioMeta.makeWav(1, 8000, 24, 10, "x".getBytes)
    assert(AudioPcm.decode(b24).isEmpty) // outside the decode profile
    assert(AudioMeta.sniff(b24).nonEmpty) // but metadata still parses
  }

  test("audioPcmStats matches the builder byte formula end-to-end") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L)
    // textCol just feeds the JUNK/ANNO filler chunk — doc_id works
    val media = MM.syntheticAudio(spark, ids.toDF("doc_id"), "doc_id", "doc_id")
    val got = MM.audioPcmStats(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      val channels = 1 + math.floorMod(id * 17, 2).toInt
      val bits = 8 + 8 * math.floorMod(id * 13, 2).toInt
      val nFrames = (100 + math.floorMod(id * 29, 2000)).toInt
      val n = nFrames * channels
      val mult = if (id % 2 == 0) 31 else 37
      val samples = (0 until n).map { i =>
        if (bits == 8) {
          val u = (i * mult) & 0xff
          if (id % 2 == 0) u - 128 else if (u >= 128) u - 256 else u
        } else {
          val b0 = (2 * i * mult) & 0xff; val b1 = ((2 * i + 1) * mult) & 0xff
          val u = if (id % 2 == 0) b0 + 256 * b1 else 256 * b0 + b1
          if (u >= 32768) u - 65536 else u
        }
      }
      val r = got(id)
      assert(r.getString(1) == (if (id % 2 == 0) "wav" else "aiff"))
      assert(r.getLong(2) == n.toLong, s"id=$id n")
      assert(r.getLong(3) == samples.map(_.toLong).sum, s"id=$id sum")
      assert(r.getLong(4) == samples.map(s => math.abs(s.toLong)).max, s"id=$id peak")
      assert(r.getLong(5) == samples.map(s => s.toLong * s).sum, s"id=$id sumsq")
    }
  }
}
