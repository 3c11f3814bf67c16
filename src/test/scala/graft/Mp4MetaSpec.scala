package graft

import graft.multimodal.{Mp4Meta, Mp4Sample, Multimodal => MM}

/** MP4 / ISO-BMFF walk: golden parses of built files, the wire variants
  * (mvhd v1, co64, 64-bit largesize mdat), the stsc tail-chunk semantics,
  * offset correctness proven against the actual mdat bytes, and the
  * never-throw contract on truncation/garbage. The oracle queries
  * (q_media_mp4 / q_media_frames) cover the fixture-scale path.
  */
class Mp4MetaSpec extends SparkTestBase {

  private def build(nSamples: Int = 10, withAudio: Boolean = true,
                    largeMdat: Boolean = false, mvhdV1: Boolean = false,
                    useCo64: Boolean = false): Array[Byte] =
    Mp4Meta.makeMp4(timescale = 1000, nSamples = nSamples, sampleDelta = 40,
      width = 640, height = 480, videoCodec = "avc1", withAudio = withAudio,
      sizeOf = i => 100 + 7 * i, fillOf = i => (11 * i) % 251,
      largeMdat = largeMdat, mvhdV1 = mvhdV1, useCo64 = useCo64)

  test("sniff recovers brand, timing, tracks, dims, codecs") {
    val m = Mp4Meta.sniff(build()).get
    assert(m.brand == "isom")
    assert(m.timescale == 1000L && m.durationMs == 400L) // 10 x 40 ticks @1000
    assert(m.nTracks == 2)
    assert(m.width.contains(640) && m.height.contains(480))
    assert(m.videoCodec.contains("avc1") && m.audioCodec.contains("mp4a"))
    val solo = Mp4Meta.sniff(build(withAudio = false)).get
    assert(solo.nTracks == 1 && solo.audioCodec.isEmpty)
  }

  test("wire variants parse identically: mvhd v1, co64, largesize mdat") {
    val base = Mp4Meta.sniff(build()).get
    for (b <- Seq(build(largeMdat = true), build(mvhdV1 = true),
        build(useCo64 = true),
        build(largeMdat = true, mvhdV1 = true, useCo64 = true))) {
      val m = Mp4Meta.sniff(b).get
      assert(m.copy() == base, "variant must sniff identically")
      assert(Mp4Meta.videoSamples(b).get.map(s => (s.idx, s.dts, s.size)) ==
        Mp4Meta.videoSamples(build()).get.map(s => (s.idx, s.dts, s.size)))
    }
  }

  test("videoSamples: dts run-length, sizes, chunk-resolved offsets hit the real bytes") {
    val b = build(nSamples = 10) // chunks of 4,4,2 -> multi-entry stsc
    val ss = Mp4Meta.videoSamples(b).get
    assert(ss.length == 10)
    assert(ss.map(_.idx) == (0 until 10).toVector)
    assert(ss.map(_.dts) == (0 until 10).map(_ * 40L).toVector)
    assert(ss.map(_.size) == (0 until 10).map(100 + 7 * _).toVector)
    // samples are contiguous within AND across these chunks (builder packs
    // them back to back), and every resolved byte equals the known fill
    ss.sliding(2).foreach { w =>
      assert(w(0).offset + w(0).size == w(1).offset)
    }
    ss.foreach { s =>
      (s.offset until s.offset + s.size).foreach { p =>
        assert((b(p.toInt) & 0xff) == (11 * s.idx) % 251)
      }
    }
  }

  test("largesize mdat shifts offsets by the 8 extra header bytes") {
    val small = Mp4Meta.videoSamples(build()).get.head.offset
    val large = Mp4Meta.videoSamples(build(largeMdat = true)).get.head.offset
    assert(large == small + 8)
    // ...and the fill bytes still line up at the shifted offsets
    val b = build(largeMdat = true)
    val s0 = Mp4Meta.videoSamples(b).get.head
    assert((b(s0.offset.toInt) & 0xff) == 0)
  }

  test("size==0 final box (to-end-of-file) is legal") {
    val b = build()
    // moov is the last top-level box; rewrite its u32 size to 0
    val moovAt = {
      var p = 0; var at = -1
      while (p + 8 <= b.length) {
        val sz = ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
        if (new String(b, p + 4, 4, "US-ASCII") == "moov") at = p
        p += sz.toInt
      }
      at
    }
    assert(moovAt > 0)
    val patched = b.clone()
    patched(moovAt) = 0; patched(moovAt + 1) = 0
    patched(moovAt + 2) = 0; patched(moovAt + 3) = 0
    assert(Mp4Meta.sniff(patched) == Mp4Meta.sniff(b))
  }

  test("never throws: every truncation, garbage, undersized box") {
    val b = build()
    (0 until b.length).foreach { n =>
      Mp4Meta.sniff(java.util.Arrays.copyOf(b, n)) // must not throw
      Mp4Meta.videoSamples(java.util.Arrays.copyOf(b, n))
    }
    assert(Mp4Meta.sniff(java.util.Arrays.copyOf(b, b.length - 1)).isEmpty)
    assert(Mp4Meta.sniff(Array.tabulate[Byte](300)(i => (i * 17).toByte)).isEmpty)
    assert(Mp4Meta.sniff(null).isEmpty && Mp4Meta.videoSamples(null).isEmpty)
    // a box claiming size 5 (< header) must refuse, not loop or throw
    val bad = b.clone(); bad(3) = 5
    assert(Mp4Meta.sniff(bad).isEmpty)
  }

  test("synthetic corpus round-trips through the Spark ops") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir).limit(40)
    val media = MM.syntheticMp4(spark, docs, "doc_id")
    val dims = MM.mp4Dims(spark, media).collect().map(r =>
      r.getLong(0) -> r).toMap
    dims.foreach { case (id, r) =>
      val ts = Array(600, 1000, 90000, 48000)((id * 7 % 4).toInt)
      val n = 5 + id * 31 % 20
      assert(r.getString(1) == "isom")
      assert(r.getLong(2) == ts)
      assert(r.getLong(3) == n * (ts / 25) * 1000 / ts)
      assert(r.getInt(4) == (if (id % 3 == 0) 1 else 2))
      assert(r.getInt(5) == 16 * (4 + id * 13 % 117).toInt)
    }
    val frames = MM.mp4FrameSamples(spark, media, stride = 3)
    val f = frames.filter(col("id") === 1 && col("sample_idx") === 3)
      .head()
    // id=1: size = 100+(1+21)%155 = 122, fill = (1+33)%251 = 34
    assert(f.getLong(4) == 122L && f.getLong(5) == 122L * 34)
  }
}
