package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AudioInfo, AudioMeta, ImageInfo, ImageMeta, Multimodal => MM}

/** Multimodal column plumbing: binary payloads + metadata, batched
  * decode/feature extraction (the mapInPandas shape), stub codec contracts.
  * The byte-level oracle queries (q_media_stats/q_media_hist) cover the
  * fixture-scale path.
  */
class MultimodalSpec extends SparkTestBase {

  test("asMedia wraps a table into (id, media_type, payload, meta)") {
    val m = MM.asMedia(graft.core.Tables.documents(spark, sfDir), "doc_id", "text")
    assert(m.columns.toSeq == Seq("id", "media_type", "payload", "meta"))
    val r = m.orderBy("id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[Map[String, String]]("meta")("src_col") == "text")
  }

  test("payload histogram counts every byte exactly once (incl. multi-byte UTF-8)") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "中文")).toDF("doc_id", "text") // CJK = 3 bytes each
    val f = MM.extractFeatures(spark, MM.asMedia(df, "doc_id", "text"))
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).nBytes == 3 && f(1L).hist.sum == 3)
    assert(f(1L).hist(1) == 3) // 'a','b','c' all in [64,128)
    assert(f(2L).nBytes == 6 && f(2L).hist.sum == 6) // byte-level, not codepoint
    // L1-normalized feature
    assert(math.abs(f(1L).feature.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("stub codec is deterministic and resize preserves aspect contract") {
    val d1 = MM.Codec.decode(7L, Array[Byte](1, 2, 3))
    val d2 = MM.Codec.decode(7L, Array[Byte](1, 2, 3))
    assert(d1 == d2)
    val r = MM.Codec.resizeMeta(d1.copy(width = 1000, height = 500), maxDim = 100)
    assert(r.width == 100 && r.height == 50)
  }

  test("frame sampling strides fixed-size slices") {
    val frames = MM.Codec.frameSample(Array.tabulate[Byte](100)(_.toByte),
      frameSize = 10, stride = 3)
    assert(frames.length == 4) // slices 0,3,6,9
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
  }

  test("decodeAll runs the codec per partition over the dataset") {
    val m = MM.asMedia(graft.core.Tables.documents(spark, sfDir), "doc_id", "text")
    val out = MM.decodeAll(spark, m)
    assert(out.count() == m.count())
    val first = out.orderBy("id").head()
    assert(first.width >= 16 && first.height >= 16)
  }

  // ---- real container parsing (ImageMeta) -------------------------------
  // Golden fixtures are written as EXPLICIT bytes from the public specs,
  // NOT via the builders — a symmetric builder/parser bug cannot pass.

  test("golden PNG: the canonical 1x1 IHDR bytes parse big-endian") {
    // standard 8-byte signature + IHDR chunk of a 1x1 RGBA PNG (incl. its
    // well-known CRC 1F 15 C4 89)
    val png = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    assert(ImageMeta.sniff(png).contains(ImageInfo("png", 1, 1)))
    // big-endian means width 256 is 00 00 01 00, NOT 00 01 00 00
    val png256 = png.clone()
    png256(16) = 0; png256(17) = 0; png256(18) = 1; png256(19) = 0
    assert(ImageMeta.sniff(png256).contains(ImageInfo("png", 256, 1)))
  }

  test("golden GIF: logical screen descriptor parses little-endian") {
    // GIF89a, width = 0x0102 = 258 (bytes 02 01), height = 0x012C = 300
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x02, 0x01, 0x2c, 0x01, 0x00, 0x00, 0x00, 0x3b).map(_.toByte)
    assert(ImageMeta.sniff(gif).contains(ImageInfo("gif", 258, 300)))
    // GIF87a is equally valid; other versions are not
    val gif87 = gif.clone(); gif87(4) = '7'.toByte
    assert(ImageMeta.sniff(gif87).contains(ImageInfo("gif", 258, 300)))
    val bad = gif.clone(); bad(4) = '6'.toByte
    assert(ImageMeta.sniff(bad).isEmpty)
  }

  test("golden BMP: BITMAPINFOHEADER dims, negative height = top-down") {
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0)
      .putInt(54).putInt(40).putInt(5).putInt(-7) // 5 wide, top-down 7 tall
      .putShort(1).putShort(24).putInt(0).putInt(0)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    assert(ImageMeta.sniff(bb.array()).contains(ImageInfo("bmp", 5, 7)))
  }

  test("golden JPEG: SOF dims found by marker scan, never a fixed offset") {
    def seg(m: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, m.toByte,
        (((data.length + 2) >> 8) & 0xff).toByte,
        ((data.length + 2) & 0xff).toByte) ++ data
    val sof = Array[Byte](8, 0x00, 0x20, 0x00, 0x40, 1, 1, 0x11, 0) // h=32 w=64
    val soi = Array(0xff.toByte, 0xd8.toByte)
    // two different APPn/COM prefixes of different lengths must both land
    // on the same SOF — proof the parser walks segments
    val short = soi ++ seg(0xe0, new Array[Byte](7)) ++ seg(0xc0, sof)
    val long = soi ++ seg(0xe1, new Array[Byte](91)) ++
      seg(0xfe, "a comment".getBytes) ++ seg(0xc2, sof) // progressive SOF2
    assert(ImageMeta.sniff(short).contains(ImageInfo("jpeg", 64, 32)))
    assert(ImageMeta.sniff(long).contains(ImageInfo("jpeg", 64, 32)))
    // DHT (C4) is NOT a frame header — its body must be skipped, not parsed
    val withDht = soi ++ seg(0xc4, new Array[Byte](19)) ++ seg(0xc0, sof)
    assert(ImageMeta.sniff(withDht).contains(ImageInfo("jpeg", 64, 32)))
  }

  test("truncated and corrupt payloads return None, never throw") {
    val good = ImageMeta.makePng(100, 50, "x".getBytes)
    for (cut <- Seq(0, 1, 7, 12, 20, 23)) // every prefix short of the dims
      assert(ImageMeta.sniff(good.take(cut)).isEmpty, s"cut=$cut")
    assert(ImageMeta.sniff(null).isEmpty)
    assert(ImageMeta.sniff(Array.emptyByteArray).isEmpty)
    assert(ImageMeta.sniff("not an image at all".getBytes).isEmpty)
    // JPEG that hits EOI/SOS before any SOF marker
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(ImageMeta.sniff(noSof).isEmpty)
    val sos = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x02).map(_.toByte)
    assert(ImageMeta.sniff(sos).isEmpty)
    // JPEG truncated mid-segment (declared length runs past the bytes)
    val trunc = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x60, 0x4a).map(_.toByte)
    assert(ImageMeta.sniff(trunc).isEmpty)
    // PNG whose first chunk is not IHDR
    val bad = ImageMeta.makePng(3, 3, Array.emptyByteArray)
    bad(12) = 'J'.toByte
    assert(ImageMeta.sniff(bad).isEmpty)
  }

  test("builders round-trip through sniff across formats and edge dims") {
    val filler = "opaque pixel stand-in".getBytes
    for ((w, h) <- Seq((1, 1), (16, 16), (2015, 1515), (65535, 65535))) {
      assert(ImageMeta.sniff(ImageMeta.makePng(w, h, filler))
        .contains(ImageInfo("png", w, h)))
      assert(ImageMeta.sniff(ImageMeta.makeGif(w, h, filler))
        .contains(ImageInfo("gif", w, h)))
      assert(ImageMeta.sniff(ImageMeta.makeBmp(w, h, filler))
        .contains(ImageInfo("bmp", w, h)))
      assert(ImageMeta.sniff(ImageMeta.makeJpeg(w, h, filler))
        .contains(ImageInfo("jpeg", w, h)))
    }
    // PNG dims are u32 — beyond the u16 formats
    assert(ImageMeta.sniff(ImageMeta.makePng(100000, 70000, filler))
      .contains(ImageInfo("png", 100000, 70000)))
  }

  test("imageDims extracts dims from the binary column; garbage maps to unknown") {
    import spark.implicits._
    val media = MM.syntheticImages(spark,
      graft.core.Tables.documents(spark, sfDir).limit(40), "doc_id", "text")
      .unionByName(Seq((999999L, "application/octet-stream",
        "definitely not an image".getBytes, Map("synthetic" -> "true")))
        .toDF("id", "media_type", "payload", "meta"))
    val dims = MM.imageDims(spark, media).collect().map(d => d.id -> d).toMap
    dims.values.filter(_.id != 999999L).foreach { d =>
      assert(d.format == Seq("png", "gif", "bmp", "jpeg")(
        math.floorMod(d.id, 4).toInt))
      assert(d.width.contains((16 + math.floorMod(d.id * 37, 2000)).toInt))
      assert(d.height.contains((16 + math.floorMod(d.id * 53, 1500)).toInt))
    }
    assert(dims(999999L).format == "unknown" && dims(999999L).width.isEmpty)
  }

  test("Codec.decode prefers real container dims over the fallback fake") {
    val png = ImageMeta.makePng(640, 360, "pixels".getBytes)
    val d = MM.Codec.decode(5L, png)
    assert(d.width == 640 && d.height == 360)
    // non-image payloads keep the deterministic fallback
    val f1 = MM.Codec.decode(5L, Array[Byte](1, 2, 3))
    val f2 = MM.Codec.decode(5L, Array[Byte](1, 2, 3))
    assert(f1 == f2)
  }

  test("golden WAV: canonical headerless-junk 44-byte layout parses little-endian") {
    // the textbook minimal PCM WAV: RIFF size 36+data, fmt 16 bytes,
    // 44100 Hz stereo 16-bit, 2 frames of data (8 bytes)
    val bb = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
    bb.put("data".getBytes).putInt(8).putLong(0x1122334455667788L)
    val got = AudioMeta.sniff(bb.array())
    assert(got.contains(AudioInfo("wav", 2, 44100, 16, 2L)))
  }

  test("golden AIFF: 80-bit extended float 44100 = 0x400E AC44…") {
    val enc = AudioMeta.intToExtended80(44100)
    assert((enc(0) & 0xff) == 0x40 && (enc(1) & 0xff) == 0x0e)
    assert((enc(2) & 0xff) == 0xac && (enc(3) & 0xff) == 0x44)
    assert(enc.drop(4).forall(_ == 0))
    // and the non-power-of-two rate 22050 round-trips through the builder
    val a = AudioMeta.makeAiff(1, 22050, 16, 5, "x".getBytes)
    assert(AudioMeta.sniff(a).contains(AudioInfo("aiff", 1, 22050, 16, 5L)))
  }

  test("audio builders round-trip through sniff across the parameter grid") {
    for (ch <- Seq(1, 2); rate <- Seq(8000, 22050, 44100);
         bits <- Seq(8, 16); n <- Seq(0, 1, 777)) {
      val w = AudioMeta.sniff(AudioMeta.makeWav(ch, rate, bits, n, "f".getBytes))
      assert(w.contains(AudioInfo("wav", ch, rate, bits, n.toLong)),
        s"wav ch=$ch rate=$rate bits=$bits n=$n -> $w")
      val a = AudioMeta.sniff(AudioMeta.makeAiff(ch, rate, bits, n, "f".getBytes))
      assert(a.contains(AudioInfo("aiff", ch, rate, bits, n.toLong)),
        s"aiff ch=$ch rate=$rate bits=$bits n=$n -> $a")
    }
  }

  test("golden MP3: the canonical FF FB 90 00 header parses by hand-checked arithmetic") {
    // hand-built, independent of makeMp3: MPEG-1 Layer III, 128 kbps
    // (bitrate index 9), 44100 Hz (index 0), no padding, stereo — frame
    // length = floor(144·128000/44100) = 417 bytes. Three frames.
    val frame = new Array[Byte](417)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
    frame(2) = 0x90.toByte; frame(3) = 0x00
    val bytes = frame ++ frame ++ frame
    val got = AudioMeta.sniff(bytes)
    assert(got.contains(AudioInfo("mp3", 2, 44100, 0, 3 * 1152L)), s"got $got")
    // with an ID3v2 prefix (syncsafe size 0x81 = 129-byte body)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 1, 1) ++
      new Array[Byte](129)
    assert(AudioMeta.sniff(id3 ++ bytes)
      .contains(AudioInfo("mp3", 2, 44100, 0, 3 * 1152L)))
  }

  test("MP3 builder round-trips through sniff across the parameter grid") {
    for (mpeg1 <- Seq(true, false); brIdx <- Seq(1, 9, 14);
         srIdx <- 0 to 2; mode <- Seq(0, 3); pad <- Seq(0, 1);
         n <- Seq(1, 5); id3 <- Seq(0, 37)) {
      val b = AudioMeta.makeMp3(mpeg1, brIdx, srIdx, mode, n, pad, id3)
      val spf = if (mpeg1) 1152L else 576L
      val sr = (if (mpeg1) Seq(44100, 48000, 32000)
                else Seq(22050, 24000, 16000))(srIdx)
      val got = AudioMeta.sniff(b)
      assert(got.contains(
        AudioInfo("mp3", if (mode == 3) 1 else 2, sr, 0, n * spf)),
        s"mpeg1=$mpeg1 br=$brIdx sr=$srIdx mode=$mode pad=$pad n=$n " +
          s"id3=$id3 -> $got")
    }
  }

  test("MP3 corruption: truncation, free/bad indices, mixed rates -> None") {
    val good = AudioMeta.makeMp3(mpeg1 = true, 9, 0, 0, 3, 0, 0)
    assert(AudioMeta.sniff(good).isDefined)
    // truncated mid-frame, mid-header, and one trailing junk byte
    for (cut <- Seq(3, 4, 100, good.length - 1))
      assert(AudioMeta.sniff(good.take(cut)).isEmpty, s"cut=$cut")
    assert(AudioMeta.sniff(good :+ 0x00.toByte).isEmpty,
      "trailing junk after the last frame must refuse")
    // free-format bitrate (index 0) and bad index (15)
    def patched(f: (Array[Byte]) => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    assert(AudioMeta.sniff(patched(b => b(2) = 0x00.toByte)).isEmpty) // free
    assert(AudioMeta.sniff(patched(b => b(2) = 0xf0.toByte)).isEmpty) // bad
    // reserved sample-rate index (3)
    assert(AudioMeta.sniff(patched(b => b(2) = (b(2) | 0x0c).toByte)).isEmpty)
    // reserved version (bits 01)
    assert(AudioMeta.sniff(patched(b => b(1) = 0xeb.toByte)).isEmpty)
    // mixed sample rates across the chain: rewrite the SECOND frame's
    // rate index (44100 -> 48000)
    val mixed = good.clone()
    mixed(417 + 2) = (mixed(417 + 2) | 0x04).toByte
    assert(AudioMeta.sniff(mixed).isEmpty)
  }

  test("truncated and corrupt audio payloads return None, never throw") {
    val wav = AudioMeta.makeWav(2, 44100, 16, 100, "junk".getBytes)
    val aiff = AudioMeta.makeAiff(2, 44100, 16, 100, "junk".getBytes)
    for (full <- Seq(wav, aiff); cut <- Seq(0, 4, 11, 12, 20, 40)) {
      assert(AudioMeta.sniff(full.take(cut)).isEmpty, s"cut=$cut")
    }
    // chunk size pointing past the end (truncated download) must bail
    val lying = wav.clone()
    val fmtAt = wav.indexOfSlice("fmt ".getBytes)
    lying(fmtAt + 4) = 0xff.toByte; lying(fmtAt + 5) = 0xff.toByte
    assert(AudioMeta.sniff(lying).isEmpty)
    assert(AudioMeta.sniff("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks at all
    assert(AudioMeta.sniff(Array.fill[Byte](64)(0x5a)).isEmpty)
  }

  test("audioDims extracts metadata from the binary column; garbage maps to unknown") {
    import spark.implicits._
    val media = MM.syntheticAudio(spark,
      graft.core.Tables.documents(spark, sfDir).limit(40), "doc_id", "text")
      .unionByName(Seq((999999L, "application/octet-stream",
        "definitely not audio".getBytes, Map("synthetic" -> "true")))
        .toDF("id", "media_type", "payload", "meta"))
    val dims = MM.audioDims(spark, media).collect().map(d => d.id -> d).toMap
    dims.values.filter(_.id != 999999L).foreach { d =>
      assert(d.format == (if (d.id % 2 == 0) "wav" else "aiff"))
      assert(d.channels.contains(1 + math.floorMod(d.id * 17, 2).toInt))
      assert(d.nFrames.contains(100 + math.floorMod(d.id * 29, 2000)))
      val rate = Seq(8000, 16000, 22050, 44100)(math.floorMod(d.id * 31, 4).toInt)
      assert(d.sampleRate.contains(rate))
      assert(d.durationMs.contains(d.nFrames.get * 1000L / rate))
    }
    assert(dims(999999L).format == "unknown" && dims(999999L).channels.isEmpty)
  }

  test("CDC chunking covers the payload exactly and re-syncs after an insert") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val body = Array.fill[Byte](20000)(rnd.nextInt(256).toByte)
    val shifted = Array.fill[Byte](37)(rnd.nextInt(256).toByte) ++ body
    val media = Seq((1L, body), (2L, shifted)).toDF("id", "payload")
    val chunks = MM.cdcChunks(spark, media, maskBits = 8,
      minChunk = 64, maxChunk = 2048).collect()

    // lossless coverage: contiguous, in order, sums to the payload length
    for ((id, len) <- Seq(1L -> body.length, 2L -> shifted.length)) {
      val cs = chunks.filter(_.id == id).sortBy(_.idx)
      assert(cs.map(_.nBytes.toLong).sum == len)
      assert(cs.head.offset == 0L)
      cs.sliding(2).foreach { case Array(a, b) =>
        assert(b.offset == a.offset + a.nBytes)
      case _ => }
    }
    // shift-resistance: a 37-byte prefix insert must NOT re-chunk the
    // whole file — the two versions share most segment fingerprints
    // (fixed-size splitting would share none)
    val f1 = chunks.filter(_.id == 1L).map(_.fp).toSet
    val f2 = chunks.filter(_.id == 2L).map(_.fp).toSet
    val shared = (f1 & f2).size.toDouble / f1.size
    assert(shared > 0.8, s"shared=$shared f1=${f1.size} f2=${f2.size}")
    // cross-file dedup is one groupBy(fp)
    val dup = MM.cdcChunks(spark, media, maskBits = 8, minChunk = 64,
      maxChunk = 2048).groupBy("fp").count().filter(col("count") > 1).count()
    assert(dup > 0)
  }
}
