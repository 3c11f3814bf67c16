package graft.multimodal

import java.io.ByteArrayOutputStream

/** Sniffed container metadata for one MP4/ISO-BMFF payload. */
case class Mp4Info(brand: String, timescale: Long, durationMs: Long,
                   nTracks: Int, width: Option[Int], height: Option[Int],
                   videoCodec: Option[String], audioCodec: Option[String])

/** One sample (frame) resolved from the sample tables: index in decode
  * order, decode timestamp in media-timescale units, absolute byte
  * offset in the file, and byte size.
  */
case class Mp4Sample(idx: Int, dts: Long, offset: Long, size: Int)

/** Byte-level MP4 / ISO Base Media File Format parsing — the VIDEO leg of
  * the multimodal surface, same contract as [[ImageMeta]]/[[AudioMeta]]:
  * real container metadata from the binary column, no native decoders,
  * everything from the public spec (ISO/IEC 14496-12).
  *
  * The format is a TREE of boxes `<u32be size> <4cc type> <payload>`,
  * with two escapes naive readers break on: `size == 1` means the real
  * length follows as a u64 ("largesize", required for >4 GiB `mdat` —
  * the normal case at crawl scale), and `size == 0` means "to end of
  * file" (legal only for the last top-level box). Container boxes
  * (`moov`, `trak`, `mdia`, `minf`, `stbl`, `dinf`) hold child boxes;
  * unknown boxes are SKIPPED by size, which is how the format versions
  * forward — a reader that whitelists offsets breaks on the first
  * in-the-wild file.
  *
  * Metadata surfaced: `ftyp` major brand, `mvhd` timescale + duration
  * (version 0 u32s / version 1 u64s — both real), per-`trak` handler
  * type from `hdlr`, visual width/height from `tkhd` (stored 16.16
  * fixed-point), first sample-entry fourcc from `stsd` (the codec id:
  * avc1/hev1/vp09/av01/mp4a...).
  *
  * [[videoSamples]] additionally walks the four sample tables the way a
  * frame-sampler must: `stts` (run-length decode times) expanded to
  * per-sample DTS, `stsz` per-sample byte sizes, and the `stsc`
  * chunk-map × `stco`/`co64` chunk offsets joined to place every sample
  * at an ABSOLUTE byte range — within a chunk, sample k starts where
  * sample k−1 ended. This is the real plumbing of "frame-sample the
  * video column": at 100 TB you never decode whole files, you resolve
  * byte ranges for every k-th frame and fetch only those.
  *
  * Truncated or corrupt payloads return None — never throw — because at
  * 100 TB a crawl batch always contains garbage and one bad byte must
  * not kill a task (the [[AudioMeta]] contract). The reference treated
  * all large objects as opaque tagged blobs (lib/disco/ddfs.py — DDFS
  * blobs); this surfaces the structure a training pipeline needs while
  * keeping the coded stream opaque.
  */
object Mp4Meta {

  // ---------------------------------------------------------------- parse

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i < 0 || i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")
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

  /** One parsed box: payload [start, end). */
  private case class Box(tpe: String, start: Int, end: Int)

  /** Child boxes of [from, to) — None on any malformed header (short
    * header, size below header length, size past the parent end).
    */
  private def children(b: Array[Byte], from: Int, to: Int): Option[List[Box]] = {
    val out = List.newBuilder[Box]
    var p = from
    while (p < to) {
      if (p + 8 > to) return None
      val size32 = be32(b, p)
      val tpe = fourcc(b, p + 4)
      var header = 8L
      var size = size32
      if (size32 == 1L) { // largesize follows as u64
        if (p + 16 > to) return None
        size = be64(b, p + 8)
        header = 16L
      } else if (size32 == 0L) { // to end of parent
        size = (to - p).toLong
      }
      if (size < header || p + size > to) return None
      out += Box(tpe, (p + header).toInt, (p + size).toInt)
      p = (p + size).toInt
    }
    Some(out.result())
  }

  private def find(bs: List[Box], tpe: String): Option[Box] =
    bs.find(_.tpe == tpe)

  /** mvhd/mdhd share the layout prefix: version byte selects u32 (v0) or
    * u64 (v1) creation/modification/duration with a u32 timescale between.
    * Returns (timescale, duration).
    */
  private def timescaleDuration(b: Array[Byte], x: Box): Option[(Long, Long)] = {
    if (x.end - x.start < 20) return None
    b(x.start) & 0xff match {
      case 0 =>
        Some((be32(b, x.start + 12), be32(b, x.start + 16)))
      case 1 =>
        if (x.end - x.start < 32) None
        else Some((be32(b, x.start + 20), be64(b, x.start + 24)))
      case _ => None
    }
  }

  /** tkhd width/height: the LAST 8 payload bytes in both versions, stored
    * 16.16 fixed-point.
    */
  private def tkhdDims(b: Array[Byte], x: Box): Option[(Int, Int)] = {
    if (x.end - x.start < 84) return None
    val w = be32(b, x.end - 8) >> 16
    val h = be32(b, x.end - 4) >> 16
    Some((w.toInt, h.toInt))
  }

  private def hdlrType(b: Array[Byte], x: Box): Option[String] =
    if (x.end - x.start < 12) None else Some(fourcc(b, x.start + 8))

  private def stsdFourcc(b: Array[Byte], x: Box): Option[String] = {
    // version/flags + entry_count, then the first sample entry's own
    // size + fourcc header.
    if (x.end - x.start < 16 || be32(b, x.start + 4) < 1) None
    else Some(fourcc(b, x.start + 12))
  }

  /** The stbl box of one trak, with its media handler type. */
  private def trakParts(b: Array[Byte], trak: Box)
    : Option[(String, Box, List[Box])] = for {
    tk <- children(b, trak.start, trak.end)
    mdia <- find(tk, "mdia")
    mk <- children(b, mdia.start, mdia.end)
    hdlr <- find(mk, "hdlr")
    handler <- hdlrType(b, hdlr)
    minf <- find(mk, "minf")
    nk <- children(b, minf.start, minf.end)
    stbl <- find(nk, "stbl")
    sk <- children(b, stbl.start, stbl.end)
  } yield (handler, stbl, sk)

  def sniff(b: Array[Byte]): Option[Mp4Info] = {
    if (b == null || b.length < 24) return None
    try {
      val top = children(b, 0, b.length).getOrElse(return None)
      val ftyp = find(top, "ftyp").getOrElse(return None)
      if (ftyp.end - ftyp.start < 8) return None
      val brand = fourcc(b, ftyp.start)
      val moov = find(top, "moov").getOrElse(return None)
      val mk = children(b, moov.start, moov.end).getOrElse(return None)
      val mvhd = find(mk, "mvhd").getOrElse(return None)
      val (ts, dur) = timescaleDuration(b, mvhd).getOrElse(return None)
      if (ts <= 0) return None
      val traks = mk.filter(_.tpe == "trak")
      var w: Option[Int] = None; var h: Option[Int] = None
      var vc: Option[String] = None; var ac: Option[String] = None
      traks.foreach { t =>
        trakParts(b, t).foreach { case (handler, _, sk) =>
          val codec = find(sk, "stsd").flatMap(stsdFourcc(b, _))
          if (handler == "vide" && vc.isEmpty) {
            vc = codec
            children(b, t.start, t.end)
              .flatMap(find(_, "tkhd")).flatMap(tkhdDims(b, _))
              .foreach { case (ww, hh) => w = Some(ww); h = Some(hh) }
          } else if (handler == "soun" && ac.isEmpty) ac = codec
        }
      }
      Some(Mp4Info(brand, ts, dur * 1000L / ts, traks.size, w, h, vc, ac))
    } catch { case _: Exception => None }
  }

  /** Per-sample (dts, absolute offset, size) of the FIRST video track,
    * decode order — the stts/stsz/stsc/stco join described in the object
    * doc. None when there is no video track or any table is malformed or
    * inconsistent (the chunk map must place exactly stsz's sample count).
    */
  def videoSamples(b: Array[Byte]): Option[Vector[Mp4Sample]] = {
    if (b == null || b.length < 24) return None
    try {
      val top = children(b, 0, b.length).getOrElse(return None)
      val moov = find(top, "moov").getOrElse(return None)
      val mk = children(b, moov.start, moov.end).getOrElse(return None)
      val video = mk.filter(_.tpe == "trak")
        .flatMap(trakParts(b, _)).find(_._1 == "vide").getOrElse(return None)
      val sk = video._3

      // stts → per-sample DTS
      val stts = find(sk, "stts").getOrElse(return None)
      val nTimeEntries = be32(b, stts.start + 4).toInt
      if (stts.end - stts.start < 8 + 8L * nTimeEntries) return None
      val dts = Vector.newBuilder[Long]
      var t = 0L; var e = 0
      while (e < nTimeEntries) {
        val cnt = be32(b, stts.start + 8 + 8 * e).toInt
        val delta = be32(b, stts.start + 12 + 8 * e)
        var k = 0
        while (k < cnt) { dts += t; t += delta; k += 1 }
        e += 1
      }
      val times = dts.result()

      // stsz → sizes (uniform-size form when sample_size != 0)
      val stsz = find(sk, "stsz").getOrElse(return None)
      if (stsz.end - stsz.start < 12) return None
      val uniform = be32(b, stsz.start + 4)
      val n = be32(b, stsz.start + 8).toInt
      if (n != times.length) return None
      val sizes: Int => Int =
        if (uniform != 0L) _ => uniform.toInt
        else {
          if (stsz.end - stsz.start < 12 + 4L * n) return None
          i => be32(b, stsz.start + 12 + 4 * i).toInt
        }

      // stsc entries: (firstChunk, samplesPerChunk)
      val stsc = find(sk, "stsc").getOrElse(return None)
      val nMap = be32(b, stsc.start + 4).toInt
      if (nMap < 1 || stsc.end - stsc.start < 8 + 12L * nMap) return None
      val mapEntries = Array.tabulate(nMap) { i =>
        (be32(b, stsc.start + 8 + 12 * i).toInt,
          be32(b, stsc.start + 12 + 12 * i).toInt)
      }

      // stco (u32) or co64 (u64) chunk offsets
      val offsets: Array[Long] = find(sk, "stco") match {
        case Some(stco) =>
          val c = be32(b, stco.start + 4).toInt
          if (stco.end - stco.start < 8 + 4L * c) return None
          Array.tabulate(c)(i => be32(b, stco.start + 8 + 4 * i))
        case None =>
          val co64 = find(sk, "co64").getOrElse(return None)
          val c = be32(b, co64.start + 4).toInt
          if (co64.end - co64.start < 8 + 8L * c) return None
          Array.tabulate(c)(i => be64(b, co64.start + 8 + 8 * i))
      }

      // chunk map × offsets → absolute per-sample ranges
      val out = Vector.newBuilder[Mp4Sample]
      var sample = 0
      var chunk = 0
      while (chunk < offsets.length && sample < n) {
        // the stsc entry governing chunk (1-based) is the last one whose
        // firstChunk <= chunk
        var spc = mapEntries(0)._2
        var m = 0
        while (m < nMap && mapEntries(m)._1 <= chunk + 1) {
          spc = mapEntries(m)._2; m += 1
        }
        var off = offsets(chunk)
        var k = 0
        while (k < spc && sample < n) {
          val sz = sizes(sample)
          if (sz < 0 || off < 0 || off + sz > b.length) return None
          out += Mp4Sample(sample, times(sample), off, sz)
          off += sz; sample += 1; k += 1
        }
        chunk += 1
      }
      if (sample != n) return None // chunk map failed to place every sample
      Some(out.result())
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------- build

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc: $s")
    s.getBytes("US-ASCII")
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = cat(parts: _*)
    cat(u32(8L + payload.length), fcc(tpe), payload)
  }
  private def full(tpe: String, version: Int, flags: Int,
                   parts: Array[Byte]*): Array[Byte] =
    box(tpe, cat(Array(version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte), cat(parts: _*)))

  private val unityMatrix: Array[Byte] = cat(
    u32(0x00010000L), u32(0), u32(0),
    u32(0), u32(0x00010000L), u32(0),
    u32(0), u32(0), u32(0x40000000L))

  private def u64(v: Long): Array[Byte] = cat(u32(v >>> 32), u32(v & 0xffffffffL))

  private def mvhd(timescale: Int, duration: Long, nextTrack: Int,
                   v1: Boolean) =
    full("mvhd", if (v1) 1 else 0, 0,
      if (v1) cat(u64(0), u64(0), u32(timescale), u64(duration))
      else cat(u32(0), u32(0), u32(timescale), u32(duration)),
      u32(0x00010000L), u16(0x0100),  // rate 1.0, volume 1.0
      u16(0), u32(0), u32(0),         // reserved
      unityMatrix,
      u32(0), u32(0), u32(0), u32(0), u32(0), u32(0), // pre_defined
      u32(nextTrack))

  private def tkhd(trackId: Int, duration: Long, w: Int, h: Int,
                   audio: Boolean) =
    full("tkhd", 0, 3,                // enabled | in-movie
      u32(0), u32(0), u32(trackId), u32(0), u32(duration),
      u32(0), u32(0),                 // reserved
      u16(0), u16(0),                 // layer, alternate_group
      u16(if (audio) 0x0100 else 0), u16(0),
      unityMatrix,
      u32(w.toLong << 16), u32(h.toLong << 16))

  private def mdhd(timescale: Int, duration: Long) =
    full("mdhd", 0, 0, u32(0), u32(0), u32(timescale), u32(duration),
      u16(0x55c4), u16(0))            // language 'und'

  private def hdlr(handler: String, name: String) =
    full("hdlr", 0, 0, u32(0), fcc(handler), u32(0), u32(0), u32(0),
      name.getBytes("US-ASCII"), Array(0.toByte))

  private def dinf: Array[Byte] =
    box("dinf", full("dref", 0, 0, u32(1), full("url ", 0, 1)))

  private def visualSampleEntry(codec: String, w: Int, h: Int) =
    box(codec,
      Array.fill[Byte](6)(0), u16(1),                 // reserved, dref idx
      u16(0), u16(0), u32(0), u32(0), u32(0),         // pre_defined/reserved
      u16(w), u16(h),
      u32(0x00480000L), u32(0x00480000L),             // 72 dpi
      u32(0), u16(1),                                 // reserved, frame_count
      Array.fill[Byte](32)(0),                        // compressorname
      u16(0x0018), u16(0xffff))                       // depth, pre_defined -1

  private def audioSampleEntry(codec: String, sampleRate: Int) =
    box(codec,
      Array.fill[Byte](6)(0), u16(1),
      u32(0), u32(0),                                 // reserved
      u16(2), u16(16),                                // channels, samplesize
      u16(0), u16(0),                                 // pre_defined, reserved
      u32(sampleRate.toLong << 16))

  /** stsc entries for `n` samples at `spc` per chunk: one run of full
    * chunks plus (when n % spc != 0) a second entry for the short tail
    * chunk — multi-entry maps are the common real-file shape and force
    * readers to honor the firstChunk run-length semantics.
    */
  private def stscEntries(n: Int, spc: Int): Array[(Int, Int)] = {
    val fullChunks = n / spc
    val rem = n % spc
    if (fullChunks == 0) Array((1, rem))
    else if (rem == 0) Array((1, spc))
    else Array((1, spc), (fullChunks + 1, rem))
  }

  private def stbl(codecEntry: Array[Byte], nSamples: Int, delta: Int,
                   sizes: Array[Int], spc: Int,
                   chunkOffsets: Array[Long], co64: Boolean) =
    box("stbl",
      full("stsd", 0, 0, u32(1), codecEntry),
      full("stts", 0, 0, u32(1), u32(nSamples), u32(delta)),
      full("stsc", 0, 0, u32(stscEntries(nSamples, spc).length),
        cat(stscEntries(nSamples, spc).map { case (f, s) =>
          cat(u32(f), u32(s), u32(1))
        }: _*)),
      full("stsz", 0, 0, u32(0), u32(nSamples),
        cat(sizes.map(s => u32(s.toLong)): _*)),
      if (co64) full("co64", 0, 0, u32(chunkOffsets.length),
        cat(chunkOffsets.map(u64): _*))
      else full("stco", 0, 0, u32(chunkOffsets.length),
        cat(chunkOffsets.map(u32): _*)))

  /** Minimal spec-correct MP4, `ftyp` + `mdat` + `moov` — mdat BEFORE
    * moov (the legal non-faststart layout) so chunk offsets are known
    * when the sample tables are written. Video sample i carries
    * `sizeOf(i)` bytes all equal to `fillOf(i)`; `largeMdat` writes the
    * mdat length as a 64-bit largesize. An optional `free` box precedes
    * moov so readers must skip unknown boxes.
    */
  def makeMp4(timescale: Int, nSamples: Int, sampleDelta: Int,
              width: Int, height: Int, videoCodec: String,
              withAudio: Boolean, sizeOf: Int => Int, fillOf: Int => Int,
              samplesPerChunk: Int = 4,
              largeMdat: Boolean = false,
              mvhdV1: Boolean = false,
              useCo64: Boolean = false): Array[Byte] = {
    require(timescale > 0 && nSamples >= 1 && sampleDelta > 0 &&
      samplesPerChunk >= 1 && width > 0 && height > 0,
      s"mp4 params: ts=$timescale n=$nSamples d=$sampleDelta spc=$samplesPerChunk")
    val sizes = Array.tabulate(nSamples)(sizeOf)
    val duration = nSamples.toLong * sampleDelta
    val nAudio = 4
    val audioBytes = 32

    val ftyp = box("ftyp", fcc("isom"), u32(0x200), fcc("isom"), fcc("mp42"))
    val mdatHeader = if (largeMdat) 16 else 8
    val payloadStart = ftyp.length.toLong + mdatHeader

    // video chunk offsets: contiguous samples grouped spc per chunk
    val nChunks = (nSamples + samplesPerChunk - 1) / samplesPerChunk
    val videoOffsets = new Array[Long](nChunks)
    var off = payloadStart
    var i = 0
    while (i < nSamples) {
      if (i % samplesPerChunk == 0) videoOffsets(i / samplesPerChunk) = off
      off += sizes(i)
      i += 1
    }
    val audioOffset = off // one audio chunk after all video bytes

    val mdatPayload = new ByteArrayOutputStream()
    i = 0
    while (i < nSamples) {
      val fill = fillOf(i)
      var k = 0
      while (k < sizes(i)) { mdatPayload.write(fill); k += 1 }
      i += 1
    }
    if (withAudio) {
      var k = 0
      while (k < nAudio * audioBytes) { mdatPayload.write((k * 7) & 0xff); k += 1 }
    }
    val mdatBody = mdatPayload.toByteArray
    val mdat =
      if (largeMdat)
        cat(u32(1), fcc("mdat"),
          u32((16L + mdatBody.length) >> 32),
          u32((16L + mdatBody.length) & 0xffffffffL), mdatBody)
      else cat(u32(8L + mdatBody.length), fcc("mdat"), mdatBody)

    val videoTrak = box("trak",
      tkhd(1, duration, width, height, audio = false),
      box("mdia",
        mdhd(timescale, duration),
        hdlr("vide", "VideoHandler"),
        box("minf",
          full("vmhd", 0, 1, u16(0), u16(0), u16(0), u16(0)),
          dinf,
          stbl(visualSampleEntry(videoCodec, width, height),
            nSamples, sampleDelta, sizes, samplesPerChunk, videoOffsets,
            useCo64))))

    val audioTrak = if (!withAudio) Array.emptyByteArray else box("trak",
      tkhd(2, duration, 0, 0, audio = true),
      box("mdia",
        mdhd(timescale, duration),
        hdlr("soun", "SoundHandler"),
        box("minf",
          full("smhd", 0, 0, u16(0), u16(0)),
          dinf,
          stbl(audioSampleEntry("mp4a", 44100),
            nAudio, (duration / nAudio).toInt.max(1),
            Array.fill(nAudio)(audioBytes), nAudio, Array(audioOffset),
            co64 = false))))

    val moov = box("moov",
      mvhd(timescale, duration, if (withAudio) 3 else 2, mvhdV1),
      videoTrak, audioTrak)

    cat(ftyp, mdat, box("free", "skip me".getBytes("US-ASCII")), moov)
  }
}
