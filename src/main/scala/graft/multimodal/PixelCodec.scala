package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A decoded raster: packed row-major top-down RGB, 3 bytes per pixel. */
case class PixelImage(format: String, width: Int, height: Int,
                      rgb: Array[Byte]) {
  def r(x: Int, y: Int): Int = rgb((y * width + x) * 3) & 0xff
  def g(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 1) & 0xff
  def b(x: Int, y: Int): Int = rgb((y * width + x) * 3 + 2) & 0xff
}

/** REAL pixel-level decode for the two formats a pure JVM can handle with
  * no native codecs — exactly the "uncompressed paths" a 100 TB crawl
  * pipeline can afford to open inline:
  *
  *  - BMP 24bpp BI_RGB (Windows BITMAPINFOHEADER): the pixel array is raw
  *    BGR rows, bottom-up (top-down when height < 0), each row padded to a
  *    4-byte boundary. No compression involved at all.
  *  - PNG 8-bit truecolor (RFC 2083 / W3C PNG spec): IDAT chunks carry a
  *    zlib stream (`java.util.zip.Inflater` speaks it natively); each
  *    decompressed scanline is `filter_byte + 3·width` bytes, and the five
  *    standard filters (None/Sub/Up/Average/Paeth) must be reversed per
  *    row. Chunk CRCs are verified so corruption is a deterministic None,
  *    not silently-wrong pixels.
  *
  * Both decoders return None on anything truncated, corrupt, or outside
  * the supported profile — at scale a batch always contains garbage and a
  * bad payload must not kill the task (same contract as [[ImageMeta]]).
  * The reference keeps all blobs opaque (DDFS bytes); this is the
  * builder-brief multimodal decode leg made real within the container's
  * means, replacing the previous payload-checksum stand-in.
  */
object PixelCodec {

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Magic-byte dispatch over the supported pixel-decodable profiles. */
  def decode(bytes: Array[Byte]): Option[PixelImage] = {
    if (bytes == null || bytes.length < 8) return None
    (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case (0x42, 0x4d) => decodeBmp(bytes)
      case (0x89, 0x50) => decodePng(bytes)
      case (0x47, 0x49) => decodeGif(bytes)
      case (0xff, 0xd8) => JpegCodec.decode(bytes)
      case _            => None
    }
  }

  // ---- BMP ----------------------------------------------------------------

  /** 24bpp BI_RGB BITMAPINFOHEADER profile; anything else → None. */
  def decodeBmp(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 54) return None
    if (b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    // guard dims before multiplying: a hostile header must not OOM the task
    if (w > (1 << 20) || h > (1 << 20) || w.toLong * h > (1L << 26)) return None
    val rowBytes = w * 3
    val stride = (rowBytes + 3) & ~3 // rows pad to 4-byte boundaries
    if (dataOffset < 54 || dataOffset.toLong + stride.toLong * h > b.length)
      return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // stored bottom-up unless height was negative
      val srcRow = dataOffset + stride * (if (topDown) y else h - 1 - y)
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3 // stored as BGR
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(PixelImage("bmp", w, h, rgb))
  }

  /** Real BMP with pixel content (vs [[ImageMeta.makeBmp]]'s opaque-filler
    * shell): 24bpp BI_RGB, bottom-up rows, 4-byte row padding.
    */
  def makeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} rgb bytes, got ${rgb.length}")
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(size).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
    val out = bb.array()
    var y = 0
    while (y < h) {
      val dstRow = 54 + stride * (h - 1 - y)
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PNG ----------------------------------------------------------------

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** 8-bit truecolor non-interlaced profile. Walks chunks (verifying each
    * CRC), concatenates IDAT, inflates the zlib stream, reverses per-row
    * filters.
    */
  def decodePng(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 45) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var sawIhdr = false
    var done = false
    while (!done) {
      if (pos + 8 > b.length) return None
      val len = be32(b, pos)
      if (len < 0 || pos + 12L + len > b.length) return None
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(b, pos + 4, 4 + len)
      if (((crc.getValue & 0xffffffffL).toInt) != be32(b, pos + 8 + len))
        return None // corrupt chunk: deterministic rejection, not bad pixels
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          val bitDepth = b(pos + 16) & 0xff
          val colorType = b(pos + 17) & 0xff
          val interlace = b(pos + 20) & 0xff
          if (bitDepth != 8 || colorType != 2 || interlace != 0) return None
          if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
              w.toLong * h > (1L << 26)) return None
          sawIhdr = true
        case "IDAT" => idat.write(b, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks are skippable by design
      }
      pos += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return None
    val stride = w * 3 + 1 // filter byte + RGB row
    val raw = new Array[Byte](stride * h)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    unfilter(raw, w, h).map(rgb => PixelImage("png", w, h, rgb))
  }

  /** Reverse the five PNG row filters (spec §6): each row's first byte
    * names the filter; predictors read the already-reconstructed left (a),
    * up (b), up-left (c) bytes at a 3-byte (bpp) lag.
    */
  private def unfilter(raw: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val stride = w * 3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val a = if (x >= 3) out(dst + x - 3) & 0xff else 0
        val bb = if (y > 0) out(dst - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= 3) out(dst - stride + x - 3) & 0xff else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + bb
          case 3 => cur + ((a + bb) / 2)
          case 4 => cur + paeth(a, bb, c)
          case _ => return None // undefined filter type: corrupt
        }
        out(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ---- GIF ----------------------------------------------------------------

  /** GIF87a/89a single-image decode with a FULL LZW decompressor
    * (variable code width 3..12 bits LSB-first, clear/end codes,
    * dictionary growth to 4096, the KwKwK self-reference case) — GIF is
    * lossless LZW over palette indices, squarely inside the "pure JVM
    * can afford to open inline" contract next to BMP and zlib PNG.
    * Profile: global or local color table, sequential AND interlaced row
    * order (the standard 8/8/4/2-offset four-pass scheme — ImageIO's own
    * writer interlaces by default, and the cross-validation spec decodes
    * its output), first image block (a multi-frame animation decodes its
    * first frame against the logical screen; pixels outside the frame
    * rectangle take palette entry 0). Missing palettes, out-of-range
    * codes, truncated sub-blocks, and oversized dimensions all return
    * None — the same garbage-tolerant contract as the other decoders.
    */
  def decodeGif(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 14) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    val sw = le16(b, 6)
    val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0 || sw > (1 << 20) || sh > (1 << 20) ||
        sw.toLong * sh > (1L << 26)) return None
    val packed = b(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + n * 3 > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
      pos += n * 3
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x21 => // extension block: label byte + data sub-blocks
          pos += 2
          while (pos < b.length && (b(pos) & 0xff) != 0)
            pos += 1 + (b(pos) & 0xff)
          if (pos >= b.length) return None
          pos += 1
        case 0x2c =>
          if (pos + 10 > b.length) return None
          val left = le16(b, pos + 1)
          val top = le16(b, pos + 3)
          val iw = le16(b, pos + 5)
          val ih = le16(b, pos + 7)
          val ip = b(pos + 9) & 0xff
          pos += 10
          val interlaced = (ip & 0x40) != 0
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + n * 3 > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
            pos += n * 3
          }
          if (pal == null) return None
          if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh) return None
          if (pos >= b.length) return None
          val minCode = b(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var ok = true
          while (ok && pos < b.length && (b(pos) & 0xff) != 0) {
            val n = b(pos) & 0xff
            if (pos + 1 + n > b.length) ok = false
            else { data.write(b, pos + 1, n); pos += 1 + n }
          }
          if (!ok || pos >= b.length) return None
          val raw = lzwDecode(data.toByteArray, minCode, iw * ih) match {
            case Some(ix) => ix
            case None     => return None
          }
          // interlaced streams store rows in four passes (offsets/steps
          // 0/8, 4/8, 2/4, 1/2); map stream row order back to raster rows
          val indices = if (!interlaced) raw else {
            val order = new Array[Int](ih)
            var k = 0
            for ((off, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                 y <- off until ih by step) { order(k) = y; k += 1 }
            val re = new Array[Byte](raw.length)
            var sy = 0
            while (sy < ih) {
              System.arraycopy(raw, sy * iw, re, order(sy) * iw, iw)
              sy += 1
            }
            re
          }
          val rgb = new Array[Byte](sw * sh * 3)
          // background = palette entry 0 wherever the frame doesn't cover
          if (left != 0 || top != 0 || iw != sw || ih != sh) {
            var p = 0
            while (p < sw * sh) {
              rgb(p * 3) = pal(0); rgb(p * 3 + 1) = pal(1); rgb(p * 3 + 2) = pal(2)
              p += 1
            }
          }
          var i = 0
          while (i < iw * ih) {
            val idx = indices(i) & 0xff
            if (idx * 3 + 2 >= pal.length) return None
            val d = ((top + i / iw) * sw + (left + i % iw)) * 3
            rgb(d) = pal(idx * 3); rgb(d + 1) = pal(idx * 3 + 1)
            rgb(d + 2) = pal(idx * 3 + 2)
            i += 1
          }
          return Some(PixelImage("gif", sw, sh, rgb))
        case 0x3b => return None // trailer before any image block
        case _    => return None
      }
    }
    None
  }

  /** GIF-variant LZW: codes read LSB-first at `minCode`+1 bits, widening
    * as the dictionary fills (cap 12 bits / 4096 entries), reset on the
    * CLEAR code. Returns exactly `expected` palette indices or None.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val MaxDict = 4096
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Byte](MaxDict)
    var dictSize = end + 1
    var codeSize = minCode + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        if ((data((bitPos + i) >> 3) & (1 << ((bitPos + i) & 7))) != 0)
          v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    val stack = new Array[Byte](MaxDict + 1)
    var prev = -1
    var prevFirst: Byte = 0
    while (outPos < expected) {
      val code = read()
      if (code < 0) return None
      if (code == clear) { dictSize = end + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == end) return None // stream ended short of expected
      else {
        // a composite code must already be in the dictionary, except the
        // KwKwK case (code == next entry, valid only mid-sequence)
        if (code > dictSize || (code == dictSize && prev < 0)) return None
        // (literal codes < clear need no range check here: palette-range
        // safety for emitted indices is enforced by decodeGif's
        // idx-vs-palette bound — round 9, removed a dead guard that
        // compared code < clear && code >= clear)
        var sp = 0
        var cur = if (code == dictSize) prev else code
        if (code == dictSize) { stack(sp) = prevFirst; sp += 1 }
        while (cur > end) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        if (cur == clear || cur == end) return None
        stack(sp) = cur.toByte; sp += 1
        val first = cur.toByte
        if (outPos + sp > expected) return None
        var i = sp - 1
        while (i >= 0) { out(outPos) = stack(i); outPos += 1; i -= 1 }
        if (prev >= 0 && dictSize < MaxDict) {
          prefix(dictSize) = prev; suffix(dictSize) = first; dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        prevFirst = first
      }
    }
    Some(out)
  }

  /** Real 8-bit GIF87a with a 256-entry GRAYSCALE palette (entry v =
    * (v,v,v)) — the fixture writer behind the GIF decode specs and the
    * `q_media_gif` corpus. Pixels are palette indices = gray values; the
    * LZW stream uses the classic fixed-width encoding (emit literal
    * codes at 9 bits, CLEAR before the decoder's dictionary would force
    * a width change) — valid LZW any decoder accepts, trivially correct
    * to produce, and it exercises the decoder's dictionary/reset paths.
    */
  def makeGif8(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w < 65536 && h < 65536, s"gif dims ${w}x$h")
    require(gray.length == w * h, s"need ${w * h} gray bytes, got ${gray.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0); out.write(0)
    var v = 0
    while (v < 256) { out.write(v); out.write(v); out.write(v); v += 1 }
    out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0)
    out.write(8) // LZW minimum code size
    // 9-bit codes, LSB-first; CLEAR(256) every 250 literals keeps the
    // decoder's dictionary below the 512-entry width bump
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nAcc
      nAcc += 9
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    emit(256)
    var i = 0
    while (i < gray.length) {
      emit(gray(i) & 0xff)
      i += 1
      if (i % 250 == 0 && i < gray.length) emit(256)
    }
    emit(257)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val lzw = bits.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Nearest-neighbor resize — the real pixel transform behind thumbnail /
    * hash pipelines, in PURE INTEGER arithmetic so any engine replays the
    * sampling exactly: destination pixel (x, y) reads source
    * (x·srcW / dstW, y·srcH / dstH), floor division. No filtering kernel —
    * deterministic and portable beats smooth for dedup fingerprints.
    */
  def resizeNearest(img: PixelImage, dstW: Int, dstH: Int): PixelImage = {
    require(dstW > 0 && dstH > 0, s"resize to ${dstW}x$dstH")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * img.height / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * img.width / dstW
        val s = (sy * img.width + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    PixelImage(img.format, dstW, dstH, out)
  }

  /** Bounded-box resize: scale so max(width, height) == maxDim (never
    * upscale), aspect preserved in integer arithmetic —
    * dstW = max(1, w·maxDim / max(w,h)).
    */
  def resizeToMax(img: PixelImage, maxDim: Int): PixelImage = {
    val m = math.max(img.width, img.height)
    if (m <= maxDim) img
    else resizeNearest(img,
      math.max(1, img.width * maxDim / m), math.max(1, img.height * maxDim / m))
  }

  /** Paeth predictor (PNG spec §6.6), exact integer form. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG with pixel content (vs [[ImageMeta.makePng]]'s filler IDAT):
    * 8-bit truecolor, one zlib stream, `filterFor(y)` picks each row's
    * filter type (0–4) so the decode path's de-filtering is genuinely
    * exercised, not just filter-0 identity.
    */
  def makePng24(w: Int, h: Int, rgb: Array[Byte],
                filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} rgb bytes, got ${rgb.length}")
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft outside [0,4]")
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val a = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= 3) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) / 2)
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) zOut.write(buf, 0, def_.deflate(buf))
    def_.end()
    val out = new java.io.ByteArrayOutputStream(64 + zOut.size())
    out.write(PngSig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt((crc.getValue & 0xffffffffL).toInt).array(), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
