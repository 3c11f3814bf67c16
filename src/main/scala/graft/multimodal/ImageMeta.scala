package graft.multimodal

import java.util.zip.CRC32

/** Sniffed container metadata for one image payload. */
case class ImageInfo(format: String, width: Int, height: Int)

/** Byte-level image container parsing — REAL format metadata extraction
  * over opaque `binary` columns, no native decoders. Everything here works
  * from the public format specifications:
  *
  *  - PNG (RFC 2083 / W3C): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *    first chunk must be IHDR; width/height are big-endian u32 at payload
  *    offsets 16–19 / 20–23.
  *  - GIF (GIF87a/89a spec): 6-byte version header, then the Logical
  *    Screen Descriptor: width/height little-endian u16 at offsets 6–7 /
  *    8–9.
  *  - BMP (Windows BITMAPINFOHEADER / OS2 BITMAPCOREHEADER): `BM`, 14-byte
  *    file header, then the DIB header whose leading u32 is its own size —
  *    40+ ⇒ s32le width at 18, s32le height at 22 (negative = top-down ⇒
  *    abs); 12 ⇒ u16le width at 18, u16le height at 20.
  *  - JPEG (ITU T.81): `FF D8`, then a marker SCAN — segments are
  *    `FF <marker> <u16be len>`; dimensions live in the frame header (SOF0,
  *    SOF1, SOF2, … — every 0xC0–0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC):
  *    `len(2) precision(1) height(u16be) width(u16be)`. Fixed offsets do
  *    NOT work for JPEG: APPn/COM segments of arbitrary length precede the
  *    frame header, so the scan is mandatory.
  *
  * Truncated or corrupt payloads return None — never throw — because at
  * 100 TB a crawl batch always contains garbage and one bad byte must not
  * kill a task. The parse touches only the leading bytes it needs; the
  * payload column stays opaque and column-pruned unless selected.
  *
  * The reference treats all blobs as opaque DDFS bytes (SURVEY §1.3); this
  * surface is the builder-brief "multimodal columns" extension on top.
  */
object ImageMeta {

  /** Magic-byte dispatch: format + dimensions, or None for anything that
    * is not a recognizable complete header.
    */
  def sniff(b: Array[Byte]): Option[ImageInfo] = {
    if (b == null || b.length < 2) return None
    (b(0) & 0xff, b(1) & 0xff) match {
      case (0x89, 0x50) => png(b)
      case (0x47, 0x49) => gif(b)
      case (0x42, 0x4d) => bmp(b)
      case (0xff, 0xd8) => jpeg(b)
      case _            => None
    }
  }

  // unsigned accessors with the caller responsible for bounds
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def png(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 24) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR: len(4) 'IHDR' w(4) h(4)
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) None else Some(ImageInfo("png", w, h))
  }

  private def gif(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 10) return None
    val v = new String(b, 0, 6, "US-ASCII")
    if (v != "GIF87a" && v != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageInfo("gif", w, h))
  }

  private def bmp(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 26) return None
    val dibSize = le32(b, 14)
    if (dibSize >= 40) {
      if (b.length < 30) return None
      val w = le32(b, 18); val h = math.abs(le32(b, 22)) // negative = top-down
      if (w <= 0 || h == 0) None else Some(ImageInfo("bmp", w, h))
    } else if (dibSize == 12) { // BITMAPCOREHEADER: u16 dims
      val w = le16(b, 18); val h = le16(b, 20)
      if (w <= 0 || h <= 0) None else Some(ImageInfo("bmp", w, h))
    } else None
  }

  private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    var i = 2 // past FF D8
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // FF fill bytes
      if (j >= b.length) return None
      val m = b(j) & 0xff
      if (m == 0xd9) return None                      // EOI before any SOF
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) // standalone markers
        i = j + 1
      else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (j + 7 >= b.length) return None
          val h = be16(b, j + 4) // marker(1) len(2) precision(1) → height
          val w = be16(b, j + 6)
          return if (w <= 0 || h <= 0) None else Some(ImageInfo("jpeg", w, h))
        }
        if (m == 0xda) return None // SOS without a frame header: corrupt
        i = j + 1 + len
      }
    }
    None
  }

  // ---- builders ----------------------------------------------------------
  // Spec-correct minimal files for synthesizing test corpora (the fixtures
  // carry no real media bytes). Container structure — signatures, chunk
  // framing, CRCs, marker segments — is valid per the specs above; the
  // pixel payload is opaque filler (nothing here claims pixel decode).

  /** Minimal PNG: signature + IHDR (with CRC) + one IDAT carrying `filler`
    * + IEND. 8-bit truecolor header fields.
    */
  def makePng(w: Int, h: Int, filler: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + filler.length)
    out.write(PngSig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len, 0, 4)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt((crc.getValue & 0xFFFFFFFFL).toInt).array(), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", filler)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal GIF89a: header + logical screen descriptor + a comment
    * extension carrying up to 255 bytes of `filler` + trailer.
    */
  def makeGif(w: Int, h: Int, filler: Array[Byte]): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff,
      s"gif dims are u16: ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(32 + filler.length)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0x00) // no global color table
    out.write(0x00) // background color index
    out.write(0x00) // pixel aspect ratio
    val com = filler.take(255)
    if (com.nonEmpty) {
      out.write(0x21); out.write(0xfe) // comment extension
      out.write(com.length); out.write(com, 0, com.length)
      out.write(0x00) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Minimal BMP: `BM` file header + BITMAPINFOHEADER (24bpp, BI_RGB) +
    * `filler` as the pixel-data section.
    */
  def makeBmp(w: Int, h: Int, filler: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + filler.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + filler.length) // file size
    bb.putShort(0).putShort(0)    // reserved
    bb.putInt(54)                 // pixel data offset
    bb.putInt(40)                 // BITMAPINFOHEADER size
    bb.putInt(w).putInt(h)
    bb.putShort(1)                // planes
    bb.putShort(24)               // bpp
    bb.putInt(0)                  // BI_RGB
    bb.putInt(filler.length)      // image size
    bb.putInt(0).putInt(0)        // ppm
    bb.putInt(0).putInt(0)        // palette
    bb.put(filler)
    bb.array()
  }

  /** Minimal JPEG: SOI + APP0/JFIF + a COM segment carrying `filler` (so
    * dimension extraction MUST marker-scan past a variable-length segment,
    * never read a fixed offset) + SOF0 + EOI.
    */
  def makeJpeg(w: Int, h: Int, filler: Array[Byte]): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff,
      s"jpeg dims are u16: ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(64 + filler.length)
    def marker(m: Int, data: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write(((data.length + 2) >> 8) & 0xff)
      out.write((data.length + 2) & 0xff)
      out.write(data, 0, data.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0, 1:1 aspect
    val com = filler.take(0xfff0)
    if (com.nonEmpty) marker(0xfe, com) // COM before the frame header
    marker(0xc0, Array[Byte](8, // precision
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      3, // components
      1, 0x22.toByte, 0, 2, 0x11.toByte, 1, 3, 0x11.toByte, 1))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
