package graft.multimodal

import java.io.ByteArrayOutputStream

/** Parsed EXIF metadata for one payload. `container` is "tiff" or
  * "jpeg"; byteOrder is the TIFF BOM ("II" little-endian / "MM"
  * big-endian). Absent tags are None.
  */
case class ExifInfo(container: String, byteOrder: String,
                    orientation: Option[Int], make: Option[String],
                    model: Option[String], dateTime: Option[String],
                    exposureDen: Option[Long], iso: Option[Int],
                    width: Option[Long], height: Option[Long])

/** Byte-level EXIF / TIFF-IFD parsing — the camera-metadata leg of the
  * multimodal surface, from the public specs (TIFF 6.0, Adobe 1992;
  * Exif 2.3, JEITA CP-3451): orientation, make/model, timestamps,
  * exposure, ISO, pixel dimensions — the fields an image-dedup or
  * provenance pipeline keys on without touching pixel data.
  *
  * TIFF is an offset-graph, not a stream: a 2-byte byte-order mark
  * ("II"=little, "MM"=big — BOTH orders are live in the wild and both
  * are exercised here), magic 42, then linked IFDs of 12-byte entries
  * `(tag u16, type u16, count u32, value-or-offset u32)`. A value is
  * INLINE when its byte size ≤ 4, otherwise the field holds an absolute
  * offset — the rule naive readers break on (a 2-char string is inline,
  * a 5-char one is not). The 0x8769 pointer tag links the Exif sub-IFD.
  * ASCII counts include the NUL terminator; RATIONAL is u32/u32.
  *
  * In JPEG, the same TIFF blob rides in an APP1 segment prefixed
  * "Exif\0\0" ([[fromJpeg]] walks the marker stream to it, skipping
  * unrelated APPn/COM segments, stopping at SOS). Truncated or corrupt
  * payloads return None — never throw (the [[AudioMeta]]/[[Mp4Meta]]
  * contract). Offsets are bounds-checked against the blob, so a
  * malicious offset cannot read out of range or loop.
  */
object ExifMeta {

  private final val TagMake = 0x010f
  private final val TagModel = 0x0110
  private final val TagOrientation = 0x0112
  private final val TagDateTime = 0x0132
  private final val TagExifPtr = 0x8769
  private final val TagExposure = 0x829a
  private final val TagIso = 0x8827
  private final val TagDateTimeOriginal = 0x9003
  private final val TagPixelX = 0xa002
  private final val TagPixelY = 0xa003

  // ---------------------------------------------------------------- parse

  /** One IFD entry's raw fields plus the blob it indexes into. */
  private case class Entry(tag: Int, tpe: Int, count: Long, at: Int)

  private class Reader(b: Array[Byte], le: Boolean) {
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private def typeSize(tpe: Int): Int = tpe match {
      case 1 | 2 | 7 => 1 // BYTE, ASCII, UNDEFINED
      case 3 => 2         // SHORT
      case 4 | 9 => 4     // LONG, SLONG
      case 5 | 10 => 8    // RATIONAL, SRATIONAL
      case _ => 0
    }

    /** Entries of the IFD at `off`, or Nil if malformed. */
    def ifd(off: Int): List[Entry] = {
      val n = u16(off)
      if (n <= 0 || off + 2 + 12 * n + 4 > b.length) return Nil
      (0 until n).toList.flatMap { k =>
        val e = off + 2 + 12 * k
        val tpe = u16(e + 2)
        val count = u32(e + 4)
        val sz = typeSize(tpe).toLong * count
        if (sz <= 0) None
        else {
          // inline when the value fits the 4-byte field, else offset
          val at = if (sz <= 4) e + 8 else u32(e + 8).toInt
          if (at < 0 || at + sz > b.length) None
          else Some(Entry(u16(e), tpe, count, at))
        }
      }
    }

    def short(e: Entry): Option[Int] =
      if (e.tpe == 3 && e.count >= 1) Some(u16(e.at)) else None
    def long(e: Entry): Option[Long] =
      if (e.tpe == 4 && e.count >= 1) Some(u32(e.at))
      else short(e).map(_.toLong)
    def ascii(e: Entry): Option[String] =
      if (e.tpe != 2) None
      else {
        val raw = new String(b, e.at, e.count.toInt, "US-ASCII")
        Some(raw.takeWhile(_ != '\u0000'))
      }
    def rationalDen(e: Entry): Option[Long] =
      if (e.tpe == 5 && e.count >= 1) Some(u32(e.at + 4)) else None
  }

  /** Parse a bare TIFF/EXIF blob (starting at the byte-order mark). */
  def fromTiff(b: Array[Byte]): Option[ExifInfo] = parseTiff(b, "tiff")

  private def parseTiff(b: Array[Byte], container: String): Option[ExifInfo] = {
    if (b == null || b.length < 8) return None
    try {
      val bom = new String(b, 0, 2, "US-ASCII")
      val le = bom match {
        case "II" => true
        case "MM" => false
        case _ => return None
      }
      val r = new Reader(b, le)
      if (r.u16(2) != 42) return None
      val ifd0 = r.ifd(r.u32(4).toInt)
      if (ifd0.isEmpty) return None
      def find(es: List[Entry], tag: Int) = es.find(_.tag == tag)
      val exifIfd = find(ifd0, TagExifPtr)
        .flatMap(r.long).map(o => r.ifd(o.toInt)).getOrElse(Nil)
      Some(ExifInfo(container, bom,
        find(ifd0, TagOrientation).flatMap(r.short),
        find(ifd0, TagMake).flatMap(r.ascii),
        find(ifd0, TagModel).flatMap(r.ascii),
        find(exifIfd, TagDateTimeOriginal).orElse(find(ifd0, TagDateTime))
          .flatMap(r.ascii),
        find(exifIfd, TagExposure).flatMap(r.rationalDen),
        find(exifIfd, TagIso).flatMap(r.short),
        find(exifIfd, TagPixelX).flatMap(r.long),
        find(exifIfd, TagPixelY).flatMap(r.long)))
    } catch { case _: Exception => None }
  }

  /** Walk a JPEG marker stream to the APP1 "Exif\0\0" segment and parse
    * the embedded TIFF blob. Skips other APPn/COM segments by length;
    * stops at SOS (entropy data follows) or EOI.
    */
  def fromJpeg(b: Array[Byte]): Option[ExifInfo] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try {
      var p = 2
      while (p + 4 <= b.length && (b(p) & 0xff) == 0xff) {
        val marker = b(p + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 8 &&
          new String(b, p + 4, 4, "US-ASCII") == "Exif" &&
          b(p + 8) == 0 && b(p + 9) == 0) {
          val tiff = java.util.Arrays.copyOfRange(b, p + 10, p + 2 + len)
          return parseTiff(tiff, "jpeg")
        }
        p += 2 + len
      }
      None
    } catch { case _: Exception => None }
  }

  /** Sniff either container. */
  def sniff(b: Array[Byte]): Option[ExifInfo] =
    if (b == null || b.length < 4) None
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) fromJpeg(b)
    else fromTiff(b)

  // ---------------------------------------------------------------- build

  /** One pending IFD entry: tag, type, count, value bytes (already in
    * the target byte order).
    */
  private case class Pending(tag: Int, tpe: Int, count: Int,
                             data: Array[Byte])

  private class Writer(le: Boolean) {
    def u16(v: Int): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    /** Serialize one IFD at absolute offset `ifdStart`: directory, then
      * out-of-line values; returns the full byte block.
      */
    def ifd(entries: List[Pending], ifdStart: Int): Array[Byte] = {
      val dirSize = 2 + 12 * entries.length + 4
      var valueOff = ifdStart + dirSize
      val dir = new ByteArrayOutputStream()
      val values = new ByteArrayOutputStream()
      dir.write(u16(entries.length))
      entries.foreach { e =>
        dir.write(u16(e.tag)); dir.write(u16(e.tpe))
        dir.write(u32(e.count.toLong))
        if (e.data.length <= 4) {
          dir.write(java.util.Arrays.copyOf(e.data, 4)) // zero-padded inline
        } else {
          dir.write(u32(valueOff.toLong))
          values.write(e.data)
          valueOff += e.data.length
        }
      }
      dir.write(u32(0)) // next-IFD: none
      dir.toByteArray ++ values.toByteArray
    }
  }

  /** Build a spec-correct EXIF TIFF blob: IFD0 (make, model, orientation,
    * datetime, Exif pointer) + Exif sub-IFD (exposure 1/exposureDen, ISO,
    * original datetime, pixel dims). Strings are out-of-line (NUL-counted),
    * orientation/ISO inline — both placements exercised by construction.
    */
  def makeExifTiff(le: Boolean, orientation: Int, make: String,
                   model: String, dateTime: String, exposureDen: Long,
                   iso: Int, width: Long, height: Long): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8 && exposureDen >= 1,
      s"exif params: o=$orientation d=$exposureDen")
    val w = new Writer(le)
    def asciiZ(s: String) = s.getBytes("US-ASCII") :+ 0.toByte
    val exifEntries = List(
      Pending(TagExposure, 5, 1, w.u32(1L) ++ w.u32(exposureDen)),
      Pending(TagIso, 3, 1, w.u16(iso)),
      Pending(TagDateTimeOriginal, 2, dateTime.length + 1, asciiZ(dateTime)),
      Pending(TagPixelX, 4, 1, w.u32(width)),
      Pending(TagPixelY, 4, 1, w.u32(height)))
    // IFD0 needs the Exif-IFD offset, which depends on IFD0's own size —
    // sizes are fixed by entry counts + value lengths, so compute first
    def blockSize(es: List[Pending]) =
      2 + 12 * es.length + 4 + es.map(e => if (e.data.length <= 4) 0 else e.data.length).sum
    val mk = asciiZ(make); val md = asciiZ(model); val dt = asciiZ(dateTime)
    val ifd0Proto = List(
      Pending(TagMake, 2, mk.length, mk),
      Pending(TagModel, 2, md.length, md),
      Pending(TagOrientation, 3, 1, w.u16(orientation)),
      Pending(TagDateTime, 2, dt.length, dt),
      Pending(TagExifPtr, 4, 1, w.u32(0))) // patched below
    val exifOff = 8 + blockSize(ifd0Proto)
    val ifd0 = ifd0Proto.map(e =>
      if (e.tag == TagExifPtr) e.copy(data = w.u32(exifOff.toLong)) else e)
    val header = (if (le) "II" else "MM").getBytes("US-ASCII") ++
      w.u16(42) ++ w.u32(8L)
    header ++ w.ifd(ifd0, 8) ++ w.ifd(exifEntries, exifOff)
  }

  /** Wrap a TIFF blob as a minimal JPEG: SOI + APP1 "Exif\0\0" + EOI. */
  def wrapJpeg(tiff: Array[Byte]): Array[Byte] = {
    val len = 2 + 6 + tiff.length
    require(len <= 0xffff, s"APP1 too large: $len")
    Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
      "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff ++
      Array(0xff.toByte, 0xd9.toByte)
  }
}
