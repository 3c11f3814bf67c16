package graft

import graft.multimodal.ExifMeta

/** EXIF / TIFF-IFD walk: golden parses in both byte orders, the
  * inline-vs-offset value rule, the JPEG APP1 marker walk with leading
  * unrelated segments, malicious-offset bounds, and the never-throw
  * contract. The oracle query (q_media_exif) covers the fixture-scale
  * path over both containers.
  */
class ExifMetaSpec extends SparkTestBase {

  private def build(le: Boolean) = ExifMeta.makeExifTiff(le,
    orientation = 6, make = "MakerX", model = "Cam42",
    dateTime = "2024:01:05 07:00:00", exposureDen = 250L, iso = 400,
    width = 1920L, height = 1080L)

  test("golden parse, both byte orders, bare TIFF and JPEG APP1") {
    for (le <- Seq(true, false)) {
      val tiff = ExifMeta.fromTiff(build(le)).get
      assert(tiff.container == "tiff")
      assert(tiff.byteOrder == (if (le) "II" else "MM"))
      assert(tiff.orientation.contains(6))
      assert(tiff.make.contains("MakerX") && tiff.model.contains("Cam42"))
      assert(tiff.dateTime.contains("2024:01:05 07:00:00"))
      assert(tiff.exposureDen.contains(250L) && tiff.iso.contains(400))
      assert(tiff.width.contains(1920L) && tiff.height.contains(1080L))
      val jpeg = ExifMeta.sniff(ExifMeta.wrapJpeg(build(le))).get
      assert(jpeg == tiff.copy(container = "jpeg"))
    }
  }

  test("short ASCII values take the inline path and still parse") {
    // "ab" + NUL = 3 bytes <= 4 -> lives INSIDE the 12-byte entry
    val b = ExifMeta.makeExifTiff(le = true, orientation = 1, make = "ab",
      model = "c", dateTime = "2024:01:01 00:00:00", exposureDen = 8L,
      iso = 100, width = 640L, height = 480L)
    val e = ExifMeta.fromTiff(b).get
    assert(e.make.contains("ab") && e.model.contains("c"))
    assert(e.dateTime.contains("2024:01:01 00:00:00")) // 20 bytes, offset path
  }

  test("APP1 is found behind unrelated leading segments") {
    val tiff = build(le = true)
    val app1Len = 2 + 6 + tiff.length
    val jfif = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte) // APP0
    val com = Array(0xff, 0xfe, 0x00, 0x05, 'h', 'i', '!').map(_.toByte)
    val b = Array(0xff.toByte, 0xd8.toByte) ++ jfif ++ com ++
      Array(0xff.toByte, 0xe1.toByte,
        ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++
      "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff ++
      Array(0xff.toByte, 0xd9.toByte)
    val e = ExifMeta.sniff(b).get
    assert(e.container == "jpeg" && e.iso.contains(400))
  }

  test("malicious value offset is bounds-checked, not read out of range") {
    val b = build(le = true)
    // IFD0 starts at 8 after the 8-byte header; first entry (Make, ASCII,
    // out-of-line) holds its offset at entry+8 — point it past the blob
    val off = 8 + 2 + 8
    b(off) = 0xff.toByte; b(off + 1) = 0xff.toByte
    b(off + 2) = 0xff.toByte; b(off + 3) = 0x7f.toByte
    val e = ExifMeta.fromTiff(b).get
    assert(e.make.isEmpty)            // the bad entry is dropped...
    assert(e.orientation.contains(6)) // ...not the whole parse
  }

  test("never throws: every truncation, garbage, wrong magic") {
    val variants = Seq(build(le = true), ExifMeta.wrapJpeg(build(le = false)))
    variants.foreach { b =>
      (0 until b.length).foreach { n =>
        ExifMeta.sniff(java.util.Arrays.copyOf(b, n)) // must not throw
      }
    }
    assert(ExifMeta.sniff(null).isEmpty)
    assert(ExifMeta.sniff(Array.tabulate[Byte](64)(i => (i * 13).toByte)).isEmpty)
    val badMagic = build(le = true); badMagic(2) = 41
    assert(ExifMeta.fromTiff(badMagic).isEmpty)
  }
}
