package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.multimodal.{JpegCodec, Multimodal => MM, PixelCodec}

/** Baseline JPEG decode: golden DC-only fixtures are integer-exact under
  * ANY conforming IDCT (S₀₀ multiples of 8), so expected pixels are
  * hand-computed; the JDK's native decoder cross-validates both directions;
  * corruption fixtures pin the None-never-throw contract.
  */
class JpegCodecSpec extends SparkTestBase {

  /** The decoder's documented fixed-point YCbCr→RGB (libjpeg constants). */
  private def rgb420(yv: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
    val cb = cb0 - 128; val cr = cr0 - 128
    def cl(v: Int) = math.max(0, math.min(255, v))
    (cl(yv + Math.floorDiv(91881 * cr + 32768, 65536)),
      cl(yv + Math.floorDiv(-22554 * cb - 46802 * cr + 32768, 65536)),
      cl(yv + Math.floorDiv(116130 * cb + 32768, 65536)))
  }

  test("grayscale DC-only golden: exact block values incl. partial-MCU crop") {
    val w = 21; val h = 13 // 3x2 blocks, right/bottom blocks partial
    def v(bx: Int, by: Int) = (7 + bx * 31 + by * 57) % 256
    val bytes = JpegCodec.makeJpegGray(w, h, v)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.format == "jpeg" && img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val e = v(x / 8, y / 8)
      assert(img.r(x, y) == e && img.g(x, y) == e && img.b(x, y) == e,
        s"pixel ($x,$y): got ${img.r(x, y)}, want $e")
    }
    // determinism
    assert(JpegCodec.decode(bytes).get.rgb.sameElements(img.rgb))
  }

  test("4:2:0 color DC-only golden: exact fixed-point color transform") {
    val w = 29; val h = 19 // 2x2 MCUs, partials on both edges
    def yv(bx: Int, by: Int) = (11 + bx * 23 + by * 41) % 256
    def cb(mx: Int, my: Int) = (90 + mx * 37 + my * 53) % 256
    def cr(mx: Int, my: Int) = (160 + mx * 43 + my * 59) % 256
    val bytes = JpegCodec.makeJpeg420(w, h, yv, cb, cr)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode returned None"))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = rgb420(yv(x / 8, y / 8), cb(x / 16, y / 16), cr(x / 16, y / 16))
      assert(img.r(x, y) == er && img.g(x, y) == eg && img.b(x, y) == eb,
        s"pixel ($x,$y): got (${img.r(x, y)},${img.g(x, y)},${img.b(x, y)}), " +
          s"want ($er,$eg,$eb)")
    }
  }

  test("restart markers: RSTn resync decodes exactly; wrong RST index -> None") {
    val w = 40; val h = 16 // 5x2 blocks -> restarts mid-row and across rows
    def v(bx: Int, by: Int) = (200 + bx * 19 + by * 77) % 256
    val bytes = JpegCodec.makeJpegGray(w, h, v, restartInterval = 2)
    // the stream really contains restart markers
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) >= 0xd0 &&
        (bytes(i + 1) & 0xff) <= 0xd7))
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode returned None"))
    for (y <- 0 until h; x <- 0 until w)
      assert(img.r(x, y) == v(x / 8, y / 8), s"($x,$y)")
    // corrupt the first RST marker's index: resync must fail loudly
    val bad = bytes.clone()
    val ri = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) >= 0xd0 &&
        (bad(i + 1) & 0xff) <= 0xd7).get
    bad(ri + 1) = (0xd0 + (((bad(ri + 1) & 0x0f) + 3) & 7)).toByte
    assert(JpegCodec.decode(bad).isEmpty, "wrong restart index must not decode")
    // color restart path too
    val cBytes = JpegCodec.makeJpeg420(35, 33, (a, b) => (a * 9 + b * 3) % 256,
      (a, b) => (a * 5 + b * 7 + 100) % 256, (a, b) => (a * 3 + b * 11 + 50) % 256,
      restartInterval = 2)
    val cImg = JpegCodec.decode(cBytes).getOrElse(fail("color restart decode"))
    assert(cImg.width == 35 && cImg.height == 33)
  }

  test("byte stuffing: fixture corpus contains FF00 pairs and decodes exactly") {
    // scan formula ids until the entropy stream emits a stuffed 0xFF byte —
    // "FF 00" cannot occur in our headers (all dims < 256, tables 8/16)
    var found = false
    var id = 0L
    while (id < 200 && !found) {
      val w = MM.JpegFormula.width(id); val h = MM.JpegFormula.height(id)
      val bytes =
        if (id % 2 == 0) JpegCodec.makeJpegGray(w, h, MM.JpegFormula.gray(id))
        else JpegCodec.makeJpeg420(w, h, MM.JpegFormula.yv(id),
          MM.JpegFormula.cb(id), MM.JpegFormula.cr(id))
      val stuffed = (0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
      if (stuffed) {
        found = true
        val img = JpegCodec.decode(bytes).getOrElse(fail(s"id=$id"))
        if (id % 2 == 0)
          for (y <- 0 until h; x <- 0 until w)
            assert(img.r(x, y) == MM.JpegFormula.gray(id)(x / 8, y / 8),
              s"id=$id ($x,$y)")
      }
      id += 1
    }
    assert(found, "no formula id produced a stuffed byte in 200 tries")
  }

  test("JDK cross-validation 1: ImageIO decodes our fixtures to the exact values") {
    // grayscale
    val (w, h) = (24, 16)
    def v(bx: Int, by: Int) = (3 + bx * 67 + by * 29) % 256
    val gray = JpegCodec.makeJpegGray(w, h, v)
    val jg = javax.imageio.ImageIO.read(new ByteArrayInputStream(gray))
    assert(jg != null && jg.getWidth == w && jg.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(jg.getRaster.getSample(x, y, 0) == v(x / 8, y / 8),
        s"jdk gray ($x,$y)")
    // color, MCU-varying chroma: libjpeg upsamples h2v2 chroma with a
    // triangular filter, which blends ACROSS MCU borders where our
    // fixture's chroma steps — compare exactly on the pixels whose whole
    // chroma neighborhood sits inside one MCU (x%16, y%16 ∈ 2..13); the
    // border behavior of OUR decoder is pinned exactly by the golden test
    def yv(bx: Int, by: Int) = (17 + bx * 13 + by * 7) % 256
    def cbf(mx: Int, my: Int) = (100 + mx * 31 + my * 17) % 256
    def crf(mx: Int, my: Int) = (140 + mx * 19 + my * 23) % 256
    val color = JpegCodec.makeJpeg420(32, 32, yv, cbf, crf)
    val jc = javax.imageio.ImageIO.read(new ByteArrayInputStream(color))
    assert(jc != null && jc.getWidth == 32 && jc.getHeight == 32)
    var interior = 0
    for (y <- 0 until 32; x <- 0 until 32
         if (x % 16) >= 2 && (x % 16) <= 13 && (y % 16) >= 2 && (y % 16) <= 13) {
      interior += 1
      val (er, eg, eb) = rgb420(yv(x / 8, y / 8), cbf(x / 16, y / 16), crf(x / 16, y / 16))
      val p = jc.getRGB(x, y)
      val (jr, jgg, jb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      assert(math.abs(jr - er) <= 1 && math.abs(jgg - eg) <= 1 &&
        math.abs(jb - eb) <= 1,
        s"jdk color ($x,$y): jdk=($jr,$jgg,$jb) ours=($er,$eg,$eb)")
    }
    assert(interior == 12 * 12 * 4, s"checked $interior interior pixels")
    // constant chroma across the image: every upsampler agrees everywhere,
    // so the comparison covers all pixels including MCU borders
    val flat = JpegCodec.makeJpeg420(32, 32, yv, (_, _) => 90, (_, _) => 170)
    val jf = javax.imageio.ImageIO.read(new ByteArrayInputStream(flat))
    for (y <- 0 until 32; x <- 0 until 32) {
      val (er, eg, eb) = rgb420(yv(x / 8, y / 8), 90, 170)
      val p = jf.getRGB(x, y)
      val (jr, jgg, jb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      assert(math.abs(jr - er) <= 1 && math.abs(jgg - eg) <= 1 &&
        math.abs(jb - eb) <= 1,
        s"jdk flat-chroma ($x,$y): jdk=($jr,$jgg,$jb) ours=($er,$eg,$eb)")
    }
  }

  test("JDK cross-validation 2: our decoder matches ImageIO on its own files") {
    // real AC coefficients, standard tables, an independent encoder:
    // grayscale first (no chroma path ambiguity), per-pixel |diff| <= 1
    // (IDCT implementations are spec-bounded, not bit-specified)
    val (w, h) = (48, 32)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0,
        ((x * 11 + y * 5) % 160 + (if ((x / 8 + y / 8) % 2 == 0) 64 else 0)) % 256)
    val buf = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", buf))
    val bytes = buf.toByteArray
    val ours = JpegCodec.decode(bytes)
      .getOrElse(fail("our decoder rejected an ImageIO-written jpeg"))
    val jdk = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(ours.width == w && ours.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ours.r(x, y) - jdk.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 1, s"gray maxDiff=$maxDiff")
    // color with CONSTANT chroma (gray RGB content): 4:2:0 subsampling of
    // constant chroma is constant, so upsampler choice cannot diverge and
    // the luma path carries all the signal
    val cbi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 7 + y * 13) % 256
      cbi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val cbuf = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cbi, "jpg", cbuf))
    val cOurs = JpegCodec.decode(cbuf.toByteArray)
      .getOrElse(fail("our decoder rejected an ImageIO color jpeg"))
    val cJdk = javax.imageio.ImageIO.read(new ByteArrayInputStream(cbuf.toByteArray))
    assert(cOurs.width == w && cOurs.height == h)
    var cMax = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = cJdk.getRGB(x, y)
      cMax = math.max(cMax, math.abs(cOurs.r(x, y) - ((p >> 16) & 0xff)))
      cMax = math.max(cMax, math.abs(cOurs.g(x, y) - ((p >> 8) & 0xff)))
      cMax = math.max(cMax, math.abs(cOurs.b(x, y) - (p & 0xff)))
    }
    assert(cMax <= 2, s"color maxDiff=$cMax")
  }

  test("corruption: truncation, progressive, bad tables, hostile dims -> None") {
    val good = JpegCodec.makeJpegGray(21, 13, (bx, by) => (bx * 31 + by * 57) % 256)
    assert(JpegCodec.decode(good).isDefined)
    // truncation anywhere: headers, entropy data, missing EOI tail
    for (cut <- Seq(1, 2, 6, 20, 100, good.length / 2, good.length - 2))
      assert(JpegCodec.decode(java.util.Arrays.copyOf(good, cut)).isEmpty,
        s"cut=$cut")
    def patch(marker: Int)(f: (Array[Byte], Int) => Unit): Array[Byte] = {
      val b = good.clone()
      val i = (0 until b.length - 1).find(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == marker).get
      f(b, i)
      b
    }
    // SOF0 -> SOF2 (progressive): refused, not mis-decoded
    assert(JpegCodec.decode(patch(0xc0)((b, i) => b(i + 1) = 0xc2.toByte)).isEmpty)
    // 12-bit precision: refused
    assert(JpegCodec.decode(patch(0xc0)((b, i) => b(i + 4) = 12.toByte)).isEmpty)
    // hostile dims: height patched to 65535 trips the w*h bound before alloc
    assert(JpegCodec.decode(patch(0xc0) { (b, i) =>
      b(i + 5) = 0xff.toByte; b(i + 6) = 0xff.toByte
    }).isEmpty)
    // overfull DHT (17 codes of length 4 > 16 slots): table build refuses
    assert(JpegCodec.decode(patch(0xc4) { (b, i) =>
      b(i + 4 + 4) = 17.toByte // BITS[4], after marker+len+tc/th
    }).isEmpty)
    // scan referencing an undefined quant table
    assert(JpegCodec.decode(patch(0xc0) { (b, i) =>
      b(i + 10) = 3.toByte // component quant id -> table 3, never defined
    }).isEmpty)
    // garbage in the entropy stream: flip bytes after SOS — must never
    // throw, and must either refuse or produce a well-formed raster
    val sos = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    for (k <- sos + 10 until math.min(sos + 30, good.length - 2)) {
      val b = good.clone()
      b(k) = (~b(k)).toByte
      JpegCodec.decode(b) match {
        case Some(img) => assert(img.rgb.length == img.width * img.height * 3)
        case None      => ()
      }
    }
  }

  test("decode dispatches from PixelCodec.decode on the FFD8 magic") {
    val bytes = JpegCodec.makeJpegGray(10, 9, (bx, by) => 55 + bx + by)
    val img = PixelCodec.decode(bytes).getOrElse(fail("dispatch failed"))
    assert(img.format == "jpeg" && img.width == 10 && img.height == 9)
  }
}
