package graft

import java.util.zip.{CRC32, Deflater}
import graft.multimodal.{Multimodal => MM, PixelCodec, PixelImage}

/** Pixel-level decode: golden fixtures are hand-computed bytes from the
  * PNG/BMP public specs, written independently of the builders, so a
  * symmetric build/decode bug cannot pass. Corruption fixtures pin the
  * "None, never throw, never wrong-pixels" contract.
  */
class PixelCodecSpec extends SparkTestBase {

  // 2x2 RGB test raster, top-down: the pixels every golden case decodes to
  private val px2x2 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)

  // spec-local PNG writer over EXPLICIT pre-filtered scanline bytes — the
  // filtering arithmetic below is done by hand, not by makePng24
  private def pngFromRaw(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt((crc.getValue & 0xffffffffL).toInt).array(), 0, 4)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // hand-filtered scanlines for px2x2, one per PNG filter type (spec §6):
  // each row = filter byte + 6 data bytes, arithmetic done on paper
  private val goldenRaw: Map[Int, Array[Byte]] = Map(
    0 -> Array[Byte](0, 10, 20, 30, 40, 50, 60,
                     0, 70, 80, 90, 100, 110, 120),
    1 -> Array[Byte](1, 10, 20, 30, 30, 30, 30, // Sub: cur - left
                     1, 70, 80, 90, 30, 30, 30),
    2 -> Array[Byte](2, 10, 20, 30, 40, 50, 60, // Up: cur - above (row0: 0)
                     2, 60, 60, 60, 60, 60, 60),
    3 -> Array[Byte](3, 10, 20, 30, 35, 40, 45, // Average: cur - (a+b)/2
                     3, 65, 70, 75, 45, 45, 45),
    4 -> Array[Byte](4, 10, 20, 30, 30, 30, 30, // Paeth
                     4, 60, 60, 60, 30, 30, 30))

  for ((ft, raw) <- goldenRaw.toSeq.sortBy(_._1))
    test(s"golden PNG filter type $ft decodes to the hand-computed pixels") {
      val img = PixelCodec.decode(pngFromRaw(2, 2, raw))
      assert(img.contains(PixelImage("png", 2, 2, px2x2)) ||
        img.exists(i => i.format == "png" && i.width == 2 && i.height == 2 &&
          i.rgb.toSeq == px2x2.toSeq))
    }

  test("golden PNG: undefined filter type 5 is rejected, not misdecoded") {
    val raw = Array[Byte](5, 10, 20, 30, 40, 50, 60,
                          0, 70, 80, 90, 100, 110, 120)
    assert(PixelCodec.decode(pngFromRaw(2, 2, raw)).isEmpty)
  }

  test("PNG corruption: a flipped IDAT byte fails the CRC -> None") {
    val good = pngFromRaw(2, 2, goldenRaw(0))
    // flip one byte inside the IDAT chunk body (after sig+IHDR = 8+25=33,
    // IDAT header 8 more; offset 45 is inside the zlib stream)
    val bad = good.clone()
    bad(45) = (bad(45) ^ 0x41).toByte
    assert(PixelCodec.decode(bad).isEmpty)
  }

  test("PNG corruption: truncation anywhere -> None, never a throw") {
    val good = pngFromRaw(2, 2, goldenRaw(4))
    for (cut <- Seq(0, 7, 8, 20, 33, 40, good.length - 5, good.length - 1))
      assert(PixelCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
  }

  test("PNG profile guards: 16-bit, paletted, interlaced, hostile dims -> None") {
    def ihdrVariant(mod: Array[Byte] => Unit): Array[Byte] = {
      val g = pngFromRaw(2, 2, goldenRaw(0))
      // rebuild IHDR with a tweak and a RECOMPUTED crc (so only the profile
      // check can reject it, not the crc)
      val ihdr = java.util.Arrays.copyOfRange(g, 16, 29) // 13 IHDR data bytes
      mod(ihdr)
      val out = new java.io.ByteArrayOutputStream()
      out.write(g, 0, 8)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(13).array(), 0, 4)
      val body = "IHDR".getBytes("US-ASCII") ++ ihdr
      out.write(body, 0, body.length)
      val crc = new CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4)
        .putInt((crc.getValue & 0xffffffffL).toInt).array(), 0, 4)
      out.write(g, 33, g.length - 33) // rest: IDAT + IEND unchanged
      out.toByteArray
    }
    assert(PixelCodec.decode(ihdrVariant(i => i(8) = 16)).isEmpty)  // bit depth
    assert(PixelCodec.decode(ihdrVariant(i => i(9) = 3)).isEmpty)   // paletted
    assert(PixelCodec.decode(ihdrVariant(i => i(12) = 1)).isEmpty)  // Adam7
    assert(PixelCodec.decode(ihdrVariant { i => // 2^24 x 2^24: would OOM
      i(0) = 1; i(1) = 0; i(2) = 0; i(3) = 0
      i(4) = 1; i(5) = 0; i(6) = 0; i(7) = 0
    }).isEmpty)
  }

  test("golden BMP: bottom-up BGR rows with 4-byte padding decode top-down RGB") {
    // 2 wide x 2 tall, 24bpp: row stride = ceil(6/4)*4 = 8 (2 pad bytes).
    // Stored bottom-up: file's first row is the image's BOTTOM row, BGR.
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putShort(0).putShort(0)
      .putInt(54).putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row first: px(0,1)=RGB(70,80,90) -> BGR 90,80,70 …
    bb.put(Array[Byte](90, 80, 70, 120, 110, 100, 0, 0))
    bb.put(Array[Byte](30, 20, 10, 60, 50, 40, 0, 0))
    val img = PixelCodec.decode(bb.array())
    assert(img.exists(i => i.format == "bmp" && i.width == 2 && i.height == 2 &&
      i.rgb.toSeq == px2x2.toSeq))
  }

  test("BMP guards: truncated pixel data, 16bpp, RLE compression -> None") {
    val good = PixelCodec.makeBmp24(3, 2, Array.tabulate[Byte](18)(_.toByte))
    assert(PixelCodec.decode(good).nonEmpty)
    assert(PixelCodec.decode(good.take(good.length - 1)).isEmpty)
    val bpp16 = good.clone(); bpp16(28) = 16
    assert(PixelCodec.decode(bpp16).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(PixelCodec.decode(rle).isEmpty)
  }

  test("build/decode round-trip: BMP and all-filter PNG, odd widths (padding)") {
    for (w <- Seq(1, 2, 3, 5); h <- Seq(1, 2, 4)) {
      val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val bmp = PixelCodec.decode(PixelCodec.makeBmp24(w, h, rgb))
      assert(bmp.exists(_.rgb.toSeq == rgb.toSeq), s"bmp ${w}x$h")
      for (ft <- 0 to 4) {
        val png = PixelCodec.decode(PixelCodec.makePng24(w, h, rgb, _ => ft))
        assert(png.exists(_.rgb.toSeq == rgb.toSeq), s"png ${w}x$h filter $ft")
      }
    }
  }

  test("decodedStats over syntheticPixelImages matches the pixel formula") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 58L)
    val media = MM.syntheticPixelImages(spark, ids.toDF("doc_id"), "doc_id")
    val stats = MM.decodedStats(spark, media).collect().map(s => s.id -> s).toMap
    for (id <- ids) {
      val w = MM.PixelFormula.width(id); val h = MM.PixelFormula.height(id)
      val lums = for (y <- 0 until h; x <- 0 until w) yield
        MM.PixelFormula.lum(MM.PixelFormula.r(id, x, y),
          MM.PixelFormula.g(id, x, y), MM.PixelFormula.b(id, x, y))
      val s = stats(id)
      assert(s.format == (if (id % 2 == 0) "bmp" else "png"))
      assert(s.width.contains(w) && s.height.contains(h))
      assert(s.lumSum.contains(lums.map(_.toLong).sum))
      assert(s.l0.contains(lums.count(_ >> 6 == 0).toLong))
      assert(s.l1.contains(lums.count(_ >> 6 == 1).toLong))
      assert(s.l2.contains(lums.count(_ >> 6 == 2).toLong))
      assert(s.l3.contains(lums.count(_ >> 6 == 3).toLong))
    }
  }

  test("resizeNearest: golden integer sampling, resizeToMax never upscales") {
    // 4x2 source, distinct channels per pixel
    val rgb = Array.tabulate[Byte](24)(i => (i * 10).toByte)
    val img = PixelImage("bmp", 4, 2, rgb)
    // downsample to 2x1: dst(0,0) reads src(0*4/2, 0*2/1) = (0,0);
    // dst(1,0) reads src(1*4/2, 0) = (2,0) -> bytes 6,7,8 = 60,70,80
    val r = PixelCodec.resizeNearest(img, 2, 1)
    assert(r.rgb.toSeq == Seq[Byte](0, 10, 20, 60, 70, 80))
    // bounded-box: 32x8 at maxDim 16 -> 16x4 (aspect in integer arith)
    val big = PixelImage("bmp", 32, 8, new Array[Byte](32 * 8 * 3))
    val boxed = PixelCodec.resizeToMax(big, 16)
    assert(boxed.width == 16 && boxed.height == 4)
    // never upscale
    assert(PixelCodec.resizeToMax(img, 100) eq img)
  }

  test("aHash bands: deterministic, perturbation stays hash-near, distinct images differ") {
    val base = MM.PixelFormula.rgbBytes(10L)
    val w = MM.PixelFormula.width(10L); val h = MM.PixelFormula.height(10L)
    val img = PixelImage("bmp", w, h, base)
    val h1 = MM.aHashBands(img).toSeq
    assert(h1 == MM.aHashBands(img).toSeq) // deterministic
    // a planted variant (id 14 -> base 10) hashes within hamming 3
    val variant = PixelImage("bmp", w, h, MM.PixelFormula.rgbBytesDup(14L))
    val h2 = MM.aHashBands(variant).toSeq
    val ham = h1.zip(h2).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(ham <= 3, s"planted variant drifted to hamming $ham")
    // unrelated images sit OUTSIDE the near-dup radius (their exact
    // distance varies — the contract is only that they don't pass as dups)
    val others = Seq(11L, 12L, 13L, 15L, 16L).map { id =>
      MM.aHashBands(PixelImage("bmp", MM.PixelFormula.width(id),
        MM.PixelFormula.height(id), MM.PixelFormula.rgbBytes(id))).toSeq
    }
    others.foreach { h3 =>
      assert(h1.zip(h3).map { case (a, b) => Integer.bitCount(a ^ b) }.sum > 3)
    }
  }

  test("imageNearDupPairs finds the planted variants through decode+hash+band join") {
    import spark.implicits._
    val ids = (0L until 60L)
    val media = MM.syntheticPixelImages(spark, ids.toDF("doc_id"), "doc_id",
      withDups = true)
    val pairs = MM.imageNearDupPairs(spark, media, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    // planted: (k, k+4) for k % 5 == 0 — 12 pairs in [0, 60)
    val planted = ids.filter(_ % 5 == 0).map(k => (k, k + 4)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    val hit = planted.intersect(found)
    assert(hit.size >= planted.size * 3 / 4,
      s"found ${hit.size}/${planted.size} planted near-dups: $found")
    pairs.foreach(p => assert(p._3 <= 3))
  }

  test("decodedStats: garbage and metadata-only payloads yield format=unknown") {
    import spark.implicits._
    val junk = Seq(
      (1L, "nope".getBytes("UTF-8")),
      // ImageMeta-parseable but NOT pixel-decodable: filler IDAT png shell
      (2L, graft.multimodal.ImageMeta.makePng(10, 10, "x".getBytes)),
      (3L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = MM.decodedStats(spark, junk).collect()
    assert(out.forall(s => s.format == "unknown" && s.width.isEmpty))
  }

  // ---- GIF ---------------------------------------------------------------

  private def grayFor(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((seed * 31 + i * 17) % 256).toByte)

  test("GIF round-trip: decodeGif(makeGif8) recovers every gray pixel") {
    for ((w, h, seed) <- Seq((1, 1, 3), (7, 5, 11), (40, 33, 29), (257, 2, 5))) {
      // 257 wide crosses the encoder's 250-literal CLEAR cadence mid-row
      val gray = grayFor(w, h, seed)
      val img = PixelCodec.decodeGif(PixelCodec.makeGif8(w, h, gray))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.format == "gif" && img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gray(y * w + x) & 0xff
        assert(img.r(x, y) == v && img.g(x, y) == v && img.b(x, y) == v,
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("GIF cross-validation against javax.imageio, both directions") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val (w, h) = (31, 17)
    val gray = grayFor(w, h, 7)
    // 1. OUR encoder read by the JDK's independent GIF decoder
    val jdk = javax.imageio.ImageIO.read(
      new ByteArrayInputStream(PixelCodec.makeGif8(w, h, gray)))
    assert(jdk.getWidth == w && jdk.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x) & 0xff
      assert((jdk.getRGB(x, y) & 0xffffff) == (v << 16 | v << 8 | v),
        s"jdk pixel ($x,$y)")
    }
    // 2. the JDK's GIF ENCODER (real variable-width LZW, not our
    // fixed-width trick) read by OUR decoder — exercises dictionary
    // growth and code-size widening on an independent bitstream
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, gray(y * w + x) & 0xff)
    val buf = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", buf))
    val ours = PixelCodec.decodeGif(buf.toByteArray)
      .getOrElse(fail("our decoder rejected an ImageIO-written gif"))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x) & 0xff
      assert(ours.r(x, y) == v && ours.g(x, y) == v && ours.b(x, y) == v,
        s"our pixel ($x,$y)")
    }
  }

  test("GIF corruption: truncation, bad LZW, missing palette all yield None") {
    val good = PixelCodec.makeGif8(9, 6, grayFor(9, 6, 1))
    assert(PixelCodec.decodeGif(good).isDefined)
    // truncated anywhere inside the data stream
    for (cut <- Seq(10, 13, 700, good.length - 3))
      assert(PixelCodec.decodeGif(java.util.Arrays.copyOf(good, cut)).isEmpty,
        s"cut=$cut")
    val idPos = 13 + 256 * 3 // image separator right after header + GCT
    assert((good(idPos) & 0xff) == 0x2c)
    // no global AND no local color table
    val noPal = good.clone()
    noPal(10) = (noPal(10) & 0x7f).toByte // drop GCT flag: palette bytes
    // now parse as garbage blocks -> must be None, never wrong pixels
    assert(PixelCodec.decodeGif(noPal).isEmpty)
    // a corrupt LZW stream (zeroed data sub-block) must not decode
    val badLzw = good.clone()
    var p = idPos + 10 + 1 // skip descriptor + min-code byte
    val n = badLzw(p) & 0xff
    java.util.Arrays.fill(badLzw, p + 1, p + 1 + n, 0xAA.toByte)
    assert(PixelCodec.decodeGif(badLzw).isEmpty ||
      PixelCodec.decodeGif(badLzw).get.rgb.length == 9 * 6 * 3)
  }
}
