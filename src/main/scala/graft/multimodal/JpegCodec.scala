package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Baseline sequential JPEG (ITU-T T.81) decode in pure JVM — the third
  * real pixel decoder next to [[PixelCodec]]'s PNG/GIF/BMP: marker-segment
  * walk (SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI), canonical Huffman
  * tables built from DHT per T.81 Annex C, the F.2.2 entropy-decoding
  * procedures (DC difference + EXTEND, AC run/size with ZRL and EOB, 0xFF00
  * byte unstuffing, restart-marker resync), dequantization through the
  * zigzag order, a double-precision separable 8×8 IDCT (StrictMath basis
  * table, so the arithmetic is identical on every JVM), integer-replication
  * chroma upsampling for the {1,2}×{1,2} sampling grid, and the libjpeg
  * fixed-point YCbCr→RGB transform (FIX(x)=round(x·2¹⁶) constants with a
  * floor shift, so uniform-chroma images decode bit-identically to the
  * JDK's native reader — cross-validated both directions in JpegCodecSpec).
  *
  * Supported profile: SOF0 baseline, 8-bit precision, 1 or 3 components,
  * sampling factors 1–2, single interleaved scan (or single-component
  * scan). Progressive (SOF2), arithmetic coding, 12-bit, and multi-scan
  * files return None — same never-kill-the-task contract as the other
  * decoders (a 100 TB crawl batch always contains garbage).
  *
  * The reference keeps media blobs opaque bytes (lib/disco/ddfs.py); this
  * is the builder-brief multimodal decode leg. Format knowledge is the
  * public ITU T.81 spec; no code is derived from any JPEG library.
  */
object JpegCodec {

  /** zigzag position → natural (row-major) position, T.81 Figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** a(v, x) = C(v)·cos((2x+1)vπ/16) — the 1-D IDCT basis, StrictMath so
    * the table (and therefore every decoded pixel) is JVM-independent.
    */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (v, x) =>
    val c = if (v == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    c * StrictMath.cos((2 * x + 1) * v * StrictMath.PI / 16.0)
  }

  /** T.81 F.2.2.3 decoder tables from a DHT (BITS, HUFFVAL) pair. */
  private final class HuffTable(val minCode: Array[Int], val maxCode: Array[Int],
                                val valPtr: Array[Int], val vals: Array[Byte])

  /** Canonical code assignment (T.81 Annex C); None on an over-full or
    * inconsistent table — corrupt DHT must fail loudly, not decode noise.
    */
  private def buildHuff(bits: Array[Int], vals: Array[Byte]): Option[HuffTable] = {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      valPtr(l) = k
      minCode(l) = code
      code += bits(l)
      k += bits(l)
      if (code > (1 << l)) return None // more codes than the length holds
      if (bits(l) > 0) maxCode(l) = code - 1
      code <<= 1
      l += 1
    }
    if (k != vals.length || k == 0) None
    else Some(new HuffTable(minCode, maxCode, valPtr, vals))
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffed; any real
    * marker (or running out of bytes) ends the stream — readBit returns -1
    * and the caller decides whether a restart marker was expected there.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) return -1
          val m = b(pos + 1) & 0xff
          if (m != 0x00) return -1 // real marker: stop before it
          pos += 1 // stuffed zero: the data byte is 0xFF
          v = 0xff
        }
        pos += 1
        bitBuf = v
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    /** n raw bits MSB-first, or Int.MinValue if the stream ended. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = readBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    /** Byte-align and consume the expected RSTn marker; false on resync loss. */
    def restart(expected: Int): Boolean = {
      bitCnt = 0
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff) return false
      if ((b(pos + 1) & 0xff) != 0xd0 + expected) return false
      pos += 2
      true
    }
  }

  /** One Huffman symbol via the T.81 F.2.2.3 DECODE procedure; -1 on a
    * code longer than 16 bits or a truncated stream.
    */
  private def decodeSym(r: BitReader, t: HuffTable): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val bit = r.readBit()
      if (bit < 0) return -1
      code = (code << 1) | bit
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.vals(t.valPtr(l) + code - t.minCode(l)) & 0xff
      l += 1
    }
    -1
  }

  /** T.81 F.2.2.1 EXTEND: map s low bits to the signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  def decode(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4) // zigzag order, as stored in DQT
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var w = 0; var h = 0; var nc = 0
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compIds: Array[Int] = null
    var restartInterval = 0

    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var m = b(pos + 1) & 0xff
      pos += 2
      while (m == 0xff && pos < b.length) { m = b(pos) & 0xff; pos += 1 } // fill bytes
      m match {
        case 0xdb => // DQT: one or more tables
          val len = be16(b, pos)
          val end = pos + len
          if (end > b.length) return None
          var p = pos + 2
          while (p < end) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > end) return None // 8-bit only
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = b(p + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            p += 65
          }
          pos = end

        case 0xc4 => // DHT: one or more tables
          val len = be16(b, pos)
          val end = pos + len
          if (end > b.length) return None
          var p = pos + 2
          while (p < end) {
            if (p + 17 > end) return None
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var n = 0
            var i = 1
            while (i <= 16) { bits(i) = b(p + i) & 0xff; n += bits(i); i += 1 }
            if (p + 17 + n > end) return None
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = buildHuff(bits, vals).getOrElse(return None)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            p += 17 + n
          }
          pos = end

        case 0xc0 => // SOF0 baseline
          val len = be16(b, pos)
          if (pos + len > b.length || len < 8) return None
          if ((b(pos + 2) & 0xff) != 8) return None // 8-bit precision only
          h = be16(b, pos + 3)
          w = be16(b, pos + 5)
          nc = b(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (w > (1 << 20) || h > (1 << 20) || w.toLong * h > (1L << 26)) return None
          if (len != 8 + 3 * nc) return None
          compIds = new Array[Int](nc)
          compH = new Array[Int](nc); compV = new Array[Int](nc)
          compQ = new Array[Int](nc)
          var i = 0
          while (i < nc) {
            compIds(i) = b(pos + 8 + 3 * i) & 0xff
            val hv = b(pos + 9 + 3 * i) & 0xff
            compH(i) = hv >> 4; compV(i) = hv & 0x0f
            compQ(i) = b(pos + 10 + 3 * i) & 0xff
            if (compH(i) < 1 || compH(i) > 2 || compV(i) < 1 || compV(i) > 2 ||
                compQ(i) > 3) return None
            i += 1
          }
          pos += len

        case 0xdd => // DRI
          val len = be16(b, pos)
          if (len != 4 || pos + 4 > b.length) return None
          restartInterval = be16(b, pos + 2)
          pos += len

        case 0xda => // SOS — decode the scan and finish
          if (compH == null) return None
          val len = be16(b, pos)
          if (pos + len > b.length) return None
          val ns = b(pos + 2) & 0xff
          if (ns != nc) return None // single interleaved scan only
          val scanDc = new Array[HuffTable](nc)
          val scanAc = new Array[HuffTable](nc)
          val order = new Array[Int](ns) // scan position → frame component
          var i = 0
          while (i < ns) {
            val cs = b(pos + 3 + 2 * i) & 0xff
            val ci = compIds.indexOf(cs)
            if (ci < 0) return None
            order(i) = ci
            val tt = b(pos + 4 + 2 * i) & 0xff
            val dc = dcTab(tt >> 4); val ac = acTab(tt & 0x0f)
            if (dc == null || ac == null) return None
            scanDc(ci) = dc; scanAc(ci) = ac
            i += 1
          }
          val ss = b(pos + 3 + 2 * ns) & 0xff
          val se = b(pos + 4 + 2 * ns) & 0xff
          if (ss != 0 || se != 63) return None // baseline spectral range
          i = 0
          while (i < nc) {
            if (quant(compQ(i)) == null) return None
            i += 1
          }
          pos += len
          return decodeScan(b, pos, w, h, nc, order, compH, compV,
            compQ.map(quant), scanDc, scanAc, restartInterval)

        case 0xd9 => return None // EOI with no scan
        case 0xc2 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf => return None // non-baseline frames
        case x if (x >= 0xe0 && x <= 0xef) || x == 0xfe => // APPn / COM
          val len = be16(b, pos)
          if (len < 2 || pos + len > b.length) return None
          pos += len
        case _ => return None
      }
    }
    None
  }

  /** Entropy-decode the single scan into per-component sample planes, then
    * upsample + color-transform into packed RGB.
    */
  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int, nc: Int,
                         order: Array[Int], compH: Array[Int], compV: Array[Int],
                         qtabs: Array[Array[Int]], dcT: Array[HuffTable],
                         acT: Array[HuffTable],
                         restartInterval: Int): Option[PixelImage] = {
    val hmax = compH.max
    val vmax = compV.max
    // A single-component scan is non-interleaved per T.81: the MCU is one
    // 8×8 block at the component's full resolution, whatever the declared
    // sampling factors (they only matter relative to other components).
    val (mcusX, mcusY, bh, bv) =
      if (nc == 1) (((w + 7) / 8), ((h + 7) / 8), Array(1), Array(1))
      else (((w + 8 * hmax - 1) / (8 * hmax)), ((h + 8 * vmax - 1) / (8 * vmax)),
        compH, compV)
    val planeW = Array.tabulate(nc)(i => mcusX * bh(i) * 8)
    val planeH = Array.tabulate(nc)(i => mcusY * bv(i) * 8)
    val planes = Array.tabulate(nc)(i => new Array[Byte](planeW(i) * planeH(i)))
    val pred = new Array[Int](nc)
    val zz = new Array[Int](64)
    val block = new Array[Int](64)
    val px = new Array[Int](64)
    val r = new BitReader(b, start)
    var mcu = 0
    var rstIdx = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart(rstIdx)) return None
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var s = 0
      while (s < order.length) {
        val ci = order(s)
        var by = 0
        while (by < bv(ci)) {
          var bx = 0
          while (bx < bh(ci)) {
            // --- one 8×8 data unit (T.81 F.2.2.1 / F.2.2.2) ---
            java.util.Arrays.fill(zz, 0)
            val cat = decodeSym(r, dcT(ci))
            if (cat < 0 || cat > 15) return None
            val diffBits = if (cat == 0) 0 else r.receive(cat)
            if (diffBits == Int.MinValue) return None
            pred(ci) += extend(diffBits, cat)
            zz(0) = pred(ci)
            var k = 1
            while (k < 64) {
              val rs = decodeSym(r, acT(ci))
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 15
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64            // EOB
              } else {
                k += run
                if (k > 63) return None
                val vv = r.receive(size)
                if (vv == Int.MinValue) return None
                zz(k) = extend(vv, size)
                k += 1
              }
            }
            // dequantize through zigzag into natural order, then IDCT
            val q = qtabs(ci)
            java.util.Arrays.fill(block, 0)
            var i = 0
            while (i < 64) { block(Zigzag(i)) = zz(i) * q(i); i += 1 }
            idct8x8(block, px)
            // place into the component plane
            val ox = (mx * bh(ci) + bx) * 8
            val oy = (my * bv(ci) + by) * 8
            val pw = planeW(ci)
            val plane = planes(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowBase = (oy + yy) * pw + ox
              while (xx < 8) {
                plane(rowBase + xx) = px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        s += 1
      }
      mcu += 1
    }
    // strict tail: after the last MCU the stream must close with EOI
    // (optional 0xFF fill bytes first) — a payload cut anywhere, even just
    // the trailing marker, is truncated and refuses rather than "mostly
    // decodes" (the None-never-wrong-pixels contract)
    var tp = r.pos
    while (tp + 1 < b.length && (b(tp) & 0xff) == 0xff &&
      (b(tp + 1) & 0xff) == 0xff) tp += 1
    if (tp + 1 >= b.length || (b(tp) & 0xff) != 0xff ||
      (b(tp + 1) & 0xff) != 0xd9) return None
    // ...and EOI must END the payload: trailing bytes after FF D9 are the
    // same refuse-don't-guess case as the MP3 walk's one-junk-byte rule
    if (tp + 2 != b.length) return None
    // compose: replication upsampling + (for 3 components) JFIF YCbCr→RGB
    // with the libjpeg fixed-point constants FIX(1.40200)=91881,
    // FIX(0.34414)=22554, FIX(0.71414)=46802, FIX(1.77200)=116130 and a
    // floor shift — so JDK-decoded pixels of uniform-chroma images match
    // bit-for-bit (spec-pinned).
    val rgb = new Array[Byte](w * h * 3)
    val sh = Array.tabulate(nc)(i => if (nc == 1) 1 else hmax / bh(i))
    val sv = Array.tabulate(nc)(i => if (nc == 1) 1 else vmax / bv(i))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nc == 1) {
          val v = planes(0)((y * planeW(0)) + x)
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        } else {
          val yv = planes(0)(((y / sv(0)) * planeW(0)) + (x / sh(0))) & 0xff
          val cb = (planes(1)(((y / sv(1)) * planeW(1)) + (x / sh(1))) & 0xff) - 128
          val cr = (planes(2)(((y / sv(2)) * planeW(2)) + (x / sh(2))) & 0xff) - 128
          rgb(o) = clamp8(yv + Math.floorDiv(91881 * cr + 32768, 65536))
          rgb(o + 1) = clamp8(yv + Math.floorDiv(-22554 * cb - 46802 * cr + 32768, 65536))
          rgb(o + 2) = clamp8(yv + Math.floorDiv(116130 * cb + 32768, 65536))
        }
        x += 1
      }
      y += 1
    }
    Some(PixelImage("jpeg", w, h, rgb))
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Separable double-precision IDCT + level shift + clamp: out(x,y) =
    * clamp(round(¼ Σᵤ Σᵥ C(u)C(v) F(u,v) cosᵤ(y) cosᵥ(x)) + 128). For a
    * DC-only block this is exactly F₀₀/8 + 128 (the spec pins it), so
    * fixture pixels are integer-exact whatever IDCT a cross-validating
    * decoder uses.
    */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows: 1-D IDCT across v for each frequency row u
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          val c = coef(u * 8 + v)
          if (c != 0) acc += Basis(v)(x) * c
          v += 1
        }
        tmp(u * 8 + x) = acc
        x += 1
      }
      u += 1
    }
    // cols: 1-D IDCT across u, scale ¼, shift, clamp
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var uu = 0
        while (uu < 8) {
          acc += Basis(uu)(y) * tmp(uu * 8 + x)
          uu += 1
        }
        val v = Math.round(acc / 4.0).toInt + 128
        out(y * 8 + x) = if (v < 0) 0 else if (v > 255) 255 else v
        x += 1
      }
      y += 1
    }
  }

  // ---- fixture encoder ----------------------------------------------------
  // DC-only baseline JPEGs with DC quantizer 8, so every 8×8 block decodes
  // to EXACTLY its chosen value (S₀₀ = (v−128)·8 → IDCT = v−128 → +128 = v)
  // under ANY conforming IDCT — the hand-computable golden corpus the
  // decoder, the JDK cross-check, and the SQL oracle all agree on.

  /** Minimal-but-valid Huffman tables for DC-only data, written into DHT:
    * DC = twelve 4-bit codes for categories 0–11; AC = EOB at 1 bit plus
    * ZRL at 2 (never all-ones, per the T.81 padding rule).
    */
  private val FixDcBits: Array[Int] = { val a = new Array[Int](17); a(4) = 12; a }
  private val FixDcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val FixAcBits: Array[Int] = { val a = new Array[Int](17); a(1) = 1; a(2) = 1; a }
  private val FixAcVals: Array[Byte] = Array(0x00.toByte, 0xf0.toByte)

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBit((bits >> i) & 1); i -= 1 }
    }
    def putBit(bit: Int): Unit = {
      acc = (acc << 1) | bit
      n += 1
      if (n == 8) {
        out += acc.toByte
        if (acc == 0xff) out += 0x00.toByte // byte stuffing
        acc = 0; n = 0
      }
    }
    def flush(): Unit = while (n != 0) putBit(1) // pad with 1s (T.81 F.1.2.3)
  }

  /** Encode one DC difference with the fixture tables + AC EOB. */
  private def putDcOnlyBlock(bw: BitWriter, diff: Int): Unit = {
    var cat = 0
    var a = math.abs(diff)
    while (a != 0) { cat += 1; a >>= 1 }
    bw.put(cat, 4) // DC code for category c is the 4-bit value c
    if (cat > 0) {
      val bits = if (diff >= 0) diff else diff + (1 << cat) - 1
      bw.put(bits, cat)
    }
    bw.put(0, 1) // AC EOB (code 0, length 1)
  }

  private def seg(out: ArrayBuffer[Byte], marker: Int, payload: Array[Byte]): Unit = {
    out += 0xff.toByte; out += marker.toByte
    val len = payload.length + 2
    out += ((len >> 8) & 0xff).toByte; out += (len & 0xff).toByte
    out ++= payload
  }

  private def headerSegs(out: ArrayBuffer[Byte], w: Int, h: Int,
                         comps: Array[(Int, Int, Int, Int)], // (id, h, v, tq)
                         restartInterval: Int): Unit = {
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (and 1 when chroma present): DC quantizer 8, AC 16
    val nTables = comps.map(_._4).distinct.sorted
    val dqt = ArrayBuffer.empty[Byte]
    nTables.foreach { tq =>
      dqt += tq.toByte
      dqt += 8.toByte
      var i = 1
      while (i < 64) { dqt += 16.toByte; i += 1 }
    }
    seg(out, 0xdb, dqt.toArray)
    // SOF0
    val sof = ArrayBuffer[Byte](8.toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      comps.length.toByte)
    comps.foreach { case (id, ch, cv, tq) =>
      sof += id.toByte; sof += ((ch << 4) | cv).toByte; sof += tq.toByte
    }
    seg(out, 0xc0, sof.toArray)
    // DHT: the fixture DC + AC tables, both as table id 0
    val dht = ArrayBuffer.empty[Byte]
    dht += 0x00.toByte
    var i = 1
    while (i <= 16) { dht += FixDcBits(i).toByte; i += 1 }
    dht ++= FixDcVals
    dht += 0x10.toByte
    i = 1
    while (i <= 16) { dht += FixAcBits(i).toByte; i += 1 }
    dht ++= FixAcVals
    seg(out, 0xc4, dht.toArray)
    if (restartInterval > 0)
      seg(out, 0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    // SOS: every component uses DC table 0 / AC table 0
    val sos = ArrayBuffer[Byte](comps.length.toByte)
    comps.foreach { case (id, _, _, _) => sos += id.toByte; sos += 0x00.toByte }
    sos += 0.toByte; sos += 63.toByte; sos += 0.toByte
    seg(out, 0xda, sos.toArray)
  }

  /** Grayscale DC-only baseline JPEG: block (bx,by) decodes to exactly
    * `value(bx, by)` (0–255) on all its visible pixels.
    */
  def makeJpegGray(w: Int, h: Int, value: (Int, Int) => Int,
                   restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val out = ArrayBuffer.empty[Byte]
    headerSegs(out, w, h, Array((1, 1, 1, 0)), restartInterval)
    val bw = new BitWriter(out)
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    var pred = 0
    var i = 0
    val total = bxs * bys
    var rstIdx = 0
    while (i < total) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.flush()
        out += 0xff.toByte; out += (0xd0 + rstIdx).toByte
        rstIdx = (rstIdx + 1) & 7
        pred = 0
      }
      val level = value(i % bxs, i / bxs) - 128
      putDcOnlyBlock(bw, level - pred)
      pred = level
      i += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** 4:2:0 color DC-only baseline JPEG: Y block (bx,by) is uniform
    * `yVal(bx,by)`, chroma is uniform per 16×16 MCU (`cbVal`/`crVal` of the
    * MCU index) — so nearest AND interpolating upsamplers agree and the
    * decode is exact under any conforming decoder.
    */
  def makeJpeg420(w: Int, h: Int, yVal: (Int, Int) => Int,
                  cbVal: (Int, Int) => Int, crVal: (Int, Int) => Int,
                  restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val out = ArrayBuffer.empty[Byte]
    headerSegs(out, w, h,
      Array((1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)), restartInterval)
    val bw = new BitWriter(out)
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val pred = new Array[Int](3)
    var mcu = 0
    var rstIdx = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        out += 0xff.toByte; out += (0xd0 + rstIdx).toByte
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var dy = 0
      while (dy < 2) {
        var dx = 0
        while (dx < 2) {
          val level = yVal(2 * mx + dx, 2 * my + dy) - 128
          putDcOnlyBlock(bw, level - pred(0))
          pred(0) = level
          dx += 1
        }
        dy += 1
      }
      val cbL = cbVal(mx, my) - 128
      putDcOnlyBlock(bw, cbL - pred(1)); pred(1) = cbL
      val crL = crVal(mx, my) - 128
      putDcOnlyBlock(bw, crL - pred(2)); pred(2) = crL
      mcu += 1
    }
    bw.flush()
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }
}
