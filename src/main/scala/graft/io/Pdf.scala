package graft.io

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

import scala.util.Try

/** PDF text extraction — the second front door of the crawl stack
  * (HtmlOps is the first): real Common-Crawl-shaped corpora carry
  * `application/pdf` payloads right behind `text/html`, and every
  * downstream text op wants the shown text, not the container.
  *
  * Everything here is implemented from the PUBLIC ISO 32000-1 (PDF 1.7)
  * spec — the classic cross-reference-table file layout (§7.5.4), the
  * PDF 1.5 cross-reference STREAM layout (§7.5.8) with object streams
  * (§7.5.7) and PNG predictors (§7.4.4.4, filters per the PNG spec §6 —
  * the same five filters `multimodal/PixelCodec.scala` reverses for
  * images), incremental-update chains (`/Prev`, §7.5.6) and hybrid-
  * reference files (`/XRefStm`, §7.5.8.4), the object grammar (§7.3),
  * FlateDecode (§7.4.4, RFC 1951 via the JVM zlib the WARC/PNG code
  * already uses), the page tree (§7.7.3), and the text-showing
  * operators (§9.4.3: Tj, ', ", TJ). No reference-repo lineage:
  * discoproject/disco has no PDF surface; this is extension surface for
  * the LLM-data pipeline.
  *
  * Documented scope (deterministic on every input, never silently
  * wrong): classic xref tables AND xref streams, chained through
  * `/Prev`/`/XRefStm` with latest-section-wins merging; object streams
  * for compressed objects; stream filters none or FlateDecode (single
  * name or 1-element array) with optional PNG predictors (2-component
  * `/DecodeParms`, 8-bit, TIFF predictor 2 out of scope); simple 8-bit
  * fonts read per their `/Encoding` — `/WinAnsiEncoding` (CP1252) and
  * `/MacRomanEncoding` via the JVM's canonical charset tables,
  * `/Differences` glyph-name overlays (AGL uniXXXX/uXXXX forms + the
  * Annex D Latin common names; a private `gNN` name rejects), Latin-1
  * when no /Encoding entry names one; composite `/Type0` fonts with
  * `/Encoding /Identity-H` read as 2-byte big-endian codes mapped
  * through the font's `/ToUnicode` CMap (§9.10.3 — bfchar, both
  * bfrange forms, UTF-16BE destinations; simple fonts carrying a
  * 1-byte ToUnicode map byte-wise through it — the subsetted-font
  * shape; a code the CMap does not cover rejects the document rather
  * than guess; Identity-V vertical writing, other CMap encodings, and
  * Type0 fonts WITHOUT a ToUnicode are out of scope and reject); encrypted documents under the STANDARD
  * security handler with the EMPTY user password — RC4-40/128 (V1/V2)
  * and AES-128-CBC (V4 `/CFM /AESV2`), key derivation and `/U`
  * verification per §7.6.3 in [[PdfCrypt]] (a real password,
  * AES-256/V5, or any other handler rejects); TJ kern numbers are
  * IGNORED (no
  * heuristic space insertion — heuristics are nondeterministic across
  * extractors, and the builder splits inside words precisely so
  * concatenation is the one right answer); every text-POSITIONING
  * operator (Td TD T* Tm, and the ' / " next-line shows) is a line
  * break. Failure is a None, never a partial answer: truncated tail,
  * dangling xref offset, corrupt Flate data, an object-reference cycle,
  * a decompression bomb, or an out-of-scope construct all reject the
  * document — the corruption-spec contract WarcSpec set.
  *
  * 100 TB shape: a PDF is one row-local binary blob; build/extract are
  * pure byte work at scan grain inside a Dataset map — no shuffle, no
  * driver involvement, task-per-file when rooted on a WARC read. The
  * payload lives in a parquet `binary` column, so metadata predicates
  * never read a byte of it (the Multimodal contract).
  */
object Pdf {

  // ----------------------------------------------------------------- model

  /** A parsed PDF object (ISO 32000-1 §7.3). Numbers are kept as Double
    * (the grammar does not separate int/real; integer consumers round).
    */
  sealed trait PObj
  final case class PNum(v: Double) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PName(v: String) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int, gen: Int) extends PObj
  final case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  /** An indirect stream object: its dict plus DECODED data. */
  final case class PStream(dict: PDict, data: Array[Byte]) extends PObj

  /** Extraction result: one string per page (lines joined by \n). */
  final case class PdfText(pages: Vector[String]) {
    def nPages: Int = pages.length
    /** All pages, lines joined by \n (page breaks are line breaks too). */
    def text: String = pages.mkString("\n")
  }

  private final class PdfError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new PdfError(msg)

  // ----------------------------------------------------------------- lexer

  private def isWs(b: Byte): Boolean =
    b == 0x00 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d || b == 0x20
  private def isDelim(b: Byte): Boolean = b.toChar match {
    case '(' | ')' | '<' | '>' | '[' | ']' | '{' | '}' | '/' | '%' => true
    case _ => false
  }
  private def isRegular(b: Byte): Boolean = !isWs(b) && !isDelim(b)

  /** Cursor over the raw bytes; shared by the file parser and the
    * content-stream tokenizer (one grammar, ISO 32000-1 §7.2).
    */
  private final class Lex(val b: Array[Byte], var p: Int) {
    def eof: Boolean = p >= b.length
    def peek: Byte = if (eof) fail("unexpected EOF") else b(p)

    /** Skip whitespace and %-comments (comment runs to EOL, §7.2.4). */
    def ws(): Unit = {
      var go = true
      while (go && !eof) {
        if (isWs(b(p))) p += 1
        else if (b(p) == '%') { while (!eof && b(p) != '\n' && b(p) != '\r') p += 1 }
        else go = false
      }
    }

    /** Next regular-character token (keyword or number text). */
    def token(): String = {
      ws()
      if (eof) fail("unexpected EOF")
      val s = p
      while (!eof && isRegular(b(p))) p += 1
      if (p == s) fail(s"expected token at $s, got delimiter '${b(s).toChar}'")
      new String(b, s, p - s, ISO_8859_1)
    }

    def expect(kw: String): Unit = {
      val t = token()
      if (t != kw) fail(s"expected '$kw', got '$t'")
    }

    /** Consume one EOL after the `stream` keyword (§7.3.8: CRLF or LF). */
    def streamEol(): Unit = {
      if (!eof && b(p) == '\r') p += 1
      if (!eof && b(p) == '\n') p += 1 else fail("missing EOL after 'stream'")
    }

    // -- object grammar (§7.3); `refs` enables `n g R` lookahead ---------

    private var nest = 0 // hostile-input guard: `[[[[…` must fail, not blow the stack

    def obj(refs: Boolean): PObj = {
      ws()
      if (eof) fail("unexpected EOF")
      nest += 1
      if (nest > 200) fail("object nesting too deep")
      val out = (b(p).toChar: @annotation.switch) match {
        case '/' => name()
        case '(' => literalString()
        case '[' => p += 1; array(refs)
        case '<' =>
          if (p + 1 < b.length && b(p + 1) == '<') { p += 2; dict(refs) }
          else hexString()
        case _ =>
          val t = token()
          t match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case _       => number(t, refs)
          }
      }
      nest -= 1
      out
    }

    private def number(t: String, refs: Boolean): PObj = {
      val v = t.toDoubleOption.getOrElse(fail(s"expected number, got '$t'"))
      // `n g R` lookahead: two non-negative integers followed by R
      if (refs && v >= 0 && v == v.floor) {
        val save = p
        ws()
        val s2 = p
        while (!eof && isRegular(b(p))) p += 1
        val t2 = if (p > s2) new String(b, s2, p - s2, ISO_8859_1) else ""
        if (t2.nonEmpty && t2.forall(_.isDigit) && t2.toIntOption.isDefined) {
          val save2 = p
          ws()
          val s3 = p
          while (!eof && isRegular(b(p))) p += 1
          val t3 = if (p > s3) new String(b, s3, p - s3, ISO_8859_1) else ""
          if (t3 == "R") return PRef(v.toInt, t2.toInt)
          p = save2
        }
        p = save
      }
      PNum(v)
    }

    private def name(): PName = {
      p += 1 // '/'
      val sb = new StringBuilder
      while (!eof && isRegular(b(p))) {
        if (b(p) == '#' && p + 2 < b.length) { // #xx hex escape (§7.3.5)
          val h = new String(b, p + 1, 2, ISO_8859_1)
          val v = Try(Integer.parseInt(h, 16)).getOrElse(fail(s"bad name escape #$h"))
          sb.append(v.toChar); p += 3
        } else { sb.append((b(p) & 0xff).toChar); p += 1 }
      }
      PName(sb.toString)
    }

    private def literalString(): PStr = {
      p += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (eof) fail("unterminated literal string")
        val c = b(p); p += 1
        c.toChar match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' =>
            if (eof) fail("dangling backslash")
            val e = b(p).toChar; p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' | ')' | '\\' => out.write(e)
              case '\r' => if (!eof && b(p) == '\n') p += 1 // \<EOL>: continuation
              case '\n' => ()
              case d if d >= '0' && d <= '7' => // 1-3 octal digits
                var v = d - '0'; var k = 0
                while (k < 2 && !eof && b(p) >= '0' && b(p) <= '7') {
                  v = v * 8 + (b(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash is dropped
            }
          case '\r' => // raw EOL in string reads as \n (§7.3.4.2)
            if (!eof && b(p) == '\n') p += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = {
      p += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (eof) fail("unterminated hex string")
        val c = b(p); p += 1
        if (c == '>') done = true
        else if (isWs(c)) ()
        else {
          val v = Character.digit(c.toChar, 16)
          if (v < 0) fail(s"bad hex digit '${c.toChar}'")
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      if (hi >= 0) out.write(hi * 16) // odd count: pad low nibble with 0
      PStr(out.toByteArray)
    }

    private def array(refs: Boolean): PArr = {
      val items = Vector.newBuilder[PObj]
      var done = false
      while (!done) {
        ws()
        if (eof) fail("unterminated array")
        if (b(p) == ']') { p += 1; done = true }
        else items += obj(refs)
      }
      PArr(items.result())
    }

    private def dict(refs: Boolean): PDict = {
      val m = Map.newBuilder[String, PObj]
      var done = false
      while (!done) {
        ws()
        if (eof) fail("unterminated dict")
        if (b(p) == '>' && p + 1 < b.length && b(p + 1) == '>') { p += 2; done = true }
        else {
          if (b(p) != '/') fail("dict key must be a name")
          val k = name().v
          m += k -> obj(refs)
        }
      }
      PDict(m.result())
    }
  }

  // ----------------------------------------------------------- stream codec

  /** Decompression-bomb guard: zlib's maximum expansion is ~1032:1, so
    * `raw·1100 + 4096` can never reject a stream a real deflater produced
    * from input this size — the per-stream cap is purely a memory bound.
    * The absolute lid caps what a LARGE raw stream may legitimately
    * inflate to; no text-bearing construct in scope approaches it.
    */
  private val InflateAbsCap: Long = 64L << 20

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val cap = math.min(raw.length.toLong * 1100 + 4096, InflateAbsCap)
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(raw.length * 4, 64), 1 << 20))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // n == 0 with more input wanted = truncated; with a preset-
        // dictionary request (or any other stall) = out-of-scope hostile
        // stream — both must FAIL, never spin (needsDictionary() leaves
        // finished()/needsInput() false forever)
        if (n == 0 && !inf.finished()) fail(
          if (inf.needsDictionary()) "FDICT preset-dictionary Flate stream (out of scope)"
          else "truncated Flate stream")
        out.write(buf, 0, n)
        if (out.size().toLong > cap) fail("Flate output too large (decompression bomb)")
      }
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"corrupt Flate stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  /** Decode a stream's raw bytes per its dict: the filter chain (none or
    * FlateDecode), then the PNG predictor named by `/DecodeParms`
    * (§7.4.4.4 — `/Predictor ≥ 10` means each decoded row is a PNG
    * filter-tag byte plus `/Columns·/Colors` bytes, reversed per the PNG
    * spec; the xref-stream layout most writers emit uses the Up filter,
    * tag 2). TIFF predictor 2 and sub-8-bit components are out of scope.
    */
  private def decodeStream(d: PDict, raw: Array[Byte]): Array[Byte] = {
    val decoded = d.m.get("Filter") match {
      case None => raw
      case Some(PName("FlateDecode")) => inflate(raw)
      case Some(PArr(Vector(PName("FlateDecode")))) => inflate(raw)
      case Some(f) => fail(s"unsupported stream filter $f")
    }
    val parms = d.m.get("DecodeParms").orElse(d.m.get("DP")) match {
      case None | Some(PNull) => None
      case Some(pd: PDict) => Some(pd)
      case Some(PArr(Vector(pd: PDict))) => Some(pd)
      case Some(_) => fail("unsupported /DecodeParms shape")
    }
    parms match {
      case None => decoded
      case Some(pd) =>
        def iv(k: String, dflt: Int): Int = pd.m.get(k) match {
          case None => dflt
          case Some(PNum(x)) if x == x.floor && x >= 0 && x <= (1 << 20) => x.toInt
          case Some(o) => fail(s"bad /DecodeParms /$k $o")
        }
        val pred = iv("Predictor", 1)
        if (pred == 1) decoded
        else if (pred >= 10) {
          if (iv("BitsPerComponent", 8) != 8)
            fail("predictor BitsPerComponent != 8 (out of scope)")
          val colors = iv("Colors", 1)
          val cols = iv("Columns", 1)
          val rowLen = cols.toLong * colors
          if (colors < 1 || cols < 1 || rowLen > (1 << 22))
            fail("bad predictor geometry")
          pngUnpredict(decoded, rowLen.toInt, colors)
        } else fail(s"predictor $pred (out of scope)") // TIFF predictor 2
    }
  }

  /** Reverse the five PNG row filters (PNG spec §6; the
    * [[graft.multimodal.PixelCodec]] unfilter specialized to `bpp`
    * bytes/pixel): each encoded row is one filter-tag byte plus `rowLen`
    * bytes; predictors read the reconstructed left (a), up (b), and
    * up-left (c) bytes, with the row above all-zero for the first row.
    */
  private def pngUnpredict(data: Array[Byte], rowLen: Int, bpp: Int): Array[Byte] = {
    val stride = rowLen + 1
    if (data.length == 0 || data.length % stride != 0)
      fail("predictor data is not a whole number of rows")
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowLen)
    var prev = -1 // offset of the reconstructed row above, -1 before row 0
    var y = 0
    while (y < rows) {
      val tag = data(y * stride) & 0xff
      val src = y * stride + 1
      val dst = y * rowLen
      var x = 0
      while (x < rowLen) {
        val rawB = data(src + x) & 0xff
        val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val b = if (prev >= 0) out(prev + x) & 0xff else 0
        val c = if (x >= bpp && prev >= 0) out(prev + x - bpp) & 0xff else 0
        val v = tag match {
          case 0 => rawB
          case 1 => rawB + a
          case 2 => rawB + b
          case 3 => rawB + (a + b) / 2
          case 4 => // Paeth (PNG spec §6.6), exact integer form
            val p0 = a + b - c
            val pa = math.abs(p0 - a); val pb = math.abs(p0 - b); val pc = math.abs(p0 - c)
            rawB + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => fail(s"bad PNG filter tag $tag")
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      prev = dst
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- document

  /** Where an object lives, per the merged cross-reference sections. */
  private sealed trait XEntry
  private final case class InFile(off: Long) extends XEntry
  private final case class InObjStm(stm: Int, idx: Int) extends XEntry
  private case object Freed extends XEntry

  /** One parsed document: merged xref entries + lazy object fetch. */
  private final class Doc(bytes: Array[Byte]) {
    private val (offsets, trailer) = readXref()
    private val cache = scala.collection.mutable.Map.empty[Int, PObj]
    // Standard-security-handler decryption (§7.6.3), empty user
    // password only. A `var` set by the init block at the BOTTOM of the
    // class body (all fields live by then) and after the /Encrypt dict
    // itself resolves: that dict's strings are stored UNENCRYPTED
    // (§7.6.2), so its fetch must see no cipher.
    private var cipher: Option[PdfCrypt.ObjectCipher] = None
    // object numbers currently being fetched: a self-referential /Length
    // (`4 0 obj << /Length 4 0 R >> stream`) re-enters fetch through
    // resolve and would recurse unboundedly — re-entry is a cycle and
    // fails as a catchable PdfError, never a StackOverflowError
    private val inFlight = scala.collection.mutable.Set.empty[Int]
    private val objStmCache =
      scala.collection.mutable.Map.empty[Int, (Vector[(Int, Int)], Int, Array[Byte])]

    /** Walk the cross-reference chain from `startxref` (§7.5.5): each
      * section is a classic table or an xref stream; classic sections may
      * name a parallel xref stream (`/XRefStm`, hybrid-reference files)
      * and either kind chains to its predecessor through `/Prev`. The
      * LATEST section wins per object (first-seen during the walk), so
      * incremental updates shadow — and `f` entries free — older bodies.
      * A hybrid pair (classic table + its `/XRefStm`) is ONE update
      * level: a classic non-free entry wins, but a classic `f` row for
      * an object the parallel stream locates resolves to the STREAM
      * entry — §7.5.8.4 hybrid writers routinely list their
      * ObjStm-resident objects free in the classic table (so a 1.4
      * reader skips them) and expect a 1.5 reader to use the stream.
      */
    private def readXref(): (Map[Int, XEntry], PDict) = {
      val tailLen = math.min(bytes.length, 256)
      val tail = new String(bytes, bytes.length - tailLen, tailLen, ISO_8859_1)
      val at = tail.lastIndexOf("startxref")
      if (at < 0) fail("no startxref in file tail")
      val lx = new Lex(bytes, bytes.length - tailLen + at)
      lx.expect("startxref")
      var off = lx.token().toLongOption.getOrElse(fail("bad startxref offset"))
      val entries = scala.collection.mutable.Map.empty[Int, XEntry]
      val seen = scala.collection.mutable.Set.empty[Long]
      var trailer: PDict = null
      var hops = 0
      def merge(sec: Seq[(Int, XEntry)]): Unit =
        sec.foreach { case (k, v) => if (!entries.contains(k)) entries(k) = v }
      while (off >= 0) {
        hops += 1
        if (hops > 64) fail("xref chain too long")
        if (!seen.add(off)) fail("xref chain cycle")
        if (off >= bytes.length) fail(s"xref offset $off out of range")
        val (sec, tr) = readSection(off.toInt)
        if (trailer == null) trailer = tr
        val stmSec: Seq[(Int, XEntry)] = tr.m.get("XRefStm") match {
          case None => Seq.empty
          case Some(PNum(x)) if x >= 0 && x == x.floor && x < bytes.length =>
            if (seen.add(x.toLong)) readSection(x.toInt)._1 else Seq.empty
          case Some(o) => fail(s"bad /XRefStm offset $o")
        }
        if (stmSec.isEmpty) merge(sec)
        else { // hybrid level: stream entry overrides a same-level Freed
          val stmFirst = scala.collection.mutable.Map.empty[Int, XEntry]
          stmSec.foreach { case (k, v) =>
            if (!stmFirst.contains(k)) stmFirst(k) = v }
          merge(sec.map {
            case (k, Freed) => k -> stmFirst.get(k).filter(_ != Freed)
              .getOrElse(Freed: XEntry)
            case kv => kv
          })
          merge(stmSec)
        }
        off = tr.m.get("Prev") match {
          case None => -1L
          case Some(PNum(x)) if x >= 0 && x == x.floor => x.toLong
          case Some(o) => fail(s"bad /Prev offset $o")
        }
      }
      (entries.toMap, trailer)
    }

    /** One cross-reference section at `off`: a classic `xref` table
      * (§7.5.4) or an xref STREAM object (§7.5.8). Returns the section's
      * entries plus its trailer dict (for an xref stream, the stream's
      * own dict IS the trailer, §7.5.8.2).
      */
    private def readSection(off: Int): (Seq[(Int, XEntry)], PDict) = {
      val lx = new Lex(bytes, off)
      lx.ws()
      if (!lx.eof && lx.peek == 'x') readClassic(lx) else readXrefStream(lx)
    }

    private def readClassic(lx: Lex): (Seq[(Int, XEntry)], PDict) = {
      lx.expect("xref")
      val out = Seq.newBuilder[(Int, XEntry)]
      var t = lx.token()
      while (t != "trailer") { // subsections: `start count` then fixed entries
        val start = t.toIntOption.getOrElse(fail(s"bad xref subsection '$t'"))
        val count = lx.token().toIntOption.getOrElse(fail("bad xref count"))
        if (start < 0 || count < 0 || start.toLong + count > 10000000)
          fail("xref subsection out of range")
        var i = 0
        while (i < count) {
          val o = lx.token(); val g = lx.token(); val kind = lx.token()
          if (kind == "n")
            out += (start + i) ->
              InFile(o.toLongOption.getOrElse(fail("bad xref offset")))
          else if (kind == "f") out += (start + i) -> Freed
          else fail(s"bad xref entry kind '$kind'")
          val _ = g
          i += 1
        }
        t = lx.token()
      }
      val tr = lx.obj(refs = true) match {
        case d: PDict => d
        case _        => fail("trailer is not a dict")
      }
      (out.result(), tr)
    }

    /** An xref STREAM (§7.5.8): `n g obj` wrapping a `/Type /XRef`
      * stream whose decoded rows are `/W`-wide big-endian fields over the
      * `/Index` subsections — type 0 free, type 1 in-file offset, type 2
      * (object stream, index). `/Length` (and every other key read here)
      * must be direct: no object can be resolved before the xref exists.
      */
    private def readXrefStream(lx: Lex): (Seq[(Int, XEntry)], PDict) = {
      lx.token().toLongOption.getOrElse(fail("bad xref object number"))
      lx.token().toLongOption.getOrElse(fail("bad xref object generation"))
      lx.expect("obj")
      val d = lx.obj(refs = true) match {
        case d: PDict => d
        case _        => fail("xref object is not a stream dict")
      }
      if (!d.m.get("Type").contains(PName("XRef")))
        fail("startxref object is not /Type /XRef")
      lx.ws(); lx.expect("stream"); lx.streamEol()
      val len = d.m.get("Length") match {
        case Some(PNum(x)) if x == x.floor => x.toLong
        case Some(_) => fail("xref stream /Length must be a direct integer")
        case None    => fail("xref stream without /Length")
      }
      if (len < 0 || lx.p.toLong + len > bytes.length)
        fail(s"xref stream length $len out of range")
      val raw = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len.toInt)
      val data = decodeStream(d, raw)
      val w = d.m.get("W") match {
        case Some(PArr(items)) if items.length == 3 => items.map {
          case PNum(x) if x == x.floor && x >= 0 && x <= 8 => x.toInt
          case o => fail(s"bad /W field width $o")
        }
        case _ => fail("xref stream missing 3-element /W")
      }
      val rowW = w.sum
      if (rowW == 0) fail("zero-width xref rows")
      val size = d.m.get("Size") match {
        case Some(PNum(x)) if x == x.floor && x >= 0 => x.toInt
        case _ => fail("xref stream missing direct /Size")
      }
      val index: Seq[(Int, Int)] = d.m.get("Index") match {
        case None => Seq((0, size))
        case Some(PArr(items)) if items.length % 2 == 0 && items.nonEmpty =>
          items.grouped(2).map {
            case Vector(PNum(a), PNum(b))
              if a == a.floor && b == b.floor && a >= 0 && b >= 0 =>
              (a.toInt, b.toInt)
            case o => fail(s"bad /Index pair $o")
          }.toSeq
        case Some(_) => fail("bad /Index")
      }
      val total = index.map(_._2.toLong).sum
      if (total > 10000000) fail(s"xref row count $total out of range")
      if (total * rowW > data.length)
        fail("xref stream data shorter than /Index claims")
      val out = Seq.newBuilder[(Int, XEntry)]
      var pos = 0
      def field(wd: Int): Long = {
        var v = 0L; var k = 0
        while (k < wd) { v = (v << 8) | (data(pos) & 0xff); pos += 1; k += 1 }
        v
      }
      index.foreach { case (start, count) =>
        var i = 0
        while (i < count) {
          val t = if (w(0) == 0) 1L else field(w(0)) // absent type defaults to 1
          val f2 = field(w(1)); val f3 = field(w(2))
          val num = start + i
          t match {
            case 0 => out += num -> Freed
            case 1 => out += num -> InFile(f2)
            case 2 => out += num -> InObjStm(f2.toInt, f3.toInt)
            case other => fail(s"bad xref entry type $other")
          }
          val _ = f3
          i += 1
        }
      }
      (out.result(), d)
    }

    /** Build the standard-handler cipher from the /Encrypt dict: derive
      * the file key for the EMPTY user password (Algorithm 2) and
      * verify it against /U — a real password, a non-/Standard
      * handler, V5/AES-256, or any crypt-filter shape other than
      * /StdCF-everywhere rejects the document (the None contract).
      */
    private def buildCipher(encObj: PObj): PdfCrypt.ObjectCipher = {
      val ed = encObj match {
        case d: PDict => d
        case _        => fail("/Encrypt is not a dict")
      }
      if (!ed.m.get("Filter").contains(PName("Standard")))
        fail("non-/Standard security handler (out of scope)")
      def int(k: String): Int = ed.m.get(k) match {
        case Some(PNum(x)) if x == x.floor => x.toLong.toInt
        case _ => fail(s"/Encrypt /$k missing or not an integer")
      }
      def bytes32(k: String): Array[Byte] = ed.m.get(k) match {
        case Some(PStr(b)) if b.length >= 32 => b
        case _ => fail(s"/Encrypt /$k missing or too short")
      }
      val v = int("V"); val r = int("R")
      if (r < 2 || r > 4) fail(s"/Encrypt revision $r (out of scope)")
      val o = bytes32("O"); val u = bytes32("U"); val p = int("P")
      val id0 = trailer.m.get("ID") match {
        case Some(PArr(PStr(b) +: _)) => b
        case _ => fail("encrypted file without a direct trailer /ID")
      }
      val encryptMetadata = ed.m.get("EncryptMetadata") match {
        case Some(PBool(b)) => b
        case None           => true
        case Some(_)        => fail("bad /EncryptMetadata")
      }
      val (nBytes, aes) = v match {
        case 1 => (5, false)
        case 2 =>
          val len = ed.m.get("Length") match {
            case None => 40
            case Some(PNum(x)) if x == x.floor => x.toInt
            case Some(_) => fail("bad /Encrypt /Length")
          }
          if (len < 40 || len > 128 || len % 8 != 0)
            fail(s"bad /Encrypt key length $len")
          (len / 8, false)
        case 4 =>
          val cf = resolve(ed.m.getOrElse("CF", fail("/Encrypt V4 without /CF"))) match {
            case d: PDict => d; case _ => fail("/CF is not a dict")
          }
          val std = resolve(cf.m.getOrElse("StdCF", fail("/CF without /StdCF"))) match {
            case d: PDict => d; case _ => fail("/StdCF is not a dict")
          }
          if (!ed.m.get("StmF").contains(PName("StdCF")) ||
              !ed.m.get("StrF").contains(PName("StdCF")))
            fail("/StmF or /StrF other than /StdCF (out of scope)")
          std.m.get("CFM") match {
            case Some(PName("AESV2")) => (16, true)
            case Some(PName("V2"))    => (16, false)
            case m => fail(s"crypt filter method $m (out of scope)")
          }
        case other => fail(s"/Encrypt V $other (out of scope)")
      }
      val key = PdfCrypt.fileKey(o, p, id0, nBytes, r, encryptMetadata)
      if (!PdfCrypt.userCheck(key, id0, r, u))
        fail("document is not openable with the empty user password")
      new PdfCrypt.ObjectCipher(key, aes)
    }

    /** Strings inside an indirect object decrypt with THAT object's
      * (num, gen) key (§7.6.2); ObjStm residents are exempt — their
      * container stream already decrypted (§7.5.7).
      */
    private def decryptStrings(o: PObj, num: Int, gen: Int,
                               c: PdfCrypt.ObjectCipher): PObj = o match {
      case PStr(b)     => PStr(c.decrypt(num, gen, b))
      case PArr(items) => PArr(items.map(decryptStrings(_, num, gen, c)))
      case PDict(m)    => PDict(m.map { case (k, x) => k -> decryptStrings(x, num, gen, c) })
      case other       => other
    }

    def root: PDict = resolve(trailer.m.getOrElse("Root", fail("trailer has no /Root"))) match {
      case d: PDict => d
      case _        => fail("/Root is not a dict")
    }

    /** Chase refs to a direct object (streams decoded on the way out). */
    def resolve(o: PObj): PObj = o match {
      case PRef(n, _) => fetch(n)
      case other      => other
    }

    private def fetch(num: Int): PObj = cache.get(num) match {
      case Some(v) => v
      case None =>
        if (!inFlight.add(num)) fail(s"object reference cycle at $num")
        val v = try {
          offsets.getOrElse(num, fail(s"object $num not in xref")) match {
            case Freed             => fail(s"object $num is free")
            case InObjStm(stm, i)  => fetchFromObjStm(num, stm, i)
            case InFile(off)       => fetchAt(num, off)
          }
        } finally inFlight.remove(num)
        cache(num) = v
        v
    }

    private def fetchAt(num: Int, off: Long): PObj = {
      if (off < 0 || off >= bytes.length) fail(s"object $num offset $off out of range")
      val lx = new Lex(bytes, off.toInt)
      val n = lx.token().toIntOption.getOrElse(fail(s"bad object header at $off"))
      if (n != num) fail(s"xref says object $num at $off, found $n")
      val gen = lx.token().toIntOption.getOrElse(fail(s"bad generation at $off"))
      lx.expect("obj")
      val v0 = lx.obj(refs = true)
      val v = cipher.fold(v0)(decryptStrings(v0, num, gen, _))
      lx.ws()
      if (!lx.eof && lx.peek == 's') {
        lx.expect("stream")
        val d = v match { case d: PDict => d; case _ => fail("stream without dict") }
        lx.streamEol()
        val len = resolve(d.m.getOrElse("Length", fail("stream without /Length"))) match {
          case PNum(x) => x.toLong // Long: a hostile huge /Length must not clamp/overflow
          case _       => fail("/Length is not a number")
        }
        if (len < 0 || lx.p.toLong + len > bytes.length)
          fail(s"stream length $len out of range")
        val raw0 = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len.toInt)
        lx.p += len.toInt
        lx.expect("endstream")
        // stored stream bytes are Encrypt(Encoded(plain)) — decrypt,
        // THEN run the filter chain (§7.6.2; a cipher failure is a
        // catchable reject through the shared error path)
        val raw = cipher.fold(raw0)(_.decrypt(num, gen, raw0))
        PStream(d, decodeStream(d, raw))
      } else v
    }

    /** Fetch a compressed object out of its object stream (§7.5.7): the
      * container's decoded data opens with `/N` (number, offset) integer
      * pairs; object bodies start at `/First` + offset and are DIRECT
      * objects (no `obj`/`endobj` wrappers, no nested streams). The
      * header pair at the xref entry's index must name the expected
      * object number — a mismatch is corruption, not a fallback search.
      */
    private def fetchFromObjStm(num: Int, stm: Int, idx: Int): PObj = {
      val (pairs, first, data) = objStmCache.get(stm) match {
        case Some(h) => h
        case None =>
          val container = fetch(stm) match {
            case s: PStream => s
            case _          => fail(s"type-2 xref entry points at non-stream object $stm")
          }
          if (!container.dict.m.get("Type").contains(PName("ObjStm")))
            fail(s"type-2 xref entry points at non-/ObjStm object $stm")
          def direct(k: String): Int =
            resolve(container.dict.m.getOrElse(k, fail(s"/ObjStm without /$k"))) match {
              case PNum(x) if x == x.floor && x >= 0 => x.toInt
              case o => fail(s"bad /ObjStm /$k $o")
            }
          val n = direct("N")
          val first = direct("First")
          if (n > 100000 || first > container.data.length)
            fail("/ObjStm header bounds out of range")
          val hx = new Lex(container.data, 0)
          val pairs = Vector.tabulate(n) { _ =>
            val o = hx.token().toIntOption.getOrElse(fail("bad ObjStm header number"))
            val f = hx.token().toIntOption.getOrElse(fail("bad ObjStm header offset"))
            if (hx.p > first) fail("ObjStm header overruns /First")
            (o, f)
          }
          val h = (pairs, first, container.data)
          objStmCache(stm) = h
          h
      }
      if (idx < 0 || idx >= pairs.length) fail(s"ObjStm index $idx out of range")
      val (onum, ooff) = pairs(idx)
      if (onum != num) fail(s"ObjStm header names object $onum at index $idx, xref says $num")
      if (first.toLong + ooff > data.length) fail("ObjStm object offset out of range")
      val ox = new Lex(data, first + ooff)
      ox.obj(refs = true)
    }

    /** The parsed `/ToUnicode` CMap of a font, cached by its indirect
      * object number (every page sharing the font reuses the parse).
      */
    private val cmapCache = scala.collection.mutable.Map.empty[Int, CMapTable]
    def toUnicodeOf(o: PObj): CMapTable = {
      def build(s: PObj): CMapTable = s match {
        case PStream(_, data) => parseToUnicode(data)
        case _                => fail("/ToUnicode is not a stream")
      }
      o match {
        case PRef(n, _) => cmapCache.getOrElseUpdate(n, build(fetch(n)))
        case other      => build(other)
      }
    }

    // encryption setup LAST: every field above must be live before the
    // /Encrypt dict fetch runs through the normal object machinery
    trailer.m.get("Encrypt").foreach(e => cipher = Some(buildCipher(resolve(e))))
  }

  // ------------------------------------------------------- fonts & CMaps

  /** How a font's show-string bytes become text: simple 8-bit fonts
    * WITHOUT a `/ToUnicode` read as Latin-1 (the documented scope);
    * simple fonts WITH one map byte-by-byte through their 1-byte CMap
    * (the subsetted-Type1/TrueType shape, where raw bytes are glyph
    * codes with no relation to Latin-1); `/Type0` composite fonts with
    * `/Encoding /Identity-H` read as 2-byte big-endian codes through
    * their 2-byte CMap (§9.10.3).
    */
  private sealed trait Font
  private case object SimpleFont extends Font
  private final case class SimpleMapped(toUnicode: Array[String]) extends Font
  private final case class Type0Font(toUnicode: Array[String]) extends Font

  /** A parsed ToUnicode CMap: source-code byte width (1 or 2) + map. */
  private[graft] final case class CMapTable(width: Int, m: Map[Int, String]) {
    /** Dense decode table (null = uncovered): show-string decoding is
      * per-code hot-path work — a boxed Map lookup per glyph across a
      * corpus is measurable, an array index is not. Built once per
      * parsed CMap (the Doc-level cache holds the table, so every page
      * sharing the font shares the array).
      */
    lazy val dense: Array[String] = {
      val a = new Array[String](if (width == 1) 256 else 65536)
      m.foreach { case (k, v) => if (k >= 0 && k < a.length) a(k) = v }
      a
    }
  }

  private def fontOf(doc: Doc, o: PObj): Font = o match {
    case fd: PDict if fd.m.get("Subtype").contains(PName("Type0")) =>
      doc.resolve(fd.m.getOrElse("Encoding",
        fail("Type0 font without /Encoding"))) match {
        case PName("Identity-H") => ()
        case e => fail(s"Type0 encoding $e (only Identity-H in scope)")
      }
      val t = doc.toUnicodeOf(fd.m.getOrElse("ToUnicode",
        fail("Type0 font without /ToUnicode (glyphs unmappable)")))
      if (t.width != 2) fail("Type0 ToUnicode codes are not 2-byte (Identity-H)")
      Type0Font(t.dense)
    case fd: PDict => fd.m.get("ToUnicode") match {
      case Some(r) => // ToUnicode wins over any encoding entry (§9.10.3)
        val t = doc.toUnicodeOf(r)
        if (t.width != 1) fail("simple-font ToUnicode codes are not 1-byte")
        SimpleMapped(t.dense)
      case None => fd.m.get("Encoding").map(doc.resolve) match {
        case None => SimpleFont // built-in encoding: the Latin-1 read (scope)
        case Some(PName(n)) => SimpleMapped(Encodings.dense(Encodings.named(n)))
        case Some(ed: PDict) =>
          val base = ed.m.get("BaseEncoding") match {
            case None           => Encodings.latin1
            case Some(PName(n)) => Encodings.named(n)
            case Some(o)        => fail(s"bad /BaseEncoding $o")
          }
          SimpleMapped(Encodings.dense(Encodings.withDifferences(base,
            ed.m.get("Differences").map(doc.resolve))))
        case Some(o) => fail(s"bad simple-font /Encoding $o")
      }
    }
    case _ => fail("font resource is not a dict")
  }

  /** Simple-font byte encodings (ISO 32000-1 Annex D). WinAnsi IS
    * Windows code page 1252 and MacRoman IS Mac OS Roman, so the
    * 256-entry tables come from the JVM's canonical charset
    * implementations rather than a hand-typed annex (the only place
    * they could drift is the JDK itself). An /Encoding DICT overlays
    * `/Differences` glyph-name overrides on its `/BaseEncoding`:
    * `uniXXXX`/`uXXXX[XX]` names decode algorithmically (Adobe Glyph
    * List rules), a single ASCII letter names itself, and a curated
    * common-name table covers the standard Latin set; any other glyph
    * name rejects the document — a subset font's private `gNN` names
    * carry no text and must never be guessed. A font whose dict has NO
    * /Encoding key keeps the Latin-1 read (the documented
    * built-in-encoding approximation). A ToUnicode CMap, when present,
    * takes precedence over all of this.
    */
  private object Encodings {
    private def charsetMap(cs: String): Map[Int, String] = {
      val c = java.nio.charset.Charset.forName(cs)
      (0 to 255).map(b => b -> new String(Array(b.toByte), c)).toMap
    }
    lazy val latin1: Map[Int, String] = charsetMap("ISO-8859-1")
    private lazy val winAnsi = charsetMap("windows-1252")
    private lazy val macRoman = charsetMap("x-MacRoman")

    /** Dense 256-slot decode table (null = uncovered) — same hot-path
      * rationale as [[CMapTable.dense]].
      */
    def dense(m: Map[Int, String]): Array[String] = {
      val a = new Array[String](256)
      m.foreach { case (k, v) => if (k >= 0 && k < 256) a(k) = v }
      a
    }
    def named(n: String): Map[Int, String] = n match {
      case "WinAnsiEncoding"  => winAnsi
      case "MacRomanEncoding" => macRoman
      case other => fail(s"simple-font encoding /$other (out of scope)")
    }

    /** The common glyph names of Annex D's Latin set (punctuation,
      * digits, frequent accents/ligatures) — the names real
      * /Differences arrays use when they are not uniXXXX form.
      */
    private val common: Map[String, String] = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9", "colon" -> ":", "semicolon" -> ";",
      "less" -> "<", "equal" -> "=", "greater" -> ">", "question" -> "?",
      "at" -> "@", "bracketleft" -> "[", "backslash" -> "\\",
      "bracketright" -> "]", "asciicircum" -> "^", "underscore" -> "_",
      "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "bullet" -> "•", "endash" -> "–", "emdash" -> "—",
      "ellipsis" -> "…", "dagger" -> "†",
      "daggerdbl" -> "‡", "periodcentered" -> "·",
      "perthousand" -> "‰", "trademark" -> "™",
      "copyright" -> "©", "registered" -> "®",
      "degree" -> "°", "plusminus" -> "±",
      "Euro" -> "€", "cent" -> "¢", "sterling" -> "£",
      "yen" -> "¥", "currency" -> "¤", "section" -> "§",
      "paragraph" -> "¶", "exclamdown" -> "¡",
      "questiondown" -> "¿", "florin" -> "ƒ",
      "fraction" -> "⁄", "fi" -> "ﬁ", "fl" -> "ﬂ",
      "germandbls" -> "ß", "dotlessi" -> "ı",
      "oe" -> "œ", "OE" -> "Œ", "ae" -> "æ",
      "AE" -> "Æ", "oslash" -> "ø", "Oslash" -> "Ø",
      "Lslash" -> "Ł", "lslash" -> "ł",
      "Scaron" -> "Š", "scaron" -> "š",
      "Zcaron" -> "Ž", "zcaron" -> "ž",
      "Ydieresis" -> "Ÿ", "ydieresis" -> "ÿ",
      "circumflex" -> "ˆ", "tilde" -> "˜",
      "macron" -> "¯", "breve" -> "˘",
      "dotaccent" -> "˙", "dieresis" -> "¨",
      "ring" -> "˚", "cedilla" -> "¸",
      "hungarumlaut" -> "˝", "ogonek" -> "˛",
      "caron" -> "ˇ",
      "agrave" -> "à", "aacute" -> "á",
      "acircumflex" -> "â", "atilde" -> "ã",
      "adieresis" -> "ä", "aring" -> "å",
      "ccedilla" -> "ç", "egrave" -> "è",
      "eacute" -> "é", "ecircumflex" -> "ê",
      "edieresis" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icircumflex" -> "î",
      "idieresis" -> "ï", "ntilde" -> "ñ",
      "ograve" -> "ò", "oacute" -> "ó",
      "ocircumflex" -> "ô", "otilde" -> "õ",
      "odieresis" -> "ö", "divide" -> "÷",
      "ugrave" -> "ù", "uacute" -> "ú",
      "ucircumflex" -> "û", "udieresis" -> "ü",
      "yacute" -> "ý", "thorn" -> "þ", "eth" -> "ð",
      "Agrave" -> "À", "Aacute" -> "Á",
      "Acircumflex" -> "Â", "Atilde" -> "Ã",
      "Adieresis" -> "Ä", "Aring" -> "Å",
      "Ccedilla" -> "Ç", "Egrave" -> "È",
      "Eacute" -> "É", "Ecircumflex" -> "Ê",
      "Edieresis" -> "Ë", "Igrave" -> "Ì",
      "Iacute" -> "Í", "Icircumflex" -> "Î",
      "Idieresis" -> "Ï", "Ntilde" -> "Ñ",
      "Ograve" -> "Ò", "Oacute" -> "Ó",
      "Ocircumflex" -> "Ô", "Otilde" -> "Õ",
      "Odieresis" -> "Ö", "multiply" -> "×",
      "Ugrave" -> "Ù", "Uacute" -> "Ú",
      "Ucircumflex" -> "Û", "Udieresis" -> "Ü",
      "Yacute" -> "Ý", "Thorn" -> "Þ", "Eth" -> "Ð",
      "mu" -> "µ", "logicalnot" -> "¬", "brokenbar" -> "¦",
      "ordfeminine" -> "ª", "ordmasculine" -> "º",
      "onequarter" -> "¼", "onehalf" -> "½",
      "threequarters" -> "¾", "onesuperior" -> "¹",
      "twosuperior" -> "²", "threesuperior" -> "³",
      "minus" -> "−", "nbspace" -> " ")

    /** Glyph name → text per the Adobe Glyph List rules in scope. */
    def glyphText(name: String): String = {
      val isHex = (s: String) => s.nonEmpty && s.forall(c => Character.digit(c, 16) >= 0)
      if (name.length == 1 && name.head.isLetter && name.head < 0x80)
        name // A..Z a..z name themselves
      else if (name.startsWith("uni") && (name.length - 3) % 4 == 0 &&
               name.length > 3 && isHex(name.drop(3)))
        name.drop(3).grouped(4)
          .map(h => Integer.parseInt(h, 16).toChar).mkString
      else if (name.head == 'u' && name.length >= 5 && name.length <= 7 &&
               isHex(name.tail) &&
               Character.isValidCodePoint(Integer.parseInt(name.tail, 16)))
        new String(Character.toChars(Integer.parseInt(name.tail, 16)))
      else common.getOrElse(name, fail(s"glyph name /$name (out of scope)"))
    }

    /** Overlay a /Differences array on a base table (§9.6.6.1: a
      * number sets the next code, each following name fills codes
      * upward).
      */
    def withDifferences(base: Map[Int, String],
                        diffs: Option[PObj]): Map[Int, String] = diffs match {
      case None => base
      case Some(PArr(items)) =>
        var code = -1
        var m = base
        items.foreach {
          case PNum(x) if x == x.floor && x >= 0 && x <= 255 => code = x.toInt
          case PName(n) =>
            if (code < 0 || code > 255) fail("/Differences name without a code")
            m = m.updated(code, glyphText(n))
            code += 1
          case o => fail(s"bad /Differences item $o")
        }
        m
      case Some(o) => fail(s"bad /Differences $o")
    }
  }

  /** Parse a `/ToUnicode` CMap stream (ISO 32000-1 §9.10.3) into the
    * code → text mapping. The stream is a PostScript-wrapped CMap: the
    * wrapper tokens (`findresource`, `begincmap`, `def`, …) carry no
    * mapping semantics and are scanned over with the SAME object
    * grammar the content streams use; only `begincodespacerange`,
    * `beginbfchar`, and `beginbfrange` blocks are interpreted.
    *
    * Scope (deterministic, all-or-nothing): source codes are 1-byte
    * (simple subsetted fonts) or 2-byte (the Identity-H geometry) —
    * ONE width per CMap, inferred from the first code seen and
    * enforced across every entry; destinations are UTF-16BE hex
    * strings (multi-unit targets like ligatures and surrogate pairs
    * included); the bfrange string-destination form increments the
    * LAST UTF-16 code unit (the convention every mainstream extractor
    * applies) and must not overflow it; the array form must list
    * exactly hi−lo+1 destinations. The expanded mapping is capped at
    * 70k entries (a 2-byte space holds 65 536) — any violation rejects
    * the document.
    */
  private[graft] def parseToUnicode(data: Array[Byte]): CMapTable = {
    val lx = new Lex(data, 0)
    val out = scala.collection.mutable.Map.empty[Int, String]
    var width = -1 // inferred from the first source code / codespace
    def put(code: Int, dst: String): Unit = {
      out(code) = dst
      if (out.size > 70000) fail("ToUnicode mapping too large")
    }
    def code2(o: PObj): Int = o match {
      case PStr(b) if b.length == 1 || b.length == 2 =>
        if (width < 0) width = b.length
        else if (width != b.length)
          fail(s"mixed ${b.length}-byte code in a $width-byte CMap")
        if (b.length == 1) b(0) & 0xff
        else ((b(0) & 0xff) << 8) | (b(1) & 0xff)
      case _ => fail("ToUnicode source code is not 1- or 2-byte")
    }
    def utf16(b: Array[Byte]): String = {
      if (b.length % 2 != 0 || b.isEmpty)
        fail("ToUnicode destination is not whole UTF-16BE units")
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    // each block reads objects until its end keyword; a stray delimiter
    // or EOF inside fails loudly through the shared lexer
    def block(end: String)(entry: () => Unit): Unit = {
      var done = false
      while (!done) {
        lx.ws()
        if (lx.eof) fail(s"unterminated CMap block (no $end)")
        if (lx.peek == '<') entry()
        else if (lx.token() == end) done = true
        else fail(s"unexpected token in CMap block before $end")
      }
    }
    while ({ lx.ws(); !lx.eof }) {
      val c = lx.peek.toChar
      if (c == '<' || c == '(' || c == '[' || c == '/' || c == '-' ||
          c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        lx.obj(refs = false); () // wrapper operand — no mapping semantics
      } else lx.token() match {
        case "begincodespacerange" => block("endcodespacerange") { () =>
          (lx.obj(refs = false), lx.obj(refs = false)) match {
            case (PStr(a), PStr(b))
              if a.length == b.length &&
                 (a.length == 1 || a.length == 2) =>
              if (width < 0) width = a.length
              else if (width != a.length)
                fail(s"mixed ${a.length}-byte codespace in a $width-byte CMap")
            case _ => fail("codespace range is not 1- or 2-byte")
          }
        }
        case "beginbfchar" => block("endbfchar") { () =>
          val src = code2(lx.obj(refs = false))
          lx.obj(refs = false) match {
            case PStr(b) => put(src, utf16(b))
            case _       => fail("bfchar destination is not a string")
          }
        }
        case "beginbfrange" => block("endbfrange") { () =>
          val lo = code2(lx.obj(refs = false))
          val hi = code2(lx.obj(refs = false))
          if (hi < lo) fail(s"bfrange <$lo> <$hi> is inverted")
          lx.ws()
          if (!lx.eof && lx.peek == '[') lx.obj(refs = false) match {
            case PArr(items) =>
              if (items.length != hi - lo + 1)
                fail("bfrange array arity != range size")
              items.zipWithIndex.foreach {
                case (PStr(b), i) => put(lo + i, utf16(b))
                case _ => fail("bfrange array item is not a string")
              }
            case _ => fail("bfrange array destination expected")
          } else lx.obj(refs = false) match {
            case PStr(b) =>
              val s = utf16(b)
              val last = s.charAt(s.length - 1).toInt
              if (last + (hi - lo) > 0xffff)
                fail("bfrange destination overflows its last UTF-16 unit")
              var i = 0
              while (i <= hi - lo) {
                put(lo + i, s.substring(0, s.length - 1) + (last + i).toChar)
                i += 1
              }
            case _ => fail("bfrange destination is not a string")
          }
        }
        case _ => () // PostScript wrapper keyword
      }
    }
    CMapTable(if (width < 0) 2 else width, out.toMap)
  }

  // ----------------------------------------------------------- extraction

  /** Extract the shown text of every page; None on any malformed or
    * out-of-scope input (the all-or-nothing corruption contract).
    */
  def extract(bytes: Array[Byte]): Option[PdfText] =
    try {
      if (bytes.length < 8 || !new String(bytes, 0, 5, ISO_8859_1).equals("%PDF-"))
        return None
      val doc = new Doc(bytes)
      val pagesRoot = doc.resolve(doc.root.m.getOrElse("Pages", fail("catalog has no /Pages")))
      val pages = Vector.newBuilder[String]
      collectPages(doc, pagesRoot, pages, seen = scala.collection.mutable.Set.empty,
        depth = 0, inheritedRes = None)
      Some(PdfText(pages.result()))
    } catch {
      // the all-or-nothing contract: ANY malformed/hostile construct is a
      // None, never an escaping exception that kills a streaming ingest
      // task (NonFatal keeps OOM/StackOverflow loud — the nesting/depth/
      // ref-cycle guards and the inflate cap make those unreachable from
      // input alone)
      case scala.util.control.NonFatal(_) => None
    }

  /** Convenience: full text (pages joined by \n), None on failure. */
  def extractText(bytes: Array[Byte]): Option[String] = extract(bytes).map(_.text)

  /** Diagnostic twin of [[extract]]: the failure message instead of
    * None (tests and triage only — production paths use extract).
    */
  private[graft] def extractDebug(bytes: Array[Byte]): Either[String, PdfText] =
    try {
      if (bytes.length < 8 || !new String(bytes, 0, 5, ISO_8859_1).equals("%PDF-"))
        return Left("not a PDF header")
      val doc = new Doc(bytes)
      val pagesRoot = doc.resolve(doc.root.m.getOrElse("Pages", fail("catalog has no /Pages")))
      val pages = Vector.newBuilder[String]
      collectPages(doc, pagesRoot, pages, seen = scala.collection.mutable.Set.empty,
        depth = 0, inheritedRes = None)
      Right(PdfText(pages.result()))
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def collectPages(doc: Doc, node: PObj,
                           out: scala.collection.mutable.Builder[String, Vector[String]],
                           seen: scala.collection.mutable.Set[Int],
                           depth: Int, inheritedRes: Option[PDict]): Unit = {
    if (depth > 64) fail("page tree too deep (cycle?)")
    val d = node match { case d: PDict => d; case _ => fail("page-tree node is not a dict") }
    // /Resources is inheritable down the page tree (§7.7.3.4)
    val res: Option[PDict] = d.m.get("Resources").map(doc.resolve) match {
      case None            => inheritedRes
      case Some(rd: PDict) => Some(rd)
      case Some(_)         => fail("/Resources is not a dict")
    }
    d.m.get("Type") match {
      case Some(PName("Pages")) =>
        val kids = doc.resolve(d.m.getOrElse("Kids", fail("/Pages without /Kids"))) match {
          case PArr(items) => items
          case _           => fail("/Kids is not an array")
        }
        kids.foreach { k =>
          k match {
            case PRef(n, _) =>
              if (!seen.add(n)) fail(s"page-tree cycle at object $n")
            case _ => ()
          }
          collectPages(doc, doc.resolve(k), out, seen, depth + 1, res)
        }
      case Some(PName("Page")) =>
        val fonts: Map[String, Font] = res.flatMap(_.m.get("Font"))
          .map(doc.resolve) match {
          case None             => Map.empty
          case Some(fd: PDict)  =>
            fd.m.map { case (n, fo) => n -> fontOf(doc, doc.resolve(fo)) }
          case Some(_)          => fail("/Font is not a dict")
        }
        val content = d.m.get("Contents") match {
          case None => Array.emptyByteArray
          case Some(c) => doc.resolve(c) match {
            case PStream(_, data) => data
            case PArr(items) => // multi-stream page: divides at lexical boundaries (§7.8.2)
              items.map(doc.resolve(_) match {
                case PStream(_, data) => data
                case _                => fail("/Contents array item is not a stream")
              }).reduceOption(_ ++ "\n".getBytes(ISO_8859_1) ++ _)
                .getOrElse(Array.emptyByteArray)
            case _ => fail("/Contents is not a stream")
          }
        }
        out += pageText(content, fonts)
      case t => fail(s"unexpected page-tree node type $t")
    }
  }

  /** Run the text-showing operators of one content stream (§9.4.3).
    * Line model: Td, TD, T*, Tm and BT break lines; ' and " break then
    * show; TJ concatenates its strings (kern numbers ignored — scope).
    * `Tf` switches the active font: show strings decode per the SELECTED
    * font — Latin-1 for simple fonts (and when the name is not in the
    * page's resources, the pre-Type0 behavior), byte-wise through a
    * 1-byte ToUnicode CMap for subsetted simple fonts that carry one,
    * 2-byte Identity-H codes through the CMap for Type0 fonts. The font is text state
    * that persists across BT/ET (q/Q graphics-state save/restore of the
    * font is out of scope — the builder never emits it).
    */
  private def pageText(content: Array[Byte], fonts: Map[String, Font]): String = {
    val lx = new Lex(content, 0)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var any = false // a line exists once any show op ran on it
    var font: Font = SimpleFont
    def break(): Unit = { if (any) lines += cur.toString; cur.clear(); any = false }
    def show(s: Array[Byte]): Unit = {
      font match {
        case SimpleFont => cur.append(new String(s, ISO_8859_1))
        case SimpleMapped(map) =>
          var i = 0
          while (i < s.length) {
            val code = s(i) & 0xff
            val u = map(code)
            if (u == null) fail(s"ToUnicode CMap does not cover byte $code")
            cur.append(u)
            i += 1
          }
        case Type0Font(map) =>
          if (s.length % 2 != 0) fail("odd-length Identity-H show string")
          var i = 0
          while (i < s.length) {
            val code = ((s(i) & 0xff) << 8) | (s(i + 1) & 0xff)
            val u = map(code)
            if (u == null) fail(s"ToUnicode CMap does not cover code $code")
            cur.append(u)
            i += 2
          }
      }
      any = true
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[PObj]
    while ({ lx.ws(); !lx.eof }) {
      val o = lx.peek.toChar match {
        case '(' | '<' | '[' | '/' => Some(lx.obj(refs = false))
        case c if c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9') =>
          Some(lx.obj(refs = false))
        case _ => None
      }
      o match {
        case Some(operand) => stack += operand
        case None =>
          val op = lx.token()
          op match {
            case "Tj" => stack.lastOption match {
              case Some(PStr(s)) => show(s)
              case _             => fail("Tj without string operand")
            }
            case "'" => stack.lastOption match {
              case Some(PStr(s)) => break(); show(s)
              case _             => fail("' without string operand")
            }
            case "\"" => stack.lastOption match {
              case Some(PStr(s)) => break(); show(s)
              case _             => fail("\" without string operand")
            }
            case "TJ" => stack.lastOption match {
              case Some(PArr(items)) =>
                items.foreach { case PStr(s) => show(s); case _ => () }
              case _ => fail("TJ without array operand")
            }
            case "Td" | "TD" | "T*" | "Tm" | "BT" => break()
            case "Tf" =>
              if (stack.length < 2) fail("Tf without operands")
              stack(stack.length - 2) match {
                case PName(n) => font = fonts.getOrElse(n, SimpleFont)
                case _        => fail("Tf operand is not a font name")
              }
            case _ => () // all other operators are not text-bearing
          }
          stack.clear()
      }
    }
    break()
    lines.result().mkString("\n")
  }

  // -------------------------------------------------------------- builder

  /** Fixed layout geometry of [[build]]: text is chunked into
    * [[LineWidth]]-char lines, [[LinesPerPage]] lines per page — so page
    * count is pure arithmetic over the text length and the DuckDB oracle
    * never touches a byte: ceil(max(ceil(len/60), 1) / 30).
    */
  val LineWidth = 60
  val LinesPerPage = 30

  /** Build a real PDF showing `text` (Latin-1, newline-free scope: a
    * source '\n' would round-trip as a char INSIDE a shown line and be
    * indistinguishable from a layout line break downstream, so the
    * builder rejects it loudly rather than let a consumer's line-break
    * strip silently diverge — the fixture generator's reject-don't-lose
    * rule, same as non-Latin-1). Line grain exercises all four show
    * forms: plain Tj, TJ with a mid-word kern split, and the ' next-line
    * show; content streams FlateDecode'd unless `compress` is false
    * (both filter paths are real).
    *
    * `xrefStream = false` emits the classic PDF 1.4 single-xref-table
    * layout. `xrefStream = true` emits the PDF 1.5 layout most post-2005
    * writers produce: the document dictionaries packed into an object
    * stream (`/Type /ObjStm`), content streams as top-level objects, and
    * a cross-reference STREAM (`/Type /XRef`, `/W [1 4 2]`) — PNG
    * Up-predicted and FlateDecode'd when `compress`, raw when not (both
    * xref-stream decode paths are real). All layouts show identical
    * text.
    *
    * `cidFont = true` emits the post-2010 FONT layout: a `/Type0`
    * composite font, `/Encoding /Identity-H`, a `/CIDFontType2`
    * descendant, and a generated `/ToUnicode` CMap stream — the
    * subsetted-font shape mainstream producers write. Character codes
    * are assigned in first-seen order (code 1 up, the subsetter
    * convention — codes carry NO relation to Unicode), show strings
    * become 2-byte-per-code hex strings, and the CMap maps codes back
    * via all three §9.10.3 entry forms (greedy: increment-form bfrange
    * for runs where codes AND chars advance together, array-form
    * bfrange for code runs without char runs, bfchar for singletons;
    * blocks chunked at the spec's 100-entry limit). Orthogonal to
    * `xrefStream` — all four layout combinations extract identically.
    *
    * `encrypt` ∈ { "", "rc4-40", "rc4-128", "aesv2" } applies the
    * standard security handler (§7.6.3) with EMPTY owner and user
    * passwords — the restrict-permissions-only shape crawls meet:
    * V1/R2 40-bit RC4, V2/R3 128-bit RC4, or V4/R4 AES-128-CBC via
    * /CF /StdCF /CFM /AESV2. Streams store Encrypt(Encoded(plain));
    * top-level literal strings (the classic CID layout's
    * /CIDSystemInfo) encrypt with their object's key; ObjStm-resident
    * strings stay plain inside the encrypted container (§7.5.7); the
    * xref stream itself is never encrypted (§7.5.8.2). /ID derives
    * from MD5(text) so fixtures are byte-stable. Orthogonal to every
    * other knob.
    */
  def build(text: String, compress: Boolean = true,
            xrefStream: Boolean = false, cidFont: Boolean = false,
            encrypt: String = ""): Array[Byte] = {
    require(text.forall(_ < 0x100),
      "builder scope is Latin-1 text (simple 8-bit fonts)")
    require(!text.exists(c => c == '\n' || c == '\r'),
      "builder scope is newline-free text (a source newline is " +
        "indistinguishable from a layout line break after extraction)")
    val lines: Vector[String] =
      if (text.isEmpty) Vector("")
      else text.grouped(LineWidth).toVector
    val pages = lines.grouped(LinesPerPage).toVector

    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '('  => sb.append("\\(")
        case ')'  => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case c if c >= 0x20 && c < 0x7f => sb.append(c)
        case c => sb.append(f"\\${c.toInt}%03o")
      }
      sb.toString
    }

    // subsetter-style code table: first-seen char -> 1-based code
    val codeOf: Map[Char, Int] =
      if (!cidFont) Map.empty
      else text.distinct.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    // dense twin of codeOf for the per-char show-string hot path (a
    // format-interpolator + boxed Map lookup per glyph dominates the
    // CID builder's profile); 0 = absent, codes are 1-based.
    val codeArr: Array[Int] =
      if (!cidFont) null
      else {
        val a = new Array[Int](65536)
        codeOf.foreach { case (c, v) => a(c.toInt) = v }
        a
      }
    val hexDigit = "0123456789abcdef".toCharArray
    def hexShow(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length * 4 + 2)
      sb.append('<')
      var i = 0
      while (i < s.length) {
        val v = codeArr(s.charAt(i).toInt)
        sb.append(hexDigit((v >> 12) & 0xf)).append(hexDigit((v >> 8) & 0xf))
          .append(hexDigit((v >> 4) & 0xf)).append(hexDigit(v & 0xf))
        i += 1
      }
      sb.append('>').toString
    }
    def showStr(s: String): String = if (cidFont) hexShow(s) else s"(${esc(s)})"

    def contentStream(pageLines: Vector[String]): Array[Byte] = {
      val sb = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
      pageLines.zipWithIndex.foreach { case (line, i) =>
        if (i == 0) sb.append(s"${showStr(line)} Tj\n")
        else (i % 3: @annotation.switch) match {
          case 1 => // TJ: split mid-line; kern number carries no space
            val cut = line.length / 2
            sb.append(s"0 -14 Td\n[${showStr(line.take(cut))} -250 ${showStr(line.drop(cut))}] TJ\n")
          case 2 => // ': move to next line and show, no explicit Td
            sb.append(s"${showStr(line)} '\n")
          case _ =>
            sb.append(s"0 -14 Td\n${showStr(line)} Tj\n")
        }
      }
      sb.append("ET\n")
      sb.toString.getBytes(ISO_8859_1)
    }

    // standard security handler setup (empty owner + user passwords)
    val encMode: Option[(Int, Int, Int, Boolean)] = encrypt match {
      case ""        => None
      case "rc4-40"  => Some((1, 2, 5, false))
      case "rc4-128" => Some((2, 3, 16, false))
      case "aesv2"   => Some((4, 4, 16, true))
      case other =>
        throw new IllegalArgumentException(s"unknown encrypt mode '$other'")
    }
    def hexPStr(b: Array[Byte]): String =
      "<" + b.map(x => f"$x%02x").mkString + ">"
    val encState: Option[(PdfCrypt.ObjectCipher, String, String)] =
      encMode.map { case (v, r, n, aes) =>
        val id0 = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(ISO_8859_1))
        val p = -4
        val o = PdfCrypt.ownerEntry(n, r)
        val key = PdfCrypt.fileKey(o, p, id0, n, r, encryptMetadata = true)
        val u = PdfCrypt.userEntry(key, id0, r)
        val dict = v match {
          case 1 => s"<< /Filter /Standard /V 1 /R 2 " +
            s"/O ${hexPStr(o)} /U ${hexPStr(u)} /P $p >>"
          case 2 => s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
            s"/O ${hexPStr(o)} /U ${hexPStr(u)} /P $p >>"
          case _ => "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
            "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
            "/StmF /StdCF /StrF /StdCF " +
            s"/O ${hexPStr(o)} /U ${hexPStr(u)} /P $p >>"
        }
        val trailerKeys = s"/ID [ ${hexPStr(id0)} ${hexPStr(id0)} ] "
        (new PdfCrypt.ObjectCipher(key, aes), dict, trailerKeys)
      }
    // a literal string at a TOP-LEVEL object: plain in the clear and
    // ObjStm cases, per-object-key encrypted (hex-emitted) otherwise
    def litStr(s: String, objNum: Int): String = encState match {
      case Some((c, _, _)) if !xrefStream =>
        hexPStr(c.encrypt(objNum, 0, s.getBytes(ISO_8859_1)))
      case _ => s"($s)"
    }

    // object table: 1 catalog, 2 pages, 3 font, then (page, content)
    // pairs; the CID layout inserts 4 descendant-font + 5 ToUnicode
    val firstPage = if (cidFont) 6 else 4
    val nObjs = firstPage - 1 + 2 * pages.length
    val kids = pages.indices.map(i => s"${firstPage + 2 * i} 0 R").mkString(" ")
    val dictBody = new Array[String](nObjs + 1) // non-stream object bodies
    dictBody(1) = "<< /Type /Catalog /Pages 2 0 R >>"
    dictBody(2) = s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>"
    val contentData = new Array[(Array[Byte], String)](nObjs + 1)
    def streamSlot(objNum: Int, data: Array[Byte]): (Array[Byte], String) = {
      val encoded =
        if (compress) (deflate(data), "/Filter /FlateDecode ") else (data, "")
      encState.fold(encoded) { case (c, _, _) =>
        (c.encrypt(objNum, 0, encoded._1), encoded._2) }
    }
    if (!cidFont)
      dictBody(3) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    else {
      dictBody(3) = "<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica " +
        "/Encoding /Identity-H /DescendantFonts [ 4 0 R ] /ToUnicode 5 0 R >>"
      dictBody(4) = "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Helvetica " +
        s"/CIDSystemInfo << /Registry ${litStr("Adobe", 4)} " +
        s"/Ordering ${litStr("Identity", 4)} /Supplement 0 >> " +
        "/CIDToGIDMap /Identity /DW 500 >>"
      contentData(5) = streamSlot(5, toUnicodeCMap(codeOf))
    }
    pages.zipWithIndex.foreach { case (pl, i) =>
      val pageNum = firstPage + 2 * i
      val contNum = pageNum + 1
      dictBody(pageNum) = "<< /Type /Page /Parent 2 0 R " +
        "/MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contNum 0 R >>"
      contentData(contNum) = streamSlot(contNum, contentStream(pl))
    }

    if (!xrefStream) buildClassic(nObjs, dictBody, contentData, encState)
    else buildXrefStreamLayout(nObjs, dictBody, contentData, compress, encState)
  }

  /** Generate the builder's `/ToUnicode` CMap (the §9.10.3 skeleton):
    * greedy entry-form assignment over the code-ordered table —
    * increment-form bfrange where ≥ 3 consecutive codes map to
    * consecutive chars, array-form bfrange for code runs of ≥ 2 without
    * the char run (capped at 8 per entry so singles still surface),
    * bfchar for the rest; all blocks chunked at the spec's 100-entry
    * limit. Deterministic in the code table alone.
    */
  private def toUnicodeCMap(codeOf: Map[Char, Int]): Array[Byte] = {
    val pairs = codeOf.toVector.map(_.swap).sortBy(_._1)
    val bfchar = Vector.newBuilder[(Int, Char)]
    val bfrangeInc = Vector.newBuilder[(Int, Int, Char)]
    val bfrangeArr = Vector.newBuilder[(Int, Vector[Char])]
    var i = 0
    while (i < pairs.length) {
      var j = i + 1
      while (j < pairs.length && pairs(j)._1 == pairs(i)._1 + (j - i) &&
             pairs(j)._2 == pairs(i)._2 + (j - i)) j += 1
      if (j - i >= 3) { bfrangeInc += ((pairs(i)._1, pairs(j - 1)._1, pairs(i)._2)); i = j }
      else {
        var k = i + 1
        while (k < pairs.length && pairs(k)._1 == pairs(i)._1 + (k - i) &&
               (k - i) < 8) k += 1
        if (k - i >= 2) { bfrangeArr += ((pairs(i)._1, pairs.slice(i, k).map(_._2))); i = k }
        else { bfchar += pairs(i); i += 1 }
      }
    }
    def hex4(v: Int): String = f"<$v%04x>"
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n")
    sb.append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
    sb.append("1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n")
    bfchar.result().grouped(100).foreach { chunk =>
      sb.append(s"${chunk.length} beginbfchar\n")
      chunk.foreach { case (c, ch) =>
        sb.append(s"${hex4(c)} ${hex4(ch.toInt)}\n") }
      sb.append("endbfchar\n")
    }
    val ranges: Vector[String] =
      bfrangeInc.result().map { case (lo, hi, ch) =>
        s"${hex4(lo)} ${hex4(hi)} ${hex4(ch.toInt)}" } ++
      bfrangeArr.result().map { case (lo, chs) =>
        s"${hex4(lo)} ${hex4(lo + chs.length - 1)} [" +
          chs.map(c => hex4(c.toInt)).mkString(" ") + "]" }
    ranges.grouped(100).foreach { chunk =>
      sb.append(s"${chunk.length} beginbfrange\n")
      chunk.foreach(r => sb.append(r + "\n"))
      sb.append("endbfrange\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  private def buildClassic(nObjs: Int, dictBody: Array[String],
                           contentData: Array[(Array[Byte], String)],
                           enc: Option[(PdfCrypt.ObjectCipher, String, String)]
                             = None): Array[Byte] = {
    val encNum = if (enc.isDefined) nObjs + 1 else 0
    val lastObj = if (enc.isDefined) encNum else nObjs
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(ISO_8859_1))
    val offsets = new Array[Long](lastObj + 1)
    (1 to nObjs).foreach { i =>
      offsets(i) = out.size().toLong
      if (dictBody(i) != null)
        out.write(s"$i 0 obj\n${dictBody(i)}\nendobj\n".getBytes(ISO_8859_1))
      else {
        val (data, filter) = contentData(i)
        out.write(s"$i 0 obj\n<< $filter/Length ${data.length} >>\nstream\n"
          .getBytes(ISO_8859_1))
        out.write(data)
        out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
      }
    }
    enc.foreach { case (_, dict, _) => // the /Encrypt dict, never encrypted
      offsets(encNum) = out.size().toLong
      out.write(s"$encNum 0 obj\n$dict\nendobj\n".getBytes(ISO_8859_1))
    }
    val xrefOff = out.size()
    val xref = new StringBuilder(s"xref\n0 ${lastObj + 1}\n0000000000 65535 f \n")
    (1 to lastObj).foreach(i => xref.append(f"${offsets(i)}%010d 00000 n \n"))
    val encKeys = enc.fold("") { case (_, _, tk) => s"/Encrypt $encNum 0 R $tk" }
    xref.append(s"trailer\n<< /Size ${lastObj + 1} /Root 1 0 R $encKeys>>\n")
    xref.append(s"startxref\n$xrefOff\n%%EOF\n")
    out.write(xref.toString.getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** The PDF 1.5 layout: dictionaries in an `/ObjStm` (object `nObjs+1`),
    * content streams top-level, one `/Type /XRef` stream (object
    * `nObjs+2`) closing the file. When `compress`, the xref rows are PNG
    * Up-predicted (`/Predictor 12`, tag-2 rows) then FlateDecode'd — the
    * layout mainstream writers emit; when not, the xref stream is raw
    * (no filter, no predictor), which is equally legal and pins the
    * unfiltered decode path.
    */
  private def buildXrefStreamLayout(nObjs: Int,
                                    dictBody: Array[String],
                                    contentData: Array[(Array[Byte], String)],
                                    compress: Boolean,
                                    enc: Option[(PdfCrypt.ObjectCipher, String, String)]
                                      = None): Array[Byte] = {
    // the /Encrypt dict may not live in an object stream (§7.5.7), so
    // when encrypting it takes nObjs+1 as a top-level dict
    val encNum = if (enc.isDefined) nObjs + 1 else 0
    val objStmNum = nObjs + (if (enc.isDefined) 2 else 1)
    val xrefNum = objStmNum + 1
    // object stream: header pairs `num off`, bodies at /First + off
    val inStm: Seq[Int] = (1 to nObjs).filter(dictBody(_) != null)
    val stmIdx: Map[Int, Int] = inStm.zipWithIndex.toMap
    val bodyOffs = inStm.scanLeft(0)((acc, i) => acc + dictBody(i).length + 1)
    val header = inStm.zip(bodyOffs).map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val stmPlain = (header + inStm.map(dictBody(_)).mkString("\n") + "\n")
      .getBytes(ISO_8859_1)
    val (stmData, stmFilter) = {
      val encoded =
        if (compress) (deflate(stmPlain), "/Filter /FlateDecode ") else (stmPlain, "")
      // the ObjStm container IS an encrypted stream; resident strings
      // stay plain inside it (§7.5.7)
      enc.fold(encoded) { case (c, _, _) =>
        (c.encrypt(objStmNum, 0, encoded._1), encoded._2) }
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.5\n%âãÏÓ\n".getBytes(ISO_8859_1))
    val offsets = new Array[Long](xrefNum + 1)
    (1 to nObjs).foreach { i =>
      if (contentData(i) != null) {
        offsets(i) = out.size().toLong
        val (data, filter) = contentData(i)
        out.write(s"$i 0 obj\n<< $filter/Length ${data.length} >>\nstream\n"
          .getBytes(ISO_8859_1))
        out.write(data)
        out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
      }
    }
    enc.foreach { case (_, dict, _) => // the /Encrypt dict, never encrypted
      offsets(encNum) = out.size().toLong
      out.write(s"$encNum 0 obj\n$dict\nendobj\n".getBytes(ISO_8859_1))
    }
    offsets(objStmNum) = out.size().toLong
    out.write((s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${inStm.length} " +
      s"/First ${header.length} $stmFilter/Length ${stmData.length} >>\nstream\n")
      .getBytes(ISO_8859_1))
    out.write(stmData)
    out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))

    // xref rows: /W [1 4 2] — type byte, 4-byte field 2, 2-byte field 3
    offsets(xrefNum) = out.size().toLong
    val size = xrefNum + 1
    val rowW = 7
    val rows = new Array[Byte](size * rowW)
    def putRow(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val o = num * rowW
      rows(o) = t.toByte
      rows(o + 1) = ((f2 >> 24) & 0xff).toByte
      rows(o + 2) = ((f2 >> 16) & 0xff).toByte
      rows(o + 3) = ((f2 >> 8) & 0xff).toByte
      rows(o + 4) = (f2 & 0xff).toByte
      rows(o + 5) = ((f3 >> 8) & 0xff).toByte
      rows(o + 6) = (f3 & 0xff).toByte
    }
    putRow(0, 0, 0L, 0xffff)
    (1 to nObjs).foreach { i =>
      if (dictBody(i) != null) putRow(i, 2, objStmNum.toLong, stmIdx(i))
      else putRow(i, 1, offsets(i), 0)
    }
    if (enc.isDefined) putRow(encNum, 1, offsets(encNum), 0)
    putRow(objStmNum, 1, offsets(objStmNum), 0)
    putRow(xrefNum, 1, offsets(xrefNum), 0)
    val (xrefData, xrefKeys) =
      if (compress) {
        val filtered = new Array[Byte](size * (rowW + 1)) // Up-predicted rows
        var y = 0
        while (y < size) {
          filtered(y * (rowW + 1)) = 2 // PNG Up filter tag
          var x = 0
          while (x < rowW) {
            val above = if (y == 0) 0 else rows((y - 1) * rowW + x) & 0xff
            filtered(y * (rowW + 1) + 1 + x) =
              (((rows(y * rowW + x) & 0xff) - above) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (deflate(filtered),
          s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowW >> ")
      } else (rows, "")
    // the xref stream is NEVER encrypted (§7.5.8.2); when encrypting,
    // its dict doubles as the trailer and carries /Encrypt + /ID
    val encKeys = enc.fold("") { case (_, _, tk) => s"/Encrypt $encNum 0 R $tk" }
    out.write((s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [ 1 4 2 ] " +
      s"/Index [ 0 $size ] /Root 1 0 R $encKeys$xrefKeys/Length ${xrefData.length} " +
      ">>\nstream\n").getBytes(ISO_8859_1))
    out.write(xrefData)
    out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    out.write(s"startxref\n${offsets(xrefNum)}\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** BEST_SPEED: the builder is a fixture generator — the extractor must
    * accept any conformant zlib stream, so the cheapest one is the right
    * one to emit (CID content streams are 4x the bytes of the literal
    * text and the deflate pass shows up in the corpus-scale profile).
    */
  private def deflate(plain: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(plain); d.finish()
    val out = new java.io.ByteArrayOutputStream(plain.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
