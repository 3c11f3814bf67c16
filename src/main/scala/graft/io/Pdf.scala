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
  * spec — the classic cross-reference-table file layout (§7.5), the
  * object grammar (§7.3), FlateDecode (§7.4.4, RFC 1951 via the JVM
  * zlib the WARC/PNG code already uses), the page tree (§7.7.3), and the
  * text-showing operators (§9.4.3: Tj, ', ", TJ). No reference-repo
  * lineage: discoproject/disco has no PDF surface; this is extension
  * surface for the LLM-data pipeline.
  *
  * Documented scope (deterministic on every input, never silently
  * wrong): classic xref TABLES only (single section, no incremental
  * updates — xref STREAMS and object streams are PDF 1.5 additions out
  * of scope and fail cleanly); stream filters none or FlateDecode
  * (single name or 1-element array); simple 8-bit fonts read as
  * Latin-1 (PDFDocEncoding and WinAnsi agree with Latin-1 on the range
  * our builder emits — CID/Type0 fonts with multi-byte encodings are
  * out of scope); TJ kern numbers are IGNORED (no heuristic space
  * insertion — heuristics are nondeterministic across extractors, and
  * the builder splits inside words precisely so concatenation is the
  * one right answer); every text-POSITIONING operator (Td TD T* Tm, and
  * the ' / " next-line shows) is a line break. Failure is a None, never
  * a partial answer: truncated tail, dangling xref offset, corrupt
  * Flate data, or an out-of-scope construct all reject the document —
  * the corruption-spec contract WarcSpec set.
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

  // ------------------------------------------------------------- document

  /** One parsed document: xref offsets + lazy object fetch. */
  private final class Doc(bytes: Array[Byte]) {
    private val (offsets, trailer) = readXref()
    private val cache = scala.collection.mutable.Map.empty[Int, PObj]

    private def readXref(): (Map[Int, Long], PDict) = {
      // locate `startxref` by scanning the fixed-size tail (§7.5.5)
      val tailLen = math.min(bytes.length, 256)
      val tail = new String(bytes, bytes.length - tailLen, tailLen, ISO_8859_1)
      val at = tail.lastIndexOf("startxref")
      if (at < 0) fail("no startxref in file tail")
      val lx = new Lex(bytes, bytes.length - tailLen + at)
      lx.expect("startxref")
      val off = lx.token().toLongOption.getOrElse(fail("bad startxref offset"))
      if (off < 0 || off >= bytes.length) fail(s"startxref offset $off out of range")
      val xr = new Lex(bytes, off.toInt)
      xr.ws()
      if (!xr.eof && xr.peek != 'x') // an int here would be an xref STREAM object
        fail("cross-reference streams (PDF 1.5) are out of scope")
      xr.expect("xref")
      val offs = Map.newBuilder[Int, Long]
      var t = xr.token()
      while (t != "trailer") { // subsections: `start count` then fixed entries
        val start = t.toIntOption.getOrElse(fail(s"bad xref subsection '$t'"))
        val count = xr.token().toIntOption.getOrElse(fail("bad xref count"))
        var i = 0
        while (i < count) {
          val o = xr.token(); val g = xr.token(); val kind = xr.token()
          if (kind == "n")
            offs += (start + i) -> o.toLongOption.getOrElse(fail("bad xref offset"))
          else if (kind != "f") fail(s"bad xref entry kind '$kind'")
          val _ = g
          i += 1
        }
        t = xr.token()
      }
      val tr = xr.obj(refs = true) match {
        case d: PDict => d
        case _        => fail("trailer is not a dict")
      }
      if (tr.m.contains("Prev") || tr.m.contains("XRefStm"))
        fail("incremental-update xref chains are out of scope")
      (offs.result(), tr)
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

    private def fetch(num: Int): PObj = cache.getOrElseUpdate(num, {
      val off = offsets.getOrElse(num, fail(s"object $num not in xref"))
      if (off < 0 || off >= bytes.length) fail(s"object $num offset $off out of range")
      val lx = new Lex(bytes, off.toInt)
      val n = lx.token().toIntOption.getOrElse(fail(s"bad object header at $off"))
      if (n != num) fail(s"xref says object $num at $off, found $n")
      lx.token() // generation
      lx.expect("obj")
      val v = lx.obj(refs = true)
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
        val raw = java.util.Arrays.copyOfRange(bytes, lx.p, lx.p + len.toInt)
        lx.p += len.toInt
        lx.expect("endstream")
        PStream(d, decode(d, raw))
      } else v
    })

    private def decode(d: PDict, raw: Array[Byte]): Array[Byte] =
      d.m.get("Filter") match {
        case None => raw
        case Some(PName("FlateDecode")) => inflate(raw)
        case Some(PArr(Vector(PName("FlateDecode")))) => inflate(raw)
        case Some(f) => fail(s"unsupported stream filter $f")
      }
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
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
      }
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"corrupt Flate stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
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
      collectPages(doc, pagesRoot, pages, seen = scala.collection.mutable.Set.empty, depth = 0)
      Some(PdfText(pages.result()))
    } catch {
      // the all-or-nothing contract: ANY malformed/hostile construct is a
      // None, never an escaping exception that kills a streaming ingest
      // task (NonFatal keeps OOM/StackOverflow loud — the depth/nesting
      // guards above make those unreachable from input alone)
      case scala.util.control.NonFatal(_) => None
    }

  /** Convenience: full text (pages joined by \n), None on failure. */
  def extractText(bytes: Array[Byte]): Option[String] = extract(bytes).map(_.text)

  private def collectPages(doc: Doc, node: PObj,
                           out: scala.collection.mutable.Builder[String, Vector[String]],
                           seen: scala.collection.mutable.Set[Int],
                           depth: Int): Unit = {
    if (depth > 64) fail("page tree too deep (cycle?)")
    val d = node match { case d: PDict => d; case _ => fail("page-tree node is not a dict") }
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
          collectPages(doc, doc.resolve(k), out, seen, depth + 1)
        }
      case Some(PName("Page")) =>
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
        out += pageText(content)
      case t => fail(s"unexpected page-tree node type $t")
    }
  }

  /** Run the text-showing operators of one content stream (§9.4.3).
    * Line model: Td, TD, T*, Tm and BT break lines; ' and " break then
    * show; TJ concatenates its strings (kern numbers ignored — scope).
    */
  private def pageText(content: Array[Byte]): String = {
    val lx = new Lex(content, 0)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var any = false // a line exists once any show op ran on it
    def break(): Unit = { if (any) lines += cur.toString; cur.clear(); any = false }
    def show(s: Array[Byte]): Unit = { cur.append(new String(s, ISO_8859_1)); any = true }
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

  /** Build a real single-xref PDF 1.4 showing `text` (Latin-1 scope;
    * the builder is the test-fixture generator, so out-of-range chars
    * reject loudly rather than lossily). Line grain exercises all four
    * show forms: plain Tj, TJ with a mid-word kern split, and the '
    * next-line show; content streams FlateDecode'd unless `compress`
    * is false (both filter paths are real).
    */
  def build(text: String, compress: Boolean = true): Array[Byte] = {
    require(text.forall(_ < 0x100),
      "builder scope is Latin-1 text (simple 8-bit fonts)")
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
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c >= 0x20 && c < 0x7f => sb.append(c)
        case c => sb.append(f"\\${c.toInt}%03o")
      }
      sb.toString
    }

    def contentStream(pageLines: Vector[String]): Array[Byte] = {
      val sb = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
      pageLines.zipWithIndex.foreach { case (line, i) =>
        if (i == 0) sb.append(s"(${esc(line)}) Tj\n")
        else (i % 3: @annotation.switch) match {
          case 1 => // TJ: split mid-line; kern number carries no space
            val cut = line.length / 2
            sb.append(s"0 -14 Td\n[(${esc(line.take(cut))}) -250 (${esc(line.drop(cut))})] TJ\n")
          case 2 => // ': move to next line and show, no explicit Td
            sb.append(s"(${esc(line)}) '\n")
          case _ =>
            sb.append(s"0 -14 Td\n(${esc(line)}) Tj\n")
        }
      }
      sb.append("ET\n")
      sb.toString.getBytes(ISO_8859_1)
    }

    // object table: 1 catalog, 2 pages, 3 font, then (page, content) pairs
    val nObjs = 3 + 2 * pages.length
    val bodies = new Array[Array[Byte]](nObjs + 1)
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    bodies(1) = s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n".getBytes(ISO_8859_1)
    bodies(2) = (s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] " +
      s"/Count ${pages.length} >>\nendobj\n").getBytes(ISO_8859_1)
    bodies(3) = ("3 0 obj\n<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >>\nendobj\n").getBytes(ISO_8859_1)
    pages.zipWithIndex.foreach { case (pl, i) =>
      val pageNum = 4 + 2 * i
      val contNum = pageNum + 1
      bodies(pageNum) = (s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
        "/MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contNum 0 R >>\nendobj\n").getBytes(ISO_8859_1)
      val plain = contentStream(pl)
      val (data, filter) =
        if (compress) (deflate(plain), "/Filter /FlateDecode ") else (plain, "")
      bodies(contNum) =
        (s"$contNum 0 obj\n<< $filter/Length ${data.length} >>\nstream\n".getBytes(ISO_8859_1)
          ++ data ++ "\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes(ISO_8859_1))
    val offsets = new Array[Long](nObjs + 1)
    (1 to nObjs).foreach { i =>
      offsets(i) = out.size().toLong
      out.write(bodies(i))
    }
    val xrefOff = out.size()
    val xref = new StringBuilder(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    (1 to nObjs).foreach(i => xref.append(f"${offsets(i)}%010d 00000 n \n"))
    xref.append(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\n")
    xref.append(s"startxref\n$xrefOff\n%%EOF\n")
    out.write(xref.toString.getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def deflate(plain: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(plain); d.finish()
    val out = new java.io.ByteArrayOutputStream(plain.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
