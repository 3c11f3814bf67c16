package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.io.Pdf

/** PDF (ISO 32000-1): hand-laid-out fixtures are assembled by the TEST's
  * own mini-writer (object bodies literal, xref offsets derived here),
  * independent of Pdf.build, so a symmetric build/parse bug cannot pass;
  * corruption pins the all-or-nothing None contract (the WarcSpec
  * pattern).
  */
class PdfSpec extends SparkTestBase {

  /** Assemble a classic-xref PDF from literal object bodies (object i+1 =
    * objs(i)); pure-ASCII bodies so char offset = byte offset.
    */
  private def pdf(objs: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = objs.map { o => val at = sb.length; sb.append(o); at }
    val xref = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xref\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Single page with a literal (uncompressed) content stream. */
  private def onePage(content: String): Array[Byte] = pdf(Seq(
    "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
    "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
    "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
    s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"))

  private def specDeflate(plain: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(plain); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble an xref-STREAM-layout PDF (PDF 1.5) by hand: `fileObjs`
    * are (number, full `n 0 obj…endobj` text) laid out at file offsets
    * with type-1 rows; `extra` overrides/adds rows as (type, field2,
    * field3) — e.g. type-2 object-stream residents. The closing object
    * is the `/Type /XRef` stream itself, W [1 4 2], `/Index` defaulted;
    * `predict` wraps the rows in PNG-filtered FlateDecode with
    * `filterFor(row)` picking each row's filter tag (0–4), so every
    * predictor path is genuinely exercised. Independent of Pdf.build —
    * the mini-writer discipline of [[pdf]].
    */
  private def xpdf(fileObjs: Seq[(Int, String)],
                   extra: Map[Int, (Int, Long, Int)] = Map.empty,
                   predict: Boolean = false,
                   filterFor: Int => Int = _ => 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.5\n".getBytes(ISO_8859_1))
    val offs = fileObjs.map { case (n, o) =>
      val at = out.size().toLong; out.write(o.getBytes(ISO_8859_1)); (n, at)
    }.toMap
    val xnum = (fileObjs.map(_._1) ++ extra.keys ++ Seq(0)).max + 1
    val size = xnum + 1
    val rows = new Array[Byte](size * 7)
    def put(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val o = num * 7
      rows(o) = t.toByte
      rows(o + 1) = ((f2 >> 24) & 0xff).toByte; rows(o + 2) = ((f2 >> 16) & 0xff).toByte
      rows(o + 3) = ((f2 >> 8) & 0xff).toByte; rows(o + 4) = (f2 & 0xff).toByte
      rows(o + 5) = ((f3 >> 8) & 0xff).toByte; rows(o + 6) = (f3 & 0xff).toByte
    }
    put(0, 0, 0, 0xffff)
    offs.foreach { case (n, at) => put(n, 1, at, 0) }
    extra.foreach { case (n, (t, f2, f3)) => put(n, t, f2, f3) }
    val xoff = out.size().toLong
    put(xnum, 1, xoff, 0)
    val (data, keys) =
      if (!predict) (rows, "")
      else {
        val filt = new Array[Byte](size * 8)
        for (y <- 0 until size) {
          val ft = filterFor(y)
          filt(y * 8) = ft.toByte
          for (x <- 0 until 7) {
            val r = rows(y * 7 + x) & 0xff
            val a = if (x >= 1) rows(y * 7 + x - 1) & 0xff else 0
            val b = if (y >= 1) rows((y - 1) * 7 + x) & 0xff else 0
            val c = if (x >= 1 && y >= 1) rows((y - 1) * 7 + x - 1) & 0xff else 0
            val pred = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) / 2
              case _ =>
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            }
            filt(y * 8 + 1 + x) = ((r - pred) & 0xff).toByte
          }
        }
        (specDeflate(filt),
          "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> ")
      }
    out.write((s"$xnum 0 obj\n<< /Type /XRef /Size $size /W [ 1 4 2 ] " +
      s"/Root 1 0 R $keys/Length ${data.length} >>\nstream\n").getBytes(ISO_8859_1))
    out.write(data)
    out.write(s"\nendstream\nendobj\nstartxref\n$xoff\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** The four-object single-page body as (number, text) pairs for xpdf. */
  private def onePageObjs(content: String): Seq[(Int, String)] = Seq(
    1 -> "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
    2 -> "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
    3 -> "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
    4 -> s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")

  test("golden: hand-laid-out page with Tj/TJ/'/\" and all escape forms") {
    val content =
      "BT /F1 12 Tf 72 720 Td\n" +
        "(Hello \\(PDF\\) \\\\ world) Tj\n" + // ()\ escapes
        "0 -14 Td [(con) -250 (cat)] TJ\n" + // TJ: kern number carries no space
        "(quoted line) '\n" + // ': next line + show
        "1 2 (dquoted line) \"\n" + // ": aw ac next line + show
        "0 -14 Td (oct\\101l \\) done) Tj\n" + // \101 = 'A', escaped ')'
        "0 -14 Td <48657821> Tj\n" // hex string "Hex!"
    val got = Pdf.extract(onePage(content))
    assert(got.isDefined)
    assert(got.get.nPages == 1)
    assert(got.get.text ==
      "Hello (PDF) \\ world\nconcat\nquoted line\ndquoted line\noctAl ) done\nHex!")
  }

  test("golden: odd-length hex string pads low nibble; comments are skipped") {
    val content =
      "% leading comment\nBT 72 720 Td\n<48656C6C6F2> Tj % trailing comment\n"
    // odd hex: last nibble 2 -> byte 0x20 (space)
    assert(Pdf.extractText(onePage(content)).contains("Hello "))
  }

  test("golden: backslash-EOL continuation and raw EOL inside a string") {
    val content = "BT 72 720 Td (split\\\nline) Tj 0 -14 Td (raw\nEOL) Tj\n"
    // \<EOL> vanishes; a raw EOL inside a literal string reads as \n
    assert(Pdf.extractText(onePage(content)).contains("splitline\nraw\nEOL"))
  }

  test("golden: /Contents array concatenates streams at a lexical boundary") {
    val c1 = "BT 72 720 Td (part-one"
    val c2 = ") Tj ET"
    val bytes = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [ 4 0 R 5 0 R ] >>\nendobj\n",
      s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n",
      s"5 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n"))
    // the two streams form one instruction list; the joining byte is EOL,
    // which lands INSIDE the open literal string and reads as \n
    assert(Pdf.extractText(bytes).contains("part-one\n"))
  }

  test("golden: nested page tree (Pages under Pages) and /Length as a ref") {
    val c = "BT 72 720 Td (deep) Tj"
    val bytes = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n",
      "4 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>\nendobj\n",
      "5 0 obj\n<< /Length 6 0 R >>\nstream\n" + c + "\nendstream\nendobj\n",
      s"6 0 obj\n${c.length}\nendobj\n"))
    assert(Pdf.extractText(bytes).contains("deep"))
    assert(Pdf.extract(bytes).get.nPages == 1)
  }

  test("builder round-trip: plain ASCII, exact text recovery") {
    val text = "key agg row scan slow fast table value part hash " * 10
    val got = Pdf.extractText(Pdf.build(text.trim))
    assert(got.isDefined)
    assert(got.get.replace("\n", "") == text.trim)
  }

  test("builder round-trip: parens, backslashes, control and Latin-1 chars") {
    val text = "a(b)c\\d \t tab  bell éÿ high"
    val got = Pdf.extractText(Pdf.build(text))
    assert(got.isDefined)
    // source text is newline-free by the builder's contract, so every \n
    // in the extraction is a layout line break and stripping is exact
    assert(got.get.replace("\n", "") == text)
  }

  test("builder: source newlines are rejected loudly, not silently merged") {
    // a source '\n' would be indistinguishable from a layout line break
    // after extraction — the builder rejects it like non-Latin-1 text
    intercept[IllegalArgumentException](Pdf.build("line one\nline two"))
    intercept[IllegalArgumentException](Pdf.build("cr\rtoo"))
  }

  test("builder round-trip: empty text is one page of empty text") {
    val got = Pdf.extract(Pdf.build(""))
    assert(got.contains(Pdf.PdfText(Vector(""))))
  }

  test("builder round-trip: multi-page split at 30 lines x 60 chars") {
    val text = "x" * (Pdf.LineWidth * Pdf.LinesPerPage * 2 + 7) // 3 pages
    val got = Pdf.extract(Pdf.build(text))
    assert(got.get.nPages == 3)
    assert(got.get.text.replace("\n", "") == text)
    assert(Pdf.extract(Pdf.build(text, compress = false)).get.nPages == 3)
  }

  test("builder: uncompressed and FlateDecode paths agree") {
    val text = "the quick brown fox " * 40
    val a = Pdf.extractText(Pdf.build(text, compress = true))
    val b = Pdf.extractText(Pdf.build(text, compress = false))
    assert(a == b && a.isDefined)
  }

  test("builder: out-of-Latin-1 text is rejected loudly, not lossily") {
    intercept[IllegalArgumentException](Pdf.build("emoji 😀"))
  }

  test("corruption: truncated tail, bad startxref, dangling xref offset -> None") {
    val good = Pdf.build("hello corruption")
    assert(Pdf.extract(good).isDefined)
    assert(Pdf.extract(good.take(good.length - 40)).isEmpty, "truncated tail")
    assert(Pdf.extract(good.take(200)).isEmpty, "no xref at all")
    val badStart = new String(good, ISO_8859_1)
      .replaceAll("startxref\n\\d+", "startxref\n999999999")
      .getBytes(ISO_8859_1)
    assert(Pdf.extract(badStart).isEmpty, "startxref out of range")
    // xref offset pointing at garbage: damage object 1's entry (each
    // entry is exactly 20 bytes; object 1's starts 20 after the free one)
    val s = new String(good, ISO_8859_1)
    val e1 = s.indexOf("0000000000 65535 f") + 20
    val dangling = (s.substring(0, e1) + "0000000004 00000 n \n" +
      s.substring(e1 + 20)).getBytes(ISO_8859_1)
    assert(Pdf.extract(dangling).isEmpty, "xref offset at garbage")
  }

  test("corruption: corrupt Flate data -> None") {
    val good = Pdf.build("deflate me " * 30)
    val s = new String(good, ISO_8859_1)
    val at = s.indexOf("stream\n") + 7
    val bad = good.clone()
    bad(at + 20) = (bad(at + 20) ^ 0x5f).toByte // flip bits mid-stream
    assert(Pdf.extract(bad).isEmpty)
  }

  test("out of scope constructs fail cleanly: unknown filter, bad xref object, not a PDF") {
    assert(Pdf.extract("not a pdf at all".getBytes(ISO_8859_1)).isEmpty)
    assert(Pdf.extract(Array.emptyByteArray).isEmpty)
    // startxref pointing at an object that is NOT /Type /XRef is rejected
    val notXref = pdf(Seq("1 0 obj\n<< /Type /Catalog >>\nendobj\n"))
    val s = new String(notXref, ISO_8859_1)
    val redirected = s.replaceAll("startxref\n\\d+", "startxref\n9").getBytes(ISO_8859_1)
    assert(Pdf.extract(redirected).isEmpty)
    val content = "BT 72 720 Td (x) Tj"
    val unknown = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Filter /LZWDecode /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"))
    assert(Pdf.extract(unknown).isEmpty)
  }

  test("hostile inputs fail to None, never an escaping throw or a hang") {
    // a huge /Length must not clamp/overflow into a crash
    val huge = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      "4 0 obj\n<< /Length 3000000000 >>\nstream\nBT (x) Tj\nendstream\nendobj\n"))
    assert(Pdf.extract(huge).isEmpty)
    // an 11+-digit generation number must not throw NumberFormatException
    val bigGen = onePage("BT 72 720 Td (x) Tj").map(_.toChar).mkString
    val bg = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 99999999999 99999999999 R >>\nendobj\n"))
    assert(Pdf.extract(bg).isEmpty)
    val _ = bigGen
    // pathological nesting must fail the depth guard, not the JVM stack
    val deep = onePage("BT " + "[" * 5000)
    assert(Pdf.extract(deep).isEmpty)
    // an FDICT (preset-dictionary) zlib stream must fail, not spin forever
    val dictStream = Array[Byte](0x78, 0xf9.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    val c = new String(dictStream.map(b => (b & 0xff).toChar))
    val fdict = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Filter /FlateDecode /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"))
    assert(Pdf.extract(fdict).isEmpty)
  }

  test("page-tree cycle is rejected, not an infinite loop") {
    val bytes = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Pages /Kids [ 2 0 R ] /Count 1 >>\nendobj\n"))
    assert(Pdf.extract(bytes).isEmpty)
  }

  test("name #xx escapes and dict/array operands in content are tolerated") {
    val content = "/Sp#61n << /K 1 >> BDC BT 72 720 Td (tagged) Tj ET EMC"
    assert(Pdf.extractText(onePage(content)).contains("tagged"))
  }

  // ---- PDF 1.5: xref streams, object streams, update chains (round 16)

  test("golden: hand-laid xref-STREAM layout (raw rows, no filter) extracts") {
    val bytes = xpdf(onePageObjs("BT 72 720 Td (xref stream) Tj"))
    assert(Pdf.extractText(bytes).contains("xref stream"))
  }

  test("golden: PNG-predicted Flate xref stream, every filter tag 0-4") {
    // size 6 -> six rows; filterFor cycles None/Sub/Up/Average/Paeth so
    // each predictor branch of the decoder reconstructs at least one row
    val bytes = xpdf(onePageObjs("BT 72 720 Td (predicted) Tj"),
      predict = true, filterFor = y => y % 5)
    assert(Pdf.extractText(bytes).contains("predicted"))
    val up = xpdf(onePageObjs("BT 72 720 Td (up only) Tj"), predict = true)
    assert(Pdf.extractText(up).contains("up only"))
  }

  test("golden: object stream holds the document dictionaries") {
    val content = "BT 72 720 Td (from objstm) Tj"
    val b1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val b2 = "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"
    val b3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${b1.length + 1} 3 ${b1.length + b2.length + 2}\n"
    val stm = header + b1 + "\n" + b2 + "\n" + b3 + "\n"
    val bytes = xpdf(
      Seq(
        4 -> s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
        5 -> (s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
          s"/Length ${stm.length} >>\nstream\n$stm\nendstream\nendobj\n")),
      extra = Map(1 -> ((2, 5L, 0)), 2 -> ((2, 5L, 1)), 3 -> ((2, 5L, 2))))
    val got = Pdf.extract(bytes)
    assert(got.isDefined && got.get.nPages == 1)
    assert(got.get.text.contains("from objstm"))
  }

  test("incremental update: /Prev chain, latest section wins") {
    val base = new String(onePage("BT 72 720 Td (old text) Tj"), ISO_8859_1)
    val prevOff = "startxref\n(\\d+)".r.findFirstMatchIn(base).get.group(1)
    val c2 = "BT 72 720 Td (new text) Tj"
    val sb = new StringBuilder(base)
    val off4 = sb.length
    sb.append(s"4 0 obj\n<< /Length ${c2.length} >>\nstream\n$c2\nendstream\nendobj\n")
    val x2 = sb.length
    sb.append(s"xref\n4 1\n" + f"$off4%010d" + " 00001 n \n")
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $prevOff >>\n")
    sb.append(s"startxref\n$x2\n%%EOF\n")
    val got = Pdf.extractText(sb.toString.getBytes(ISO_8859_1))
    assert(got.contains("new text"), s"got $got")
    assert(!got.get.contains("old text"))
  }

  test("incremental update: a later `f` entry frees the object for good") {
    val base = new String(onePage("BT 72 720 Td (soon gone) Tj"), ISO_8859_1)
    val prevOff = "startxref\n(\\d+)".r.findFirstMatchIn(base).get.group(1)
    val sb = new StringBuilder(base)
    val x2 = sb.length
    // free the CONTENT object in the update: the doc now dangles -> None,
    // never a resurrect-the-old-body read
    sb.append("xref\n4 1\n0000000000 00002 f \n")
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $prevOff >>\n")
    sb.append(s"startxref\n$x2\n%%EOF\n")
    assert(Pdf.extract(sb.toString.getBytes(ISO_8859_1)).isEmpty)
  }

  test("hybrid file: /XRefStm supplies entries the classic table lacks") {
    val content = "BT 72 720 Td (hybrid) Tj"
    val sb = new StringBuilder("%PDF-1.5\n")
    def add(o: String): Int = { val at = sb.length; sb.append(o); at }
    val o1 = add("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val o2 = add("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    val o3 = add("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    val o4 = add(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    // parallel xref stream (object 5) carrying ONLY object 4's entry
    val row = Array(1, (o4 >> 24) & 0xff, (o4 >> 16) & 0xff, (o4 >> 8) & 0xff,
      o4 & 0xff, 0, 0).map(_.toChar).mkString
    val x5 = add("5 0 obj\n<< /Type /XRef /Size 6 /W [ 1 4 2 ] /Index [ 4 1 ] " +
      s"/Root 1 0 R /Length 7 >>\nstream\n$row\nendstream\nendobj\n")
    val xt = sb.length
    sb.append("xref\n0 4\n0000000000 65535 f \n")
    Seq(o1, o2, o3).foreach(o => sb.append(f"$o%010d" + " 00000 n \n"))
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R /XRefStm $x5 >>\n")
    sb.append(s"startxref\n$xt\n%%EOF\n")
    assert(Pdf.extractText(sb.toString.getBytes(ISO_8859_1)).contains("hybrid"))
  }

  test("hybrid file: classic `f` rows yield to the /XRefStm's entries") {
    // the §7.5.8.4 mainstream-writer shape: the document dictionaries
    // live in an ObjStm, the classic table lists them FREE (so a 1.4
    // reader skips them) and the parallel xref stream carries their
    // type-2 entries — a 1.5 reader must use the stream, not hard-fail
    // on Freed
    val content = "BT 72 720 Td (hybrid freed) Tj"
    val b1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val b2 = "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"
    val b3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${b1.length + 1} 3 ${b1.length + b2.length + 2}\n"
    val stm = header + b1 + "\n" + b2 + "\n" + b3 + "\n"
    val sb = new StringBuilder("%PDF-1.5\n")
    def add(o: String): Int = { val at = sb.length; sb.append(o); at }
    val o4 = add(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val o5 = add(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${stm.length} >>\nstream\n$stm\nendstream\nendobj\n")
    // parallel xref STREAM (object 6): type-2 rows for objects 1..3
    val rows = (0 until 3).flatMap(i =>
      Seq(2, 0, 0, 0, 5, 0, i)).map(_.toChar).mkString
    val x6 = add("6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 4 2 ] /Index [ 1 3 ] " +
      s"/Root 1 0 R /Length ${rows.length} >>\nstream\n$rows\nendstream\nendobj\n")
    val xt = sb.length
    sb.append("xref\n0 6\n0000000000 65535 f \n")
    (1 to 3).foreach(_ => sb.append("0000000000 00000 f \n")) // freed for 1.4 readers
    Seq(o4, o5).foreach(o => sb.append(f"$o%010d" + " 00000 n \n"))
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R /XRefStm $x6 >>\n")
    sb.append(s"startxref\n$xt\n%%EOF\n")
    val got = Pdf.extractText(sb.toString.getBytes(ISO_8859_1))
    assert(got.contains("hybrid freed"), s"got $got")
    // a LATER update level's `f` still frees: append a plain update
    // section freeing object 4 — the hybrid resolution must not leak
    // across levels and resurrect it
    val prev = xt
    val x2 = sb.length
    sb.append("xref\n4 1\n0000000000 00001 f \n")
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $prev >>\n")
    sb.append(s"startxref\n$x2\n%%EOF\n")
    assert(Pdf.extract(sb.toString.getBytes(ISO_8859_1)).isEmpty)
  }

  // ---- Type0/CID fonts + ToUnicode CMaps (round 17)

  /** Hand-laid classic-layout page showing through a Type0 font whose
    * /ToUnicode stream is `cmapBody` — full control for hostile cases.
    */
  private def type0Pdf(content: String, cmapBody: String,
                       encoding: String = "/Identity-H",
                       toUnicodeKey: String = "/ToUnicode 6 0 R ",
                       resourcesOnPages: Boolean = false): Array[Byte] = {
    val res = "/Resources << /Font << /F1 5 0 R >> >> "
    pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      s"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 " +
        (if (resourcesOnPages) res else "") + ">>\nendobj\n",
      s"3 0 obj\n<< /Type /Page /Parent 2 0 R " +
        (if (resourcesOnPages) "" else res) + "/Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      s"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X " +
        s"/Encoding $encoding /DescendantFonts [ 7 0 R ] $toUnicodeKey>>\nendobj\n",
      s"6 0 obj\n<< /Length ${cmapBody.length} >>\nstream\n$cmapBody\nendstream\nendobj\n",
      "7 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /X >>\nendobj\n"))
  }

  private val miniCmap =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
      |/CMapName /Adobe-Identity-UCS def
      |/CMapType 2 def
      |1 begincodespacerange
      |<0000> <ffff>
      |endcodespacerange
      |2 beginbfchar
      |<0001> <0048>
      |<0002> <0069>
      |endbfchar
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end
      |end
      |""".stripMargin

  test("golden: hand-laid Type0/Identity-H page decodes through its ToUnicode CMap") {
    val got = Pdf.extractText(type0Pdf(
      "BT /F1 12 Tf 72 720 Td <00010002> Tj ET", miniCmap))
    assert(got.contains("Hi"), s"got $got")
    // /Resources inherited from the /Pages node (§7.7.3.4)
    val inh = Pdf.extractText(type0Pdf(
      "BT /F1 12 Tf 72 720 Td <00010002> Tj ET", miniCmap,
      resourcesOnPages = true))
    assert(inh.contains("Hi"), s"got $inh")
    // the same codes WITHOUT the Tf select read as a simple font:
    // raw code BYTES through the Latin-1 read, not CMap output
    val noTf = Pdf.extractText(type0Pdf(
      "BT 72 720 Td <00010002> Tj ET", miniCmap))
    assert(noTf.contains("\u0000\u0001\u0000\u0002"), s"got $noTf")
  }

  test("golden: hand-written CMap — ligature target, surrogate pair, both bfrange forms") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <ffff>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <006600660069>
        |<0002> <d83dde00>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [<0058> <0059>]
        |endbfrange
        |endcmap
        |end
        |""".stripMargin
    val t = Pdf.parseToUnicode(cmap.getBytes(ISO_8859_1))
    assert(t.width == 2)
    val m = t.m
    assert(m(1) == "ffi") // multi-unit ligature destination
    assert(m(2) == new String(Character.toChars(0x1f600))) // surrogate pair
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c") // increment form
    assert(m(0x20) == "X" && m(0x21) == "Y") // array form
    assert(m.size == 7)
  }

  test("Type0 hostile inputs are a None (or a loud CMap parse error), never partial text") {
    val show = "BT /F1 12 Tf 72 720 Td <00010002> Tj ET"
    // uncovered code
    assert(Pdf.extract(type0Pdf(
      "BT /F1 12 Tf 72 720 Td <00010003> Tj ET", miniCmap)).isEmpty)
    // odd byte count in an Identity-H show string (3 bytes)
    assert(Pdf.extract(type0Pdf(
      "BT /F1 12 Tf 72 720 Td <000100> Tj ET", miniCmap)).isEmpty)
    // vertical writing / other encodings are out of scope
    assert(Pdf.extract(type0Pdf(show, miniCmap,
      encoding = "/Identity-V")).isEmpty)
    // a Type0 font without /ToUnicode cannot map glyphs -> reject
    assert(Pdf.extract(type0Pdf(show, miniCmap, toUnicodeKey = "")).isEmpty)
    def bad(body: String): Unit = {
      val e = intercept[RuntimeException] {
        Pdf.parseToUnicode((s"begincmap\n$body\nendcmap\n").getBytes(ISO_8859_1))
      }
      assert(Pdf.extract(type0Pdf(show,
        s"begincmap\n$body\nendcmap\n")).isEmpty)
      val _ = e
    }
    bad("1 beginbfrange\n<0012> <0010> <0061>\nendbfrange") // inverted
    bad("1 beginbfrange\n<0010> <0012> [<0058> <0059>]\nendbfrange") // arity
    bad("1 beginbfrange\n<0001> <0003> <ffff>\nendbfrange") // unit overflow
    // a 1-byte CMap parses (the simple-font shape) but a Type0 font
    // requires 2-byte codes -> document rejects at the font level
    assert(Pdf.parseToUnicode(
      "begincmap\n1 beginbfchar\n<01> <0048>\nendbfchar\nendcmap\n"
        .getBytes(ISO_8859_1)).width == 1)
    assert(Pdf.extract(type0Pdf(show,
      "begincmap\n1 beginbfchar\n<01> <0048>\nendbfchar\nendcmap\n")).isEmpty)
    bad("1 beginbfchar\n<0001> <004800>\nendbfchar") // ragged UTF-16 dest
    bad("1 beginbfchar\n<0001> <0048>") // unterminated block
  }

  test("simple font with a 1-byte ToUnicode maps byte-wise (the subsetted-font shape)") {
    // a subsetted simple font: raw show bytes are glyph codes 1..3 with
    // no relation to Latin-1; the 1-byte CMap carries the real text
    val cmap1 =
      """begincmap
        |1 begincodespacerange
        |<00> <ff>
        |endcodespacerange
        |2 beginbfchar
        |<01> <0048>
        |<02> <0069>
        |endbfchar
        |1 beginbfrange
        |<10> <12> <0061>
        |endbfrange
        |endcmap
        |""".stripMargin
    def simplePdf(content: String, cmapBody: String): Array[Byte] = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      "5 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont /SubsetX " +
        "/ToUnicode 6 0 R >>\nendobj\n",
      s"6 0 obj\n<< /Length ${cmapBody.length} >>\nstream\n$cmapBody\nendstream\nendobj\n"))
    val got = Pdf.extractText(simplePdf(
      "BT /F1 12 Tf 72 720 Td <0102101112> Tj ET", cmap1))
    assert(got.contains("Hiabc"), s"got $got")
    // an uncovered byte rejects (all-or-nothing, never Latin-1 fallback)
    assert(Pdf.extract(simplePdf(
      "BT /F1 12 Tf 72 720 Td <0103> Tj ET", cmap1)).isEmpty)
    // a 2-byte CMap on a simple font is a width mismatch -> reject
    assert(Pdf.extract(simplePdf(
      "BT /F1 12 Tf 72 720 Td <0102> Tj ET", miniCmap)).isEmpty)
    // mixed widths inside one CMap reject at parse
    val mixed = "begincmap\n2 beginbfchar\n<01> <0048>\n<0002> <0069>\nendbfchar\nendcmap\n"
    intercept[RuntimeException] { Pdf.parseToUnicode(mixed.getBytes(ISO_8859_1)) }
    val t1 = Pdf.parseToUnicode(cmap1.getBytes(ISO_8859_1))
    assert(t1.width == 1 && t1.m.size == 5)
  }

  test("simple-font encodings: WinAnsi/MacRoman tables, /Differences overlays, ToUnicode precedence") {
    def encPdf(content: String, fontBody: String,
               extraObjs: Seq[String] = Seq.empty): Array[Byte] = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      s"5 0 obj\n$fontBody\nendobj\n") ++ extraObjs)
    val win = "<< /Type /Font /Subtype /TrueType /BaseFont /Arial " +
      "/Encoding /WinAnsiEncoding >>"
    // 0x93 0x48 0x69 0x94 = smart-quoted "Hi" in CP1252 — the bytes a
    // Latin-1 read silently turns into C1 controls
    val got = Pdf.extractText(encPdf(
      "BT /F1 12 Tf 72 720 Td <93486994> Tj ET", win))
    assert(got.contains("“Hi”"), s"got $got")
    // MacRoman: 0xA5 is the bullet
    val mac = "<< /Type /Font /Subtype /Type1 /BaseFont /Times " +
      "/Encoding /MacRomanEncoding >>"
    val gotMac = Pdf.extractText(encPdf(
      "BT /F1 12 Tf 72 720 Td <48A549> Tj ET", mac))
    assert(gotMac.contains("H•I"), s"got $gotMac")
    // /Differences overlay on a named base: common name, uniXXXX, uXXXX
    val diff = "<< /Type /Font /Subtype /Type1 /BaseFont /Sub " +
      "/Encoding << /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 65 /eacute /uni0058 /u0059 ] >> >>"
    val gotDiff = Pdf.extractText(encPdf(
      "BT /F1 12 Tf 72 720 Td <41424344> Tj ET", diff))
    assert(gotDiff.contains("éXYD"), s"got $gotDiff")
    // a subset font's private gNN names carry no text -> reject
    val priv = "<< /Type /Font /Subtype /Type1 /BaseFont /Sub " +
      "/Encoding << /Differences [ 65 /g42 ] >> >>"
    assert(Pdf.extract(encPdf(
      "BT /F1 12 Tf 72 720 Td <41> Tj ET", priv)).isEmpty)
    // unsupported named encodings reject (never a silent Latin-1 guess)
    val expert = "<< /Type /Font /Subtype /Type1 /BaseFont /X " +
      "/Encoding /MacExpertEncoding >>"
    assert(Pdf.extract(encPdf(
      "BT /F1 12 Tf 72 720 Td <41> Tj ET", expert)).isEmpty)
    // a ToUnicode CMap wins over the encoding entry
    val both = "<< /Type /Font /Subtype /TrueType /BaseFont /Sub " +
      "/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>"
    val cm = "begincmap\n1 beginbfchar\n<93> <0041>\nendbfchar\nendcmap\n"
    val gotBoth = Pdf.extractText(encPdf(
      "BT /F1 12 Tf 72 720 Td <93> Tj ET", both,
      Seq(s"6 0 obj\n<< /Length ${cm.length} >>\nstream\n$cm\nendstream\nendobj\n")))
    assert(gotBoth.contains("A"), s"got $gotBoth")
  }

  test("builder CID layout: all four layout combinations extract identically") {
    val text = ("abcdef zq cid font layout parity 0123456789 " * 45).trim + "!"
    val a = Pdf.extract(Pdf.build(text))
    assert(a.isDefined && a.get.nPages > 1)
    Seq(
      Pdf.build(text, cidFont = true),
      Pdf.build(text, xrefStream = true, cidFont = true),
      Pdf.build(text, compress = false, cidFont = true),
      Pdf.build(text, compress = false, xrefStream = true, cidFont = true))
      .foreach(v => assert(Pdf.extract(v) == a))
    // codes are subsetter-assigned, so the raw CID file carries no
    // literal text, and the generated CMap exercises ALL THREE entry
    // forms ("abcdef" run -> increment bfrange; non-consecutive chars
    // -> array bfrange; singletons -> bfchar)
    val raw = new String(Pdf.build(text, compress = false, cidFont = true), ISO_8859_1)
    assert(!raw.contains("layout parity"))
    assert(raw.contains("beginbfchar") && raw.contains("beginbfrange"))
    assert(raw.contains("[<")) // array form present
  }

  // ---- /Encrypt: standard security handler, empty password (round 17)

  test("RC4 matches the public test vector") {
    // the classic "Key"/"Plaintext" vector (same family as RFC 6229)
    val c = graft.io.PdfCrypt.rc4("Key".getBytes(ISO_8859_1),
      "Plaintext".getBytes(ISO_8859_1))
    assert(c.map(b => f"$b%02x").mkString == "bbf316e8d940af0ad3")
  }

  test("encrypted builds round-trip across all modes, layouts, and fonts") {
    val text = ("encrypted corpus payload 0123456789 abcdef " * 50).trim
    val plain = Pdf.extract(Pdf.build(text))
    assert(plain.isDefined && plain.get.nPages > 1)
    for (mode <- Seq("rc4-40", "rc4-128", "aesv2");
         xs <- Seq(false, true); cid <- Seq(false, true)) {
      val enc = Pdf.build(text, xrefStream = xs, cidFont = cid, encrypt = mode)
      assert(Pdf.extract(enc) == plain, s"mode=$mode xref=$xs cid=$cid")
    }
    // uncompressed path too (stored stream = Encrypt(plain), no filter)
    assert(Pdf.extract(Pdf.build(text, compress = false, encrypt = "aesv2")) == plain)
    // ciphertext really is ciphertext: the uncompressed-encrypted file
    // must show neither the content operators nor the text
    val raw = new String(Pdf.build(text, compress = false, encrypt = "rc4-128"), ISO_8859_1)
    assert(!raw.contains("BT\n/F1 12 Tf"))
    assert(!raw.contains(text.take(30)))
  }

  test("encryption hostile cases: wrong password proof, corrupt bytes, out-of-scope modes") {
    val text = "guarded secret payload"
    def mutate(b: Array[Byte], find: String, repl: String): Array[Byte] = {
      val s = new String(b, ISO_8859_1)
      val at = s.indexOf(find)
      assert(at >= 0, s"fixture lacks '$find'")
      assert(find.length == repl.length) // same length: offsets survive
      (s.substring(0, at) + repl + s.substring(at + find.length))
        .getBytes(ISO_8859_1)
    }
    val rc4 = Pdf.build(text, encrypt = "rc4-128")
    assert(Pdf.extractText(rc4).contains(text))
    // flip a hex digit of /U: the empty-password proof fails -> None
    // (the "a real user password exists" shape)
    val s = new String(rc4, ISO_8859_1)
    val uAt = s.indexOf("/U <")
    assert(uAt >= 0)
    val c = s.charAt(uAt + 4)
    val flipped = s.substring(0, uAt + 4) +
      (if (c == '0') '1' else '0') + s.substring(uAt + 5)
    assert(Pdf.extract(flipped.getBytes(ISO_8859_1)).isEmpty)
    // and for the REASON the contract promises: the password proof
    assert(Pdf.extractDebug(flipped.getBytes(ISO_8859_1))
      .swap.exists(_.contains("empty user password")))
    // out-of-scope revisions / foreign handlers / missing ID reject
    assert(Pdf.extract(mutate(rc4, "/V 2 /R 3", "/V 5 /R 5")).isEmpty)
    assert(Pdf.extract(mutate(rc4, "/Standard", "/Standarf")).isEmpty)
    assert(Pdf.extract(mutate(rc4, "/ID [", "/IE [")).isEmpty)
    // corrupt stream ciphertext decrypts to garbage: the Flate checksum
    // (RC4) or the CBC padding (AES) rejects -> None, never partial text
    def corruptStream(b: Array[Byte]): Array[Byte] = {
      val at = new String(b, ISO_8859_1).indexOf("stream\n")
      assert(at >= 0)
      val out = b.clone()
      out(at + 10) = (out(at + 10) ^ 0x55).toByte
      out
    }
    assert(Pdf.extract(corruptStream(rc4)).isEmpty)
    assert(Pdf.extract(corruptStream(Pdf.build(text, encrypt = "aesv2"))).isEmpty)
  }

  test("builder xref-stream layout round-trips and matches classic exactly") {
    val text = ("pdf fifteen layout parity check " * 70).trim // multi-page
    val a = Pdf.extract(Pdf.build(text))
    val b = Pdf.extract(Pdf.build(text, xrefStream = true))
    val c = Pdf.extract(Pdf.build(text, compress = false, xrefStream = true))
    assert(a.isDefined && a == b && b == c)
    assert(b.get.text.replace("\n", "") == text)
    assert(new String(Pdf.build(text, xrefStream = true).take(9), ISO_8859_1)
      == "%PDF-1.5\n")
    assert(Pdf.extract(Pdf.build("", xrefStream = true))
      .contains(Pdf.PdfText(Vector(""))))
  }

  test("xref-stream corruption: short data, bad /W, bad type -> None") {
    val good = xpdf(onePageObjs("BT 72 720 Td (x) Tj"))
    assert(Pdf.extract(good).isDefined)
    val s = new String(good, ISO_8859_1)
    // /Size inflated: /Index default claims more rows than the data holds
    assert(Pdf.extract(s.replace("/Size 6", "/Size 60").getBytes(ISO_8859_1)).isEmpty)
    // a 9-byte field width is outside the spec's 0..8
    assert(Pdf.extract(s.replace("/W [ 1 4 2 ]", "/W [ 1 4 9 ]").getBytes(ISO_8859_1)).isEmpty)
    // rows of width zero
    assert(Pdf.extract(s.replace("/W [ 1 4 2 ]", "/W [ 0 0 0 ]").getBytes(ISO_8859_1)).isEmpty)
    // an entry type outside 0/1/2: corrupt the first row's type byte
    val at = s.indexOf("stream\n", s.indexOf("/Type /XRef")) + 7
    val bad = good.clone(); bad(at) = 9
    assert(Pdf.extract(bad).isEmpty)
  }

  test("objstm corruption: type-2 at a non-ObjStm, header mismatch, bad index -> None") {
    val content = "BT 72 720 Td (x) Tj"
    val b1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val b2 = "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"
    val b3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${b1.length + 1} 3 ${b1.length + b2.length + 2}\n"
    val stm = header + b1 + "\n" + b2 + "\n" + b3 + "\n"
    val objs = Seq(
      4 -> s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
      5 -> (s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
        s"/Length ${stm.length} >>\nstream\n$stm\nendstream\nendobj\n"))
    // type-2 entry pointing at the CONTENT stream (not an /ObjStm)
    assert(Pdf.extract(xpdf(objs,
      extra = Map(1 -> ((2, 4L, 0)), 2 -> ((2, 5L, 1)), 3 -> ((2, 5L, 2))))).isEmpty)
    // header pair at index 1 names object 2, xref claims object 1 lives there
    assert(Pdf.extract(xpdf(objs,
      extra = Map(1 -> ((2, 5L, 1)), 2 -> ((2, 5L, 1)), 3 -> ((2, 5L, 2))))).isEmpty)
    // index out of range
    assert(Pdf.extract(xpdf(objs,
      extra = Map(1 -> ((2, 5L, 7)), 2 -> ((2, 5L, 1)), 3 -> ((2, 5L, 2))))).isEmpty)
    // an ObjStm claiming to contain ITSELF: the ref-cycle guard breaks it
    assert(Pdf.extract(xpdf(objs,
      extra = Map(1 -> ((2, 5L, 0)), 2 -> ((2, 5L, 1)), 3 -> ((2, 5L, 2)),
        5 -> ((2, 5L, 0))))).isEmpty)
  }

  test("object-reference cycle in /Length fails to None, not a StackOverflowError") {
    val bytes = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      "4 0 obj\n<< /Length 4 0 R >>\nstream\nBT (x) Tj\nendstream\nendobj\n"))
    assert(Pdf.extract(bytes).isEmpty)
  }

  test("xref chain cycle (/Prev pointing at itself) fails, not an infinite loop") {
    val base = new String(onePage("BT 72 720 Td (x) Tj"), ISO_8859_1)
    val prevOff = "startxref\n(\\d+)".r.findFirstMatchIn(base).get.group(1)
    val looped = base.replace("trailer\n<< /Size 5",
      s"trailer\n<< /Prev $prevOff /Size 5")
    assert(Pdf.extract(looped.getBytes(ISO_8859_1)).isEmpty)
  }

  test("decompression bomb: Flate output beyond the absolute cap fails, no OOM") {
    // ~80 MiB of zeros deflates to ~80 KiB; inflating must trip the
    // 64 MiB lid and reject the document instead of allocating it all
    val raw = specDeflate(new Array[Byte](80 << 20))
    assert(raw.length < (1 << 20))
    val c = new String(raw.map(b => (b & 0xff).toChar))
    val bomb = pdf(Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n",
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
      s"4 0 obj\n<< /Filter /FlateDecode /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"))
    assert(Pdf.extract(bomb).isEmpty)
  }
}
