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
    val text = "a(b)c\\d \t tab\nnewline éÿ high"
    val got = Pdf.extractText(Pdf.build(text))
    assert(got.isDefined)
    // \n in SOURCE text round-trips as a char inside the shown line, so
    // strip the LAYOUT line breaks only after mapping source \n away
    assert(got.get.replace("\n", "") == text.replace("\n", ""))
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

  test("out of scope constructs fail cleanly: xref stream, unknown filter, not a PDF") {
    assert(Pdf.extract("not a pdf at all".getBytes(ISO_8859_1)).isEmpty)
    assert(Pdf.extract(Array.emptyByteArray).isEmpty)
    // startxref pointing at an object (an xref STREAM layout) is rejected
    val xrefStream = pdf(Seq("1 0 obj\n<< /Type /Catalog >>\nendobj\n"))
    val s = new String(xrefStream, ISO_8859_1)
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
}
