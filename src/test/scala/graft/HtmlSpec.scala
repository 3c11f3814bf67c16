package graft

import org.apache.spark.sql.functions._

import graft.ops.HtmlOps

/** Golden behavior of the HTML→text extraction step chain — every claim
  * in HtmlOps' scaladoc pinned on a literal fixture, including the
  * documented limits (unclosed script, CDATA, bare '<' prose).
  */
class HtmlSpec extends SparkTestBase {

  private def extract(html: String): String =
    spark.range(1).select(HtmlOps.htmlExtract(lit(html)).as("t"))
      .head.getString(0)

  test("invisible subtrees vanish: script/style/noscript bodies, attrs, mixed case") {
    val html =
      """<html><head>
        |<STYLE type="text/css">body { color: red; } /* secret */</STYLE>
        |<script src="x.js">if (a < b && c > d) { alert("secret"); }</script>
        |<noscript>enable js secret</noscript>
        |</head><body><p>visible</p></body></html>""".stripMargin
    val out = extract(html)
    assert(out == "visible", out)
    assert(!out.contains("secret"))
  }

  test("comments vanish, including multi-line bodies") {
    assert(extract("<p>a</p><!-- hidden\nacross lines --><p>b</p>") == "a\nb")
  }

  test("block tags become line breaks; inline tags strip without splitting words") {
    val out = extract("<h1>Title</h1><p>ita<b>lic</b> and <em>emphasis</em></p><div>footer</div>")
    assert(out == "Title\nitalic and emphasis\nfooter", out)
  }

  test("list/table structure becomes one line per cell/item") {
    assert(extract("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    assert(extract("<table><tr><td>a</td><td>b</td></tr></table>") == "a\nb")
  }

  test("entities decode AFTER tag stripping; &amp;lt; double-escape stays text") {
    val out = extract("<p>1 &lt; 2 &amp;&amp; 3 &gt; 2, &quot;q&quot;, it&apos;s, a&nbsp;b, &#34;x&#39; &#160;y</p>")
    assert(out == "1 < 2 && 3 > 2, \"q\", it's, a b, \"x' y", out)
    // the escaped text "&lt;p&gt;" must decode to the TEXT <p>, never act
    // as a tag (single-pass decode, &amp; strictly last)
    assert(extract("<div>&amp;lt;p&amp;gt; is markup</div>") == "&lt;p&gt; is markup")
    // undecoded numeric entities pass through verbatim (documented limit)
    assert(extract("<p>&#8212;</p>") == "&#8212;")
  }

  test("documented limit: unclosed script keeps its text, loses only the open tag") {
    assert(extract("<p>before</p><script>var kept = 1;") == "before\nvar kept = 1;")
  }

  test("documented limit: CDATA strips as one pseudo-tag up to the first '>'") {
    assert(extract("<p>a <![CDATA[gone]]> b</p>") == "a b")
    // an embedded '>' ends the pseudo-tag early — the rest survives
    assert(extract("<p>a <![CDATA[x > y]]> b</p>") == "a y]]> b")
  }

  test("documented limit: bare '<' prose survives; a tag-shaped span does not") {
    assert(extract("<p>for x < 10 and y > 2 holds</p>") == "for x < 10 and y > 2 holds")
    // '<b and c>' parses as a tag (what a browser tokenizer does with it)
    assert(extract("<p>a <b and c> d</p>") == "a d")
  }

  test("whitespace: per-line collapse, trim, empty-line drop, CRLF handling") {
    val out = extract("<p>  a \t b\r\n  c  </p>\n\n<p> </p><p>d</p>")
    assert(out == "a b\nc\nd", out)
  }

  test("doctype and processing instructions vanish") {
    assert(extract("<!DOCTYPE html><?xml version=\"1.0\"?><p>x</p>") == "x")
  }

  test("the planted-dirt fixture round-trips a document's own text") {
    // the q_html_extract fixture embeds the doc text HTML-escaped into
    // <p>…</p>; extraction must give it back verbatim as its own line
    val text = "B&B <deluxe> rooms, 3 > 2"
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val out = extract(s"<html><body><h1>Doc 7</h1><p>$esc</p></body></html>")
    assert(out == s"Doc 7\n$text", out)
  }
}
