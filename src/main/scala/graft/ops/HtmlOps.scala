package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the crawl-pipeline front door the WARC chain
  * needs before any text op can run: real HTTP bodies are HTML, and every
  * downstream stage (quality rules, LM gate, dedup shingles) wants the
  * rendered prose, not markup.
  *
  * The extraction is the standard non-rendering recipe (the jusText /
  * BeautifulSoup-get_text family): drop invisible subtrees (script,
  * style, noscript) and comments; turn BLOCK-level tags into line breaks
  * (block structure is the paragraph segmentation signal); strip the
  * remaining inline tags to nothing (inline markup splits no words:
  * `ita<b>lic</b>` is one word); decode the common named/numeric
  * entities AFTER tag stripping (so `&lt;p&gt;` in text cannot become a
  * fake tag); then per-line whitespace collapse + empty-line drop, lines
  * joined by `\n`.
  *
  * Everything is a pure codegen'd Column chain (regexp_replace + replace
  * + split/transform/filter/array_join — no UDF), and
  * [[htmlExtractSql]] renders the IDENTICAL chain as ANSI SQL from the
  * same step list, so the Scala op and the DuckDB oracle cannot drift
  * (the [[UrlOps.registrableDomainSql]] pattern, taken one step further:
  * one data structure, two renderers). Patterns stay inside the
  * Java-regex ∩ RE2 intersection: no backreferences, no lookaround —
  * which is why script/style/noscript are three steps, not one
  * `</\1>`-backreferencing step.
  *
  * Bounded-input notes for 100 TB: each step is one linear scan of the
  * body (RE2/Java both linear here — the only `.*?` spans are
  * tag-delimited), rows never expand, and the whole chain runs at scan
  * grain inside whole-stage codegen — zero shuffle, safe inside the
  * task-per-file WARC read.
  *
  * Known limits (documented, deterministic on both sides): an UNCLOSED
  * script/style block keeps its text (the open tag itself is still
  * stripped); a CDATA section strips as one pseudo-tag up to its first
  * '>' (content after an embedded '>' survives); numeric entities
  * are decoded for the common few (&#34; &#39; &#160;), others pass
  * through verbatim; a bare '<' in prose survives only when NOT followed
  * by a tag-start character — the catch-all requires `</?[a-zA-Z!?]` so
  * `for x < 10 and y > 2` keeps its text, but `a <b and c> d` parses as
  * a tag (exactly what a browser's tokenizer does with it) and is
  * stripped.
  */
object HtmlOps {

  /** Block-level elements whose tags become line breaks. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd", "tr", "td", "th",
    "table", "thead", "tbody", "tfoot", "caption",
    "blockquote", "pre", "section", "article", "aside",
    "header", "footer", "nav", "main", "figure", "figcaption",
    "form", "fieldset", "address", "title")

  private sealed trait Step
  private final case class Re(pattern: String, repl: String) extends Step
  private final case class Lit(from: String, to: String) extends Step

  /** The single source both renderers consume, in application order. */
  private val Steps: Seq[Step] = Seq(
    // invisible subtrees first — their text must never surface
    Re("(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
    Re("(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
    Re("(?is)<noscript\\b[^>]*>.*?</noscript\\s*>", " "),
    Re("(?s)<!--.*?-->", " "),
    // block tags (open, close, or self-closing) = paragraph breaks
    Re("(?i)</?(" + BlockTags.mkString("|") + ")\\b[^>]*>", "\n"),
    // every remaining tag (inline markup, doctype, PI, unknown) vanishes;
    // the char after `</?` must be a tag-start ([a-zA-Z] element, `!`
    // doctype/comment-remnant, `?` processing instruction) so a bare '<'
    // in prose ("x < 10 and y > 2") never swallows text to the next '>'
    Re("</?[a-zA-Z!?][^>]*>", ""),
    // entity decode strictly AFTER tag stripping; &amp; strictly LAST
    // (single-pass decode: "&amp;lt;" is the ESCAPED text "&lt;")
    Lit("&nbsp;", " "), Lit("&#160;", " "),
    Lit("&lt;", "<"), Lit("&gt;", ">"),
    Lit("&quot;", "\""), Lit("&#34;", "\""),
    Lit("&apos;", "'"), Lit("&#39;", "'"),
    Lit("&amp;", "&"))

  private val LineCollapse = "[ \\t\\r]+"

  /** Extracted text of an HTML column: blocks as lines, per-line
    * whitespace collapsed, empty lines dropped.
    */
  def htmlExtract(html: Column): Column = {
    val cleaned = Steps.foldLeft(html) {
      case (c, Re(p, r))  => regexp_replace(c, p, r)
      case (c, Lit(f, t)) => replace(c, lit(f), lit(t))
    }
    array_join(
      filter(
        transform(split(cleaned, "\n", -1),
          x => trim(regexp_replace(x, LineCollapse, " "))),
        x => x =!= ""),
      "\n")
  }

  /** [[htmlExtract]] as ANSI SQL over an HTML expression — generated
    * from the SAME step list (DuckDB needs the explicit 'g' flag and a
    * `chr(10)` replacement where Spark takes a bare newline).
    */
  def htmlExtractSql(e: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    def repl(r: String) = if (r == "\n") "chr(10)" else q(r)
    val cleaned = Steps.foldLeft(e) {
      case (c, Re(p, r))  => s"regexp_replace($c, ${q(p)}, ${repl(r)}, 'g')"
      case (c, Lit(f, t)) => s"replace($c, ${q(f)}, ${q(t)})"
    }
    s"array_to_string(list_filter(list_transform(" +
      s"string_split($cleaned, chr(10)), " +
      s"x -> trim(regexp_replace(x, ${q(LineCollapse)}, ' ', 'g'))), " +
      s"x -> x <> ''), chr(10))"
  }
}
