package graft.io

import java.io.StringReader

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XML tag reader (reference: examples/util/xml_reader.py — the worked
  * "extract every `<text>` from a wikipedia dump" example).
  *
  * The reference drives a SAX parser from a chunk stream and yields each
  * target tag's character data. Here the same extraction runs on a StAX
  * pull parser (streaming, constant memory): the parser advances event by
  * event and each completed target element becomes one record, so a
  * multi-GB dump streams through a task without materializing.
  *
  * Semantics: one record per `<tag>` element, its content = all character
  * data (text + CDATA, entities resolved) between the element's start and
  * its matching end, INCLUDING text inside nested children. The reference's
  * handler drops content once a nested child starts and re-emits on every
  * later end-tag (xml_reader.py:37-50) — that's an artifact of its
  * one-variable state machine, not a contract; for flat elements like
  * wikipedia `<text>` the two agree exactly.
  *
  * Scale note: one whole XML document is inherently one task (tags span
  * byte ranges, so a blind split corrupts records — same reason Disco
  * chunked at ingest). Parallelism unit = the file; a 100 TB corpus of
  * many dumps fans out across the cluster via the path list, like
  * [[Sources.readUrls]].
  */
object Xml {

  // XMLInputFactory.newInstance is a service-loader lookup — far too
  // expensive per record; the factory isn't specified thread-safe, so
  // cache one per executor thread
  private val factoryTL = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      // untrusted input: no DTDs, no external entities (XXE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f
    }
  }
  private def factory(): XMLInputFactory = factoryTL.get()

  /** Lazy pull of each completed `<tag>` element's text from a StAX
    * reader. Nested same-name tags fold into the outermost occurrence.
    */
  private def extractIter(r: XMLStreamReader, tag: String): Iterator[String] =
    new Iterator[String] {
      private var pending: String = null
      private def advance(): Unit = {
        val sb = new StringBuilder
        var depth = 0
        while (pending == null && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT if r.getLocalName == tag =>
              if (depth == 0) sb.clear()
              depth += 1
            case XMLStreamConstants.END_ELEMENT if r.getLocalName == tag =>
              depth -= 1
              if (depth == 0) pending = sb.toString
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
                if depth > 0 =>
              sb.append(r.getText)
            case _ =>
          }
        }
      }
      def hasNext: Boolean = { if (pending == null) advance(); pending != null }
      def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        val out = pending; pending = null; out
      }
    }

  /** All `<tag>` contents of an XML string, in document order. */
  def extractAll(xml: String, tag: String): Seq[String] = {
    val r = factory().createXMLStreamReader(new StringReader(xml))
    try extractIter(r, tag).toVector finally r.close()
  }

  /** Column form: array of every `<tag>` content in the XML string column
    * (null in → null out). A real parser can't be a codegen'd builtin, so
    * this is a deliberate UDF — the preference-order exception for genuine
    * format parsing.
    */
  def extractCol(xmlCol: Column, tag: String): Column = {
    val f = udf((s: String) => if (s == null) null else extractAll(s, tag))
    f(xmlCol)
  }

  /** File source: stream each XML document at `paths` (file:// URL or plain
    * path) through StAX, one row per `<tag>` element — column `content`.
    * One task per path; the stream is closed on exhaustion and on task
    * completion (early-abandoning consumers don't leak handles).
    */
  def readFiles(spark: SparkSession, paths: Seq[String], tag: String): DataFrame = {
    import spark.implicits._
    require(paths.nonEmpty, "xml read: empty path list")
    spark.createDataset(paths).repartition(paths.size).flatMap { p =>
      val uri = if (p.contains("://")) new java.net.URI(p)
                else new java.io.File(p).toURI
      val in = uri.toURL.openStream()
      val r = factory().createXMLStreamReader(in)
      var closed = false
      def closeOnce(): Unit =
        if (!closed) { closed = true; try r.close() finally in.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val it = extractIter(r, tag)
      new Iterator[String] {
        def hasNext: Boolean = {
          val h = !closed && it.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): String = it.next()
      }
    }.toDF("content")
  }

  /** Schema-declared XML record parsing — Spark 4's NATIVE `from_xml`
    * (no UDF): one XML record string → a typed struct per the declared
    * schema, evaluated by Spark's built-in XML data source expression.
    * Use this when the record shape is known up front; [[extractCol]]
    * remains the schemaless tag-extraction dual (the reference
    * xml_reader.py contract), which a declared schema cannot express
    * (every `<tag>` occurrence at any depth).
    */
  def parseCol(xmlCol: Column,
               schema: org.apache.spark.sql.types.StructType,
               options: Map[String, String] = Map.empty): Column =
    from_xml(xmlCol, schema,
      new java.util.HashMap[String, String](
        scala.jdk.CollectionConverters.MapHasAsJava(options).asJava))

  /** Escape a string column for embedding as XML character data
    * (writer-side dual of the parser's entity resolution — `&` first so
    * produced entities aren't double-escaped). Pure codegen'd replaces.
    *
    * Carriage returns are written as `&#xD;`: XML 1.0 line-end
    * normalization folds RAW \r and \r\n to \n in character data, but a
    * character reference survives parsing verbatim, so CR round-trips.
    * Limitation: control characters outside the XML 1.0 Char production
    * (U+0000-U+0008, U+000B, U+000C, U+000E-U+001F) are not representable
    * in XML at all — strip them before embedding (a parser must reject
    * them even as references).
    */
  def escapeCol(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    val gt = regexp_replace(lt, ">", "&gt;")
    regexp_replace(gt, "\r", "&#xD;")
  }
}
