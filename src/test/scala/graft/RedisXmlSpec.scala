package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{MiniRedis, Redis, Xml}

class RedisXmlSpec extends SparkTestBase {
  import spark.implicits._

  test("redis round-trip: distributed write, SCAN+LRANGE read") {
    val srv = new MiniRedis()
    try {
      val df = Seq(("a", "1"), ("a", "2"), ("b", "3"), ("c", "4"))
        .toDF("key", "value").repartition(3)
      Redis.write(df, srv.url())
      val back = Redis.read(spark, Seq(srv.url()))
        .as[(String, String)].collect().sorted
      assert(back.toSeq == Seq("a" -> "1", "a" -> "2", "b" -> "3", "c" -> "4"))
      assert(Redis.dbSize(srv.url()) == 3)
    } finally srv.close()
  }

  test("redis: SCAN batches smaller than the keyspace still cover it") {
    val srv = new MiniRedis()
    try {
      val df = (1 to 57).map(i => (s"k$i", i.toString)).toDF("key", "value")
      Redis.write(df, srv.url())
      // scanCount 10 → 6 SCAN round-trips; every key must appear exactly once
      val keys = Redis.read(spark, Seq(srv.url()), scanCount = 10)
        .select("key").as[String].collect()
      assert(keys.length == 57 && keys.toSet.size == 57)
    } finally srv.close()
  }

  test("redis: db isolation via SELECT, lpush reverses, rpush preserves") {
    val srv = new MiniRedis()
    try {
      val one = Seq(("k", "1"), ("k", "2"), ("k", "3")).toDF("key", "value")
        .coalesce(1)
      Redis.write(one, srv.url(1), lpush = false)
      Redis.write(one, srv.url(2), lpush = true)
      def vals(db: Int) = Redis.read(spark, Seq(srv.url(db)))
        .select("value").as[String].collect().toSeq
      assert(vals(1) == Seq("1", "2", "3")) // rpush: arrival order
      assert(vals(2) == Seq("3", "2", "1")) // lpush: reference's reversal
      assert(Redis.dbSize(srv.url()) == 0)  // db 0 untouched
    } finally srv.close()
  }

  test("xml: file reader streams each <tag> element, entities resolved") {
    val xml =
      """<docs>
        |  <doc><id>1</id><text>alpha &amp; beta</text></doc>
        |  <doc><id>2</id><text>with <b>nested</b> markup</text></doc>
        |  <doc><id>3</id><note>not a text tag</note></doc>
        |  <doc><id>4</id><text><![CDATA[raw <cdata> body]]></text></doc>
        |</docs>""".stripMargin
    val f = Files.createTempFile("graft-xml", ".xml")
    try {
      Files.write(f, xml.getBytes("UTF-8"))
      val got = Xml.readFiles(spark, Seq(f.toString), "text")
        .as[String].collect().toSeq
      assert(got == Seq("alpha & beta", "with nested markup", "raw <cdata> body"))
    } finally Files.delete(f)
  }

  test("redis: LRANGE follows the real negative-index contract") {
    val srv = new MiniRedis()
    try {
      val port = srv.url().stripPrefix("redis://").split(":")(1).toInt
      val c = new Redis.Client("127.0.0.1", port)
      try {
        c.cmd("RPUSH", "k", "a", "b", "c")
        def lr(s: String, e: String) =
          c.cmd("LRANGE", "k", s, e).asInstanceOf[Seq[Any]]
        assert(lr("0", "-1") == Seq("a", "b", "c"))
        assert(lr("-2", "-1") == Seq("b", "c"))
        assert(lr("0", "-5").isEmpty) // stop resolves before start -> empty
        assert(lr("5", "10").isEmpty)
        // COUNT <= 0 is a syntax error, not an empty terminal reply
        intercept[java.io.IOException](c.cmd("SCAN", "0", "COUNT", "0"))
      } finally c.close()
    } finally srv.close()
  }

  test("xml: column extract + escape round-trips arbitrary text") {
    // \r must survive: raw CR would be folded to \n by XML line-end
    // normalization; escapeCol writes it as a character reference
    val texts = Seq("plain", "a & b < c > d", "&amp; pre-escaped", "",
      "line1\r\nline2", "cr\ronly")
    val df = texts.toDF("t")
      .withColumn("xml", concat(lit("<d><text>"), Xml.escapeCol(col("t")),
        lit("</text></d>")))
      .withColumn("back", Xml.extractCol(col("xml"), "text"))
    val rows = df.select("t", "back").as[(String, Seq[String])].collect()
    rows.foreach { case (t, back) => assert(back == Seq(t)) }
  }

  test("xml: nested same-name tags fold into the outermost element") {
    assert(Xml.extractAll("<r><t>a<t>b</t>c</t></r>", "t") == Seq("abc"))
  }

  test("xml: schema-declared parse via native from_xml agrees with the extractor") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val xmls = Seq("<rec><id>7</id><text>a &amp; b</text></rec>",
      "<rec><id>8</id><text>two</text></rec>")
    val df = xmls.toDF("xml")
      .withColumn("rec", Xml.parseCol(col("xml"), schema))
      .select(col("rec.id"), col("rec.text"), col("xml"))
    val rows = df.as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((7L, "a & b"), (8L, "two")))
    // same text the schemaless extractor yields (entity resolution parity)
    rows.foreach { case (_, text, xml) =>
      assert(Xml.extractAll(xml, "text") == Seq(text))
    }
  }
}
