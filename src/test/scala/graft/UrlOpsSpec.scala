package graft

import org.apache.spark.sql.functions._

/** Public-suffix registrable-domain extraction: the PSL longest-match
  * algorithm's edge cases, hand-computed.
  */
class UrlOpsSpec extends SparkTestBase {
  import graft.ops.UrlOps

  private def extract(urls: (String, String)*): Map[String, (String, String)] = {
    import spark.implicits._
    urls.toSeq.toDF("k", "url")
      .select(col("k"), UrlOps.host(col("url")).as("h"),
        UrlOps.registrableDomain(col("url")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
  }

  test("host: scheme/userinfo/port/path/query/fragment stripped, lowercased") {
    val m = extract(
      "plain" -> "https://www.Example.COM/a/b?q=1#f",
      "userinfo" -> "http://user:pw@deep.sub.x.org/p",
      "port" -> "https://y.net:8443/p",
      "bare" -> "ftp://Host.Example.com",
      "notaurl" -> "no scheme here")
    assert(m("plain")._1 == "www.example.com")
    assert(m("userinfo")._1 == "deep.sub.x.org")
    assert(m("port")._1 == "y.net")
    assert(m("bare")._1 == "host.example.com")
    assert(m("notaurl")._1 == "")
  }

  test("registrable domain: PSL longest-match, bare-suffix null, default rule") {
    val m = extract(
      // private-section entry beats the shorter 'com' (longest match wins)
      "private" -> "https://www.acme.example.com/x",
      // multi-label public suffix
      "couk" -> "http://cdn.shop.foo.co.uk/x",
      // single-label suffixes
      "com" -> "https://a.b.widgets.com/x",
      "org" -> "http://deep.sub.x.org/p",
      // host IS a bare suffix -> no registrable domain
      "baresuffix" -> "https://co.uk/x",
      "barecom" -> "https://com/x",
      // unlisted TLD -> default * rule: last two labels
      "unlisted" -> "https://a.b.site.dev/x",
      // single label, unlisted -> null
      "single" -> "https://localhost/x")
    assert(m("private")._2 == "acme.example.com")
    assert(m("couk")._2 == "foo.co.uk")
    assert(m("com")._2 == "widgets.com")
    assert(m("org")._2 == "x.org")
    assert(m("baresuffix")._2 == null)
    assert(m("barecom")._2 == null)
    assert(m("unlisted")._2 == "site.dev")
    assert(m("single")._2 == null)
  }

  test("example.com itself: registrable under 'com', not the private entry") {
    // host example.com: the 'example.com' entry says bare-suffix null, but
    // PSL resolution tries the LONGEST matching suffix first — example.com
    // matches the private entry exactly (null), mirroring how a bare
    // github.io has no registrable domain even though github.io = user
    // sites. The CASE chain pins that reading.
    val m = extract("ex" -> "https://example.com/x")
    assert(m("ex")._2 == null)
  }

  test("canonicalizeUrl: every rule hand-computed") {
    import spark.implicits._
    val cases = Seq(
      // case-fold + default https port + tracking strip + param sort + fragment
      ("https://Www.Ex.COM:443/A/b?b=2&utm_source=x&a=1#top",
        "https://www.ex.com/A/b?a=1&b=2"),
      // http default port, params sorted
      ("HTTP://site.org:80/p?z=9&y=8", "http://site.org/p?y=8&z=9"),
      // explicit non-default port kept
      ("https://x.net:8443/p", "https://x.net:8443/p"),
      // userinfo dropped, ALL params tracking -> no '?'
      ("http://user:pw@x.org/a/?gclid=1&fbclid=2", "http://x.org/a/"),
      // empty path -> '/'
      ("https://bare.com", "https://bare.com/"),
      ("https://bare.com?a=1", "https://bare.com/?a=1"),
      // utm params anywhere in the list, empty params dropped
      ("http://a.com/x?utm_campaign=c&k=v&&utm_medium=m", "http://a.com/x?k=v"),
      // path case PRESERVED (only scheme/host fold)
      ("http://A.com/CaseSensitive/Path", "http://a.com/CaseSensitive/Path"),
      // '?' INSIDE the fragment of a query-less URL is NOT a query
      ("http://h.com/p#sec?x=1", "http://h.com/p"),
      // real query still found when the fragment also contains '?'
      ("http://h.com/p?b=2&a=1#sec?x=1", "http://h.com/p?a=1&b=2"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), graft.ops.UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"$in -> ${got(in)}, want $want")
    // non-URL input -> null
    val nu = Seq("not a url").toDF("url")
      .select(graft.ops.UrlOps.canonicalizeUrl(col("url"))).collect()
    assert(nu.head.isNullAt(0))
    // idempotence: canon(canon(u)) == canon(u)
    val twice = cases.map(_._2).toDF("url")
      .select(col("url"), graft.ops.UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  test("SQL twin produces the identical CASE semantics on the fixture") {
    import spark.implicits._
    // run the generated SQL through Spark itself: same rows as the Column
    val df = Seq("https://www.acme.example.com/x", "http://cdn.shop.foo.co.uk/x",
      "https://a.b.widgets.com/x", "https://co.uk/x", "https://a.b.site.dev/x")
      .toDF("url")
    df.createOrReplaceTempView("urls_fixture")
    val hostSql =
      "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1))"
    val viaSql = spark.sql(
      s"SELECT ${UrlOps.registrableDomainSql(hostSql)} AS d FROM urls_fixture")
      .collect().map(_.getString(0)).toSeq
    val viaCol = df.select(UrlOps.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol)
  }
}
