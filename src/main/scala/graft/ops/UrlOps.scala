package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain operations for crawl-corpus pipelines.
  *
  * Production pipelines cap and dedup per REGISTRABLE DOMAIN (eTLD+1),
  * not per raw host — `www.x.example.org` and `cdn.x.example.org` are one
  * publisher. Extraction follows the public-suffix algorithm
  * (publicsuffix.org/list/ — Mozilla PSL): find the LONGEST suffix from
  * the list matching the host, registrable = that suffix plus one more
  * label; a host that IS a bare suffix has no registrable domain (null);
  * an unlisted TLD falls back to the PSL default `*` rule (last two
  * labels). The suffix list here is a configurable static Seq (the real
  * PSL is a data file a deployment ships; the ALGORITHM is what this op
  * pins) — including a "private-section" entry (`example.com`, standing
  * in for github.io-style entries) so the longest-match rule is
  * genuinely exercised.
  *
  * Everything is a pure codegen'd Column expression (regexp + CASE
  * chain, no UDF) and replays in any SQL engine with the same CASE —
  * the per-domain budget/dedup keys derive deterministically at scan
  * speed, no shuffle.
  */
object UrlOps {

  /** Default suffix set: multi-label + single-label public suffixes plus
    * one private-domain entry; longest match must win.
    */
  val DefaultSuffixes: Seq[String] = Seq("example.com", "co.uk", "com", "net", "org")

  /** Lowercased host from an absolute URL: strips scheme, userinfo,
    * port, path, query, fragment. Returns "" for non-URL input (the
    * regexp_extract no-match convention).
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** Registrable domain (eTLD+1) of `url` under `suffixes` — the
    * public-suffix longest-match algorithm as one CASE chain. Null when
    * the host IS a bare suffix or has fewer than two labels.
    */
  def registrableDomain(url: Column,
                        suffixes: Seq[String] = DefaultSuffixes): Column = {
    val h = host(url)
    // PSL rule: the suffix with the most labels wins (then longest)
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))
    val fallback = // default `*` rule: unlisted TLD -> last two labels
      when(h.rlike("[^.]+\\.[^.]+$"),
        regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
    ordered.foldRight(fallback) { (s, acc) =>
      val esc = s.replace(".", "\\.")
      when(h === s, lit(null).cast("string"))
        .when(h.endsWith("." + s),
          regexp_extract(h, "([^.]+\\." + esc + ")$", 1))
        .otherwise(acc)
    }
  }

  /** URL canonicalization — the crawl-frontier / seen-set key every
    * pipeline needs before URL-grain dedup (the same page arrives as
    * `HTTP://Site.com:80/x?utm_source=feed&b=2#top` and
    * `http://site.com/x?b=2`):
    *
    *  - scheme and host lowercased; userinfo dropped;
    *  - default ports removed (`:80` for http, `:443` for https),
    *    explicit non-default ports kept;
    *  - empty path becomes `/`;
    *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid` — the
    *    configurable-deny-list pattern), remaining query params SORTED
    *    (param order is not page identity), `?` dropped when none
    *    survive;
    *  - fragment dropped (never sent to the server).
    *
    * Pure codegen'd string/array expressions; null for non-URL input.
    * [[canonicalizeUrlSql]] generates the identical chain as ANSI SQL.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    val h = lower(regexp_extract(hostport, "^([^:]+)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathPart = when(path === "", lit("/")).otherwise(path)
    // query anchored to the pre-fragment prefix: a '?' INSIDE the
    // fragment of a query-less URL (http://h/p#sec?x=1) is not a query
    val q = regexp_extract(regexp_extract(url, "^([^#]*)", 1), "\\?(.*)$", 1)
    val params = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike("^(utm_|fbclid|gclid)")))
    val qPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), h, portPart, pathPart, qPart))
  }

  /** [[canonicalizeUrl]] as ANSI SQL over a URL expression — the oracle
    * twin, generated so the chains cannot drift.
    */
  def canonicalizeUrlSql(u: String): String =
    s"""CASE WHEN regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '' THEN NULL
       |ELSE lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
       |  lower(regexp_extract(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1), '^([^:]+)', 1)) ||
       |  CASE WHEN regexp_extract(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1), ':([0-9]+)$$', 1) = ''
       |         OR (lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'http'
       |             AND regexp_extract(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1), ':([0-9]+)$$', 1) = '80')
       |         OR (lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'https'
       |             AND regexp_extract(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1), ':([0-9]+)$$', 1) = '443')
       |       THEN ''
       |       ELSE ':' || regexp_extract(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1), ':([0-9]+)$$', 1) END ||
       |  CASE WHEN regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = '' THEN '/'
       |       ELSE regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END ||
       |  CASE WHEN len(list_filter(string_split(regexp_extract(regexp_extract($u, '^([^#]*)', 1), '\\?(.*)$$', 1), '&'),
       |         p -> p <> '' AND NOT regexp_matches(p, '^(utm_|fbclid|gclid)'))) > 0
       |       THEN '?' || array_to_string(list_sort(list_filter(
       |              string_split(regexp_extract(regexp_extract($u, '^([^#]*)', 1), '\\?(.*)$$', 1), '&'),
       |              p -> p <> '' AND NOT regexp_matches(p, '^(utm_|fbclid|gclid)'))), '&')
       |       ELSE '' END
       |END""".stripMargin

  /** The same CASE chain as ANSI SQL over a host expression — the oracle
    * twin of [[registrableDomain]], kept next to the Scala so the two
    * stay in lockstep.
    */
  def registrableDomainSql(hostExpr: String,
                           suffixes: Seq[String] = DefaultSuffixes): String = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))
    val cases = ordered.map { s =>
      val esc = s.replace(".", "\\.")
      s"""WHEN $hostExpr = '$s' THEN NULL
         |     WHEN $hostExpr LIKE '%.$s' THEN regexp_extract($hostExpr, '([^.]+\\.$esc)$$', 1)""".stripMargin
    }.mkString("\n     ")
    // portable default rule: both Spark and DuckDB return '' on no
    // match, so nullif covers the fewer-than-two-labels case
    s"""CASE $cases
       |     ELSE nullif(regexp_extract($hostExpr, '([^.]+\\.[^.]+)$$', 1), '') END""".stripMargin
  }
}
