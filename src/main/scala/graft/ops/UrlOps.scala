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
