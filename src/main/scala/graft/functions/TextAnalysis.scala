package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Column expressions (whole-stage codegen, no UDFs) so they run
  * at scan speed over 100 TB of documents; every formula is engine-portable
  * (the DuckDB oracles replicate them exactly).
  */
object TextAnalysis {

  /** Lowercased alphanumeric tokens, empties removed. */
  def tokensArr(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")

  /** Token count (whitespace/punct tokenizer). */
  def tokenCount(text: Column): Column = size(tokensArr(text))

  /** Word n-gram array over a token array — the ONE n-gram construction
    * both [[graft.dedup.Dedup.shingles]] and
    * [[graft.ops.TextOps.ngramCounts]] use (they must stay
    * oracle-identical). Callers pre-filter `size(toks) >= n`:
    * sequence(0, negative) would DESCEND, not produce empty.
    */
  def ngramsArr(toks: Column, n: Int): Column =
    transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** A BPE-ish subword proxy: number of ~4-char chunks across tokens —
    * ceil(len/4) summed, the standard quick token-budget estimate.
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokensArr(text), lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))

  private val stop = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit(_)): _*)))

  /** n-gram/stopword-heuristic language ID. Scores each language by marker-
    * word hits (CJK by codepoint-class regex); argmax with alphabetical
    * tie-break — fully deterministic, expressible in ANSI SQL.
    */
  def langId(text: Column): Column = langIdOver(text, tokensArr(text))

  /** [[langId]] over a pre-tokenized array — callers scoring several
    * signals should tokenize ONCE in a prior projection and pass the array
    * here: the lambda subtrees inside `hits` dodge codegen subexpression
    * elimination, so the inline form re-splits the text per marker set.
    */
  def langIdOver(text: Column, toks: Column): Column = {
    val scores = Seq(
      "de" -> hits(toks, stop("de")), "en" -> hits(toks, stop("en")),
      "es" -> hits(toks, stop("es")), "fr" -> hits(toks, stop("fr")),
      "zh" -> size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))))
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      when(acc.isNull && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: mix of length, word-shape, stopword and
    * alphanumeric-density signals (the classic Gopher/C4-style filters,
    * folded to one number). Fixed evaluation order keeps it bit-stable.
    */
  def qualityScore(text: Column): Column = qualityScoreOver(text, tokensArr(text))

  /** [[qualityScore]] over a pre-tokenized array (same rationale as
    * [[langIdOver]]). */
  def qualityScoreOver(text: Column, toks: Column): Column = {
    val n = size(toks).cast("double")
    val nTerm = least(n / lit(100.0), lit(1.0))
    val avgLen = when(n > 0,
      aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double") / n)
      .otherwise(lit(0.0))
    val lenTerm = least(avgLen / lit(8.0), lit(1.0))
    val swRatio = when(n > 0, hits(toks, stop("en")).cast("double") / n).otherwise(lit(0.0))
    val alnum = length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double")
    val alnumRatio = when(length(text) > 0, alnum / length(text).cast("double"))
      .otherwise(lit(0.0))
    round(nTerm * lit(0.25) + lenTerm * lit(0.25) +
      (lit(1.0) - swRatio) * lit(0.25) + alnumRatio * lit(0.25), 6)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(to_binary(regexp_replace(trim(lower(text)), "\\s+", " "), lit("utf-8")))

  /** Rolling polynomial fingerprint (custom codegen'd Catalyst expression). */
  def fingerprintRolling(text: Column): Column = RollingHash.rolling_hash(text)

  /** DuckDB rendering of [[langIdOver]]'s score legs as `t`/`s`/`m` CTE
    * bodies over a documents-shaped table (doc_id, text [, carried
    * columns]): `t` tokenizes, `s` counts the marker hits (IN-lists
    * generated from the SAME `stop` map the Column renderer uses — the two
    * engines cannot drift), `m` attaches the winning score. `carry` lists
    * extra columns to thread through (e.g. `lang` for agreement evals).
    */
  def langIdSqlCtes(table: String, carry: Seq[String] = Nil): String = {
    val extra = carry.map(c => s"$c, ").mkString
    def inList(l: String) = stop(l).map(w => s"'$w'").mkString(",")
    s"""t AS (SELECT doc_id, ${extra}text,
       |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |FROM $table),
       |s AS (SELECT doc_id, ${extra}text, toks,
       |  len(list_filter(toks, x -> x IN (${inList("de")}))) AS c_de,
       |  len(list_filter(toks, x -> x IN (${inList("en")}))) AS c_en,
       |  len(list_filter(toks, x -> x IN (${inList("es")}))) AS c_es,
       |  len(list_filter(toks, x -> x IN (${inList("fr")}))) AS c_fr,
       |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS c_zh
       |FROM t),
       |m AS (SELECT *, greatest(c_de, c_en, c_es, c_fr, c_zh) AS best FROM s)""".stripMargin
  }

  /** The argmax CASE over `m`'s score columns — [[langIdSqlCtes]]'s
    * companion, same first-match-wins order as [[langIdOver]]'s fold.
    */
  val langIdCaseSql: String =
    """CASE WHEN c_de = best THEN 'de' WHEN c_en = best THEN 'en'
      |       WHEN c_es = best THEN 'es' WHEN c_fr = best THEN 'fr'
      |       ELSE 'zh' END""".stripMargin

  /** Attach the full text-analysis profile to a documents DataFrame. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("bpe_est", bpeTokenEstimate(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fp_md5", fingerprintMd5(col(textCol)))
      .withColumn("fp_roll", fingerprintRolling(col(textCol)))
}
