package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Generation-eval metrics over (candidate, reference) text pairs: corpus
  * BLEU (Papineni 2002 — clipped modified n-gram precision + brevity
  * penalty) and ROUGE-N (Lin 2004 — n-gram recall/precision/F1). The
  * judge-side summarization/translation eval a training pipeline runs over
  * millions of generations.
  *
  * Scale shape: ONE pass builds the pair frame (checkpointed — three
  * consumers), then clipped-match counting is the wordcount shape on
  * (pair, n, gram) keys — two explodes, one equi-join, group-grain
  * roll-ups. Nothing is ever all-pairs and no window touches corpus rows;
  * pairs scale, n is a literal. Every formula is rendered twice from the
  * constants below (Column chain + DuckDB SQL) so the two engines cannot
  * drift.
  */
object OverlapEval {

  /** Fixture pairing fractions for the self-overlap construction
    * ([[slicePair]]): candidate = first 60% of tokens, reference = last
    * 70% — a contiguous 30% overlap region, candidate shorter than
    * reference so the brevity penalty is exercised. Single source for
    * both renderers.
    */
  val CandFrac = 0.6
  val RefFrac = 0.7

  /** Deterministic (candidate, reference) token-array pairs derived from a
    * document table: cand = first ceil(0.6·len) tokens, ref = last
    * ceil(0.7·len). Output: (id, cand, ref).
    */
  def slicePair(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sz = size(col("a"))
    val candLen = ceil(lit(CandFrac) * sz).cast("int")
    val refLen = ceil(lit(RefFrac) * sz).cast("int")
    // fanOut BEFORE the tokenize + per-row gram/DP work: a single-split
    // corpus scan would otherwise run every downstream explode and
    // edit-distance kernel on one task (no-op at production widths)
    graft.ops.ScaleOps.fanOut(df)
      .select(col(idCol).as("id"),
        TextAnalysis.tokensArr(col(textCol)).as("a"))
      .select(col("id"),
        slice(col("a"), lit(1), candLen).as("cand"),
        slice(col("a"), sz - refLen + 1, refLen).as("ref"))
  }

  /** The clipped-count engine shared by the word-gram ([[ngramOverlap]])
    * and char-gram ([[charNgramOverlap]]) metrics: given a per-n gram
    * builder and a unit-length expression, produce the per-n corpus rows
    * (n, clipped, cand_total, ref_total).
    */
  private def overlapCore(pairDf: DataFrame, maxN: Int,
                          gramsOf: (Column, Int) => Column,
                          lenOf: Column => Column): DataFrame = {
    require(maxN >= 1, s"overlapCore maxN: $maxN")
    // three consumers (cand counts, ref counts, length totals) — score the
    // tokenize/slice front end once
    val pair = pairDf.localCheckpoint()
    def gramStructs(c: Column): Column =
      flatten(array((1 to maxN).map { n =>
        transform(gramsOf(c, n), g => struct(lit(n).as("n"), g.as("g")))
      }: _*))
    // ONE union pass + ONE keyed aggregation (round 17): cand grams
    // carry (1,0), ref grams (0,1), and the per-(id,n,g) pair of sums
    // replaces the old two aggregations + left equi-join — 2 Exchanges
    // and a join collapse into 1 Exchange. Semantics are bit-equal:
    // groups seen only in cand get rc=0 (= the old coalesce(rc,0)),
    // groups seen only in ref get cc=0 so least()=0 (the old left join
    // never emitted them, and adding zeros to a sum changes nothing);
    // all arithmetic is exact integers.
    def gramSide(c: String, cc: Int, rc: Int) = pair
      .select(col("id"), explode(gramStructs(col(c))).as("x"),
        lit(cc.toLong).as("_c"), lit(rc.toLong).as("_r"))
    val clip = gramSide("cand", 1, 0).unionByName(gramSide("ref", 0, 1))
      .groupBy(col("id"), col("x.n").as("n"), col("x.g").as("g"))
      .agg(sum(col("_c")).as("cc"), sum(col("_r")).as("rc"))
      .groupBy("n")
      .agg(sum(least(col("cc"), col("rc"))).as("clipped"))
    val tot = pair
      .select(explode(array((1 to maxN).map(n =>
        struct(lit(n).as("n"),
          greatest(lit(0), lenOf(col("cand")) - n + 1).cast("long").as("ct"),
          greatest(lit(0), lenOf(col("ref")) - n + 1).cast("long").as("rt"))): _*))
        .as("x"))
      .groupBy(col("x.n").as("n"))
      .agg(sum(col("x.ct")).as("cand_total"), sum(col("x.rt")).as("ref_total"))
    tot.join(clip, Seq("n"), "left")
      .select(col("n"), coalesce(col("clipped"), lit(0L)).as("clipped"),
        col("cand_total"), col("ref_total"))
  }

  /** Per-n corpus overlap counts over word-gram pairs, n = 1..maxN:
    * clipped matches (Σ_pairs Σ_grams min(count_cand, count_ref)), total
    * candidate n-grams, total reference n-grams. The shared engine under
    * [[rougeN]] and [[bleu]].
    */
  def ngramOverlap(pairDf: DataFrame, maxN: Int): DataFrame =
    overlapCore(pairDf, maxN,
      gramsOf = (arr, n) =>
        when(size(arr) >= n, TextAnalysis.ngramsArr(arr, n))
          .otherwise(array().cast("array<string>")),
      lenOf = size)

  /** [[ngramOverlap]] over CHARACTER n-grams of string pairs (id, cand,
    * ref strings) — the engine under [[chrF]].
    */
  def charNgramOverlap(pairDf: DataFrame, maxN: Int): DataFrame = {
    // [[charPair]] strings are single-space-joined [a-z0-9] tokens —
    // single-byte ASCII — so a char n-gram of n <= 9 packs INJECTIVELY
    // into one long (7 bits per char, big-endian). The count
    // aggregation then groups/shuffles 8-byte longs instead of freshly
    // allocated 1-6 char strings: same distinct keys, same counts
    // (injective = no collisions, unlike a hash), roughly half the
    // exchange bytes and no per-gram allocation. The ASCII code array
    // is computed once per row; each gram is n element_at + shift-adds
    // in codegen.
    require(maxN >= 1 && maxN <= 9,
      s"charNgramOverlap: maxN in [1,9] (got $maxN)")
    def codes(c: Column): Column =
      // ASCII guard (round 18, ADVICE r17): the pack is injective ONLY
      // for codepoints < 128 — non-ASCII input must fail loudly, never
      // silently collide grams. All-ASCII ⟺ UTF-8 byte length equals
      // codepoint length, an O(1)-per-row comparison of two lengths the
      // row computes anyway. Null text keeps the empty-gram path (the
      // pre-guard behavior).
      when(c.isNotNull && octet_length(c) =!= length(c),
        raise_error(concat(lit("charNgramOverlap: non-ASCII input (the " +
          "7-bit long-pack is injective only for codepoints < 128); " +
          "normalize to [a-z0-9 ] first (charPair does) — offending " +
          "value: "), substring(c, 1, 40))).cast("array<int>"))
      // guard BEFORE sequence: sequence(1, 0) would DESCEND, not
      // produce empty (same pitfall ngramsArr documents)
      .when(length(c) >= 1,
        transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1)))))
        .otherwise(array().cast("array<int>"))
    val prepped = pairDf.select(col("id"),
      codes(col("cand")).as("cand"), codes(col("ref")).as("ref"))
    overlapCore(prepped, maxN,
      gramsOf = (arr, n) =>
        when(size(arr) >= n,
          transform(sequence(lit(1), size(arr) - n + 1),
            i => (0 until n).map(j =>
              shiftleft(element_at(arr, i + lit(j)).cast("long"),
                7 * (n - 1 - j))).reduce(_ + _)))
          .otherwise(array().cast("array<long>")),
      lenOf = size)
  }

  private def pRaw: Column =
    when(col("cand_total") > 0,
      col("clipped").cast("double") / col("cand_total").cast("double"))
      .otherwise(lit(0.0))
  private def rRaw: Column =
    when(col("ref_total") > 0,
      col("clipped").cast("double") / col("ref_total").cast("double"))
      .otherwise(lit(0.0))

  /** ROUGE-N table, one row per n: (n, precision, recall, f1). Recall is
    * the headline ROUGE number; precision/F1 ride along for free.
    */
  def rougeN(pairDf: DataFrame, maxN: Int): DataFrame =
    ngramOverlap(pairDf, maxN)
      .select(col("n"), round(pRaw, 6).as("precision"),
        round(rRaw, 6).as("recall"),
        round(when(pRaw + rRaw > 0,
          lit(2.0) * pRaw * rRaw / (pRaw + rRaw)).otherwise(0.0), 6)
          .as("f1"))

  /** Corpus BLEU-maxN, one row: (bp, p1..pmaxN, bleu). bleu = BP ·
    * exp(Σ ln pₙ / maxN); zero (never NaN) when any pₙ = 0 — the standard
    * unsmoothed corpus score.
    */
  def bleu(pairDf: DataFrame, maxN: Int = 4): DataFrame = {
    val ov = ngramOverlap(pairDf, maxN)
    val wide = ov.agg(
      max(when(col("n") === 1, col("cand_total"))).as("cand_len"),
      max(when(col("n") === 1, col("ref_total"))).as("ref_len") +:
        (1 to maxN).map(k =>
          max(when(col("n") === k, pRaw)).as(s"p$k")): _*)
    val bpRaw = when(col("cand_len") === 0, lit(0.0))
      .when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("ref_len").cast("double") / col("cand_len").cast("double")))
    val allPos = (1 to maxN).map(k => col(s"p$k") > 0.0).reduce(_ && _)
    val geo = exp((1 to maxN).map(k => log(col(s"p$k"))).reduce(_ + _) /
      lit(maxN.toDouble))
    wide.select(round(bpRaw, 6).as("bp") +:
      (1 to maxN).map(k => round(col(s"p$k"), 6).as(s"p$k")) :+
      round(when(allPos, bpRaw * geo).otherwise(0.0), 6).as("bleu"): _*)
  }

  /** chrF's n-gram order (1..6) and β (recall weighted 2×) — the
    * Popović 2015 standard settings, single source for both renderers.
    */
  val ChrfMaxN = 6
  val ChrfBeta = 2.0

  /** [[slicePair]] re-joined to strings for the character-level metric:
    * (id, cand string, ref string), tokens joined by single spaces.
    */
  def charPair(df: DataFrame, idCol: String, textCol: String): DataFrame =
    slicePair(df, idCol, textCol)
      .select(col("id"), array_join(col("cand"), " ").as("cand"),
        array_join(col("ref"), " ").as("ref"))

  /** chrF (Popović 2015): character n-gram F-β over n = 1..[[ChrfMaxN]],
    * per-n precision/recall averaged first (plain average over all
    * orders), then F with β = [[ChrfBeta]] (recall weighted β²). One row:
    * (chrp, chrr, chrf). Zero (never NaN) at the degenerate
    * all-empty corpus.
    */
  def chrF(pairDf: DataFrame, maxN: Int = ChrfMaxN,
           beta: Double = ChrfBeta): DataFrame = {
    val ov = charNgramOverlap(pairDf, maxN)
    // pivot per-n to columns so the average is a FIXED-order sum (a
    // sum() over double rows would add in partition order)
    val wide = ov.agg(
      max(when(col("n") === 1, pRaw)).as("p1"),
      (2 to maxN).map(k => max(when(col("n") === k, pRaw)).as(s"p$k")) ++
        (1 to maxN).map(k => max(when(col("n") === k, rRaw)).as(s"r$k")): _*)
    val chrp = (1 to maxN).map(k => col(s"p$k")).reduce(_ + _) /
      lit(maxN.toDouble)
    val chrr = (1 to maxN).map(k => col(s"r$k")).reduce(_ + _) /
      lit(maxN.toDouble)
    val b2 = beta * beta
    val den = lit(b2) * chrp + chrr
    wide.select(round(chrp, 6).as("chrp"), round(chrr, 6).as("chrr"),
      round(when(den > 0, lit(1.0 + b2) * chrp * chrr / den)
        .otherwise(0.0), 6).as("chrf"))
  }

  // ── DuckDB renderings (generated from the same constants) ──────────────

  /** `arr` + `pair` CTE bodies: the SQL twin of [[slicePair]]. */
  def slicePairSql(table: String, idCol: String, textCol: String): String =
    s"""arr AS (SELECT $idCol AS id,
       |  list_filter(regexp_split_to_array(lower($textCol), '[^a-z0-9]+'), x -> x <> '') AS a
       |  FROM $table),
       |pair AS (SELECT id,
       |  list_slice(a, 1, CAST(ceil($CandFrac * len(a)) AS BIGINT)) AS cand,
       |  list_slice(a, len(a) - CAST(ceil($RefFrac * len(a)) AS BIGINT) + 1, len(a)) AS ref
       |  FROM arr)""".stripMargin

  private def gramExprSql(arr: String, n: Int): String =
    (0 until n).map(j => if (j == 0) s"$arr[i]" else s"$arr[i+$j]")
      .mkString(" || ' ' || ")

  /** `cg`/`rg`/`clip`/`tot`/`j` CTE bodies over `pair`: the SQL twin of
    * [[ngramOverlap]] (j = the joined per-n overlap table).
    */
  def overlapCtesSql(maxN: Int): String = {
    def legs(c: String) = (1 to maxN).map(n =>
      s"SELECT id, $n AS n, unnest(list_transform(range(1, len($c) - $n + 2), " +
        s"i -> ${gramExprSql(c, n)})) AS g FROM pair WHERE len($c) >= $n")
      .mkString("\n  UNION ALL\n  ")
    val totLegs = (1 to maxN).map(n =>
      s"SELECT $n AS n, greatest(0, len(cand) - $n + 1) AS ct, " +
        s"greatest(0, len(ref) - $n + 1) AS rt FROM pair")
      .mkString("\n  UNION ALL\n  ")
    s"""cg AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS c FROM (
       |  ${legs("cand")}) GROUP BY id, n, g),
       |rg AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS c FROM (
       |  ${legs("ref")}) GROUP BY id, n, g),
       |clip AS (SELECT cg.n AS n, sum(least(cg.c, coalesce(rg.c, 0))) AS clipped
       |         FROM cg LEFT JOIN rg ON cg.id = rg.id AND cg.n = rg.n AND cg.g = rg.g
       |         GROUP BY cg.n),
       |tot AS (SELECT n, sum(ct) AS cand_total, sum(rt) AS ref_total FROM (
       |  $totLegs) GROUP BY n),
       |j AS (SELECT t.n AS n, CAST(coalesce(c.clipped, 0) AS BIGINT) AS clipped,
       |             CAST(t.cand_total AS BIGINT) AS cand_total,
       |             CAST(t.ref_total AS BIGINT) AS ref_total
       |      FROM tot t LEFT JOIN clip c USING (n))""".stripMargin
  }

  private val pRawSql =
    "CASE WHEN cand_total > 0 THEN CAST(clipped AS DOUBLE)/CAST(cand_total AS DOUBLE) ELSE 0.0 END"
  private val rRawSql =
    "CASE WHEN ref_total > 0 THEN CAST(clipped AS DOUBLE)/CAST(ref_total AS DOUBLE) ELSE 0.0 END"

  /** Full DuckDB statement: the twin of
    * `rougeN(slicePair(table, id, text), maxN)`.
    */
  def rougeSql(table: String, idCol: String, textCol: String,
               maxN: Int): String =
    s"""WITH ${slicePairSql(table, idCol, textCol)},
       |${overlapCtesSql(maxN)}
       |SELECT n, round($pRawSql, 6) AS precision, round($rRawSql, 6) AS recall,
       |  round(CASE WHEN ($pRawSql) + ($rRawSql) > 0
       |        THEN 2.0 * ($pRawSql) * ($rRawSql) / (($pRawSql) + ($rRawSql))
       |        ELSE 0.0 END, 6) AS f1
       |FROM j ORDER BY n""".stripMargin

  /** Full DuckDB statement: the twin of
    * `chrF(charPair(table, id, text), maxN, beta)`.
    */
  def chrfSql(table: String, idCol: String, textCol: String,
              maxN: Int = ChrfMaxN, beta: Double = ChrfBeta): String = {
    def legs(c: String) = (1 to maxN).map(n =>
      s"SELECT id, $n AS n, unnest(list_transform(range(1, length($c) - $n + 2), " +
        s"i -> substring($c, CAST(i AS INT), $n))) AS g FROM cpair WHERE length($c) >= $n")
      .mkString("\n  UNION ALL\n  ")
    val totLegs = (1 to maxN).map(n =>
      s"SELECT $n AS n, greatest(0, length(cand) - $n + 1) AS ct, " +
        s"greatest(0, length(ref) - $n + 1) AS rt FROM cpair")
      .mkString("\n  UNION ALL\n  ")
    val ps = (1 to maxN).map(k =>
      s"max(CASE WHEN n = $k THEN $pRawSql END) AS p$k").mkString(",\n  ")
    val rs = (1 to maxN).map(k =>
      s"max(CASE WHEN n = $k THEN $rRawSql END) AS r$k").mkString(",\n  ")
    val chrp = s"((${(1 to maxN).map(k => s"p$k").mkString(" + ")}) / ${maxN.toDouble})"
    val chrr = s"((${(1 to maxN).map(k => s"r$k").mkString(" + ")}) / ${maxN.toDouble})"
    val b2 = beta * beta
    val den = s"($b2 * $chrp + $chrr)"
    s"""WITH ${slicePairSql(table, idCol, textCol)},
       |cpair AS (SELECT id, array_to_string(cand, ' ') AS cand,
       |                 array_to_string(ref, ' ') AS ref FROM pair),
       |cg AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS c FROM (
       |  ${legs("cand")}) GROUP BY id, n, g),
       |rg AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS c FROM (
       |  ${legs("ref")}) GROUP BY id, n, g),
       |clip AS (SELECT cg.n AS n, sum(least(cg.c, coalesce(rg.c, 0))) AS clipped
       |         FROM cg LEFT JOIN rg ON cg.id = rg.id AND cg.n = rg.n AND cg.g = rg.g
       |         GROUP BY cg.n),
       |tot AS (SELECT n, sum(ct) AS cand_total, sum(rt) AS ref_total FROM (
       |  $totLegs) GROUP BY n),
       |j AS (SELECT t.n AS n, CAST(coalesce(c.clipped, 0) AS BIGINT) AS clipped,
       |             CAST(t.cand_total AS BIGINT) AS cand_total,
       |             CAST(t.ref_total AS BIGINT) AS ref_total
       |      FROM tot t LEFT JOIN clip c USING (n)),
       |w AS (SELECT
       |  $ps,
       |  $rs
       |FROM j)
       |SELECT round($chrp, 6) AS chrp, round($chrr, 6) AS chrr,
       |  round(CASE WHEN $den > 0 THEN ${1.0 + b2} * $chrp * $chrr / $den
       |        ELSE 0.0 END, 6) AS chrf
       |FROM w""".stripMargin
  }

  /** Full DuckDB statement: the twin of
    * `bleu(slicePair(table, id, text), maxN)`.
    */
  def bleuSql(table: String, idCol: String, textCol: String,
              maxN: Int): String = {
    val ps = (1 to maxN).map(k =>
      s"max(CASE WHEN n = $k THEN $pRawSql END) AS p$k").mkString(",\n  ")
    val bpRaw = "CASE WHEN cand_len = 0 THEN 0.0 " +
      "WHEN cand_len >= ref_len THEN 1.0 " +
      "ELSE exp(1.0 - CAST(ref_len AS DOUBLE)/CAST(cand_len AS DOUBLE)) END"
    val allPos = (1 to maxN).map(k => s"p$k > 0.0").mkString(" AND ")
    val geo = s"exp((${(1 to maxN).map(k => s"ln(p$k)").mkString(" + ")}) / " +
      s"${maxN.toDouble})"
    s"""WITH ${slicePairSql(table, idCol, textCol)},
       |${overlapCtesSql(maxN)},
       |w AS (SELECT
       |  max(CASE WHEN n = 1 THEN cand_total END) AS cand_len,
       |  max(CASE WHEN n = 1 THEN ref_total END) AS ref_len,
       |  $ps
       |FROM j)
       |SELECT round($bpRaw, 6) AS bp,
       |  ${(1 to maxN).map(k => s"round(p$k, 6) AS p$k").mkString(",\n  ")},
       |  round(CASE WHEN $allPos THEN ($bpRaw) * $geo ELSE 0.0 END, 6) AS bleu
       |FROM w""".stripMargin
  }

  // ---- edit-distance metrics (CER / WER) -----------------------------------

  /** WER symbol alphabet: the 94 printable ASCII chars. ASCII-only keeps
    * Spark (code-point) and DuckDB (byte) levenshtein in agreement; 94
    * symbols bound [[editEval]]'s `werCap` at 47 tokens per side.
    */
  private val WerAlphabet: Seq[String] = (33 until 127).map(_.toChar.toString)
  /** The DuckDB twin indexes the same alphabet as `chr(offset + rank)`
    * with 1-based ranks — derive the offset from [[WerAlphabet]] itself so
    * the two renderings cannot drift if the alphabet ever moves.
    */
  private val WerSqlOffset: Int = WerAlphabet.head.head.toInt - 1

  /** Corpus micro-averaged edit-distance metrics (the ASR/OCR error-rate
    * family — Levenshtein 1966; WER as in NIST SCLITE scoring) over
    * (cand, ref) pairs from [[slicePair]]:
    *
    *  - CER: character edits / reference chars, over the space-joined
    *    token strings — both engines' codegen'd `levenshtein`.
    *  - WER: token-sequence edits / reference tokens. Token-level
    *    levenshtein rides the SAME native string kernel by remapping each
    *    pair's distinct tokens to single printable-ASCII symbols (rank by
    *    token within the pair). The symbol space bounds the window:
    *    `werCap` tokens per side (default 40, max 47 → ≤ 94 distinct) —
    *    the capped-exactness convention (`q_dedup_jaccard_capped`): exact
    *    on the window, windowed by construction, loud on violation
    *    (ANSI element_at throws past the alphabet).
    *
    * Micro-averaging (Σ edits / Σ ref lengths — the standard corpus WER
    * definition) keeps every aggregate an order-free INTEGER sum; the two
    * divisions happen once, so the result replays bit-for-bit in the
    * DuckDB twin ([[editEvalSql]]).
    *
    * Scale shape: row-local DP (levenshtein is per-pair work at the scan),
    * one bounded per-pair window for the symbol ranks, map-side-combined
    * integer sums — the wordcount profile, no fat shuffle. Output: one row
    * (pairs, char_edits, ref_chars, cer, word_edits, ref_words, wer).
    */
  /** The per-pair metric projection shared by [[editEval]] and the
    * streaming leg ([[graft.streaming.Streams.editEvalStream]]) — one
    * scan, FOUR row-local columns (cd, rc, wd, rwc), no shuffle: the WER
    * symbol remap is a pure expression (rank = 1-based position in the
    * sorted distinct token window, so `array_position` replaces the old
    * explode → window → map-join machinery with identical symbols).
    */
  def editEvalCols(cand: Column, ref: Column, werCap: Int): Seq[Column] = {
    require(werCap >= 1 && werCap <= WerAlphabet.size / 2,
      s"editEval: werCap in [1, ${WerAlphabet.size / 2}] (got $werCap)")
    val cw = slice(cand, 1, werCap)
    val rw = slice(ref, 1, werCap)
    val u = array_sort(array_distinct(concat(cw, rw)))
    def sym(arr: Column) = array_join(transform(arr, t =>
      element_at(lit(WerAlphabet.toArray),
        array_position(u, t).cast("int"))), "")
    Seq(
      levenshtein(array_join(cand, " "), array_join(ref, " ")).as("cd"),
      length(array_join(ref, " ")).as("rc"),
      levenshtein(sym(cw), sym(rw)).cast("long").as("wd"),
      size(rw).cast("long").as("rwc"))
  }

  def editEval(pairDf: DataFrame, werCap: Int = 40): DataFrame =
    pairDf
      .select(editEvalCols(col("cand"), col("ref"), werCap): _*)
      .agg(count(lit(1)).as("pairs"), sum("cd").as("char_edits"),
        sum("rc").as("ref_chars"), sum("wd").as("word_edits"),
        sum("rwc").as("ref_words"))
      .select(col("pairs"), col("char_edits"), col("ref_chars"),
        round(when(col("ref_chars") > 0, col("char_edits").cast("double") /
          col("ref_chars").cast("double")).otherwise(0.0), 6).as("cer"),
        col("word_edits"), col("ref_words"),
        round(when(col("ref_words") > 0, col("word_edits").cast("double") /
          col("ref_words").cast("double")).otherwise(0.0), 6).as("wer"))

  // ---- ROUGE-L --------------------------------------------------------------

  /** Corpus ROUGE-L (Lin 2004 §3: LCS-based precision/recall/F) over
    * (cand, ref) pairs, micro-averaged: P = ΣLCS/Σ|cand|,
    * R = ΣLCS/Σ|ref|, F = 2PR/(P+R). The LCS kernel is the codegen'd
    * [[graft.functions.LcsLen]] DP; `cap` tokens per side bound the DP
    * at cap² cells/pair (the [[editEval]] windowing convention — exact
    * on the window, windowed by construction), which also bounds the
    * oracle's recursive-CTE replay at `cap` recursion steps.
    *
    * Micro-averaging keeps every aggregate an order-free INTEGER sum;
    * P/R/F are three end divisions in fixed order, so the DuckDB twin
    * ([[rougeLSql]]) replays bit-for-bit. Output: one row
    * (pairs, lcs_tokens, cand_tokens, ref_tokens, p, r, f).
    */
  def rougeL(pairDf: DataFrame, cap: Int = 40): DataFrame = {
    require(cap >= 1 && cap <= 200, s"rougeL: cap in [1,200] (got $cap)")
    val capped = pairDf.select(
      slice(col("cand"), 1, cap).as("cw"), slice(col("ref"), 1, cap).as("rw"))
    val per = capped.select(
      graft.functions.LcsLen.lcs_len(col("cw"), col("rw")).cast("long").as("lcs"),
      size(col("cw")).cast("long").as("cl"),
      size(col("rw")).cast("long").as("rl"))
    val agg = per.agg(count(lit(1)).as("pairs"), sum("lcs").as("lcs_tokens"),
      sum("cl").as("cand_tokens"), sum("rl").as("ref_tokens"))
    // empty-corpus guards (all-empty token arrays): 0-denominator yields
    // 0.0 in both engines instead of engine-specific NaN/Inf behavior
    val p = when(col("cand_tokens") > 0, col("lcs_tokens").cast("double") /
      col("cand_tokens").cast("double")).otherwise(0.0)
    val r = when(col("ref_tokens") > 0, col("lcs_tokens").cast("double") /
      col("ref_tokens").cast("double")).otherwise(0.0)
    agg.select(col("pairs"), col("lcs_tokens"), col("cand_tokens"),
      col("ref_tokens"),
      round(p, 6).as("p"), round(r, 6).as("r"),
      round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
        .as("f"))
  }

  /** Full DuckDB statement: the twin of
    * `rougeL(slicePair(table, id, text), cap)` — the LCS DP replayed as a
    * recursive CTE in the prefix-max form (see [[graft.functions.LcsLen]]).
    */
  def rougeLSql(table: String, idCol: String, textCol: String,
                cap: Int = 40): String =
    s"""WITH RECURSIVE ${slicePairSql(table, idCol, textCol)},
       |cap AS (SELECT id, cand[1:$cap] AS cw, ref[1:$cap] AS rw FROM pair),
       |step AS (
       |  SELECT id, cw, rw, 0 AS i, list_transform(range(1, len(rw)+1), x -> 0) AS row FROM cap
       |  UNION ALL
       |  SELECT id, cw, rw, i+1,
       |    list_transform(range(1, len(rw)+1), j ->
       |      greatest(row[j],
       |        list_max(list_prepend(0, list_transform(range(1, j+1), l ->
       |          (CASE WHEN l = 1 THEN 0 ELSE row[l-1] END)
       |          + (CASE WHEN rw[l] = cw[i+1] THEN 1 ELSE 0 END))))))
       |  FROM step WHERE i < len(cw)),
       |per AS (SELECT id,
       |          CASE WHEN len(rw) = 0 OR len(cw) = 0 THEN 0 ELSE row[len(rw)] END AS lcs,
       |          len(cw) AS cl, len(rw) AS rl
       |        FROM step WHERE i = len(cw)),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS pairs,
       |             CAST(sum(lcs) AS BIGINT) AS lcs_tokens,
       |             CAST(sum(cl) AS BIGINT) AS cand_tokens,
       |             CAST(sum(rl) AS BIGINT) AS ref_tokens FROM per),
       |pr AS (SELECT pairs, lcs_tokens, cand_tokens, ref_tokens,
       |         CASE WHEN cand_tokens > 0
       |              THEN CAST(lcs_tokens AS DOUBLE) / CAST(cand_tokens AS DOUBLE)
       |              ELSE 0.0 END AS pv,
       |         CASE WHEN ref_tokens > 0
       |              THEN CAST(lcs_tokens AS DOUBLE) / CAST(ref_tokens AS DOUBLE)
       |              ELSE 0.0 END AS rv
       |       FROM a)
       |SELECT pairs, lcs_tokens, cand_tokens, ref_tokens,
       |       round(pv, 6) AS p, round(rv, 6) AS r,
       |       round(CASE WHEN pv + rv > 0.0
       |                  THEN 2.0 * pv * rv / (pv + rv) ELSE 0.0 END, 6) AS f
       |FROM pr""".stripMargin

  /** Full DuckDB statement: the twin of
    * `editEval(slicePair(table, id, text), werCap)`.
    */
  def editEvalSql(table: String, idCol: String, textCol: String,
                  werCap: Int = 40): String =
    s"""WITH ${slicePairSql(table, idCol, textCol)},
       |capd AS (SELECT cand, ref, cand[1:$werCap] AS cw, ref[1:$werCap] AS rw,
       |                list_sort(list_distinct(cand[1:$werCap] || ref[1:$werCap])) AS u
       |         FROM pair),
       |per AS (SELECT
       |    levenshtein(array_to_string(cand, ' '), array_to_string(ref, ' ')) AS cd,
       |    length(array_to_string(ref, ' ')) AS rc,
       |    levenshtein(array_to_string(list_transform(cw, t -> chr($WerSqlOffset + list_position(u, t))), ''),
       |                array_to_string(list_transform(rw, t -> chr($WerSqlOffset + list_position(u, t))), '')) AS wd,
       |    len(rw) AS rwc
       |  FROM capd),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS pairs, CAST(sum(cd) AS BIGINT) AS char_edits,
       |             CAST(sum(rc) AS BIGINT) AS ref_chars,
       |             CAST(sum(wd) AS BIGINT) AS word_edits,
       |             CAST(sum(rwc) AS BIGINT) AS ref_words FROM per)
       |SELECT pairs, char_edits, ref_chars,
       |       round(CASE WHEN ref_chars > 0
       |                  THEN CAST(char_edits AS DOUBLE) / CAST(ref_chars AS DOUBLE)
       |                  ELSE 0.0 END, 6) AS cer,
       |       word_edits, ref_words,
       |       round(CASE WHEN ref_words > 0
       |                  THEN CAST(word_edits AS DOUBLE) / CAST(ref_words AS DOUBLE)
       |                  ELSE 0.0 END, 6) AS wer
       |FROM a""".stripMargin
}
