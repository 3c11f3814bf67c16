package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018
  * (arXiv:1804.10959, public paper), the third production tokenizer next
  * to BPE ([[Bpe.train]]) and WordPiece ([[Bpe.wordpieceStats]]): pieces
  * carry probabilities, a word's segmentation is the Viterbi-best path
  * under the piece LM, and training re-estimates piece probabilities from
  * segmentations (EM over a seed vocabulary).
  *
  * This implementation runs the HARD-EM (Viterbi-EM) variant: the E-step
  * counts pieces along each word's single best path instead of
  * forward-backward expectations — the standard engineering
  * simplification, and what makes every step exactly replayable in a
  * second engine (integral counts, one deterministic best path). The
  * M-step renormalizes: multi-char pieces that went unused are pruned
  * (Kudo's vocabulary shrinking, taken to the hard limit), single-char
  * pieces are floored at count 1 so segmentation coverage can never be
  * lost (Kudo keeps characters unconditionally).
  *
  * Scale shape (the [[Bpe]] contract): every pass runs at DISTINCT-WORD
  * grain — one corpus pass builds the (word, count) dictionary, each EM
  * round Viterbi-segments the dictionary with the model broadcast, and
  * the model itself is vocab-grain (collected to the driver between
  * rounds — the bounded model-state pull of [[graft.chain.KMeans]], never
  * corpus rows). At 100 TB the corpus is touched once; rounds cost
  * O(dictionary · maxPieceLen).
  *
  * Determinism: seed selection orders by (count desc, piece asc); Viterbi
  * tie-breaks by (cost asc, piece-length desc) with costs accumulated in
  * the identical left-to-right IEEE order both engines use; counts stay
  * integral (LONG) so probabilities are exact ratios of longs in either
  * engine.
  */
object UnigramLm {

  /** Final trained model: (piece, cnt) after `rounds` hard-EM rounds,
    * plus the char floor. Probabilities are cnt / Σcnt.
    */
  final case class Model(counts: Seq[(String, Long)], maxPieceLen: Int) {
    lazy val total: Double = counts.map(_._2).sum.toDouble
    lazy val costs: Map[String, Double] =
      counts.map { case (p, c) => p -> -math.log(c.toDouble / total) }.toMap
    lazy val probs: Map[String, Double] =
      counts.map { case (p, c) => p -> c / total }.toMap
    /** Implicit-UNK cost for characters the training corpus never saw:
      * the cost of a hypothetical half-count piece — strictly worse than
      * any real piece (all counts are >= 1), so it can never displace a
      * vocabulary path, only rescue positions that have none. The
      * [[Bpe.wordpieceStats]] convention (emit the raw char as its own
      * UNK-like piece) applied to the Viterbi DP.
      */
    lazy val unkCost: Double = -math.log(0.5 / total)
  }

  private def dictionary(df: DataFrame, textCol: String,
                         maxWordLen: Int): DataFrame =
    df.select(explode(graft.functions.TextAnalysis.tokensArr(col(textCol)))
        .as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Viterbi-best segmentation of one word under piece costs (-ln p).
    * DP over end positions; at each position the candidate ending pieces
    * are the ≤ maxPieceLen suffixes present in the vocab; ties on exact
    * cost equality prefer the LONGER piece. Positions no vocabulary piece
    * can reach — characters the training corpus never saw, the
    * frozen-model apply path on a NEW corpus — fall back to the raw
    * single char at `unkCost` ([[Model.unkCost]]: strictly worse than any
    * vocab piece, so the fallback never displaces a covered path and a
    * fully covered word segments exactly as before).
    */
  private[graft] def viterbi(word: String, cost: Map[String, Double],
                             maxPieceLen: Int, unkCost: Double): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.MaxValue)
    val back = Array.fill(n + 1)(0)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        if (best(j - l) < Double.MaxValue) {
          cost.get(word.substring(j - l, j)) match {
            case Some(c) =>
              val nc = best(j - l) + c
              if (nc < best(j) || (nc == best(j) && l > back(j))) {
                best(j) = nc; back(j) = l
              }
            case None =>
          }
        }
        l += 1
      }
      if (best(j) == Double.MaxValue) { // uncovered position: implicit UNK
        best(j) = best(j - 1) + unkCost; back(j) = 1
      }
      j += 1
    }
    var p = n
    var acc: List[String] = Nil
    while (p > 0) {
      val l = back(p)
      acc = word.substring(p - l, p) :: acc
      p -= l
    }
    acc
  }

  /** Train the model: seed vocab = the top `seedSize` multi-char
    * substrings by occurrence weight (count desc, piece asc) plus ALL
    * single chars, then `rounds` hard-EM rounds of
    * Viterbi-count → renormalize.
    */
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            seedSize: Int, maxPieceLen: Int = 4, rounds: Int = 2,
            maxWordLen: Int = 12): Model = {
    import spark.implicits._
    require(rounds >= 1 && seedSize >= 1 && maxPieceLen >= 2)
    // the dictionary feeds candidate gen + one pass per round: pin it
    val dict = dictionary(df, textCol, maxWordLen)
      .as[(String, Long)].localCheckpoint()
    // candidate pieces: every substring of length 1..maxPieceLen of every
    // distinct word, weighted by word count × occurrences — one
    // dictionary-grain explode, map-side combined
    val cand = dict.flatMap { case (w, c) =>
        for {
          l <- 1 to math.min(maxPieceLen, w.length)
          i <- 0 to w.length - l
        } yield (w.substring(i, i + l), c)
      }
      .toDF("piece", "c").groupBy("piece").agg(sum("c").as("cnt"))
      .localCheckpoint() // seed + chars both consume it
    val seed = cand.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
      .as[(String, Long)].collect().toSeq
    val chars = cand.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toSeq
    var model = Model(seed ++ chars, maxPieceLen)
    for (_ <- 1 to rounds) {
      val costs = model.costs
      val unk = model.unkCost
      val used = dict
        .flatMap { case (w, c) => viterbi(w, costs, maxPieceLen, unk).map(p => (p, c)) }
        .toDF("piece", "c").groupBy("piece").agg(sum("c").as("cnt"))
        .as[(String, Long)].collect().toMap
      // M-step: unused multi-char pieces pruned, chars floored at 1
      val next = model.counts.flatMap { case (p, _) =>
        val u = used.getOrElse(p, 0L)
        if (p.length >= 2) { if (u > 0) Some(p -> u) else None }
        else Some(p -> math.max(u, 1L))
      }
      model = Model(next, maxPieceLen)
    }
    model
  }

  /** The trained vocabulary as a table: (piece, cnt, prob rounded 6). */
  def vocabTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.counts.toDF("piece", "cnt")
      .select(col("piece"), col("cnt"),
        round(col("cnt").cast("double") / lit(model.total), 6).as("prob"))
  }

  /** Viterbi-segment the corpus dictionary under a trained model:
    * (word, wc, n_pieces, seg) per distinct word — the apply-side pass
    * (model broadcast, dictionary grain; the corpus is only touched by
    * the word-count aggregation).
    */
  def segmentStats(spark: SparkSession, df: DataFrame, textCol: String,
                   model: Model, maxWordLen: Int = 12): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      (model.costs, model.maxPieceLen, model.unkCost))
    dictionary(df, textCol, maxWordLen).as[(String, Long)]
      .map { case (w, c) =>
        val (costs, mpl, unk) = bc.value
        val seg = viterbi(w, costs, mpl, unk)
        (w, c, seg.length.toLong, seg.mkString(" "))
      }
      .toDF("word", "wc", "n_pieces", "seg")
  }

  // ---------------------------------------------------------------------
  // DuckDB twins: the same seed/EM/segment chain as unrolled MATERIALIZED
  // CTEs (the kmeansCtes/pcaCtesSql pattern) — position-unrolled Viterbi
  // (maxWordLen CTEs per pass, ≤ maxPieceLen branches each), integral
  // counts, identical (cost asc, length desc) tie-break via row_number.
  // ---------------------------------------------------------------------

  /** The shared seed prefix: CTEs `uwords, dict, cand, seed, chars, v0`
    * — identical for the hard-EM and soft-EM chains.
    */
  private def seedCtesSql(table: String, textCol: String, seedSize: Int,
                          maxPieceLen: Int, maxWordLen: Int): String =
    s"""uwords AS (SELECT unnest(list_filter(
         |    regexp_split_to_array(lower($textCol), '[^a-z0-9]+'), x -> x <> '')) AS word
         |  FROM $table),
         |dict AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS wc
         |  FROM uwords WHERE length(word) <= $maxWordLen GROUP BY word),
         |cand AS MATERIALIZED (
         |  SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
         |         CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM dict
         |  CROSS JOIN unnest(range(1, $maxPieceLen + 1)) AS ll(l)
         |  CROSS JOIN unnest(range(1, length(word) + 1)) AS ii(i)
         |  WHERE i + l - 1 <= length(word)
         |  GROUP BY 1),
         |seed AS MATERIALIZED (
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
         |    FROM cand WHERE length(piece) >= 2) WHERE rn <= $seedSize),
         |chars AS MATERIALIZED (SELECT piece, cnt FROM cand WHERE length(piece) = 1),
         |v0 AS MATERIALIZED (SELECT piece, cnt FROM seed
         |  UNION ALL SELECT piece, cnt FROM chars)""".stripMargin

  /** CTE bodies `dict, cand, seed, chars, v0 … v{rounds}` ending in the
    * final vocab `v{rounds}(piece, cnt)`.
    */
  def trainCtesSql(table: String, textCol: String, seedSize: Int,
                   maxPieceLen: Int = 4, rounds: Int = 2,
                   maxWordLen: Int = 12): String = {
    val base = seedCtesSql(table, textCol, seedSize, maxPieceLen, maxWordLen)
    val roundCtes = (1 to rounds).map { r =>
      s"""${viterbiCtesSql(s"r$r", s"v${r - 1}", maxPieceLen, maxWordLen)},
         |u$r AS MATERIALIZED (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(path, ' ')) AS piece, wc FROM r${r}seg)
         |  GROUP BY piece),
         |v$r AS MATERIALIZED (
         |  SELECT piece, cnt FROM u$r WHERE length(piece) >= 2
         |  UNION ALL
         |  SELECT ch.piece, greatest(coalesce(u.cnt, 0), 1) AS cnt
         |  FROM chars ch LEFT JOIN u$r u USING (piece))""".stripMargin
    }.mkString(",\n")
    s"$base,\n$roundCtes"
  }

  /** One position-unrolled Viterbi pass under vocab `$vocab(piece, cnt)`:
    * CTEs `${p}cost`, `${p}b0 … ${p}b{maxWordLen}`, ending in
    * `${p}seg(word, wc, path)` — path = best segmentation, pieces
    * space-joined.
    */
  private def viterbiCtesSql(p: String, vocab: String, maxPieceLen: Int,
                             maxWordLen: Int): String = {
    val cost =
      s"""${p}t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM $vocab),
         |${p}cost AS MATERIALIZED (SELECT piece,
         |    -ln(CAST(cnt AS DOUBLE) / total) AS cost
         |  FROM $vocab CROSS JOIN ${p}t)""".stripMargin
    val b0 = s"${p}b0 AS (SELECT word, wc, CAST(0.0 AS DOUBLE) AS cost, '' AS path FROM dict)"
    val bs = (1 to maxWordLen).map { j =>
      val branches = (1 to math.min(maxPieceLen, j)).map { l =>
        s"""    SELECT b.word, b.wc, b.cost + c.cost AS cost,
           |      CASE WHEN b.path = '' THEN c.piece
           |           ELSE b.path || ' ' || c.piece END AS path, $l AS l
           |    FROM ${p}b${j - l} b JOIN ${p}cost c
           |      ON c.piece = substring(b.word, ${j - l + 1}, $l)
           |    WHERE length(b.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""${p}b$j AS MATERIALIZED (
         |  SELECT word, wc, cost, path FROM (
         |    SELECT word, wc, cost, path,
         |      row_number() OVER (PARTITION BY word ORDER BY cost ASC, l DESC) AS rn
         |    FROM (
         |$branches))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val seg = (1 to maxWordLen).map { j =>
      s"SELECT word, wc, path FROM ${p}b$j WHERE length(word) = $j"
    }.mkString("\n  UNION ALL\n  ")
    s"""$cost,
       |$b0,
       |$bs,
       |${p}seg AS MATERIALIZED (
       |  $seg)""".stripMargin
  }

  /** Full DuckDB statement: the twin of [[train]] + [[vocabTable]]. */
  def trainSql(table: String, textCol: String, seedSize: Int,
               maxPieceLen: Int = 4, rounds: Int = 2,
               maxWordLen: Int = 12): String =
    s"""WITH ${trainCtesSql(table, textCol, seedSize, maxPieceLen, rounds, maxWordLen)},
       |tf AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v$rounds)
       |SELECT piece, cnt, round(CAST(cnt AS DOUBLE) / total, 6) AS prob
       |FROM v$rounds CROSS JOIN tf ORDER BY piece""".stripMargin

  /** Full DuckDB statement: the twin of [[train]] + [[segmentStats]] —
    * one more Viterbi pass under the final vocab.
    */
  def segmentSql(table: String, textCol: String, seedSize: Int,
                 maxPieceLen: Int = 4, rounds: Int = 2,
                 maxWordLen: Int = 12): String =
    s"""WITH ${trainCtesSql(table, textCol, seedSize, maxPieceLen, rounds, maxWordLen)},
       |${viterbiCtesSql("fin", s"v$rounds", maxPieceLen, maxWordLen)}
       |SELECT word, wc, CAST(len(string_split(path, ' ')) AS BIGINT) AS n_pieces,
       |       path AS seg
       |FROM finseg ORDER BY word""".stripMargin

  // ---------------------------------------------------------------------
  // Soft-EM (full Kudo 2018): forward-backward EXPECTATIONS instead of
  // Viterbi-path counts, then loss-based vocabulary pruning — the
  // production SentencePiece trainer next to the hard-EM variant above.
  // ---------------------------------------------------------------------

  /** Forward-backward expected piece counts for one word, quantized to
    * integral MICRO-counts: each occurrence site's posterior mass is
    * rounded to round(contrib · 1e6) BEFORE the cross-word sum, so the
    * E-step result is a sum of longs — independent of aggregation order,
    * partitioning, and engine (the HLL exact-integer discipline applied
    * to EM; the quantization is the documented algorithm, not an
    * approximation of some other one). Arithmetic order matches the SQL
    * twin literally: alpha/beta accumulate piece lengths ascending, a
    * site contributes ((((wc · alpha) · p) · beta) / Z) · 1e6.
    */
  private[graft] def expectedMicro(word: String, wc: Long,
                                   prob: Map[String, Double],
                                   maxPieceLen: Int): Seq[(String, Long)] = {
    val n = word.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var s = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        prob.get(word.substring(j - l, j)) match {
          case Some(p) => s += alpha(j - l) * p
          case None    =>
        }
        l += 1
      }
      alpha(j) = s
      j += 1
    }
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    j = n - 1
    while (j >= 0) {
      var s = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, n - j)
      while (l <= lMax) {
        prob.get(word.substring(j, j + l)) match {
          case Some(p) => s += p * beta(j + l)
          case None    =>
        }
        l += 1
      }
      beta(j) = s
      j -= 1
    }
    val z = alpha(n)
    if (z <= 0.0) return Seq.empty // unreachable in training: chars cover
    val out = Seq.newBuilder[(String, Long)]
    var i = 0
    while (i < n) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        prob.get(word.substring(i, i + l)) match {
          case Some(p) =>
            val m = math.round(wc * alpha(i) * p * beta(i + l) / z * 1e6)
            if (m != 0L) out += word.substring(i, i + l) -> m
          case None =>
        }
        l += 1
      }
      i += 1
    }
    out.result()
  }

  /** Marginal NLL of one word under piece probabilities: -ln of the
    * total path mass Σ_paths Π p(piece), via the forward pass. Positions
    * no piece covers contribute `unkP` (the implicit-UNK convention at
    * probability grain). The held-out model-comparison metric — what
    * soft-EM optimizes and hard-EM only approximates.
    */
  private[graft] def marginalNll(word: String, prob: Map[String, Double],
                                 maxPieceLen: Int, unkP: Double): Double = {
    val n = word.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var s = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        prob.get(word.substring(j - l, j)).foreach(p => s += alpha(j - l) * p)
        l += 1
      }
      if (s == 0.0) s = alpha(j - 1) * unkP
      alpha(j) = s
      j += 1
    }
    -math.log(alpha(n))
  }

  /** Kudo's loss-based vocabulary pruning: a multi-char piece's loss is
    * its (expected) count times how much the likelihood worsens when it
    * is removed — the cost of the best segmentation of the piece's OWN
    * string without itself, minus its own cost. Keep the `pruneTo`
    * highest-loss multi-char pieces (ties by piece asc); chars are never
    * pruned (coverage, as in [[train]]'s M-step).
    */
  private[graft] def lossPrune(model: Model, pruneTo: Int): Model = {
    val costs = model.costs
    val (multi, chars) = model.counts.partition(_._1.length >= 2)
    val scored = multi.map { case (piece, cnt) =>
      val alt = viterbi(piece, costs - piece, model.maxPieceLen, model.unkCost)
        .foldLeft(0.0)((a, pc) => a + costs.getOrElse(pc, model.unkCost))
      (piece, cnt, cnt * (alt - costs(piece)))
    }
    val kept = scored.sortBy { case (p, _, loss) => (-loss, p) }
      .take(pruneTo).map { case (p, c, _) => (p, c) }
    Model(kept ++ chars, model.maxPieceLen)
  }

  /** The engine-portable uniform draw of the sampler: the house
    * [[graft.ops.Sampling.hashDraw]] convention (first 8 hex digits of
    * md5(key ':' salt) as a 32-bit integer) over 2³², computed JVM-side
    * so the per-word sampling loop never leaves the row. Key is
    * `word|pos` — one independent draw per backward step.
    */
  private[graft] def drawUnit(word: String, pos: Int, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$word|$pos:$salt".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) / 4294967296.0
  }

  /** Sample ONE segmentation from the exact posterior over segmentations
    * (forward-filtering backward-sampling): at position j the ending
    * piece of length l is chosen with probability alpha(j−l)·p / alpha(j),
    * the uniform draw being [[drawUnit]](word, j) — Kudo 2018's subword-
    * regularization sampler at temperature 1, fully deterministic given
    * the salt and engine-replayable. Numeric tail rule: the candidate
    * cumsum re-runs alpha(j)'s own additions, so it lands on alpha(j)
    * bit-for-bit; if u·alpha(j) still rounds up to the full mass, the
    * LAST candidate is taken (both renderings). Positions no vocab piece
    * covers fall back to the raw single char (the [[viterbi]] implicit-
    * UNK convention) with forward mass alpha(j−1)·unkP.
    */
  private[graft] def sampleSegment(word: String, prob: Map[String, Double],
                                   maxPieceLen: Int, salt: String,
                                   unkP: Double): Seq[String] = {
    val n = word.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var s = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        prob.get(word.substring(j - l, j)).foreach(p => s += alpha(j - l) * p)
        l += 1
      }
      alpha(j) = if (s == 0.0) alpha(j - 1) * unkP else s
      j += 1
    }
    var pos = n
    var acc: List[String] = Nil
    while (pos > 0) {
      val thr = drawUnit(word, pos, salt) * alpha(pos)
      var cum = 0.0
      var l = 1
      var chosen = 0
      var lastValid = 0
      val lMax = math.min(maxPieceLen, pos)
      while (l <= lMax && chosen == 0) {
        prob.get(word.substring(pos - l, pos)) match {
          case Some(p) =>
            cum += alpha(pos - l) * p
            lastValid = l
            if (cum > thr) chosen = l
          case None =>
        }
        l += 1
      }
      val take = if (chosen > 0) chosen
        else if (lastValid > 0) lastValid
        else 1 // uncovered position: single-char implicit UNK
      acc = word.substring(pos - take, pos) :: acc
      pos -= take
    }
    acc
  }

  /** Sampled segmentation of the corpus dictionary under a trained
    * model — [[segmentStats]]'s subword-regularization twin: one sampled
    * path per distinct word instead of the Viterbi-best one.
    */
  def sampleStats(spark: SparkSession, df: DataFrame, textCol: String,
                  model: Model, salt: String = "useg",
                  maxWordLen: Int = 12): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      (model.probs, model.maxPieceLen, 0.5 / model.total))
    dictionary(df, textCol, maxWordLen).as[(String, Long)]
      .map { case (w, c) =>
        val (probs, mpl, unkP) = bc.value
        val seg = sampleSegment(w, probs, mpl, salt, unkP)
        (w, c, seg.length.toLong, seg.mkString(" "))
      }
      .toDF("word", "wc", "n_pieces", "seg")
  }

  /** Soft-EM training: [[train]]'s seeding and grain (dictionary passes,
    * vocab-grain driver pulls), but the E-step is forward-backward
    * expected counts ([[expectedMicro]]) and the final vocabulary is
    * loss-pruned to `pruneTo` multi-char pieces ([[lossPrune]]).
    */
  def trainSoft(spark: SparkSession, df: DataFrame, textCol: String,
                seedSize: Int, maxPieceLen: Int = 4, rounds: Int = 2,
                maxWordLen: Int = 12, pruneTo: Int = Int.MaxValue): Model = {
    import spark.implicits._
    require(rounds >= 1 && seedSize >= 1 && maxPieceLen >= 2 && pruneTo >= 1)
    val dict = dictionary(df, textCol, maxWordLen)
      .as[(String, Long)].localCheckpoint()
    val cand = dict.flatMap { case (w, c) =>
        for {
          l <- 1 to math.min(maxPieceLen, w.length)
          i <- 0 to w.length - l
        } yield (w.substring(i, i + l), c)
      }
      .toDF("piece", "c").groupBy("piece").agg(sum("c").as("cnt"))
      .localCheckpoint()
    val seed = cand.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
      .as[(String, Long)].collect().toSeq
    val chars = cand.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toSeq
    var model = Model(seed ++ chars, maxPieceLen)
    for (_ <- 1 to rounds) {
      val prob = model.probs
      val mpl = maxPieceLen
      val used = dict
        .flatMap { case (w, c) => expectedMicro(w, c, prob, mpl) }
        .toDF("piece", "m").groupBy("piece").agg(sum("m").as("cnt"))
        .as[(String, Long)].collect().toMap
      val next = model.counts.flatMap { case (p, _) =>
        val u = used.getOrElse(p, 0L)
        if (p.length >= 2) { if (u > 0) Some(p -> u) else None }
        else Some(p -> math.max(u, 1L))
      }
      model = Model(next, maxPieceLen)
    }
    lossPrune(model, pruneTo)
  }

  // ------------------------------------------------------------------ SQL

  /** One soft-EM round as CTEs: probs `s{r}p`, alphas `s{r}a0..aW`
    * (left-joined coalesce chains, term order = piece length ascending),
    * betas `s{r}b{W}..b0` (start-indexed so every CTE is position-static),
    * `s{r}z` (alpha at each word's length), the site-quantized
    * expected-count flatten `s{r}e`, the sum `u{r}`, and the M-step
    * `v{r}`.
    */
  /** Piece probabilities of `$vocab` as CTEs `${p}t, ${p}p`. */
  private def probCtesSql(p: String, vocab: String): String =
    s"""${p}t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM $vocab),
       |${p}p AS MATERIALIZED (SELECT piece, CAST(cnt AS DOUBLE) / total AS p
       |  FROM $vocab CROSS JOIN ${p}t)""".stripMargin

  /** The unrolled forward pass under probs `${p}p`: CTEs `${p}a0..aW`,
    * each a left-joined coalesce chain with term order = piece length
    * ascending (the literal addition order of the Scala loop).
    */
  private def alphaCtesSql(p: String, maxPieceLen: Int,
                           maxWordLen: Int): String = {
    val a0 = s"${p}a0 AS MATERIALIZED (SELECT word, wc, CAST(1.0 AS DOUBLE) AS alpha FROM dict)"
    val alphas = (1 to maxWordLen).map { j =>
      val ls = 1 to math.min(maxPieceLen, j)
      val joins = ls.map { l =>
        s"""  LEFT JOIN ${p}a${j - l} a$l ON a$l.word = d.word
           |  LEFT JOIN ${p}p c$l ON c$l.piece = substring(d.word, ${j - l + 1}, $l)""".stripMargin
      }.mkString("\n")
      val terms = ls.map(l => s"coalesce(a$l.alpha * c$l.p, 0)").mkString(" + ")
      s"""${p}a$j AS MATERIALIZED (
         |  SELECT d.word, d.wc, $terms AS alpha
         |  FROM dict d
         |$joins
         |  WHERE length(d.word) >= $j)""".stripMargin
    }.mkString(",\n")
    s"$a0,\n$alphas"
  }

  private def softRoundCtesSql(r: Int, vocab: String, maxPieceLen: Int,
                               maxWordLen: Int): String = {
    val W = maxWordLen
    val prb = probCtesSql(s"s$r", vocab)
    val alphaChain = alphaCtesSql(s"s$r", maxPieceLen, W)
    // betas descend from W so each CTE only references already-defined ones
    val betas = (W to 0 by -1).map { j =>
      val ls = (1 to maxPieceLen).filter(j + _ <= W)
      if (ls.isEmpty)
        s"""s${r}b$j AS MATERIALIZED (
           |  SELECT word, CAST(1.0 AS DOUBLE) AS beta FROM dict
           |  WHERE length(word) >= $j)""".stripMargin
      else {
        val joins = ls.map { l =>
          s"""  LEFT JOIN s${r}b${j + l} b$l ON b$l.word = d.word AND length(d.word) > $j
             |  LEFT JOIN s${r}p c$l ON c$l.piece = substring(d.word, ${j + 1}, $l)
             |    AND length(d.word) >= ${j + l}""".stripMargin
        }.mkString("\n")
        val terms = ls.map(l => s"coalesce(c$l.p * b$l.beta, 0)").mkString(" + ")
        s"""s${r}b$j AS MATERIALIZED (
           |  SELECT d.word,
           |    CASE WHEN length(d.word) = $j THEN CAST(1.0 AS DOUBLE)
           |         ELSE $terms END AS beta
           |  FROM dict d
           |$joins
           |  WHERE length(d.word) >= $j)""".stripMargin
      }
    }.mkString(",\n")
    val z = (1 to W).map { j =>
      s"  SELECT word, alpha AS z FROM s${r}a$j WHERE length(word) = $j"
    }.mkString("\n  UNION ALL\n")
    val zCte = s"s${r}z AS MATERIALIZED (\n$z)"
    val exBranches = (for {
      i <- 0 until W
      l <- 1 to math.min(maxPieceLen, W - i)
    } yield
      s"""  SELECT a.word, c.piece,
         |    CAST(round(a.wc * a.alpha * c.p * b.beta / z.z * 1000000) AS BIGINT) AS m
         |  FROM s${r}a$i a
         |  JOIN s${r}p c ON c.piece = substring(a.word, ${i + 1}, $l)
         |  JOIN s${r}b${i + l} b ON b.word = a.word
         |  JOIN s${r}z z ON z.word = a.word
         |  WHERE length(a.word) >= ${i + l}""".stripMargin
      ).mkString("\n  UNION ALL\n")
    val ex = s"s${r}e AS MATERIALIZED (\n$exBranches)"
    s"""$prb,
       |$alphaChain,
       |$betas,
       |$zCte,
       |$ex,
       |u$r AS MATERIALIZED (SELECT piece, CAST(sum(m) AS BIGINT) AS cnt
       |  FROM s${r}e GROUP BY piece),
       |v$r AS MATERIALIZED (
       |  SELECT piece, cnt FROM u$r WHERE length(piece) >= 2 AND cnt > 0
       |  UNION ALL
       |  SELECT ch.piece, greatest(coalesce(u.cnt, 0), 1) AS cnt
       |  FROM chars ch LEFT JOIN u$r u USING (piece))""".stripMargin
  }

  /** The loss-pruning CTEs over final vocab `$vocab`, ending in
    * `pk(piece, cnt)`: per multi-char piece, the best segmentation of
    * its own string WITHOUT itself (position-unrolled Viterbi over at
    * most maxPieceLen positions, self-match excluded in the join), loss
    * = cnt · (alt − own), keep the `pruneTo` highest.
    */
  private def pruneCtesSql(vocab: String, maxPieceLen: Int,
                           pruneTo: Int): String = {
    val cost =
      s"""pt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM $vocab),
         |pc AS MATERIALIZED (SELECT piece, cnt,
         |    -ln(CAST(cnt AS DOUBLE) / total) AS cost
         |  FROM $vocab CROSS JOIN pt),
         |pw AS MATERIALIZED (SELECT piece AS word, cnt, cost FROM pc
         |  WHERE length(piece) >= 2)""".stripMargin
    val b0 = "pb0 AS (SELECT word, CAST(0.0 AS DOUBLE) AS cost FROM pw)"
    val bs = (1 to maxPieceLen).map { j =>
      val branches = (1 to math.min(maxPieceLen, j)).map { l =>
        s"""    SELECT b.word, b.cost + c.cost AS cost, $l AS l
           |    FROM pb${j - l} b JOIN pc c
           |      ON c.piece = substring(b.word, ${j - l + 1}, $l)
           |     AND c.piece <> b.word
           |    WHERE length(b.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""pb$j AS MATERIALIZED (
         |  SELECT word, cost FROM (
         |    SELECT word, cost,
         |      row_number() OVER (PARTITION BY word ORDER BY cost ASC, l DESC) AS rn
         |    FROM (
         |$branches))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val alt = (2 to maxPieceLen).map { j =>
      s"  SELECT word, cost FROM pb$j WHERE length(word) = $j"
    }.mkString("\n  UNION ALL\n")
    s"""$cost,
       |$b0,
       |$bs,
       |palt AS MATERIALIZED (
       |$alt),
       |ploss AS MATERIALIZED (
       |  SELECT w.word AS piece, w.cnt,
       |    CAST(w.cnt AS DOUBLE) * (a.cost - w.cost) AS loss
       |  FROM pw w JOIN palt a ON a.word = w.word),
       |pk AS MATERIALIZED (
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt,
       |      row_number() OVER (ORDER BY loss DESC, piece ASC) AS rn
       |    FROM ploss) WHERE rn <= $pruneTo
       |  UNION ALL
       |  SELECT piece, cnt FROM $vocab WHERE length(piece) = 1)""".stripMargin
  }

  /** Full DuckDB statement: the twin of [[trainSoft]] + [[vocabTable]]. */
  def trainSoftSql(table: String, textCol: String, seedSize: Int,
                   maxPieceLen: Int = 4, rounds: Int = 2,
                   maxWordLen: Int = 12, pruneTo: Int): String = {
    val base = seedCtesSql(table, textCol, seedSize, maxPieceLen, maxWordLen)
    val roundCtes = (1 to rounds)
      .map(r => softRoundCtesSql(r, s"v${r - 1}", maxPieceLen, maxWordLen))
      .mkString(",\n")
    s"""WITH $base,
       |$roundCtes,
       |${pruneCtesSql(s"v$rounds", maxPieceLen, pruneTo)},
       |ft AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM pk)
       |SELECT piece, cnt, round(CAST(cnt AS DOUBLE) / total, 6) AS prob
       |FROM pk CROSS JOIN ft ORDER BY piece""".stripMargin
  }

  /** The backward-sampling CTEs under vocab probs `${p}p` and alphas
    * `${p}a0..aW` ([[alphaCtesSql]]): a tall (word, j, alpha) table,
    * then maxWordLen sampling steps — each step's candidate cumsum is a
    * running window sum in piece-length order (alpha(j)'s own addition
    * sequence), the threshold is the md5 unit draw at (word, pos) times
    * alpha(pos), first candidate past the threshold wins, the LAST
    * candidate on the rounding tail — ending in `${p}seg(word, wc, path)`.
    */
  private def sampleCtesSql(p: String, maxPieceLen: Int, maxWordLen: Int,
                            salt: String): String = {
    val W = maxWordLen
    val tall = (s"SELECT word, 0 AS j, CAST(1.0 AS DOUBLE) AS alpha FROM dict" +:
      (1 to W).map(j => s"SELECT word, $j AS j, alpha FROM ${p}a$j"))
      .mkString("\n  UNION ALL\n  ")
    val st0 = s"${p}st0 AS (SELECT word, wc, length(word) AS pos, '' AS path FROM dict)"
    val steps = (1 to W).map { k =>
      s"""${p}st$k AS MATERIALIZED (
         |  SELECT word, wc, pos, path FROM ${p}st${k - 1} WHERE pos = 0
         |  UNION ALL
         |  SELECT word, wc, CAST(pos - l AS INT) AS pos,
         |    CASE WHEN path = '' THEN piece ELSE piece || ' ' || path END AS path
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word ORDER BY
         |        CASE WHEN cum > thr THEN 0 ELSE 1 END,
         |        CASE WHEN cum > thr THEN l ELSE -l END) AS rn
         |    FROM (
         |      SELECT *, sum(w) OVER (PARTITION BY word ORDER BY l
         |          ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM (
         |        SELECT s.word, s.wc, s.pos, s.path, c.piece, s.l,
         |          a.alpha * c.p AS w,
         |          (CAST(('0x' || substr(md5(s.word || '|' ||
         |              CAST(s.pos AS VARCHAR) || ':$salt'), 1, 8)) AS BIGINT)
         |            / 4294967296.0) * z.alpha AS thr
         |        FROM (
         |          SELECT word, wc, pos, path, CAST(l AS INT) AS l
         |          FROM ${p}st${k - 1}
         |          CROSS JOIN unnest(range(1, $maxPieceLen + 1)) AS ll(l)
         |          WHERE pos > 0 AND l <= pos) s
         |        JOIN ${p}p c
         |          ON c.piece = substring(s.word, s.pos - s.l + 1, s.l)
         |        JOIN ${p}aT a ON a.word = s.word AND a.j = s.pos - s.l
         |        JOIN ${p}aT z ON z.word = s.word AND z.j = s.pos)))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""${p}aT AS MATERIALIZED (
       |  $tall),
       |$st0,
       |$steps,
       |${p}seg AS MATERIALIZED (
       |  SELECT word, wc, path FROM ${p}st$W WHERE pos = 0)""".stripMargin
  }

  /** Full DuckDB statement: the twin of [[train]] + [[sampleStats]] —
    * the hard-EM chain, then one forward pass + backward sampling under
    * the final vocab.
    */
  def sampleSql(table: String, textCol: String, seedSize: Int,
                maxPieceLen: Int = 4, rounds: Int = 2,
                maxWordLen: Int = 12, salt: String = "useg"): String =
    s"""WITH ${trainCtesSql(table, textCol, seedSize, maxPieceLen, rounds, maxWordLen)},
       |${probCtesSql("smp", s"v$rounds")},
       |${alphaCtesSql("smp", maxPieceLen, maxWordLen)},
       |${sampleCtesSql("smp", maxPieceLen, maxWordLen, salt)}
       |SELECT word, wc, CAST(len(string_split(path, ' ')) AS BIGINT) AS n_pieces,
       |       path AS seg
       |FROM smpseg ORDER BY word""".stripMargin
}
