package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909) — the vocabulary-learning step of a pretraining data
  * pipeline, distributed the way the original algorithm wants to be:
  *
  *  1. ONE corpus pass collapses the text to a (word, count) DICTIONARY
  *     (map-side-combined groupBy — at 100 TB the dictionary is millions
  *     of rows where the corpus is trillions of tokens; every later pass
  *     touches only the dictionary).
  *  2. Each merge round counts adjacent symbol pairs WEIGHTED by word
  *     count (explode + groupBy, shuffle volume = distinct pairs), takes
  *     the argmax with a deterministic tie-break (count desc, then pair
  *     lexicographic asc — bit-stable across partitionings), and rewrites
  *     the dictionary's symbol arrays per partition. One tiny (1-row)
  *     driver collect per round, exactly the [[graft.chain.KMeans]]
  *     driver-sequenced-iterations shape.
  *
  * Scale contract: rounds cost O(dictionary), not O(corpus); for a
  * trillion-token corpus train on a [[Sampling.hashSample]] of documents
  * and [[tokenize]] everywhere — the standard practice the API shape
  * makes explicit. The dictionary is localCheckpoint'd once (stable
  * lineage across ~1000 rounds would otherwise re-derive the corpus scan
  * every round and blow the plan depth).
  */
object Bpe {

  /** (symbols-per-word dictionary) — words split to single-char symbols
    * with the classic end-of-word marker `</w>` so merges can't cross
    * word boundaries when the vocab is applied as a tokenizer.
    */
  private def dictionary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextAnalysis.tokensArr(col(textCol)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def toSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ "</w>"

  /** Learn `nMerges` merge rules. Returns them in application order. */
  def train(spark: SparkSession, df: DataFrame, textCol: String,
            nMerges: Int): Seq[(String, String)] = {
    import spark.implicits._
    var dict: Dataset[(Seq[String], Long)] = dictionary(df, textCol)
      .as[(String, Long)].map { case (w, c) => (toSymbols(w), c) }
      .localCheckpoint()
    val rules = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val top = dict.flatMap { case (syms, c) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
        }
        .toDF("a", "b", "w")
        .groupBy("a", "b").agg(sum("w").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .head(1)
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        rules += ((a, b))
        dict = dict.map { case (syms, c) => (mergePair(syms, a, b), c) }
          .localCheckpoint()
        round += 1
      }
    }
    rules.result()
  }

  /** One in-place pair merge over a symbol array (left-to-right,
    * non-overlapping — the BPE application rule).
    */
  private[graft] def mergePair(syms: Seq[String], a: String,
                             b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Apply learned rules as a tokenizer: (id, token) rows, tokens in
    * document order. Rules broadcast; the apply is partition-local over
    * the corpus — zero shuffle.
    */
  def tokenize(spark: SparkSession, df: DataFrame, idCol: String,
               textCol: String, rules: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rules)
    df.select(col(idCol).cast("long").as("id"),
        graft.functions.TextAnalysis.tokensArr(col(textCol)).as("words"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, words) =>
        val rs = bc.value
        words.flatMap { w =>
          rs.foldLeft(toSymbols(w)) { case (s, (a, b)) => mergePair(s, a, b) }
        }.map(t => (id, t))
      }
      .toDF("id", "tok")
  }

  /** A frozen 10-rule merge table for the apply-side queries — the
    * production flow trains once offline ([[train]], Sennrich-parity
    * spec'd) and applies the frozen table corpus-wide; this fixed table
    * keeps the oracle SF-independent. Two composite rules ((sc,an) and
    * (er,</w>)) only fire through earlier merges, pinning rule-order
    * semantics. BpeSpec asserts every rule fires at most once per
    * fixture-vocabulary word, which is what makes the oracle's
    * single-replace replay exact.
    */
  val fixtureRules: Seq[(String, String)] = Seq(
    ("e", "</w>"), ("a", "n"), ("r", "t"), ("t", "h"), ("q", "u"),
    ("s", "c"), ("sc", "an"), ("o", "w"), ("e", "r"), ("er", "</w>"))

  /** Segment one word with a frozen merge table: rules in application
    * order, each applied left-to-right non-overlapping — Sennrich's apply
    * rule, the same code path [[train]] uses, so train-then-apply is
    * consistent by construction.
    */
  def segment(word: String, rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(toSymbols(word)) { case (s, (a, b)) => mergePair(s, a, b) }

  /** Corpus-wide tokenizer APPLICATION at dictionary grain — the pass an
    * actual training pipeline runs daily once a merge table is frozen.
    * The scale trick mirrors training: segment each DISTINCT word once
    * (rules broadcast, mapPartitions over the dictionary — millions of
    * rows where the corpus is trillions of tokens), then broadcast-join
    * the segmented dictionary back onto the corpus word stream. The
    * corpus side never shuffles on anything but the final per-doc
    * aggregation; per-word re-segmentation work is ZERO at corpus grain.
    *
    * Output: (doc_id, n_words, n_tokens, n_distinct_toks) per document —
    * the per-doc token accounting (sequence-length budgeting, packing
    * inputs) downstream sharding consumes.
    */
  def applyPerDocStats(spark: SparkSession, df: DataFrame, idCol: String,
                       textCol: String,
                       rules: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val words = df.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("word"))
    val bc = spark.sparkContext.broadcast(rules)
    val dict = words.select("word").distinct().as[String]
      .mapPartitions { it =>
        val rs = bc.value
        it.map(w => (w, segment(w, rs)))
      }
      .toDF("word", "toks")
    words.join(broadcast(dict), "word")
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .groupBy("doc_id").agg(
        sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n_words"),
        count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("n_distinct_toks"))
  }

  /** The corpus token-id table from the same frozen merge table, computed
    * WITHOUT ever exploding the corpus to tokens: token counts are
    * Σ wordCount(w) × occurrences(tok, segment(w)) — one dictionary
    * aggregation (map-side-combined word counts), one dictionary-local
    * segmentation, one token-grain aggregation. Ids are dense ranks by
    * (count desc, token asc) over the vocab-sized result — deterministic
    * across partitionings.
    *
    * Output: (tok, tok_id, cnt).
    */
  def applyVocab(spark: SparkSession, df: DataFrame, textCol: String,
                 rules: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rules)
    val toks = dictionary(df, textCol).as[(String, Long)]
      .flatMap { case (w, c) =>
        val rs = bc.value
        segment(w, rs).map(t => (t, c))
      }
      .toDF("tok", "c")
      .groupBy("tok").agg(sum("c").as("cnt"))
    toks.withColumn("tok_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("tok").asc)).cast("long"))
      .select(col("tok"), col("tok_id"), col("cnt"))
  }

  /** The distributed core of one training round, exposed for the oracle:
    * corpus → word dictionary → count-weighted adjacent symbol pairs.
    * (The argmax loop above is driver-sequenced and spec-verified against
    * the reference model; this pair table is the part each round
    * shuffles, and it IS SQL-expressible.)
    */
  def pairCounts(spark: SparkSession, df: DataFrame,
                 textCol: String): DataFrame = {
    import spark.implicits._
    dictionary(df, textCol).as[(String, Long)]
      .flatMap { case (w, c) =>
        val syms = toSymbols(w)
        syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
      }
      .toDF("a", "b", "w")
      .groupBy("a", "b").agg(sum("w").as("cnt"))
  }

  /** WordPiece-style GREEDY LONGEST-MATCH segmentation stats (Wu et al.
    * 2016 / the BERT tokenizer's inference rule — public): at each
    * position take the longest vocabulary piece that matches, else emit
    * the single character as its own (UNK-like) piece and advance one.
    * The complement of [[applyPerDocStats]]' merge-table BPE: vocab-
    * driven instead of rule-driven, and tie-free by construction (the
    * longest match is unique), which is what makes the oracle replay
    * exact — DuckDB walks the same greedy recursion per word.
    *
    * Scale contract: the greedy walk runs ONCE per DISTINCT word (the
    * dictionary, millions of rows where the corpus is trillions of
    * tokens) with the vocabulary broadcast; the corpus itself is only
    * touched by the word-count aggregation. Output: (word, wc,
    * n_pieces) per distinct word.
    */
  def wordpieceStats(spark: SparkSession, df: DataFrame, textCol: String,
                     vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    require(vocab.nonEmpty && vocab.forall(_.length >= 2),
      "wordpieceStats: vocab lists the MULTI-char pieces (single chars are implicit)")
    val bc = spark.sparkContext.broadcast(
      (vocab.toSet, vocab.map(_.length).max))
    dictionary(df, textCol).as[(String, Long)]
      .map { case (w, c) =>
        val (vs, ml) = bc.value
        var pos = 0
        var np = 0L
        while (pos < w.length) {
          var l = math.min(ml, w.length - pos)
          while (l > 1 && !vs.contains(w.substring(pos, pos + l))) l -= 1
          pos += l
          np += 1
        }
        (w, c, np)
      }
      .toDF("word", "wc", "n_pieces")
  }

  /** A frozen multi-char piece list for the apply-side query —
    * SF-independent like [[fixtureRules]]; overlapping pieces ("sc" vs
    * "scan", "wind" vs "window") pin the longest-match priority.
    */
  val fixtureVocab: Seq[String] = Seq(
    "th", "the", "an", "and", "in", "ing", "er", "on", "re",
    "sc", "scan", "wind", "window", "str", "stream", "umn")
}
