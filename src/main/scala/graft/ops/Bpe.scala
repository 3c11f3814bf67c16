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
}
