package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text dataflow operators — the concrete map/reduce examples Disco ships,
  * re-expressed as declarative plans so Catalyst handles partial aggregation
  * (Disco's `combiner`, reference lib/disco/worker/classic/func.py:48-71),
  * shuffle, and codegen.
  */
object TextOps {

  /** Tokenize a text column into lowercase alphanumeric words.
    * Reference: examples/util/wordcount.py:12-22 (`line.split()` map).
    * `split` + `explode` stay inside whole-stage codegen; no UDF.
    */
  def tokens(text: Column): Column =
    explode(split(lower(text), "[^a-z0-9]+"))

  /** Word count: the canonical Disco job (reference README.md:17-30,
    * examples/util/count_words.py). Map-side partial count + final hash agg
    * are automatic (`groupBy.count` = two-phase aggregation), so shuffle
    * volume is O(distinct words), not O(tokens) — the same effect as Disco's
    * `sum_combiner` (func.py:164-173) but planned by Catalyst.
    */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    df.select(tokens(col(textCol)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Distributed grep: regex filter, map-only job (no shuffle at all).
    * Reference: examples/util/grep.py:10-21. The rlike predicate is pushed
    * into the scan's filter stage; column pruning keeps the read narrow.
    */
  def grep(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.filter(col(textCol).rlike(pattern))

  /** Per-key token count (the `sum_reduce` shape, func.py:175-184). */
  def tokenCounts(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.select(col(keyCol), tokens(col(textCol)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_tokens"))
}
