package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity joins — the data-cleaning / entity-resolution
  * operators (near-identical names, titles, SKUs), found WITHOUT an
  * all-pairs comparison via the Ed-Join prefix filter (Xiao et al.,
  * VLDB'08 — public paper):
  *
  *  1. COLLAPSE identical strings (the [[graft.dedup.Dedup.jaccardPairs]]
  *     move): distance is a function of the string, duplicate rows cost
  *     nothing.
  *  2. PREFIX FILTER: d edits destroy at most q·d DISTINCT q-grams (an
  *     edit touches ≤ q gram positions; erasing a gram from the distinct
  *     set destroys every occurrence), so two strings within distance d
  *     must share a gram among each one's q·d+1 RAREST grams (one shared
  *     global rarest-first order). Candidates come from an equi-join on
  *     those prefix grams only — never the full gram table, never all
  *     pairs.
  *  3. Strings too short to own q·d+1 grams get no such guarantee: they
  *     fall back to a LENGTH-WINDOW equi-join (|len(a)−len(b)| ≤ d is
  *     necessary for distance ≤ d), exploding each short string's ±d
  *     target lengths — bounded by (2d+1)·|shorts|.
  *  4. VERIFY exactly with the built-in levenshtein (codegen'd; identical
  *     unit-cost semantics in DuckDB — the oracles brute-force all pairs).
  */
object FuzzyJoin {

  /** (s, len, pg, ngrams) per distinct string: its q·d+1 rarest grams in
    * the order given by `freq` (freq then gram tie-break — any fixed
    * total order is lossless, rarest-first minimizes candidates).
    */
  private def prefixTable(uniq: DataFrame, freq: DataFrame,
                          d: Int, q: Int): DataFrame = {
    val prefLen = q * d + 1
    uniq
      .withColumn("grams", array_distinct(expr(
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 0)), i -> substring(s, i, $q))")))
      .select(col("s"), col("len"), explode(col("grams")).as("g"))
      .join(freq, "g")
      .groupBy("s", "len")
      .agg(slice(transform(array_sort(collect_list(struct(col("f"), col("g")))),
        x => x("g")), 1, prefLen).as("pg"), count(lit(1)).as("ngrams"))
  }

  private def distinctStrings(df: DataFrame, strCol: String): DataFrame =
    df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("len", length(col("s")))

  private def gramFreq(uniq: DataFrame, q: Int): DataFrame =
    uniq.withColumn("grams", array_distinct(expr(
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 0)), i -> substring(s, i, $q))")))
      .select(explode(col("grams")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("f"))

  /** Self-join: all pairs of distinct strings within distance `d`,
    * a < b lexicographically. Output (a, b, dist); join back on the
    * string to recover row ids when needed.
    */
  def editDistancePairs(df: DataFrame, strCol: String, d: Int,
                        q: Int = 2): DataFrame = {
    require(d >= 1, s"edit distance threshold must be >= 1: $d")
    require(q >= 1, s"gram size must be >= 1: $q")
    val prefLen = q * d + 1
    val uniq = distinctStrings(df, strCol)
    val pref = prefixTable(uniq, gramFreq(uniq, q), d, q)
    val long = pref.filter(col("ngrams") >= prefLen)
      .select(col("s"), col("len"), explode(col("pg")).as("g"))
    val candLong = long.as("x").join(long.as("y"),
        col("x.g") === col("y.g") && col("x.s") < col("y.s") &&
          abs(col("x.len") - col("y.len")) <= d)
      .select(col("x.s").as("a"), col("y.s").as("b"))
    // short strings: no prefix guarantee — length-window candidates
    // (both orientations: a short string pairs with ANY string of nearby
    // length, whichever side of the lexicographic order it falls on)
    val shortTargets = pref.filter(col("ngrams") < prefLen)
      .select(col("s").as("ss"),
        explode(sequence(col("len") - d, col("len") + d)).as("tl"))
    val candShort = shortTargets
      .join(uniq, col("tl") === col("len") && col("ss") < col("s"))
      .select(col("ss").as("a"), col("s").as("b"))
      .unionByName(shortTargets
        .join(uniq, col("tl") === col("len") && col("ss") > col("s"))
        .select(col("s").as("a"), col("ss").as("b")))
    candLong.unionByName(candShort).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= d)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Two-table lookup: every (left, right) distinct-string pair within
    * distance `d` — the dirty-values → canonical-dimension matching case.
    * Output (l, r, dist); a left string may match several rights (rank
    * on dist downstream to pick a winner). The gram order is computed
    * over BOTH sides so the two prefixes are comparable.
    */
  def editDistanceLookup(left: DataFrame, leftCol: String,
                         right: DataFrame, rightCol: String,
                         d: Int, q: Int = 2): DataFrame = {
    require(d >= 1, s"edit distance threshold must be >= 1: $d")
    require(q >= 1, s"gram size must be >= 1: $q")
    val prefLen = q * d + 1
    val lu = distinctStrings(left, leftCol)
    val ru = distinctStrings(right, rightCol)
    val freq = gramFreq(lu.unionByName(ru).distinct(), q)
    val lp = prefixTable(lu, freq, d, q)
    val rp = prefixTable(ru, freq, d, q)
    def longSide(p: DataFrame) = p.filter(col("ngrams") >= prefLen)
      .select(col("s"), col("len"), explode(col("pg")).as("g"))
    val candLong = longSide(lp).as("x").join(longSide(rp).as("y"),
        col("x.g") === col("y.g") &&
          abs(col("x.len") - col("y.len")) <= d)
      .select(col("x.s").as("l"), col("y.s").as("r"))
    // short on EITHER side ⇒ length-window candidates against the other
    def shortCands(shortSide: DataFrame, other: DataFrame,
                   shortIsLeft: Boolean) = {
      val st = shortSide.filter(col("ngrams") < prefLen)
        .select(col("s").as("ss"),
          explode(sequence(col("len") - d, col("len") + d)).as("tl"))
        .join(other, col("tl") === col("len"))
      if (shortIsLeft) st.select(col("ss").as("l"), col("s").as("r"))
      else st.select(col("s").as("l"), col("ss").as("r"))
    }
    candLong
      .unionByName(shortCands(lp, ru, shortIsLeft = true))
      .unionByName(shortCands(rp, lu, shortIsLeft = false))
      .distinct()
      .withColumn("dist", levenshtein(col("l"), col("r")))
      .filter(col("dist") <= d)
      .select(col("l"), col("r"), col("dist"))
  }
}
