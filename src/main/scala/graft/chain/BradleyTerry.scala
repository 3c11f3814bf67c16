package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley-Terry strength ratings from pairwise comparisons — the
  * reward-model-lite every preference pipeline wants first: given
  * "i beat j" observations, fit per-item strengths s with
  * P(i beats j) = s_i / (s_i + s_j), by the MM algorithm (Hunter 2004,
  * "MM algorithms for generalized Bradley-Terry models"):
  *
  *   s_i ← w_i / Σ_j n_ij / (s_i + s_j),   then rescale to mean 1
  *
  * where w_i = wins of i and n_ij = comparisons between i and j. Each
  * round is two equi-joins of the pair-count table against the current
  * ratings plus one grouped sum — the chained-job shape ([[KMeans]] /
  * [[LogisticRegression]]), but with NO driver round-trip: ratings stay
  * a DataFrame (items = things being rated — sources, models, langs —
  * are bounded; comparisons are what scale).
  *
  * Cross-engine determinism (the chain recipe): each item's denominator
  * and the rescale total are summed in decimal(38,18)
  * (order-independent), and ratings are ROUNDED to 6 decimals after the
  * rescale — from there both engines update with identical double
  * arithmetic, so a SQL oracle replays training exactly.
  *
  * Input `pairs`: (win, lose) — one row per comparison, both columns
  * item ids. Items appearing only as losers get rating 0 by the w_i = 0
  * numerator (the MM fixed point for never-winners). Output:
  * (item, w, rating).
  */
object BradleyTerry {

  def fit(pairs: DataFrame, iterations: Int,
          checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1, s"bradleyTerry iterations: $iterations")
    require(checkpointEvery >= 1, s"bradleyTerry checkpointEvery: $checkpointEvery")
    val items = pairs.select(col("win").as("item"))
      .unionByName(pairs.select(col("lose").as("item")))
      .distinct()
      .localCheckpoint() // referenced every round + the final join
    val wins = items.join(
        pairs.groupBy(col("win").as("item")).agg(count(lit(1)).as("w")),
        Seq("item"), "left")
      .select(col("item"), coalesce(col("w"), lit(0L)).as("w"))
      .localCheckpoint()
    val counts = pairs.select(
        least(col("win"), col("lose")).as("a"),
        greatest(col("win"), col("lose")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("nij"))
      .localCheckpoint() // the pair scan must not rerun per round
    var s = items.withColumn("s", lit(1.0))
    for (i <- 1 to iterations) {
      val sa = s.select(col("item").as("a"), col("s").as("s_a"))
      val sb = s.select(col("item").as("b"), col("s").as("s_b"))
      val joined = counts.join(sa, "a").join(sb, "b")
        .withColumn("c", col("nij").cast("double") / (col("s_a") + col("s_b")))
      val contribs = joined.select(col("a").as("item"), col("c"))
        .unionByName(joined.select(col("b").as("item"), col("c")))
      val den = contribs.groupBy("item")
        .agg(sum(col("c").cast("decimal(38,18)")).cast("double").as("den"))
      val raw = wins.join(den, Seq("item"), "left")
        .select(col("item"),
          when(col("den").isNotNull && col("w") > 0,
            col("w").cast("double") / col("den")).otherwise(lit(0.0)).as("s"))
      val tot = raw.agg(
        sum(col("s").cast("decimal(38,18)")).cast("double").as("t"),
        count(lit(1)).cast("double").as("k"))
      s = raw.crossJoin(broadcast(tot))
        .select(col("item"),
          round(col("s") * col("k") / col("t"), 6).as("s"))
      // Each round references the previous `s` THREE times (sa, sb, and
      // the tot→raw rescale), so an untruncated lineage regrows ~4^i —
      // fine at 3 rounds, impractical at 20. PageRank-style per-round
      // truncation keeps the cost flat in the round count. Lineage.truncate
      // (not bare localCheckpoint) because the checkpoint carries the
      // origin plan's size ESTIMATE forward, and the same multi-reference
      // structure doubles that BigInt's digit count per round — measured
      // 119 s of driver-side BigInteger math at round 18 without the cap.
      if (i % checkpointEvery == 0 && i < iterations)
        s = graft.core.Lineage.truncate(s)
    }
    wins.join(s, "item").select(col("item"), col("w"), col("s").as("rating"))
  }
}
