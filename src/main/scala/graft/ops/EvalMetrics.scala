package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed model-evaluation metrics over prediction tables — the
  * "score a trained model on 10^9 held-out rows" pass.
  */
object EvalMetrics {

  /** Exact ROC AUC via the Mann–Whitney U statistic — computed with the
    * DISTRIBUTED rank machinery ([[WindowOps.rankFunctions]]): no single
    * task ever sorts the score column, yet the result is the exact
    * tie-corrected AUC (midranks for tied scores):
    *
    *   AUC = (Σ_{positives} midrank − P(P+1)/2) / (P·N)
    *
    * All rank math stays in integer longs (2·midrank = rank +
    * rows-through-peers); the final division runs in one fixed double
    * order, rounded to 6 — bit-replayable in any engine.
    *
    * `labelCol` must be 0/1 (anything else raises), `scoreCol` casts to
    * double. One row: (n_pos, n_neg, auc).
    */
  def aucExact(df: DataFrame, labelCol: String, scoreCol: String,
               partitions: Int = 32): DataFrame = {
    val lab0 = col(labelCol).cast("int")
    val lab = when(lab0 === 0 || lab0 === 1, lab0)
      .otherwise(raise_error(concat(
        lit(s"aucExact: label outside {0,1}: "), lab0.cast("string"))))
    val scored = df.select(lab.as("_lab"),
        col(scoreCol).cast("double").as("_score"))
      .withColumn("_ag", lit(1))
    val ranked = WindowOps.rankFunctions(scored, "_ag", Seq("_score"),
      numTiles = 2, partitions = partitions, keepRanks = true)
    ranked.agg(
        sum(when(col("_lab") === 1, col("rank") + col("peers_through"))
          .otherwise(lit(0L))).as("sum2"), // Σ 2·midrank over positives
        sum(col("_lab").cast("long")).as("p"),
        sum(lit(1L) - col("_lab").cast("long")).as("ng"))
      .select(
        col("p").as("n_pos"), col("ng").as("n_neg"),
        round((col("sum2").cast("double") / lit(2.0) -
            col("p").cast("double") * (col("p").cast("double") + lit(1.0)) / lit(2.0)) /
          (col("p").cast("double") * col("ng").cast("double")), 6).as("auc"))
  }
}
