package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative PageRank — the reference's chained-job example
  * (examples/datamining/page_rank.py:62-120): per iteration every node sends
  * `score * weight` along each out-edge, and every node's new score is
  * `1 - d + d * sum(received)`; nodes with no in-edges settle at `1 - d`.
  *
  * Spark shape: the driver loop chains DataFrame jobs (the `JobChain`
  * analog, lib/disco/job.py:155-190). Each iteration is one join + one
  * aggregation — two shuffles on `node`. Scale notes: `edges` is
  * repartitioned once on `src` and cached so every iteration reuses the
  * co-location; scores are localCheckpoint()ed every few rounds to truncate
  * the growing lineage (at cluster scale: checkpoint to reliable storage).
  */
object PageRank {

  /** edges: (src, dst, weight). Returns (node, score). */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int,
          damping: Double = 0.85, checkpointEvery: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight").cast("double"))
      .repartition(col("src")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    var scores = nodes.withColumn("score", lit(1.0))
    for (i <- 1 to iterations) {
      // contribution sum goes through DECIMAL(38,18): order-independent
      // exact, so the result is bit-identical at any partitioning and
      // reproducible in any engine (the DuckDB oracle sums the same way)
      val contribs = scores.join(e, scores("node") === e("src"))
        .select(col("dst").as("node"),
          (col("score") * col("weight")).cast("decimal(38,18)").as("c"))
        .groupBy("node").agg(sum("c").cast("double").as("received"))
      scores = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("received"), lit(0.0)))
            .as("score"))
      if (i % checkpointEvery == 0)
        scores = graft.core.Lineage.truncate(scores)
    }
    scores
  }

  /** Uniform out-degree weights from an unweighted edge list (src, dst). */
  def uniformWeights(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("weight"))
  }
}
