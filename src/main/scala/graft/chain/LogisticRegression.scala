package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L2-free full-batch logistic regression by gradient descent — the third
  * trainable model next to [[KMeans]] and [[NaiveBayes]], in the same
  * driver-sequenced chained-job shape the reference uses for iterative
  * training (examples/datamining: chained estimate/predict jobs): weights
  * are tiny → broadcast as literals each round (the Params analog), the
  * gradient is ONE map-side-combinable aggregation per round, and rounds
  * are driver-sequenced exactly like Lloyd iterations.
  *
  * Cross-engine determinism (the property every chain here maintains so a
  * SQL oracle can replay training bit-for-bit): the sigmoid's exp() may
  * differ by an ulp across libm implementations, so per-row error terms
  * are summed in decimal(38,18) (order-independent) and each gradient
  * component is ROUNDED TO 6 DECIMALS before the weight update — the
  * quantization absorbs any sub-1e-7 accumulated divergence, and from
  * then on both engines update weights with identical double arithmetic
  * (w ← w − lr·g in the same sequential order). Same recipe as the
  * surprisal/bigram-LM scores, applied to training.
  *
  * Scale shape per round: one codegen'd projection (dot-product fold +
  * sigmoid), one explode to (dim, err·x) with map-side partial sums —
  * shuffle volume = dims+1 decimals per partition, never rows. The
  * feature vector is augmented with a constant 1.0 so the bias is just
  * weight dims+1.
  */
object LogisticRegression {

  /** (id, xs, y) with xs = first `dims` dims of `vecCol` + the 1.0 bias
    * feature; y cast to double (must be 0/1).
    */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, dims: Int): DataFrame =
    df.select(col(idCol).as("id"),
      concat(slice(col(vecCol).cast("array<double>"), 1, dims),
        array(lit(1.0))).as("xs"),
      col(labelCol).cast("double").as("y"))

  private def score(w: Seq[Double]) = {
    val z = graft.functions.VectorOps.vec_dot_prefix(
      lit(w.toArray), col("xs"))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train `iterations` full-batch GD rounds from zero weights. Returns
    * the final weights (length dims+1, bias last).
    */
  def train(spark: SparkSession, df: DataFrame, idCol: String,
            vecCol: String, labelCol: String, dims: Int,
            iterations: Int, lr: Double): Seq[Double] = {
    require(dims >= 1 && iterations >= 1 && lr > 0.0)
    val pts = df.transform(prepared(_, idCol, vecCol, labelCol, dims))
      .localCheckpoint()
    var w = Seq.fill(dims + 1)(0.0)
    for (_ <- 1 to iterations) {
      // materialize the per-row error BEFORE the explode: without the
      // barrier, column pruning re-inlines the sigmoid fold per exploded
      // (row, dim) pair — (dims+1)× the work (the KMeans lesson)
      val withErr = pts.select((score(w) - col("y")).as("e"), col("xs"))
        .localCheckpoint()
      val grads = withErr
        .select(col("e"), posexplode(col("xs")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(sum((col("e") * col("x")).cast("decimal(38,18)")).as("s"),
          count(lit(1)).as("cnt"))
        .select(col("d"),
          round(col("s").cast("double") / col("cnt").cast("double"), 6)
            .as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.indices.map(d => w(d) - lr * grads(d))
    }
    w
  }

  /** Score rows with trained weights: (id, p, pred) — p rounded 6 (the
    * per-row quantization that makes scores engine-portable), pred at
    * the 0.5 operating point.
    */
  def predict(df: DataFrame, idCol: String, vecCol: String,
              labelCol: String, dims: Int, w: Seq[Double]): DataFrame =
    df.transform(prepared(_, idCol, vecCol, labelCol, dims))
      .select(col("id"), round(score(w), 6).as("p"),
        (score(w) >= 0.5).as("pred"), col("y").cast("int").as("label"))
}
