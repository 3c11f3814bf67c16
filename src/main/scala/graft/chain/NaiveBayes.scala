package graft.chain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Naive Bayes with the reference's exact estimation semantics
  * (examples/datamining/naive_bayes.py:46-159): document-level binary
  * events, 2×2 contingency counts per (class, feature) with +1 pseudocounts,
  * `ll(y,i) = log(a) - log(b)` and a per-class prior term
  * `ll(y) = Σ_i log(a+c) - log(b+d)` where, for class y and feature i over N
  * training docs: a = docs with both, b = docs with i but not y,
  * c = docs with y but not i, d = the rest (each +1).
  *
  * Spark shape: counts are three aggregations (docs-per-class,
  * docs-per-feature, docs-per-pair) joined into the (class × feature) grid —
  * the grid is |classes|·|features| rows, tiny next to the corpus, so the
  * predict join broadcasts it. Training scans the corpus once.
  */
object NaiveBayes {

  /** train: (docId, cls, feature-set exploded as rows (docId, cls, feature)).
    * Returns the loglikelihood grid: (cls, feature, ll_pair, ll_class).
    */
  def train(events: DataFrame): DataFrame = {
    // ONE corpus-wide distinct; every count derives from it. CONTRACT: a
    // doc carries exactly one class (the reference's model too), so
    // n_i = Σ_y n_yi and the per-doc/per-feature tables need no separate
    // pass over the exploded corpus (the old shape paid three distinct
    // shuffles of it).
    val pd = events.select("docId", "cls", "feature").distinct().cache()
    val docs = pd.select("docId", "cls").distinct()
    val total = docs.count()
    val classes = docs.groupBy("cls").agg(count(lit(1)).as("n_y"))
    val pairs = pd.groupBy("cls", "feature").agg(count(lit(1)).as("n_yi"))
    val items = pairs.groupBy("feature").agg(sum("n_yi").as("n_i"))
    val grid = classes.crossJoin(items)
      .join(pairs, Seq("cls", "feature"), "left")
      .withColumn("a", coalesce(col("n_yi"), lit(0L)) + 1)
      .withColumn("b", col("n_i") - coalesce(col("n_yi"), lit(0L)) + 1)
      .withColumn("c", col("n_y") - coalesce(col("n_yi"), lit(0L)) + 1)
      .withColumn("d", lit(total) - col("n_i") - col("n_y") +
        coalesce(col("n_yi"), lit(0L)) + 1)
    val llPair = log(col("a")) - log(col("b"))
    val llTerm = log(col("a") + col("c")) - log(col("b") + col("d"))
    // decimal sum: order-independent, so ll_class is partition-stable
    val llClass = grid.groupBy("cls")
      .agg(sum(llTerm.cast("decimal(38,18)")).cast("double").as("ll_class"))
    grid.select(col("cls"), col("feature"), llPair.as("ll_pair"))
      .join(llClass, "cls")
  }

  /** predict: (docId, feature) rows × trained grid → (docId, cls, score).
    * Unseen features contribute 0 (the reference would KeyError; we relax).
    *
    * The model join is deliberately NOT hinted `broadcast`: the grid is
    * |classes|×|features| rows, and at web-scale vocab (1e8 features) that
    * exceeds executor memory. AQE broadcasts it at runtime whenever it is
    * actually small (the common case), and falls back to a shuffle join on
    * `feature` when it isn't — the scale-safe default. The per-class prior
    * ll_class is CONSTANT per cls and already rides every joined model row,
    * so it folds into the same aggregation as max() — no second model
    * evaluation and no prior join (the old shape re-ran the whole training
    * plan to build a 5-row perClass table).
    */
  def predict(events: DataFrame, model: DataFrame): DataFrame =
    events
      // binary-event model, matching train(): a feature either occurs in a
      // doc or not — without this, a doc repeating one word 10x would add
      // its ll_pair 10 times and skew the argmax
      .select("docId", "feature").distinct()
      .join(model, Seq("feature"))
      .groupBy("docId", "cls")
      .agg(sum(col("ll_pair").cast("decimal(38,18)")).cast("double").as("s"),
        max(col("ll_class")).as("ll_class"))
      .select(col("docId"), col("cls"), (col("ll_class") + col("s")).as("score"))
}
