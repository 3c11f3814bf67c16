package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the reference's k-clustering
  * example (examples/datamining/kclustering.py:49-120): estimate step maps
  * each point to its nearest center (`estimate_map`), combines per-cluster
  * sums map-side (`estimate_combiner`), reduces to new centers
  * (`estimate_reduce`); iterations are chained jobs; predict assigns final
  * centers (`predict_map`).
  *
  * Spark shape: centers are tiny → carried as a broadcast literal array (the
  * `Params` analog, lib/disco/worker/__init__.py:435-451); assignment is a
  * pure Column expression (codegen), the center update is one groupBy over
  * element-wise vector sums (`partial aggregation = the combiner`). One
  * shuffle of k×dim doubles per iteration — scale-independent.
  *
  * Deterministic: init = the first k vectors by id; argmin tie-breaks on the
  * lowest cluster id.
  */
object KMeans {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  // native codegen fold (same fixed left-to-right IEEE order as the
  // previous aggregate(zip_with(...)) form — values unchanged); centers
  // ride as array literals
  private def sqDist(v: org.apache.spark.sql.Column, center: Seq[Double]) =
    graft.functions.VectorOps.vec_sqdist(v, lit(center.toArray))

  /** Assign each row to the nearest center (squared euclidean). */
  def assign(points: DataFrame, idCol: String, vecCol: String,
             centers: Seq[Seq[Double]]): DataFrame = {
    val v = asDouble(col(vecCol))
    val dists = centers.zipWithIndex.map { case (c, i) => (i, sqDist(v, c)) }
    val best = dists.tail.foldLeft(
      struct(dists.head._2.as("d"), lit(dists.head._1).as("i"))) {
      case (acc, (i, d)) =>
        when(d < acc("d"), struct(d.as("d"), lit(i).as("i"))).otherwise(acc)
    }
    points.select(col(idCol).as("id"), v.as("v"), best("i").as("cluster"))
  }

  /** Run `iterations` Lloyd steps; returns (centers, assignments). */
  def run(spark: SparkSession, points: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int): (Seq[Seq[Double]], DataFrame) = {
    val pts = points.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")).cache()
    val dim = pts.select(size(col("v"))).head().getInt(0)
    var centers: Seq[Seq[Double]] = pts.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iterations) {
      val assigned = assign(pts, "id", "v", centers)
      // per-dimension sums in DECIMAL(38,18): order-independent exact, so
      // centers are bit-identical at any partitioning / in any engine
      val sums = assigned.groupBy("cluster").agg(
        count(lit(1)).as("n"),
        array((0 until dim).map(d =>
          sum(element_at(col("v"), d + 1).cast("decimal(38,18)")).cast("double")): _*).as("s"))
      val updated = sums.select(col("cluster"),
          transform(col("s"), x => x / col("n")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      centers = centers.indices.map(i => updated.getOrElse(i, centers(i)))
    }
    // materialize the final assignment, then release the iteration cache —
    // a long-lived session issuing many runs must not accrete pinned
    // corpus copies (localCheckpoint is eager, so `pts` is done serving)
    val finalAssign = assign(pts, "id", "v", centers).localCheckpoint()
    pts.unpersist(false)
    (centers, finalAssign)
  }

  /** Total within-cluster sum of squares (inertia) for given centers. */
  def inertia(points: DataFrame, idCol: String, vecCol: String,
              centers: Seq[Seq[Double]]): Double = {
    val assigned = assign(points, idCol, vecCol, centers)
    val v = col("v")
    val dists = centers.zipWithIndex.map { case (c, i) =>
      when(col("cluster") === i, sqDist(v, c))
    }
    assigned.select(coalesce(dists: _*).as("d")).agg(sum("d")).head().getDouble(0)
  }
}
