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

  /** Assign each row to the nearest center (squared euclidean); ties break
    * to the lowest cluster id (= first index holding the min distance).
    *
    * Shape matters here: a when-chain argmin fold would embed the
    * accumulated tree TWICE per step (condition + otherwise) — an
    * expression tree exponential in k that breaks codegen past k ≈ 10 and
    * then eval-falls-back into the exponential tree (measured: 54 s for
    * one assignment at n=5k, k=10). The distance ARRAY is linear in k:
    * k codegen'd sqdist loops + one array_min + first-index lookup, same
    * values, same tie-break, any k.
    */
  def assign(points: DataFrame, idCol: String, vecCol: String,
             centers: Seq[Seq[Double]]): DataFrame = {
    val v = asDouble(col(vecCol))
    val dists = array(centers.map(c => sqDist(v, c)): _*)
    points.select(col(idCol).as("id"), v.as("v"),
      (array_position(dists, array_min(dists)) - 1).cast("int").as("cluster"))
  }

  /** Run `iterations` Lloyd steps; returns (centers, assignments). */
  def run(spark: SparkSession, points: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int): (Seq[Seq[Double]], DataFrame) = {
    val pts = points.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")).cache()
    var centers: Seq[Seq[Double]] = pts.orderBy("id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iterations) {
      // localCheckpoint = an optimizer barrier, not just lineage hygiene:
      // without it ColumnPruning collapses the assignment into the explode
      // below and the k-sqdist argmin is recomputed PER EXPLODED ROW —
      // dim× the work (measured 24 s vs 2 s at n=50k, k=100, dim=64)
      val assigned = assign(pts, "id", "v", centers)
        .select("cluster", "v").localCheckpoint()
      // per-dimension sums in DECIMAL(38,18): order-independent exact, so
      // centers are bit-identical at any partitioning / in any engine.
      // Shape matters: ONE decimal sum over exploded (cluster, d, x) rows —
      // a 64-wide array of decimal sums generates an update method too big
      // for HotSpot's JIT (measured 26 s/iteration at n=50k that this
      // shape runs in ~2 s). Same adds, same cast chain → same centers;
      // partial aggregation still combines map-side on (cluster, d).
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cluster", "d")
        .agg(sum(col("x").cast("decimal(38,18)")).cast("double").as("m"),
          count(lit(1)).as("n"))
      val updated = sums
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("d"), (col("m") / col("n")).as("c")))),
          s => s("c")).as("c"))
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
