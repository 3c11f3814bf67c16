package graft.chain

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embarrassingly parallel exhaustive search — the reference's travelling-
  * salesman example (examples/tsp/travelling_salesman.py:17-40: the driver
  * chunks the factorial tour space into slices, each mapper scores its
  * slice, the reduce keeps the winner).
  *
  * Spark shape: the search space IS `spark.range(0, (n-1)!)` — each index
  * Lehmer-decodes to one permutation inside `mapPartitions` (genuine
  * per-partition imperative logic, the rare case the brief reserves RDD-ish
  * code for), scores in exact integer arithmetic, and one min-aggregation
  * replaces the reduce. No data is shuffled at all until the final
  * per-partition minima combine — the 100 TB-irrelevant, CPU-bound shape
  * where parallelism = partitions of a counter, not of data.
  */
object ParallelSearch {

  /** Score every directed tour over cities 0..n-1 (city 0 fixed as start,
    * (n-1)! permutations of the rest). `dist` must be pure and integer-
    * valued — exact min, no float regime. Output: one row per tour,
    * column `total`.
    */
  def tspTours(spark: SparkSession, n: Int,
               dist: (Int, Int) => Long): DataFrame = {
    require(n >= 2 && n <= 13,
      s"tspTours: exhaustive search needs 2 <= n <= 13 cities, got $n")
    val m = n - 1
    val fact = (1 to m).foldLeft(1L)(_ * _)
    import spark.implicits._
    spark.range(0, fact).as[Long].mapPartitions { it =>
      it.map { idx0 =>
        // Lehmer decode: idx0 → the idx0-th lexicographic permutation of
        // cities 1..n-1; score the tour 0 → p1 → … → p(n-1) → 0 as we go
        val avail = scala.collection.mutable.ArrayBuffer.range(1, n)
        var idx = idx0
        var f = fact
        var prev = 0
        var total = 0L
        var k = m
        while (k > 0) {
          f /= k
          val c = avail.remove((idx / f).toInt)
          idx %= f
          total += dist(prev, c)
          prev = c
          k -= 1
        }
        total + dist(prev, 0)
      }
    }.toDF("total")
  }
}
