package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monte-Carlo π — the reference's estimate-pi example
  * (examples/util/estimate_pi.py:1-18) with the `random()` draw replaced by
  * a deterministic hash-uniform, so the estimate is reproducible in any
  * engine at any parallelism (the DuckDB oracle replays it bit-for-bit).
  *
  * Scale shape: `spark.range(n)` is a parallel, partition-local generator —
  * no input scan, no shuffle; the aggregation is a map-side partial count.
  * 10^10 samples on a cluster costs one pass of codegen'd arithmetic.
  */
object EstimatePi {

  /** Hash-uniform in [0,1): first 8 md5 hex digits of "<id>:<axis>" / 2^32. */
  private def u(id: Column, axis: String): Column =
    conv(substring(md5(to_binary(concat(id.cast("string"), lit(":" + axis)),
      lit("utf-8"))), 1, 8), 16, 10).cast("double") / lit(4294967296.0)

  /** One-row result: (n, inside, pi_est). */
  def estimate(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n)
      .select(u(col("id"), "x").as("x"), u(col("id"), "y").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("x") * col("x") + col("y") * col("y") <= lit(1.0), 1L)
          .otherwise(0L)).as("inside"))
      .select(col("n"), col("inside"),
        round(lit(4.0) * col("inside") / col("n"), 6).as("pi_est"))
}
