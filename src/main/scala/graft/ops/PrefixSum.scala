package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum + token-budget shard packing.
  *
  * A global running sum is usually written as one unpartitioned window —
  * which Spark executes as a SINGLE task (the whole dataset through one
  * sorter). This implementation keeps the math identical but distributes:
  *
  *  1. range-partition by the order column (P parallel sorted ranges),
  *  2. per-partition local running sum (parallel windows),
  *  3. collect the P partition TOTALS (P longs — not rows) to the driver,
  *     scan them into per-partition start offsets, broadcast back as a
  *     literal map,
  *  4. global prefix = local prefix + offset(partition).
  *
  * The result is partitioning-independent (it equals the one-task window
  * bit-for-bit — asserted in PrefixSumSpec), so the DuckDB oracle is just
  * `sum() OVER (ORDER BY …)`.
  */
object PrefixSum {

  /** Adds `cum` = running sum of `valCol` in `orderCol` order (inclusive).
    * `orderCol` must be unique (it is the total order).
    */
  def prefixSum(df: DataFrame, orderCol: String, valCol: String,
                partitions: Int = 32): DataFrame = {
    val parted = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("_pid", F.spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // MATERIALIZE pass 1: the totals collect and the final projection must
    // see the SAME range boundaries, and RangePartitioner's sampling is not
    // stable across re-executions (rdd.id seeds it). localCheckpoint pins
    // the partitioning and truncates lineage (cluster scale: checkpoint).
    val local = parted.withColumn("_local",
      sum(col(valCol).cast("long")).over(w))
      .localCheckpoint()
    // P partition totals -> driver (P values), scanned into start offsets.
    // sum(valCol), NOT max(_local): with negative values the running sum's
    // max is not the partition total.
    val totals = local.groupBy("_pid").agg(sum(col(valCol).cast("long")).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid + 1, acc + tot)
    }.toMap // pid -> sum of all earlier partitions' totals
    val offCol = typedLit(offsets)
    local
      .withColumn("cum", col("_local") + coalesce(
        element_at(offCol, col("_pid")), lit(0L)))
      .drop("_pid", "_local")
  }

  /** Token-budget shard packing — the "cut a corpus into ~budget-token
    * training shards in a stable order" pipeline step: shard id = the
    * document's cumulative START offset div budget, so shard boundaries
    * are deterministic, order-stable, and every shard holds ≥ budget
    * tokens' worth of docs except possibly the last (a doc that crosses a
    * boundary belongs to the shard its first token lands in).
    */
  def packShards(df: DataFrame, orderCol: String, sizeCol: String,
                 budget: Long, partitions: Int = 32): DataFrame =
    prefixSum(df, orderCol, sizeCol, partitions)
      // integral `div`, not double `/`: exact past 2^53 (100 TB of tokens)
      .withColumn("shard", expr(s"(cum - $sizeCol) div ${budget}L"))
}
