package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators — extension phase beyond the reference surface
  * (SURVEY.md §2.5: "grouping sets/cube/rollup, window functions ... Spark
  * built-ins cover these"). All windows partition by a key, so at scale each
  * window state is bounded by the largest single partition key, and the plan
  * is one shuffle on the partition key (WindowExec after a hash exchange).
  */
object WindowOps {

  /** Running (prefix) sum per key, deterministic via a unique tie-breaker in
    * the ordering. Sum goes through DECIMAL so the result is
    * order-independent exact.
    */
  def runningSum(df: DataFrame, partCol: String, orderCols: Seq[String],
                 valCol: String): DataFrame = {
    val w = Window.partitionBy(partCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running",
      sum(col(valCol).cast("decimal(18,2)")).over(w).cast("double"))
  }

  /** Top-n-per-group via row_number — the scalable "per-key top-k"
    * (one shuffle, no global sort; rank state is O(1) per row).
    */
  def topNPerGroup(df: DataFrame, partCol: String, orderCols: Seq[(String, Boolean)],
                   n: Int): DataFrame = {
    val ord = orderCols.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val w = Window.partitionBy(partCol).orderBy(ord: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Previous value per key in event-time order (lag). */
  def lagPerKey(df: DataFrame, partCol: String, orderCols: Seq[String],
                valCol: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCols.map(col): _*)
    df.withColumn("prev", lag(col(valCol), 1).over(w))
  }

  /** Batch sessionization: per-user session numbers from inactivity gaps —
    * the batch analog of [[graft.streaming.Streams]] session windows.
    * `session_n` = running count of gap-openers (first event, or > gap
    * since the previous one), so ids are 1,2,3… per user in time order.
    * All arithmetic on integer epoch-micros (exact, engine-portable);
    * `idCol` breaks timestamp ties deterministically. One shuffle on the
    * user key; window state is O(1) per row.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val gap = us - lag(us, 1).over(w)
    events
      .withColumn("_open",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_n", sum(col("_open"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_open")
  }
}
