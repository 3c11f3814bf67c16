package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — resample an event stream onto a per-key
  * calendar grid and forward-fill the gaps (the feature-engineering step
  * before any windowed model sees irregular event data).
  */
object TimeSeries {

  /** Daily resample with forward fill: aggregate `valCol` per (key, day)
    * with an exact decimal sum, expand each key's [min day, max day] span
    * to a dense daily grid, and forward-fill missing days from the last
    * observed value. `gap` marks filled rows.
    *
    * Shape at 100 TB: one two-phase aggregation to daily grain (shuffle
    * volume = O(key·days), not events), the grid generates INSIDE the row
    * (sequence+explode over the span — no join against a calendar table),
    * and the fill is one key-partitioned window. A key with a years-long
    * span costs its own days only; nothing is ever corpus-global.
    */
  def resampleDailyFfill(events: DataFrame, keyCol: String, tsCol: String,
                         valCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast("decimal(18,2)")).as("day_value"))
    val grid = daily
      .groupBy(keyCol).agg(min("day").as("d0"), max("day").as("d1"))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        col("day_value").isNull.as("gap"),
        last(col("day_value"), ignoreNulls = true).over(w)
          .cast("double").as("filled_value"))
  }

  /** Retention cohorts: users grouped by first-seen day, counted per day
    * offset — `(cohort_day, day_offset, n_users)`. The cohort assignment is
    * a per-key min aggregation joined back to the key's active days; both
    * aggregations are two-phase on the key, the final rollup is
    * O(cohorts × offsets).
    */
  def retentionCohorts(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val active = events
      .select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
    val cohort = active.groupBy(keyCol).agg(min("day").as("cohort_day"))
    active.join(cohort, Seq(keyCol))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-transition counts — the first-order Markov profile of a
    * clickstream: `(prev_type, next_type, cnt)` over each key's
    * time-ordered events. One key-partitioned window (lag) + a two-phase
    * count; ties within a timestamp are broken by `tieCol` so the
    * sequence — and the counts — are deterministic.
    */
  def transitionCounts(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("cnt"))
  }
}
