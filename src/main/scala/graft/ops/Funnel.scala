package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential funnel analysis: how many users complete step 1, then step 2
  * strictly after their step-1 time, then step 3 after that, … — the
  * classic ordered-event product query.
  *
  * Plan shape: one frontier aggregation per step — step k is a join of the
  * events scan against the step-(k-1) frontier (users × first-completion
  * time), filtered `type = stepK AND ts > prev`, min-aggregated. Everything
  * is lazy and unioned into ONE plan: k steps = k joins over the same
  * (reusable) scan, each frontier shrinking monotonically. No windows over
  * whole-user event lists, so a power user with 10⁷ events costs the same
  * shuffle keys as anyone else.
  */
object Funnel {

  /** Returns (step, event_type, users): users completing each prefix of
    * `steps` in strict time order. Ties on ts do NOT advance the funnel
    * (strict >): same-timestamp step pairs are not ordered evidence.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    val frontiers = steps.tail.scanLeft(
      e.filter(col("t") === steps.head).groupBy("u").agg(min("ts").as("ft"))) {
      case (prev, step) =>
        e.join(prev.withColumnRenamed("ft", "prev_ft"), "u")
          .filter(col("t") === step && col("ts") > col("prev_ft"))
          .groupBy("u").agg(min("ts").as("ft"))
    }
    frontiers.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _)
  }
}
