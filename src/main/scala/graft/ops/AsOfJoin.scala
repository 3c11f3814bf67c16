package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — extension phase (SURVEY.md §2.6: absent in
  * the reference; a standard analytic-engine operator).
  *
  * Implemented as the union-and-window technique rather than a custom
  * SparkPlan: tag both sides, union, single shuffle on the join key, and a
  * `last(value, ignoreNulls)` running window in time order. This is the
  * 100 TB-friendly formulation — ONE exchange on the key, no range-join
  * explosion, no per-row probe; state per key is O(1) (the last right value).
  * A correlated-subquery or inequality-join formulation would be quadratic
  * per key.
  *
  * Ties: right rows sort before left rows at equal timestamps, so the match
  * is inclusive (left.ts >= right.ts). The right side must be unique per
  * (key, ts) for deterministic output — pre-aggregate it if not.
  */
object AsOfJoin {

  /** For every left row, attach the most recent right `valCol` at or before
    * its timestamp. Output = left columns + `asof_<valCol>` (null when no
    * prior right row exists).
    */
  def lastValueAsOf(left: DataFrame, right: DataFrame, key: String,
                    ts: String, valCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valCol).dataType))
    // Align the right side to the left schema: join key + ts carried through,
    // all other left columns null, plus the value column.
    val alignedRight = {
      val exprs = leftCols.map { c =>
        if (c == key || c == ts) right(c).as(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      }
      right.select((exprs :+ right(valCol).as("_rv")).toSeq: _*)
        .withColumn("_side", lit(0))
        .select((leftCols.map(col) :+ col("_side") :+ col("_rv")).toSeq: _*)
    }
    val unioned = l.select((leftCols.map(col) :+ col("_side") :+ col("_rv")).toSeq: _*)
      .unionByName(alignedRight)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valCol", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }
}
