package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column↔Expression converters — the only
  * supported way in Spark 4's split API to wrap a custom Catalyst
  * `Expression` as a user-facing `Column` (see
  * org.apache.spark.sql.classic.ExpressionUtils in the Spark source).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `sessionState` is `private[sql]`; exposed for post-hoc function
    * registration into LIVE sessions (graft.core.GraftExtensions.register —
    * builder-time `withExtensions` is silently skipped when getOrCreate
    * returns an existing session).
    */
  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** `localCheckpoint` that CAPS the size estimate the checkpoint carries
    * forward. `Dataset.localCheckpoint` wraps the materialized RDD in a
    * `LogicalRDD` that preserves the ORIGIN plan's `Statistics` (so that a
    * small checkpointed table stays broadcast-eligible). But
    * `SizeInBytesOnlyStatsPlanVisitor` estimates a join as the PRODUCT of
    * its children's `sizeInBytes` (an unbounded `BigInt`), so in an
    * iterative chain whose round joins the loop-carried state against
    * itself more than once (Bradley-Terry references `s` as both join
    * sides plus the rescale), the carried estimate's DIGIT COUNT doubles
    * every round: by round ~17 the driver spends minutes inside
    * `BigInteger.multiplyToomCook3` on million-digit integers just to
    * re-derive a number that means nothing beyond "huge" (measured: rounds
    * 1-15 ≈ 0.6 s, round 18 = 119 s, all of it CPU in the main thread's
    * stats visitor). Single-reference loops (PageRank) only grow digits
    * linearly, which is why they never hit it.
    *
    * Fix: after checkpointing, if the carried `sizeInBytes` no longer fits
    * in a Long the estimate is garbage anyway — rebuild the `LogicalRDD`
    * with the estimate clamped to `Long.MaxValue` (still "never
    * broadcast", but bounded, so downstream products stay small BigInts).
    * Stats that fit in a Long are kept EXACT, preserving broadcast
    * decisions for genuinely small checkpoints — on that fast path this is
    * byte-for-byte `localCheckpoint`.
    */
  def localCheckpointCappedStats(df: Dataset[Row]): Dataset[Row] = {
    val ck = df.localCheckpoint().asInstanceOf[classic.Dataset[Row]]
    ck.queryExecution.logical match {
      case lr: execution.LogicalRDD =>
        val s = lr.stats
        if (s.sizeInBytes.isValidLong) ck
        else {
          val capped = catalyst.plans.logical.Statistics(
            sizeInBytes = BigInt(Long.MaxValue),
            rowCount = s.rowCount.map(_.min(BigInt(Long.MaxValue))))
          // Carry the origin CONSTRAINTS through the rebuild too — only the
          // size estimate is garbage. `lr.constraints` is the origin set
          // already filtered to deterministic exprs over the output, and
          // LogicalRDD's own constraints re-apply that same filter, so
          // passing the filtered set as the new origin is a fixed point:
          // the capped plan exposes byte-for-byte the constraints the
          // plain checkpoint would (IsNotNull pruning etc. keep working).
          classic.Dataset.ofRows(ck.sparkSession,
            lr.copy()(ck.sparkSession, Some(capped), Some(lr.constraints)))
        }
      case _ => ck
    }
  }
}
