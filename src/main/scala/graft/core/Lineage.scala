package graft.core

import org.apache.spark.sql.{DataFrame, graftbridge}

/** Lineage truncation for loop-carried DataFrames in iterative chains.
  *
  * `truncate` = `localCheckpoint` + a cap on the `Statistics` estimate the
  * checkpoint carries forward (see
  * [[org.apache.spark.sql.graftbridge.localCheckpointCappedStats]] for the
  * mechanism and the measured failure: a fixpoint round that references the
  * previous state more than once doubles the carried size-estimate's BigInt
  * digit count every round, and by round ~17 the driver burns minutes in
  * BigInteger multiplication inside Catalyst's stats visitor).
  *
  * Use this — not bare `localCheckpoint` — for any DataFrame that feeds the
  * NEXT round of its own loop. For small bounded state the cap never fires
  * and this is exactly `localCheckpoint`.
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame =
    graftbridge.localCheckpointCappedStats(df)
}
