package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application and history ops — the batch MERGE / CDC-apply
  * surface of an analytics engine: fold a change stream into a snapshot
  * (latest-wins upsert/delete) and build SCD2 validity intervals from a
  * change stream.
  */
object ChangeOps {

  /** Latest-wins merge of a changelog into a snapshot (the batch `MERGE
    * INTO` / CDC-apply op). Snapshot rows are implicit upserts; `changes`
    * shares the snapshot schema plus `opCol` ('upsert' | 'delete'). The
    * winner per key is the row with the highest `versionCol`; a delete
    * winner drops the key. CONTRACT: (key, version) unique across the
    * union — ties are undefined, version them upstream.
    *
    * Shape at 100 TB: ONE hash aggregation on the key — `max_by` carries
    * the winning row through partial/final aggregation, so there is no
    * window sort and no second join back; AQE skew-splits hot keys. Payload
    * columns ride inside a struct, untouched.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCol: String, versionCol: String,
                     opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(c => c == keyCol || c == versionCol).toSeq
    val snap = snapshot.withColumn(opCol, lit("upsert"))
    val all = snap.unionByName(changes.select(snap.columns.map(col).toIndexedSeq: _*))
    val carried = versionCol +: opCol +: payload
    all.groupBy(keyCol)
      .agg(max_by(struct(carried.map(col): _*), col(versionCol)).as("_w"))
      .select(col(keyCol) +: carried.map(c => col(s"_w.$c").as(c)): _*)
      .filter(col(opCol) === "upsert")
      .drop(opCol)
  }

  /** Incremental view maintenance for (count, sum)-per-group — keep a
    * materialized aggregate current under a changelog WITHOUT rescanning
    * the snapshot: only the CHANGED keys' snapshot rows are read (a
    * key-semi-join — partition/bucket-prunable at 100 TB), their old
    * contributions subtracted and the change winners' new contributions
    * added, then one tiny delta table (≤ |touched groups| rows) merges
    * into the base aggregate by full-outer join. Handles group-moving
    * upserts (−1 old group / +1 new group), deletes, inserts, stale
    * changes (the snapshot row wins the version race → the add puts the
    * subtracted contribution straight back), and groups emptying to zero
    * (dropped). Same contract as [[applyChangelog]]: (key, version)
    * unique across the union; sums are exact via DECIMAL(18,2) (2-dp
    * inputs by contract).
    *
    * Scope: count/sum (and anything derived from them — mean) are the
    * self-maintainable aggregates. min/max are deliberately excluded:
    * deleting the current extremum forces a rescan of its group (the
    * classic IVM boundary) — recompute those groups instead.
    *
    * `baseAgg` must be `(groupCol, cnt, sum_val)` — exactly this
    * function's output, so maintenance chains batch after batch.
    * Equivalence `maintainAgg(agg(S), S, C) == agg(applyChangelog(S, C))`
    * is the spec'd + oracle-checked contract.
    */
  def maintainAgg(baseAgg: DataFrame, snapshot: DataFrame, changes: DataFrame,
                  keyCol: String, versionCol: String, opCol: String,
                  groupCol: String, valCol: String): DataFrame = {
    val changedKeys = changes.select(col(keyCol)).distinct()
    val snapSlice = snapshot.join(changedKeys, Seq(keyCol), "left_semi")
    // version race over the touched keys only — applyChangelog's winner rule
    val race = snapSlice.withColumn(opCol, lit("upsert"))
      .unionByName(changes)
    val winner = race.groupBy(keyCol).agg(
      max_by(struct(col(opCol), col(groupCol), col(valCol)), col(versionCol))
        .as("_w"))
    val minus = snapSlice.select(col(groupCol).as("_g"),
      lit(-1L).as("_dc"),
      (col(valCol).cast("decimal(18,2)") * -1).as("_dv"))
    val plus = winner.filter(col(s"_w.$opCol") === "upsert")
      .select(col(s"_w.$groupCol").as("_g"), lit(1L).as("_dc"),
        col(s"_w.$valCol").cast("decimal(18,2)").as("_dv"))
    val delta = minus.unionByName(plus)
      .groupBy("_g").agg(sum("_dc").as("_dc"), sum("_dv").as("_dv"))
    baseAgg.join(delta, col(groupCol) === col("_g"), "full_outer")
      .select(coalesce(col(groupCol), col("_g")).as(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dc"), lit(0L))).as("cnt"),
        (coalesce(col("sum_val"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("_dv"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_val"))
      .filter(col("cnt") > 0)
  }

  /** The (group, cnt, sum_val) aggregate [[maintainAgg]] maintains —
    * provided so base construction and maintenance share one shape.
    */
  def groupAgg(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(groupCol).agg(count(lit(1)).as("cnt"),
      sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_val"))

  /** Snapshot diff — the dataset-versioning primitive: compare two
    * versions of a table by key and label every key `added` / `removed` /
    * `changed` / `unchanged`, with the list of columns that changed
    * (fixed schema order, comma-joined — deterministic, engine-portable).
    * The audit step between two runs of a 100 TB pipeline: what did this
    * rebuild actually touch?
    *
    * Shape at scale: ONE full-outer shuffle join on the key; every column
    * comparison is a codegen'd null-safe equality (`<=>`) — no per-column
    * joins, no driver work. CONTRACT: `keyCols` unique per snapshot
    * (pre-aggregate otherwise). Both snapshots must share a schema.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: no key columns")
    require(oldDf.columns.sameElements(newDf.columns),
      s"snapshotDiff: schema mismatch: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    val o = oldDf.select(oldDf.columns.map(c => col(c).as(s"_o_$c")).toSeq: _*)
    val n = newDf.select(newDf.columns.map(c => col(c).as(s"_n_$c")).toSeq: _*)
    val joined = o.join(n,
      keyCols.map(k => col(s"_o_$k") === col(s"_n_$k")).reduce(_ && _), "full_outer")
    // presence via the KEY columns (never null in a present row by def)
    val inOld = keyCols.map(k => col(s"_o_$k").isNotNull).reduce(_ && _)
    val inNew = keyCols.map(k => col(s"_n_$k").isNotNull).reduce(_ && _)
    val changedCols = concat_ws(",", valCols.map(c =>
      when(!(col(s"_o_$c") <=> col(s"_n_$c")), lit(c)).otherwise(lit(null))): _*)
    joined.select(
      keyCols.map(k => coalesce(col(s"_n_$k"), col(s"_o_$k")).as(k)) :+
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(changedCols =!= "", lit("changed"))
          .otherwise(lit("unchanged")).as("status") :+
        when(inOld && inNew, changedCols).otherwise(lit("")).as("changed_cols"): _*)
  }

  /** SCD2 history build: a change stream `(key, version, attributes…)` →
    * validity intervals `[valid_from, valid_to)` per key, `valid_to` null
    * (and `is_current` true) on each key's latest row. CONTRACT: (key,
    * version) unique — pre-aggregate duplicates to one state per version.
    *
    * Shape at 100 TB: one shuffle on the key plus the in-partition window
    * sort — the canonical distributed history build; no self-join.
    */
  def scd2(changes: DataFrame, keyCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
