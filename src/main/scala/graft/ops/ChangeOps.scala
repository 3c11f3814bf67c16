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

  /** Incremental view maintenance for (count, sum, min, max)-per-group —
    * keep a materialized aggregate current under a changelog WITHOUT
    * rescanning the snapshot: only the CHANGED keys' snapshot rows are read
    * (a key-semi-join — partition/bucket-prunable at 100 TB), their old
    * contributions subtracted and the change winners' new contributions
    * added, then one tiny delta table (≤ |touched groups| rows) merges
    * into the base aggregate by full-outer join. Handles group-moving
    * upserts (−1 old group / +1 new group), deletes, inserts, stale
    * changes (the snapshot row wins the version race → the add puts the
    * subtracted contribution straight back), and groups emptying to zero
    * (dropped). Same contract as [[applyChangelog]]: (key, version)
    * unique across the union; values flow through DECIMAL(18,2) (2-dp
    * inputs by contract) so sums are exact and extrema compare exactly.
    *
    * count/sum (and anything derived — mean) are self-maintainable.
    * min/max sit on the classic IVM boundary — deleting the current
    * extremum can't be healed from the delta — and get the standard
    * BOUNDED GROUP-RESCAN REPAIR: a group's min needs repair only when a
    * removal ties its stored min and no add replaces it (symmetrically for
    * max); ONLY those groups' snapshot slices are rescanned (group-
    * partition-prunable at 100 TB — repair cost is proportional to the
    * affected groups' size, never the table). All other groups fold
    * extrema from the delta alone: an add ≤ the stored min IS the new min
    * because every surviving row is ≥ it.
    *
    * `baseAgg` must be `(groupCol, cnt, sum_val, min_val, max_val)` —
    * exactly this function's (and [[groupAgg]]'s) output, so maintenance
    * chains batch after batch. Equivalence
    * `maintainAgg(agg(S), S, C) == agg(applyChangelog(S, C))`
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
    val removes = snapSlice.select(col(groupCol).as("_g"),
      col(valCol).cast("decimal(18,2)").as("_v"), lit(-1).as("_s"))
    val adds = winner.filter(col(s"_w.$opCol") === "upsert")
      .select(col(s"_w.$groupCol").as("_g"),
        col(s"_w.$valCol").cast("decimal(18,2)").as("_v"), lit(1).as("_s"))
    // one pass over the (tiny) contribution set: count/sum deltas plus the
    // add/remove extrema that drive both the fold and the repair trigger
    val delta = removes.unionByName(adds).groupBy("_g").agg(
      sum(col("_s").cast("long")).as("_dc"),
      sum(col("_v") * col("_s")).cast("decimal(18,2)").as("_dv"),
      min(when(col("_s") === 1, col("_v"))).as("_amin"),
      max(when(col("_s") === 1, col("_v"))).as("_amax"),
      min(when(col("_s") === -1, col("_v"))).as("_rmin"),
      max(when(col("_s") === -1, col("_v"))).as("_rmax"))
    val merged = baseAgg.join(delta, col(groupCol) === col("_g"), "full_outer")
      .select(coalesce(col(groupCol), col("_g")).as("_grp"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dc"), lit(0L))).as("cnt"),
        (coalesce(col("sum_val"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("_dv"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_val"),
        col("min_val"), col("max_val"),
        col("_amin"), col("_amax"), col("_rmin"), col("_rmax"))
      .filter(col("cnt") > 0)
      // the repair set is read twice (trigger + final assembly) and is
      // delta-sized; pin it so the trigger evaluates once
      .localCheckpoint()
    // repair trigger: a removal ties the stored extremum AND no add
    // re-covers it. (Removals come from snapshot rows, so _rmin ≥ min_val
    // always — "≤" is the tie.) Ties with multiplicity rescan harmlessly.
    val needRepair =
      (col("min_val").isNotNull && col("_rmin").isNotNull &&
        col("_rmin") <= col("min_val") &&
        (col("_amin").isNull || col("_amin") > col("min_val"))) ||
      (col("max_val").isNotNull && col("_rmax").isNotNull &&
        col("_rmax") >= col("max_val") &&
        (col("_amax").isNull || col("_amax") < col("max_val")))
    val repairGroups = merged.filter(needRepair).select(col("_grp"))
    // bounded rescan: ONLY the affected groups' live rows — surviving
    // snapshot rows (touched keys excluded) plus this batch's add winners
    val rescanSnap = snapshot
      .join(repairGroups, snapshot(groupCol) === repairGroups("_grp"), "left_semi")
      .join(changedKeys, Seq(keyCol), "left_anti")
      .select(col(groupCol).as("_g"), col(valCol).cast("decimal(18,2)").as("_v"))
    val rescanAdds = adds.select(col("_g"), col("_v"))
      .join(repairGroups, col("_g") === col("_grp"), "left_semi")
    val repaired = rescanSnap.unionByName(rescanAdds).groupBy("_g")
      .agg(min("_v").as("_pmin"), max("_v").as("_pmax"))
    merged.join(repaired, col("_grp") === repaired("_g"), "left_outer")
      .select(col("_grp").as(groupCol), col("cnt"), col("sum_val"),
        coalesce(col("_pmin"), least(col("min_val"), col("_amin")))
          .cast("decimal(18,2)").as("min_val"),
        coalesce(col("_pmax"), greatest(col("max_val"), col("_amax")))
          .cast("decimal(18,2)").as("max_val"))
  }

  /** The (group, cnt, sum_val, min_val, max_val) aggregate [[maintainAgg]]
    * maintains — provided so base construction and maintenance share one
    * shape.
    */
  def groupAgg(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(groupCol).agg(count(lit(1)).as("cnt"),
      sum(col(valCol).cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_val"),
      min(col(valCol).cast("decimal(18,2)")).as("min_val"),
      max(col(valCol).cast("decimal(18,2)")).as("max_val"))

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
