package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
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

  /** Distributed ranking functions — ntile / percent_rank / cume_dist per
    * group WITHOUT a whole-group single-task sort.
    *
    * `Window.partitionBy(lowCardinalityKey).orderBy(...)` with rank
    * functions is a genuine straggler shape: every group's FULL sort lands
    * on one task because ntile/percent_rank/cume_dist need whole-group
    * ranks. This is the two-pass range-partitioned form (the
    * [[PrefixSum]] pattern, generalized to per-group ranks):
    *
    *  1. range-partition by (group, orderCols) — each group's rows split
    *     across consecutive sorted ranges, P parallel sorts; equal sort
    *     keys land in ONE partition (range assignment is a deterministic
    *     function of the key), so tie groups never straddle a boundary,
    *  2. per-(partition, group) local row_number, plus min/max row_number
    *     over each distinct order key (tie-aware rank and cume counts),
    *  3. per-(partition, group) counts → per-group running offsets and
    *     totals, computed IN-PLAN (a G·P-row aggregate windowed per group,
    *     ≤ P rows per window — nothing collects to the driver) and
    *     broadcast-joined back,
    *  4. closed forms over the global rank: standard ntile bucketing
    *     (first n%k buckets get one extra row), percent_rank =
    *     (rank−1)/(n−1), cume_dist = peers_through_current / n.
    *
    * Results are bit-identical to the one-task-per-group window (asserted
    * in WindowOpsSpec) and partitioning-independent. `orderCols` should be
    * a total order within each group for ntile determinism (ties make any
    * engine's ntile order-dependent); percent_rank/cume_dist are tie-aware
    * either way. Output adds `ntile_<k>`, `pct_rank`, `cume` (+ `_pid`
    * when `keepPid`, for distribution assertions in specs).
    */
  def rankFunctions(df: DataFrame, groupCol: String, orderCols: Seq[String],
                    numTiles: Int, partitions: Int = 32,
                    keepPid: Boolean = false,
                    keepRanks: Boolean = false): DataFrame = {
    val reserved = Seq("_pid", "_lrn", "_lmin", "_lmax", "_off", "_n", "_c",
      "_opid", "_og")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"rankFunctions: input must not contain reserved column '$c'"))
    val ordCols: Seq[Column] = orderCols.map(col)
    // MATERIALIZE pass 1 (PrefixSum rationale): the counts aggregate and
    // the final join must see the SAME range boundaries, and
    // RangePartitioner's sampling is not stable across re-executions.
    val parted = df
      .repartitionByRange(partitions, (col(groupCol) +: ordCols): _*)
      .withColumn("_pid", F.spark_partition_id())
      .localCheckpoint()
    val wl = Window.partitionBy(col("_pid"), col(groupCol)).orderBy(ordCols: _*)
    val wk = Window.partitionBy((Seq(col("_pid"), col(groupCol)) ++ ordCols): _*)
    val local = parted
      .withColumn("_lrn", row_number().over(wl).cast("long"))
      .withColumn("_lmin", min(col("_lrn")).over(wk)) // local tie-aware rank
      .withColumn("_lmax", max(col("_lrn")).over(wk)) // local peers-through count
    // per-group start offset of each partition + group total, in-plan:
    // G·P rows, each per-group window ≤ P rows — trivially distributed
    val cnts = parted.groupBy(col("_pid"), col(groupCol))
      .agg(count(lit(1)).as("_c"))
    val wOff = Window.partitionBy(groupCol).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(groupCol)))
      .select(col("_pid").as("_opid"), col(groupCol).as("_og"),
        col("_off"), col("_n"))
    val joined = local.join(broadcast(offs),
      col("_pid") === col("_opid") && col(groupCol) === col("_og"))
    val grn = col("_off") + col("_lrn")     // global row_number
    val grank = col("_off") + col("_lmin")  // global tie-aware rank
    val gcume = col("_off") + col("_lmax")  // global rows-through-peers
    val n = col("_n")
    // standard ntile over the global row_number: q = n div k, r = n mod k;
    // the first r buckets hold q+1 rows. Doubles are exact here (group
    // sizes < 2^53); the q=0 branch (n < k) never divides by zero because
    // `when` evaluates lazily and rn <= r*(q+1) = n always holds then.
    val k = lit(numTiles.toLong)
    val q = floor(n.cast("double") / k.cast("double")).cast("long")
    val r = n - q * k
    val tile = when(grn <= r * (q + lit(1L)),
        ceil(grn.cast("double") / (q + lit(1L)).cast("double")))
      .otherwise(r + ceil((grn - r * (q + lit(1L))).cast("double") / q.cast("double")))
      .cast("long")
    val out0 = joined
      .withColumn(s"ntile_$numTiles", tile)
      .withColumn("pct_rank", when(n === 1, lit(0.0))
        .otherwise((grank - lit(1L)).cast("double") / (n - lit(1L)).cast("double")))
      .withColumn("cume", gcume.cast("double") / n.cast("double"))
    // integer rank surface for exact downstream math (AUC midranks):
    // `rank` = tie-aware global rank, `peers_through` = rows ≤ the
    // current order key, `group_n` = group size — all exact longs
    val out1 =
      if (keepRanks) out0.withColumn("rank", grank)
        .withColumn("peers_through", gcume).withColumn("group_n", n)
      else out0
    val out = out1.drop("_lrn", "_lmin", "_lmax", "_off", "_n", "_opid", "_og")
    if (keepPid) out else out.drop("_pid")
  }

  /** (group, _v, _cnt, _cum, _n) per DISTINCT value per group: value
    * count, INCLUSIVE cumulative count in value order, and group total —
    * the weighted-rank core all quantile forms share. The collapse to
    * distinct values happens FIRST (one hash aggregation), so the
    * range-partitioned cumulative pass scales with |distinct values|,
    * not |rows| — the decisive difference on low-cardinality measures.
    * Same two-pass shape as [[rankFunctions]]: P parallel sorted ranges,
    * per-(range, group) partial sums, in-plan broadcast offsets. Nulls
    * are excluded (the `percentile` / `quantile_cont` contract).
    */
  private def groupValueCum(df: DataFrame, groupCol: String, valueCol: String,
                            partitions: Int,
                            weightCol: Option[String] = None): DataFrame = {
    Seq("_v", "_cnt", "_pid", "_lcum", "_c", "_off", "_n", "_opid", "_og")
      .foreach(c => require(!df.columns.contains(c),
        s"quantiles: input must not contain reserved column '$c'"))
    // weight = row multiplicity: cumulative sums over (group, value,
    // weight) rows are IDENTICAL to count-based sums over the raw rows
    // they stand for. Pre-weighted input rides the machinery DIRECTLY —
    // no re-collapse shuffle; duplicate (group, value) rows are harmless
    // because a tie's sub-intervals all carry the same value, so any rank
    // probe landing in the tie range selects it regardless of the split.
    val counts = weightCol match {
      case Some(wc) =>
        df.select(col(groupCol), col(valueCol).cast("double").as("_v"),
            col(wc).cast("long").as("_cnt"))
          .filter(col("_v").isNotNull)
      case None =>
        df.select(col(groupCol), col(valueCol).cast("double").as("_v"))
          .filter(col("_v").isNotNull)
          .groupBy(groupCol, "_v").agg(count(lit(1)).as("_cnt"))
    }
    val parted = counts
      .repartitionByRange(partitions, col(groupCol), col("_v"))
      .withColumn("_pid", F.spark_partition_id())
      .localCheckpoint()
    val wl = Window.partitionBy(col("_pid"), col(groupCol)).orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_lcum", sum(col("_cnt")).over(wl))
    val pcnts = parted.groupBy(col("_pid"), col(groupCol))
      .agg(sum(col("_cnt")).as("_c"))
    val wOff = Window.partitionBy(groupCol).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = pcnts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(groupCol)))
      .select(col("_pid").as("_opid"), col(groupCol).as("_og"),
        col("_off"), col("_n"))
    local.join(broadcast(offs),
        col("_pid") === col("_opid") && col(groupCol) === col("_og"))
      .select(col(groupCol), col("_v"), col("_cnt"),
        (col("_off") + col("_lcum")).as("_cum"), col("_n"))
  }

  /** Exact GLOBAL discrete quantiles without a one-task global sort:
    * quantile_disc(q) = min value whose cumulative distribution reaches q
    * (the element at sorted position ceil(q·n), ties collapse), from the
    * collapsed weighted-cumulative table — one tiny aggregation per q.
    * Exactly matches DuckDB's `quantile_disc` (oracle-checked).
    *
    * Output: (q, value), one row per requested quantile, in q order.
    */
  def exactQuantilesGlobal(df: DataFrame, valueCol: String, qs: Seq[Double],
                           partitions: Int = 32): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    require(!df.columns.contains("_qg"),
      "exactQuantilesGlobal: input must not contain reserved column '_qg'")
    val cum = groupValueCum(
      df.select(col(valueCol)).withColumn("_qg", lit(1)),
      "_qg", valueCol, partitions)
    cum
      .select(explode(typedLit(qs.sorted)).as("q"), col("_v"),
        (col("_cum").cast("double") / col("_n").cast("double")).as("_cume"))
      .filter(col("_cume") >= col("q"))
      .groupBy("q").agg(min(col("_v")).as("value"))
      .orderBy("q")
  }

  /** Per-group DISCRETE quantiles — the group-partitioned dual of
    * [[exactQuantilesGlobal]] (quantile_disc semantics: min value whose
    * cumulative distribution reaches q) on the same distributed
    * cumulative machinery: no group ever sorts in one task. The edge
    * rule [[graft.ops.StatsOps.psiByGroup]] bins against.
    * Output: (group, q, value).
    */
  def exactQuantilesByGroupDiscrete(df: DataFrame, groupCol: String,
                                    valueCol: String, qs: Seq[Double],
                                    partitions: Int = 32): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val cum = groupValueCum(df, groupCol, valueCol, partitions)
    cum.select(col(groupCol), explode(typedLit(qs.sorted)).as("q"), col("_v"),
        (col("_cum").cast("double") / col("_n").cast("double")).as("_cume"))
      .filter(col("_cume") >= col("q"))
      .groupBy(groupCol, "q").agg(min(col("_v")).as("value"))
  }

  /** Exact PER-GROUP continuous (interpolated) quantiles with bounded
    * per-task state — the scale-safe dual of the `percentile` aggregate,
    * which buffers EVERY group value in one aggregation buffer (a 10⁹-row
    * group's values in one task's memory). Here ranks come from the
    * distributed two-pass machinery; each requested q interpolates
    * between the values at row positions ⌊1+(n−1)q⌋ and ⌈1+(n−1)q⌉,
    * found by probing which tie-interval [rank, peers_through] contains
    * the position — a filtered aggregation, no group ever sorts in one
    * task. Matches `percentile` / DuckDB `quantile_cont` exactly (same
    * lo + (hi−lo)·frac interpolation order).
    *
    * Output: (group, q, value), one row per group × quantile.
    */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                            qs: Seq[Double], partitions: Int = 32): DataFrame =
    quantilesFromCum(groupValueCum(df, groupCol, valueCol, partitions),
      groupCol, qs)

  /** [[exactQuantilesByGroup]] over PRE-AGGREGATED data: each input row is
    * a (group, value, weight) with weight = how many raw rows it stands
    * for. Produces bit-identical results to running the unweighted form
    * over the expanded rows — rank positions and interpolation are pure
    * functions of the cumulative weights. Input rows need NOT be unique
    * per (group, value): a tie's sub-intervals all carry the same value,
    * so the probe is split-invariant. The point at scale: a caller that
    * already holds the collapsed table (e.g. [[graft.ops.StatsOps
    * .madPerGroup]]'s deviation pass) re-ranks |distinct values| rows,
    * not |raw rows|, and pays no re-collapse shuffle.
    */
  def exactQuantilesByGroupWeighted(df: DataFrame, groupCol: String,
                                    valueCol: String, weightCol: String,
                                    qs: Seq[Double],
                                    partitions: Int = 32): DataFrame =
    quantilesFromCum(
      groupValueCum(df, groupCol, valueCol, partitions, Some(weightCol)),
      groupCol, qs)

  private def quantilesFromCum(cum: DataFrame, groupCol: String,
                               qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1]: $qs")
    // a value's row positions are the interval [_cum−_cnt+1, _cum]
    val pos = lit(1.0) + (col("_n") - lit(1L)).cast("double") * col("q")
    val lo = floor(pos)
    val hi = ceil(pos)
    val rankLo = (col("_cum") - col("_cnt") + lit(1L)).cast("double")
    val rankHi = col("_cum").cast("double")
    cum
      .withColumn("q", explode(typedLit(qs.sorted)))
      .groupBy(col(groupCol), col("q"))
      .agg(
        max(when(rankLo <= lo && lo <= rankHi, col("_v"))).as("vlo"),
        max(when(rankLo <= hi && hi <= rankHi, col("_v"))).as("vhi"),
        first(pos - lo).as("frac"))
      .select(col(groupCol), col("q"),
        (col("vlo") + (col("vhi") - col("vlo")) * col("frac")).as("value"))
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
