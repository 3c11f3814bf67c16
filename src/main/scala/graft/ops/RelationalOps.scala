package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operators demonstrated by the reference's examples/tests,
  * expressed declaratively so Catalyst picks the physical strategy
  * (broadcast vs shuffled-hash vs sort-merge join, partial aggregation,
  * range-partitioned total sort).
  */
object RelationalOps {

  /** Partitioned inner equi-join.
    * Reference: tests/test_query.py:14-63 (md5 % 160 buckets, co-grouped
    * reduce) and examples/util/simple_innerjoin.py (sort-merge).
    * In Spark the bucket count is `spark.sql.shuffle.partitions` and the
    * join strategy is Catalyst's choice; pass `broadcastRight = true` for a
    * dimension table small enough to ship to every executor (no shuffle of
    * the fact side at all — the scale-path for fact⋈dim at 100 TB).
    */
  def innerJoin(left: DataFrame, right: DataFrame, leftKey: String,
                rightKey: String, broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "inner")
  }

  /** Synthesized supplier-part cost table — the fixture carries no
    * partsupp, so the TPC-H Q9/Q11 optimizer shapes (two-fact join with a
    * per-(part,supplier) cost; HAVING over a global scalar) get their cost
    * side derived deterministically from the pairs that actually occur in
    * lineitem: `ps_supplycost`/`ps_availqty` are pure md5 arithmetic on
    * (partkey, suppkey) ([[Sampling.hashDraw]]), so any engine replays
    * them exactly and the synthesized table never needs to be stored.
    *
    * Shape at 100 TB: one distinct over two int columns of the fact table
    * (map-side partial dedup collapses it early), then codegen'd column
    * arithmetic — no extra source, no join to build it.
    */
  def syntheticPartsupp(lineitem: DataFrame): DataFrame = {
    val pairs = lineitem.select(col("l_partkey").as("ps_partkey"),
      col("l_suppkey").as("ps_suppkey")).distinct()
    val key = concat(col("ps_partkey").cast("string"), lit(":"),
      col("ps_suppkey").cast("string"))
    pairs
      .withColumn("ps_supplycost",
        ((Sampling.hashDraw(key, "pscost") % 100000) / 100.0)
          .cast("decimal(18,2)"))
      .withColumn("ps_availqty",
        (Sampling.hashDraw(key, "psavail") % 9999 + 1).cast("int"))
  }

  /** The SQL an ANSI engine needs to replay [[syntheticPartsupp]] — kept
    * adjacent so the two formulas can't drift.
    */
  val syntheticPartsuppSql: String = {
    val key = "CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)"
    s"""SELECT ps_partkey, ps_suppkey,
       |  CAST((${Sampling.hashDrawSql(key, "pscost")} % 100000) / 100.0 AS DECIMAL(18,2)) AS ps_supplycost,
       |  CAST(${Sampling.hashDrawSql(key, "psavail")} % 9999 + 1 AS INT) AS ps_availqty
       |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
       |      FROM lineitem)""".stripMargin
  }

  /** Synthesized shipping columns — the fixture lacks `l_shipmode` /
    * `l_commitdate` / `l_receiptdate`, so the TPC-H Q12 shape (big
    * fact⋈fact join driven by predicates on the shipping leg, then a
    * conditional two-way count by ship mode) derives them
    * deterministically from each line's identity: ship mode is one of
    * five labels and commit/receipt are day OFFSETS from `l_shipdate`,
    * all pure md5 arithmetic ([[Sampling.hashDraw]]) any engine replays
    * exactly. Pure codegen'd projection — no extra source, no join.
    */
  def syntheticShipping(lineitem: DataFrame): DataFrame = {
    val key = concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))
    lineitem
      .withColumn("l_shipmode",
        element_at(
          array(lit("AIR"), lit("MAIL"), lit("RAIL"), lit("SHIP"), lit("TRUCK")),
          (Sampling.hashDraw(key, "shipmode") % 5 + 1).cast("int")))
      .withColumn("commit_off", Sampling.hashDraw(key, "q12commit") % 45)
      .withColumn("receipt_off", Sampling.hashDraw(key, "q12receipt") % 30 + 1)
  }

  /** The SQL projection list replaying [[syntheticShipping]] — kept
    * adjacent so the two formulas can't drift. Select alongside
    * `lineitem.*`.
    */
  val syntheticShippingSql: String = {
    val key = "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    s"""(ARRAY['AIR','MAIL','RAIL','SHIP','TRUCK'])[CAST(${Sampling.hashDrawSql(key, "shipmode")} % 5 + 1 AS INT)] AS l_shipmode,
       |${Sampling.hashDrawSql(key, "q12commit")} % 45 AS commit_off,
       |${Sampling.hashDrawSql(key, "q12receipt")} % 30 + 1 AS receipt_off""".stripMargin
  }

  /** Total sort by key — Disco's external disk sort (lib/disco/util.py:362-388
    * `disk_sort` via Unix sort). Spark: `orderBy` = range partitioning
    * (sampled bounds) + per-partition spill-capable sort; scales linearly
    * with data because no single node sees the whole dataset.
    */
  def totalSort(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** Top-k by ordering — planned as TakeOrderedAndProject: each partition
    * keeps a k-size heap, driver merges k*numPartitions rows. No full sort,
    * no full shuffle — O(k) memory per task at any scale.
    */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** Group values of equal keys into a deterministic (sorted) list —
    * Disco's `kvgroup` over sorted reduce input (lib/disco/util.py:101-110).
    * Emitted as a joined string for engine-portable comparison; the
    * list-valued variant is `sort_array(collect_list(v))`.
    */
  def kvGroupConcat(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(array_join(array_sort(collect_list(col(valCol).cast("string"))), ",")
        .as("vals"))

  /** Disco `make_range_partition` (func.py:131-141): fixed-width range
    * label, `floor((k - min) / width)`. Unlike Spark's sampled
    * RangePartitioner this is deterministic given (min, max, n) — exposed
    * as a pure Column expression so it stays in codegen.
    */
  def fixedWidthRangeLabel(key: Column, min: Double, max: Double, n: Int): Column = {
    val width = (max - min) / n
    least(greatest(floor((key - lit(min)) / lit(width)), lit(0)), lit(n - 1)).cast("int")
  }

  /** Disco `default_partition` = hash(key) % n (func.py:128-129). The result
    * contract is grouping correctness, not bit-identical placement, so we use
    * Spark's Murmur3 hash. Returned as a label column; `repartition(n, key)`
    * is the physical equivalent.
    */
  def hashLabel(key: Column, n: Int): Column = pmod(hash(key), lit(n)).cast("int")

  /** Left semi join — EXISTS: left rows with a match, left columns only.
    * Ships only the key side of `right` through the shuffle (or broadcast);
    * at scale this beats inner-join+distinct by the width of `right`.
    */
  def semiJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "left_semi")
  }

  /** Left anti join — NOT EXISTS: left rows with no match. */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "left_anti")
  }

  /** Set difference (distinct), SQL EXCEPT. */
  def except(left: DataFrame, right: DataFrame): DataFrame = left.except(right)

  /** Interval (range) join: each `points` row matched to every `intervals`
    * row with `lo <= v < hi` — WITHOUT the BroadcastNestedLoopJoin Spark
    * plans for a raw BETWEEN predicate (all-pairs; dies at scale).
    *
    * Grid-bucket shape: points hash into buckets of `bucketWidth`;
    * intervals replicate into every bucket they overlap (one `sequence` +
    * `explode` — an interval costs ceil(span/width)+1 rows); the join is a
    * plain equi-join on the bucket id, re-checked exactly. Choose
    * `bucketWidth` ≈ the typical interval span: replication stays O(1) per
    * interval and each point probes one bucket. Equi-join ⇒ hash shuffle /
    * broadcast by size, AQE handles skewed buckets.
    */
  def rangeJoin(points: DataFrame, vCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double, maxReplication: Int = 1 << 16): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // name no caller column can collide with (withColumn would silently
    // overwrite, and the trailing drop would eat the caller's data)
    val b = "__graft_range_bucket"
    require(!points.columns.contains(b) && !intervals.columns.contains(b),
      s"rangeJoin: reserved column name $b present in input")
    val lob = floor(col(loCol) / bucketWidth).cast("long")
    val hib = floor(col(hiCol) / bucketWidth).cast("long")
    // an interval spanning more than maxReplication buckets (sentinel
    // hi = MaxValue, or bucketWidth far below the span) would explode into
    // an unbounded sequence — fail loudly instead of OOMing the executor;
    // the fix is a wider bucketWidth or a capped hi
    val guarded = when(hib - lob < lit(maxReplication.toLong), sequence(lob, hib))
      .otherwise(raise_error(concat(
        lit("rangeJoin: interval spans "), (hib - lob + 1).cast("string"),
        lit(s" buckets > maxReplication=$maxReplication — widen bucketWidth")))
        .cast("array<bigint>"))
    val pb = points.withColumn(b, floor(col(vCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn(b, explode(guarded))
    pb.join(ib, Seq(b))
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop(b)
  }

  /** Pivot: one column per (known) pivot value, counting rows per cell.
    * The pivot values are EXPLICIT — passing them keeps the plan a single
    * two-phase aggregation (Spark's values-less pivot first runs a distinct
    * collect to the driver to discover columns, an extra corpus pass and a
    * nondeterministic column order).
    */
  def pivotCounts(df: DataFrame, rowKey: String, pivotCol: String,
                  values: Seq[String]): DataFrame =
    df.groupBy(rowKey).pivot(pivotCol, values).agg(count(lit(1)))
      .na.fill(0L, values)

  /** Unpivot/melt: wide value columns back to (key, name, value) rows —
    * a pure per-row generator (no shuffle; `Unpivot` logical node).
    */
  def unpivot(df: DataFrame, rowKey: String, valueCols: Seq[String],
              nameCol: String = "name", valueCol: String = "value"): DataFrame =
    df.unpivot(Array(col(rowKey)), valueCols.map(col).toArray, nameCol, valueCol)
}
