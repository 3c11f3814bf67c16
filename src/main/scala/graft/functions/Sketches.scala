package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching for 100 TB profiling passes.
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002): hash every key to a
  * uniform 60-bit value, keep the k smallest DISTINCT hashes; if fewer than
  * k survive the cardinality is exact, otherwise estimate
  * `(k-1) * 2^60 / h_(k)`. Standard error ≈ 1/sqrt(k-2).
  *
  * Why not HyperLogLog (`approx_count_distinct`)? At this engine's oracle
  * bar the sketch must be ENGINE-PORTABLE: the same bytes, the same
  * estimate, replayable in ANSI SQL. HLL register layouts are
  * implementation-private; KMV over md5 is pure arithmetic, so a DuckDB
  * oracle reproduces the estimate bit-for-bit — and at scale it is still a
  * single `TakeOrdered(k)` over hashed keys (per-partition heap of k, driver
  * merge of p·k values), no full shuffle of the key space.
  *
  * The hash is the first 15 hex chars (60 bits) of md5 — inside the 2^53
  * double-exact range for the estimate division, and the same slice-a-digest
  * derivation the MinHash family uses ([[graft.dedup.Dedup]]).
  */
object Sketches {

  /** Uniform 60-bit hash of a key (15 hex chars of md5, engine-portable). */
  def hash60(key: Column, salt: String = "kmv"): Column =
    conv(substring(md5(to_binary(concat(key.cast("string"), lit(":" + salt)),
      lit("utf-8"))), 1, 15), 16, 10).cast("long")

  private val Space: Double = math.pow(2.0, 60) // 2^60, exactly representable

  /** KMV distinct-count estimate for `key` over `df`: one row
    * `(k_used, kth_hash, est_distinct)`.
    *
    * Plan shape: hash → partial-distinct (map-side) → global distinct on the
    * 8-byte hash → TakeOrdered(k) → single-row aggregate. The only data that
    * ever crosses the wire is distinct 60-bit hashes, never raw keys.
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 (got $k)")
    val smallest = df.select(hash60(key).as("h")).where(col("h").isNotNull)
      .distinct()
      .orderBy("h")
      .limit(k)
    smallest.agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(
        col("n").as("k_used"),
        col("kth").as("kth_hash"),
        // exact when the distinct count never filled the sketch
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(Space) / col("kth").cast("double"), 6))
          .as("est_distinct"))
  }

  /** Per-group KMV distinct-count estimate — the GROUP BY form of
    * [[kmvDistinct]] (distinct users per day, distinct keys per shard…):
    * one row `(group, k_used, kth_hash, est_distinct)` per group.
    *
    * Plan shape: distinct on (group, hash) — map-side partial dedupe, the
    * wire carries distinct 8-byte hashes per group — then a per-group
    * window heap keeps the k smallest. Per-group state is bounded by k
    * everywhere; a skewed group costs its distinct-hash volume in the one
    * dedupe exchange, which AQE skew-splits.
    */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, key: Column,
                         k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 (got $k)")
    val hashes = df.select(col(groupCol), hash60(key).as("h"))
      .where(col("h").isNotNull).distinct()
    // two-level per-group top-k: a group's distinct hashes never sort in
    // one task (hashes are distinct per group, so "h" is a total order)
    graft.ops.ScaleOps.smallestKPerGroup(hashes, groupCol, Seq("h"), k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(
        col(groupCol),
        col("n").as("k_used"),
        col("kth").as("kth_hash"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(Space) / col("kth").cast("double"), 6))
          .as("est_distinct"))
  }

  /** KMV set algebra (Beyer et al. 2007, public paper): union, Jaccard,
    * and intersection ESTIMATES for two keyed datasets from one merged
    * sketch — the profiling pass that answers "how much do these two key
    * spaces overlap" (join selectivity, corpus overlap) without ever
    * shuffling the key spaces against each other.
    *
    * The k smallest distinct hashes of A∪B are a valid KMV sketch of the
    * union (hashing commutes with union); the fraction of those k present
    * in BOTH sides estimates Jaccard; intersection = jaccard · union.
    * One row: (k_used, union_est, jaccard_est, inter_est) — exact when
    * the union's distinct count never fills the sketch.
    *
    * Plan shape: two hash-distinct passes + TakeOrdered(k) + two
    * broadcast membership joins of a k-row table — raw keys never move.
    */
  def kmvSetStats(dfA: DataFrame, keyA: Column, dfB: DataFrame, keyB: Column,
                  k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 (got $k)")
    val ha = dfA.select(hash60(keyA).as("h")).where(col("h").isNotNull).distinct()
    val hb = dfB.select(hash60(keyB).as("h")).where(col("h").isNotNull).distinct()
    val merged = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    val flagged = merged
      .join(ha.withColumn("_ina", lit(true)), Seq("h"), "left")
      .join(hb.withColumn("_inb", lit(true)), Seq("h"), "left")
    flagged.agg(
        count(lit(1)).as("n"), max(col("h")).as("kth"),
        sum(when(col("_ina") && col("_inb"), 1L).otherwise(0L)).as("both"))
      .select(
        col("n").as("k_used"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Space) /
            col("kth").cast("double"), 6)).as("union_est"),
        round(col("both").cast("double") / col("n").cast("double"), 6)
          .as("jaccard_est"),
        when(col("n") < k, col("both").cast("double"))
          .otherwise(round((col("both").cast("double") / col("n").cast("double")) *
            (lit((k - 1).toDouble) * lit(Space) / col("kth").cast("double")), 6))
          .as("inter_est"))
  }

  /** The DuckDB SQL that replays [[kmvSetStats]] bit-for-bit. */
  def kmvSetStatsSql(tableA: String, keyAExpr: String,
                     tableB: String, keyBExpr: String, k: Int,
                     salt: String = "kmv"): String = {
    def hcte(t: String, e: String) =
      s"SELECT DISTINCT CAST(('0x' || substr(md5(CAST($e AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h FROM $t WHERE $e IS NOT NULL"
    s"""WITH ha AS (${hcte(tableA, keyAExpr)}),
       |hb AS (${hcte(tableB, keyBExpr)}),
       |m AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) u ORDER BY h LIMIT $k),
       |f AS (SELECT m.h,
       |             EXISTS (SELECT 1 FROM ha WHERE ha.h = m.h) AS ina,
       |             EXISTS (SELECT 1 FROM hb WHERE hb.h = m.h) AS inb
       |      FROM m)
       |SELECT CAST(count(*) AS BIGINT) AS k_used,
       |       CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |            ELSE round(${(k - 1).toDouble} * ${Space} / CAST(max(h) AS DOUBLE), 6) END AS union_est,
       |       round(CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS jaccard_est,
       |       CASE WHEN count(*) < $k THEN CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE)
       |            ELSE round((CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |                       * (${(k - 1).toDouble} * ${Space} / CAST(max(h) AS DOUBLE)), 6) END AS inter_est
       |FROM f""".stripMargin
  }

  /** The DuckDB SQL that replays [[kmvDistinctByGroup]] bit-for-bit. */
  def kmvDistinctByGroupSql(table: String, groupCol: String, keyExpr: String,
                            k: Int, salt: String = "kmv"): String =
    s"""WITH h AS (
       |  SELECT DISTINCT $groupCol, CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h
       |  FROM $table WHERE $keyExpr IS NOT NULL),
       |r AS (SELECT $groupCol, h, row_number() OVER (PARTITION BY $groupCol ORDER BY h) AS rn FROM h),
       |s AS (SELECT $groupCol, h FROM r WHERE rn <= $k)
       |SELECT $groupCol, CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
       |       CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |            ELSE round(${(k - 1).toDouble} * ${Space} / CAST(max(h) AS DOUBLE), 6)
       |       END AS est_distinct
       |FROM s GROUP BY $groupCol ORDER BY $groupCol""".stripMargin

  /** The DuckDB SQL that replays [[kmvDistinct]] bit-for-bit — kept beside
    * the Scala so the formulas cannot drift.
    */
  def kmvDistinctSql(table: String, keyExpr: String, k: Int,
                     salt: String = "kmv"): String =
    s"""WITH h AS (
       |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h
       |  FROM $table WHERE $keyExpr IS NOT NULL),
       |s AS (SELECT h FROM h ORDER BY h LIMIT $k)
       |SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash,
       |       CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |            ELSE round(${(k - 1).toDouble} * ${Space} / CAST(max(h) AS DOUBLE), 6)
       |       END AS est_distinct
       |FROM s""".stripMargin

  // ---- count-min sketch ---------------------------------------------------

  /** CMS row-`j` bucket of a key: md5(key:salt:j) mod width — the same
    * engine-portable hashing family as [[hash60]], one independent salt
    * per sketch row.
    */
  def cmsBucket(key: Column, j: Column, width: Int, salt: String): Column =
    pmod(conv(substring(md5(to_binary(
      concat(key.cast("string"), lit(s":$salt:"), j.cast("string")),
      lit("utf-8"))), 1, 15), 16, 10).cast("long"), lit(width.toLong))

  /** Count-min sketch build (Cormode & Muthukrishnan 2005): `depth` hash
    * rows × `width` buckets, materialized as a (j, bucket, cnt) table of
    * AT MOST depth·width rows regardless of input size — the
    * fixed-memory frequency summary (KMV covers distinct counts,
    * Misra-Gries exact heavy hitters; CMS answers ANY point frequency
    * with `est ≥ true ≤ true + N/width` one-sided error).
    *
    * Plan shape: the stream first collapses to (distinct key, weight) —
    * one map-side-combined agg — so the depth-fold explode and the md5
    * bucketing run over DISTINCT keys, not the raw stream (on a Zipfian
    * token stream that is orders of magnitude less hashing; the weighted
    * re-sum is exactly equal by commutativity). Shuffle volume is bounded
    * by min(distinct keys, depth·width) rows per partition, never the
    * corpus. Sketches MERGE by unioning the tables and re-summing
    * (spec-pinned), which is how partial sketches from independent data
    * slices combine at 100 TB.
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int,
               salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"cms: depth in [1,16], width >= 2 (got $depth x $width)")
    df.select(key.as("_k")).where(col("_k").isNotNull)
      .groupBy("_k").agg(count(lit(1)).as("_w"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"),
        col("_k"), col("_w"))
      .select(col("j"), cmsBucket(col("_k"), col("j"), width, salt).as("bucket"),
        col("_w"))
      .groupBy("j", "bucket").agg(sum("_w").as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsBuild]] sketch for each
    * distinct key in `queries`: est = min over rows j of
    * sketch[j][bucket_j(key)], 0 for never-seen keys (left join +
    * coalesce). The sketch is depth·width rows — broadcast side.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, key: Column,
                  depth: Int, width: Int, salt: String = "cms"): DataFrame = {
    val q = queries.select(key.as("qkey")).where(col("qkey").isNotNull).distinct()
      .select(col("qkey"), explode(sequence(lit(0), lit(depth - 1))).as("qj"))
      .select(col("qkey"), col("qj"),
        cmsBucket(col("qkey"), col("qj"), width, salt).as("qbucket"))
    q.join(broadcast(sketch),
        col("qj") === col("j") && col("qbucket") === col("bucket"), "left")
      .groupBy("qkey")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- hash-sample quantile sketch ---------------------------------------

  /** One-pass MERGEABLE approximate quantiles: keep the k rows whose
    * [[hash60]] of `keyCol` is smallest (a deterministic uniform
    * without-replacement sample — the bottom-k-by-hash trick KMV uses for
    * distinct counts, applied to rows), then read discrete quantiles off
    * the sample. The exact two-pass machinery
    * ([[graft.ops.WindowOps.exactQuantilesGlobal]]) re-scans the corpus
    * per query; this sketch is what a 100 TB profiling pass actually
    * keeps per shard: bottom-k sets merge by union → re-take-k, so
    * shard sketches combine losslessly into the corpus sketch (same
    * deterministic result as sketching the whole corpus directly —
    * spec-pinned).
    *
    * Plan shape: one codegen'd hash projection → TakeOrdered(k) (per-
    * partition k-heaps, driver merges k·P candidates) → quantile read
    * over ≤ k rows in one bounded task. Estimates use the same lower
    * discrete quantile rule as the exact op (cume ≥ q, min value) — on a
    * sample that fills under k the estimate IS exact.
    *
    * Output: (q, est_value, sample_n), one row per requested quantile.
    */
  def quantileSketch(df: DataFrame, keyCol: Column, valueCol: Column,
                     k: Int, qs: Seq[Double],
                     salt: String = "qsk"): DataFrame = {
    require(k >= 8, s"quantileSketch needs k >= 8 (got $k)")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val sample = df
      .select(hash60(keyCol, salt).as("h"), valueCol.cast("double").as("v"))
      .where(col("h").isNotNull && col("v").isNotNull)
      .orderBy(col("h"), col("v")).limit(k)
    // the sample is ≤ k rows by construction — a single-task window over
    // it is bounded state, not a scale hazard
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val cum = sample.select(col("v"), cume_dist().over(w).as("cd"),
      count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))).as("sample_n"))
    cum.select(explode(typedLit(qs.sorted)).as("q"), col("v"), col("cd"),
        col("sample_n"))
      .filter(col("cd") >= col("q"))
      .groupBy("q").agg(min(col("v")).as("est_value"),
        first(col("sample_n")).as("sample_n"))
      .orderBy("q")
  }

  /** The DuckDB SQL replaying [[quantileSketch]] bit-for-bit. */
  def quantileSketchSql(table: String, keyExpr: String, valueExpr: String,
                        k: Int, qs: Seq[Double],
                        salt: String = "qsk"): String = {
    val qList = qs.sorted.map(q => s"($q)").mkString(", ")
    s"""WITH s AS (
       |  SELECT CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h,
       |         CAST($valueExpr AS DOUBLE) AS v
       |  FROM $table
       |  WHERE $keyExpr IS NOT NULL AND $valueExpr IS NOT NULL
       |  ORDER BY h, v LIMIT $k),
       |c AS (SELECT v, cume_dist() OVER (ORDER BY v) AS cd,
       |             (SELECT CAST(count(*) AS BIGINT) FROM s) AS sample_n
       |      FROM s),
       |qv AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $qList) AS t(q))
       |SELECT q, min(v) AS est_value, CAST(min(sample_n) AS BIGINT) AS sample_n
       |FROM qv JOIN c ON c.cd >= qv.q
       |GROUP BY q ORDER BY q""".stripMargin
  }

  /** The GROUP BY form of [[quantileSketch]] — per-group bottom-k hash
    * samples (the two-level [[graft.ops.ScaleOps.smallestKPerGroup]]
    * heap, so no group's rows ever sort in one task) and per-group
    * discrete quantile reads over ≤ k sampled rows. The per-source /
    * per-language distribution profile a 100 TB pipeline keeps as one
    * k-row sketch per group. Output: (group, q, est_value, sample_n).
    */
  def quantileSketchByGroup(df: DataFrame, groupCol: String, keyCol: Column,
                            valueCol: Column, k: Int, qs: Seq[Double],
                            salt: String = "qsk"): DataFrame = {
    require(k >= 8, s"quantileSketchByGroup needs k >= 8 (got $k)")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1]: $qs")
    val rows = df.select(col(groupCol).as("g"), hash60(keyCol, salt).as("h"),
        valueCol.cast("double").as("v"))
      .where(col("h").isNotNull && col("v").isNotNull)
    val sample = graft.ops.ScaleOps.smallestKPerGroup(rows, "g", Seq("h", "v"), k)
    val w = org.apache.spark.sql.expressions.Window
    val cum = sample.select(col("g"), col("v"),
      cume_dist().over(w.partitionBy("g").orderBy(col("v"))).as("cd"),
      count(lit(1)).over(w.partitionBy("g")).as("sample_n"))
    cum.select(col("g"), explode(typedLit(qs.sorted)).as("q"), col("v"),
        col("cd"), col("sample_n"))
      .filter(col("cd") >= col("q"))
      .groupBy("g", "q").agg(min(col("v")).as("est_value"),
        first(col("sample_n")).as("sample_n"))
      .select(col("g").as(groupCol), col("q"), col("est_value"),
        col("sample_n"))
  }

  /** The DuckDB SQL replaying [[quantileSketchByGroup]] bit-for-bit. */
  def quantileSketchByGroupSql(table: String, groupExpr: String,
                               keyExpr: String, valueExpr: String,
                               k: Int, qs: Seq[Double],
                               salt: String = "qsk"): String = {
    val qList = qs.sorted.map(q => s"($q)").mkString(", ")
    s"""WITH s0 AS (
       |  SELECT $groupExpr AS g,
       |         CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h,
       |         CAST($valueExpr AS DOUBLE) AS v
       |  FROM $table
       |  WHERE $keyExpr IS NOT NULL AND $valueExpr IS NOT NULL),
       |s AS (SELECT g, v FROM (
       |        SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
       |        FROM s0) WHERE rn <= $k),
       |c AS (SELECT g, v, cume_dist() OVER (PARTITION BY g ORDER BY v) AS cd,
       |             count(*) OVER (PARTITION BY g) AS sample_n
       |      FROM s),
       |qv AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $qList) AS t(q))
       |SELECT g AS $groupExpr, q, min(v) AS est_value,
       |       CAST(min(sample_n) AS BIGINT) AS sample_n
       |FROM qv JOIN c ON c.cd >= qv.q
       |GROUP BY g, q ORDER BY g, q""".stripMargin
  }

  // ---- HyperLogLog ---------------------------------------------------------

  /** HLL geometry over the 60-bit [[hash60]] space: the top `HllBucketBits`
    * bits pick the register, the remaining [[HllValueBits]] bits feed the
    * leading-zero rank. Rank ∈ [1, HllMaxRank]; an EMPTY register is rank 0.
    */
  private[graft] val HllBucketBits = 8
  private[graft] val HllM = 1 << HllBucketBits                  // 256 registers
  private[graft] val HllValueBits = 60 - HllBucketBits          // 52 rank bits
  private[graft] val HllMaxRank = HllValueBits + 1              // 53
  private[graft] val HllValueMask = (1L << HllValueBits) - 1    // 2^52 - 1
  // Σ 2^(-M_j) is accumulated as the EXACT integer Σ 2^(HllMaxRank - M_j)
  // (empty register → 2^HllMaxRank): max 256 · 2^53 = 2^61 < 2^63, so the
  // register sum is order-independent int64 arithmetic in any engine.
  private[graft] val HllZeroWeight = 1L << HllMaxRank           // 2^53
  /** α_m · m² · 2^HllMaxRank pre-folded to ONE double literal so both
    * renderings perform the identical single division (E = AlphaNum / S).
    */
  private[graft] val HllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * HllZeroWeight.toDouble
  private[graft] val HllSmallRange: Double = 2.5 * HllM

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007) — the
    * fixed-256-register dual of [[kmvDistinct]]: registers merge by MAX, so
    * shard sketches combine into the corpus sketch losslessly (spec-pinned),
    * and per-key state is 256 bytes no matter the cardinality — the sketch a
    * streaming leg can hold per group forever.
    *
    * Engine-portable by construction, unlike library HLLs (Spark's
    * `approx_count_distinct` register layout is implementation-private):
    * register = top 8 bits of the md5-derived [[hash60]], rank = leading
    * zeros of the remaining 52 bits + 1 (`53 - length(bin(v))` — `bin` has
    * identical no-leading-zeros semantics in Spark and DuckDB), and the
    * harmonic sum is EXACT int64 arithmetic (Σ 2^(53−M_j)), so the estimate
    * replays bit-for-bit in ANSI SQL. Small-range (≤ 2.5m with empty
    * registers) uses linear counting m·ln(m/V); the 60-bit space makes the
    * large-range correction unreachable.
    *
    * Plan shape: hash projection → partial max per (register) — map-side
    * combine bounds every exchange at m rows per partition → 256-row final
    * agg. Raw keys never move. Output: one row (zero_regs, est).
    */
  def hllDistinct(df: DataFrame, key: Column, salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, key, salt).agg(
      count(lit(1)).as("filled"),
      // variable-amount shift needs the SQL form (the Scala shiftleft API
      // takes a static Int); coalesce covers the empty-input aggregate,
      // where linear counting correctly reads est = m·ln(m/m) = 0
      coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllMaxRank - reg)")),
        lit(0L)).as("wsum")))

  /** The (register, rank) table of [[hllDistinct]] — exposed so merge
    * contracts can be spec-pinned: registers of a union = per-register MAX
    * of the parts' registers.
    */
  def hllRegisters(df: DataFrame, key: Column, salt: String = "hll"): DataFrame = {
    val h = hash60(key, salt)
    df.select(h.as("h")).where(col("h").isNotNull)
      .select(shiftright(col("h"), HllValueBits).as("bucket"),
        col("h").bitwiseAND(lit(HllValueMask)).as("v"))
      .select(col("bucket"),
        when(col("v") === 0L, lit(HllMaxRank))
          .otherwise(lit(HllMaxRank) - length(bin(col("v")))).as("rank"))
      .groupBy("bucket").agg(max("rank").as("reg"))
  }

  /** Estimate from a 1-row (filled, wsum) register summary: raw harmonic
    * estimate with the linear-counting small-range branch.
    */
  private def hllEstimate(summary: DataFrame): DataFrame =
    summary.select(
        (lit(HllM.toLong) - col("filled")).as("zero_regs"),
        (lit(HllAlphaNum) /
          (col("wsum") + (lit(HllM.toLong) - col("filled")) * lit(HllZeroWeight))
            .cast("double")).as("raw"))
      .select(col("zero_regs"),
        round(when(col("raw") <= HllSmallRange && col("zero_regs") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zero_regs").cast("double")))
          .otherwise(col("raw")), 6).as("est"))

  /** Per-group [[hllDistinct]] — one 256-register sketch per group, the
    * distinct-users-per-source profile at fixed memory. Both aggregation
    * levels map-side combine (per-(group, register) max, then a ≤256-row
    * integer sum per group); a skewed group still only ever exchanges 256
    * rows. Output: (group, zero_regs, est).
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String, key: Column,
                         salt: String = "hll"): DataFrame = {
    val h = hash60(key, salt)
    val regs = df.select(col(groupCol), h.as("h")).where(col("h").isNotNull)
      .select(col(groupCol), shiftright(col("h"), HllValueBits).as("bucket"),
        col("h").bitwiseAND(lit(HllValueMask)).as("v"))
      .select(col(groupCol), col("bucket"),
        when(col("v") === 0L, lit(HllMaxRank))
          .otherwise(lit(HllMaxRank) - length(bin(col("v")))).as("rank"))
      .groupBy(groupCol, "bucket").agg(max("rank").as("reg"))
    regs.groupBy(groupCol).agg(
        count(lit(1)).as("filled"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllMaxRank - reg)")),
          lit(0L)).as("wsum"))
      .select(col(groupCol),
        (lit(HllM.toLong) - col("filled")).as("zero_regs"),
        (lit(HllAlphaNum) /
          (col("wsum") + (lit(HllM.toLong) - col("filled")) * lit(HllZeroWeight))
            .cast("double")).as("raw"))
      .select(col(groupCol), col("zero_regs"),
        round(when(col("raw") <= HllSmallRange && col("zero_regs") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zero_regs").cast("double")))
          .otherwise(col("raw")), 6).as("est"))
  }

  /** The shared DuckDB CTE bodies replaying the register build + estimate —
    * kept beside the Scala so the geometry cannot drift.
    */
  private def hllRegSql(table: String, keyExpr: String, salt: String,
                        groupSel: String, groupBy: String): String =
    s"""r0 AS (
       |  SELECT $groupSel CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 15)) AS BIGINT) AS h
       |  FROM $table WHERE $keyExpr IS NOT NULL),
       |r1 AS (SELECT $groupSel (h >> $HllValueBits) AS bucket, (h & $HllValueMask) AS v FROM r0),
       |r AS (SELECT $groupSel bucket,
       |             max(CASE WHEN v = 0 THEN $HllMaxRank ELSE $HllMaxRank - length(bin(v)) END) AS reg
       |      FROM r1 GROUP BY ${groupBy}bucket),
       |s AS (SELECT $groupSel CAST(count(*) AS BIGINT) AS filled,
       |             CAST(coalesce(sum(1::BIGINT << ($HllMaxRank - reg)), 0) AS BIGINT) AS wsum
       |      FROM r ${if (groupBy.isEmpty) "" else s"GROUP BY ${groupBy.stripSuffix(", ")}"}),
       |e AS (SELECT $groupSel CAST($HllM - filled AS BIGINT) AS zero_regs,
       |             $HllAlphaNum / CAST(wsum + ($HllM - filled) * $HllZeroWeight AS DOUBLE) AS raw
       |      FROM s)""".stripMargin

  private def hllEstSql: String =
    s"""round(CASE WHEN raw <= $HllSmallRange AND zero_regs > 0
       |           THEN ${HllM.toDouble} * ln(${HllM.toDouble} / CAST(zero_regs AS DOUBLE))
       |           ELSE raw END, 6)""".stripMargin.replace("\n", " ")

  /** The DuckDB SQL replaying [[hllDistinct]] bit-for-bit. */
  def hllDistinctSql(table: String, keyExpr: String,
                     salt: String = "hll"): String =
    s"""WITH ${hllRegSql(table, keyExpr, salt, "", "")}
       |SELECT zero_regs, $hllEstSql AS est FROM e""".stripMargin

  /** The DuckDB SQL replaying [[hllDistinctByGroup]] bit-for-bit. */
  def hllDistinctByGroupSql(table: String, groupCol: String, keyExpr: String,
                            salt: String = "hll"): String =
    s"""WITH ${hllRegSql(table, keyExpr, salt, s"$groupCol,", s"$groupCol, ")}
       |SELECT $groupCol, zero_regs, $hllEstSql AS est FROM e
       |ORDER BY $groupCol""".stripMargin

  /** The DuckDB SQL replaying [[cmsBuild]] + [[cmsEstimate]] bit-for-bit
    * over `table`'s `keyExpr` values, estimating for `queryCte` (a CTE
    * body yielding one column `qkey`).
    */
  def cmsEstimateSql(table: String, keyExpr: String, queryCte: String,
                     depth: Int, width: Int, salt: String = "cms"): String = {
    def bucket(e: String) =
      s"CAST(('0x' || substr(md5(CAST($e AS VARCHAR) || ':$salt:' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % $width"
    s"""WITH ks AS (SELECT $keyExpr AS k FROM $table WHERE $keyExpr IS NOT NULL),
       |js AS (SELECT unnest(range($depth)) AS j),
       |sk AS (SELECT j, ${bucket("k")} AS bucket, CAST(count(*) AS BIGINT) AS cnt
       |       FROM ks CROSS JOIN js GROUP BY 1, 2),
       |qs AS (SELECT DISTINCT qkey FROM ($queryCte)),
       |qb AS (SELECT qkey, j, ${bucket("qkey")} AS bucket FROM qs CROSS JOIN js)
       |SELECT qb.qkey AS qkey, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est
       |FROM qb LEFT JOIN sk ON qb.j = sk.j AND qb.bucket = sk.bucket
       |GROUP BY qb.qkey""".stripMargin
  }
}
