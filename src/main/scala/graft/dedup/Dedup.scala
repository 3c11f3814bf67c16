package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard (with lossless prefix filtering), and
  * embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB contract):
  *  - exact dedup = one shuffle on a 16-byte digest, never on raw text;
  *  - n-gram Jaccard uses PREFIX FILTERING (PPJoin-style): candidates are
  *    generated only from each document's rarest `|A| - ceil(tau*|A|) + 1`
  *    tokens, which is lossless for threshold tau but shrinks the
  *    inverted-index join by orders of magnitude and avoids the
  *    stop-word-key skew explosion;
  *  - MinHash/LSH replaces the O(n²) similarity join with a band-bucket
  *    equi-join: shuffle keys are (band, bandHash), candidate volume is
  *    ~ sum of bucket² instead of n²;
  *  - all hashing is md5-based (deterministic, engine-portable — the DuckDB
  *    oracles reproduce signatures bit-for-bit).
  */
object Dedup {

  /** Exact duplicates by normalized-content digest: representative = min id,
    * plus group size. Output one row per distinct content.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, token) pairs. */
  def tokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokensArr(col(textCol))).as("tok"))
      .distinct()

  /** All pairs (a < b) whose token-set Jaccard >= tau. Same result as the
    * naive all-pairs spec (the DuckDB oracle), via a three-stage scale plan:
    *
    *  1. COLLAPSE identical token sets (exact-dedup before near-dedup, the
    *     standard training-pipeline move): Jaccard depends only on the token
    *     set, so documents with equal sets — the bulk of real dup clusters —
    *     reduce to one representative each. A cluster of m copies costs 1
    *     unit of similarity work instead of m²/2.
    *  2. PPJOIN over the unique sets: candidates come only from each set's
    *     rarest `|A| - ceil(tau*|A|) + 1` tokens (prefix filter), kept only
    *     if sizes are within ratio tau (length filter: J>=tau ⇒
    *     min >= tau*max) and the matching token's positions leave enough
    *     room for the required overlap (positional filter:
    *     1 + min(|A|-i, |B|-j) >= ceil(tau/(1+tau)*(|A|+|B|))). All three
    *     are lossless for threshold tau.
    *  3. VERIFY candidates by sorted-array intersection on the carried
    *     per-set arrays (bounded by document length), then EXPAND
    *     qualifying group pairs back to document pairs: cross pairs between
    *     the two clusters, plus all intra-cluster pairs (Jaccard exactly 1).
    *
    * Plan economy: the rarest-first order is computed ONCE as a sorted
    * array per document (one aggregation - no per-group window sort), the
    * prefix is a slice + posexplode (no extra shuffle), and the set arrays
    * ride the same rows from grouping to verification (no re-join against
    * the token table).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   tau: Double): DataFrame = {
    val toks = tokenSet(df, idCol, textCol)
    // global token frequency - corpus-small, Catalyst broadcasts the join
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    // 1. one row per doc: tokens sorted rarest-first ((tf, tok) asc) +
    //    canonical set id
    val docs = toks.join(freq, "tok")
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("tf"), col("tok")))),
        x => x("tok")).as("ordered"))
      .withColumn("gid",
        md5(to_binary(concat_ws("\u0001", col("ordered")), lit("utf-8"))))
      .cache()
    val members = docs.select("id", "gid")
    val gsets = docs.groupBy("gid").agg(first(col("ordered")).as("ordered"))
      .withColumn("sz", size(col("ordered")))
      .cache()
    // 2. PPJoin: prefix = the sz - ceil(tau*sz) + 1 rarest tokens
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = gsets
      .select(col("gid"), col("sz"),
        posexplode(slice(col("ordered"), lit(1), prefLen)))
      .select(col("gid"), col("sz"), (col("pos") + 1).as("r"), col("col").as("tok"))
    val minOverlap = ceil(lit(tau) / (1 + tau) * (col("x.sz") + col("y.sz")))
    val gcands = pref.as("x").join(pref.as("y"),
        col("x.tok") === col("y.tok") && col("x.gid") < col("y.gid") &&
          least(col("x.sz"), col("y.sz")) >= ceil(lit(tau) * greatest(col("x.sz"), col("y.sz"))) &&
          lit(1) + least(col("x.sz") - col("x.r"), col("y.sz") - col("y.r")) >= minOverlap)
      .select(col("x.gid").as("ga"), col("y.gid").as("gb"))
      .distinct()
    // 3. verify on the carried sorted arrays
    val qual = gcands
      .join(gsets.select(col("gid").as("ga"), col("ordered").as("seta"),
        col("sz").as("sza")), "ga")
      .join(gsets.select(col("gid").as("gb"), col("ordered").as("setb"),
        col("sz").as("szb")), "gb")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))).cast("double"))
      .withColumn("jac", col("i") / (col("sza") + col("szb") - col("i")))
      .filter(col("jac") >= tau)
      .select(col("ga"), col("gb"), col("jac"))
    // expand group pairs to doc pairs; intra-cluster pairs have Jaccard 1
    val cross = qual
      .join(members.as("ma"), col("ga") === col("ma.gid"))
      .join(members.as("mb"), col("gb") === col("mb.gid"))
      .select(least(col("ma.id"), col("mb.id")).as("a"),
        greatest(col("ma.id"), col("mb.id")).as("b"), col("jac"))
    val intra = members.as("ma").join(members.as("mb"),
        col("ma.gid") === col("mb.gid") && col("ma.id") < col("mb.id"))
      .select(col("ma.id").as("a"), col("mb.id").as("b"), lit(1.0).as("jac"))
    cross.unionByName(intra)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jaccard"))
  }

  /** Word n-gram shingles per document (distinct). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("shingle"))
      .distinct()

  /** All minhashes in ONE aggregation: column `mh<s>` = min over shingles
    * of md5(s':'shingle). One wide groupBy instead of a numHashes×
    * row-explosion + (id,seed) shuffle — same signatures, 1/numHashes the
    * shuffle volume (the plan-shape that survives a 100× scale-up).
    */
  private def minhashWide(sh: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map { s =>
      min(md5(to_binary(concat(lit(s.toString), lit(":"), col("shingle")),
        lit("utf-8")))).as(s"mh$s")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: near-dup candidate pairs (a < b) that share at
    * least one band, verified by exact shingle-set Jaccard >= tau.
    * numHashes = bands * rowsPerBand.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                      tau: Double = 0.7): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleN).cache()
    val mh = minhashWide(sh, bands * rowsPerBand)
    // band hash = md5 of the band's minhashes joined in seed order — the
    // same bytes the per-seed formulation produced (oracle-compatible)
    val bandHash = mh.select(col("id"), posexplode(array((0 until bands).map { b =>
        md5(to_binary(array_join(array(
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*),
          ","), lit("utf-8")))
      }: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))
    val cands = bandHash.as("x").join(bandHash.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sets = sh.groupBy("id").agg(collect_set(col("shingle")).as("set"))
    cands
      .join(sets.as("sa"), col("a") === col("sa.id"))
      .join(sets.as("sb"), col("b") === col("sb.id"))
      .withColumn("inter", size(array_intersect(col("sa.set"), col("sb.set"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sa.set")) + size(col("sb.set")) - col("inter")))
      .filter(col("jac") >= tau)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jaccard"))
  }

  /** 32-bit SimHash over distinct tokens: bit j of the fingerprint is 1 iff
    * sum over tokens of ±1 (sign = bit j of md5-derived 32-bit token hash)
    * is positive.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokenSet(df, idCol, textCol)
      .withColumn("h", conv(substring(md5(to_binary(col("tok"), lit("utf-8"))), 1, 8), 16, 10)
        .cast("long"))
    toks
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(31))).as("j"))
      .withColumn("sign", when(expr("shiftright(h, j) % 2") === 1, 1).otherwise(-1))
      .groupBy("id", "j")
      .agg(sum(col("sign")).as("s"))
      .groupBy("id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), cast(j as int))")).otherwise(0L)).as("simhash"))
  }
}
