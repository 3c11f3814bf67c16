package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
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
  *
  * Cache contract: the similarity builders cache intermediates that their
  * returned plan consumes more than once (token sets, doc arrays, wide
  * signatures). Those caches live until evicted; a long-lived session
  * running many pipelines should `spark.catalog.clearCache()` between
  * runs (same applies to [[graft.chain.PageRank]] / NaiveBayes).
  * The `storage` parameter picks the level: the default
  * (MEMORY_AND_DISK, `.cache()`'s level) fits fixture-to-TB scale; a
  * 100 TB caller whose wide shingle-set arrays would crowd executor
  * memory passes `Some(StorageLevel.DISK_ONLY)` — or `None` to skip
  * caching entirely and recompute (when the upstream scan is cheaper
  * than materializing the intermediate).
  */
object Dedup {

  /** Apply the caller-chosen storage level (see the cache contract above). */
  private def persistAt(df: DataFrame, storage: Option[StorageLevel]): DataFrame =
    storage.map(df.persist).getOrElse(df)

  /** Exact duplicates by normalized-content digest: representative = min id,
    * plus group size. Output one row per distinct content.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** LINE-grain boilerplate removal (the RefinedWeb / CCNet line-dedup
    * pass): drop every line that occurs verbatim in >= `minDocs`
    * DISTINCT documents — cookie banners, nav bars, footers — and
    * reassemble each document from its surviving lines in original
    * order. Exact line identity (no normalization beyond the split):
    * the op composes AFTER [[graft.ops.TextOps.normalizeText]], which
    * owns whitespace canonicalization.
    *
    * Shape at 100 TB: explode to (doc, pos, line) → one hash
    * aggregation on the line key (map-side combine collapses per-doc
    * repeats via the distinct-doc count) → anti-join lines against the
    * hot set → per-doc reassembly as ONE aggregation (sort_array of
    * (pos, line) structs inside the agg buffer, never a window). The
    * hot-line set is tiny (boilerplate is by definition few distinct
    * strings) — AQE broadcasts the anti-join probe side.
    *
    * Output: (id, n_lines, n_removed, text_clean) — per-doc accounting
    * plus the rebuilt text, docs with every line removed keep an empty
    * string (never dropped: the pipeline decides, not the op).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                minDocs: Int = 5): DataFrame = {
    require(minDocs >= 2, s"lineDedup: minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val hot = lines.groupBy("line")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("line")
    val kept = lines.join(hot, Seq("line"), "left_anti")
    reassembleLines(lines, kept)
  }

  /** Rebuild documents from surviving (id, pos, line) rows against the
    * full line table — the shared back half of [[lineDedup]] and the
    * streaming incremental form
    * ([[graft.streaming.Streams.lineDedupStream]]).
    */
  private[graft] def reassembleLines(lines: DataFrame,
                                     kept: DataFrame): DataFrame = {
    val counts = lines.groupBy("id").agg(count(lit(1)).as("n_lines"))
    kept.groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("text_clean"))
      .join(counts, Seq("id"), "right")
      .select(col("id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Distinct (id, token) pairs. Deduped PER ROW (array_distinct before
    * the explode) — zero shuffle, because a row's tokens live in that row.
    *
    * CONTRACT: one input row per document id (the document model
    * everywhere in this suite). A doc split across several rows would get
    * per-ROW dedupe only — pre-concatenate its text first.
    */
  def tokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // fanOut: tokenize+dedupe+explode is scan-side work — spread a
    // sub-core-count input before it (no-op at production widths)
    graft.ops.ScaleOps.fanOut(df).select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokensArr(col(textCol)))).as("tok"))

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
                   tau: Double,
                   storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    // 1. per-ROW canonical set + identity: sorted distinct token array and
    //    its md5 — zero shuffle. The collapse to unique sets happens BEFORE
    //    any corpus-wide aggregation, so the frequency/ordering work below
    //    runs over unique sets only, and the one full-corpus shuffle is the
    //    groupBy(gid) of small per-doc arrays (the old shape first shuffled
    //    every exploded (id, token) pair through a distinct).
    val docArr = df.select(col(idCol).as("id"),
        array_sort(array_distinct(TextAnalysis.tokensArr(col(textCol)))).as("set"))
      // token-less docs (empty/null/punctuation-only text) have no Jaccard
      // similarity to anything — without this filter they'd all share the
      // empty-set gid and the intra expansion below would fabricate 1.0
      // pairs (the old exploded-token formulation dropped them implicitly)
      .filter(size(col("set")) > 0)
      .withColumn("gid",
        md5(to_binary(concat_ws("\u0001", col("set")), lit("utf-8"))))
    val docArrP = persistAt(docArr, storage)
    val members = docArrP.select("id", "gid")
    val usets = persistAt(
      docArrP.groupBy("gid").agg(first(col("set")).as("set")), storage)
    // global token order for the prefix filter: rarest-first by frequency
    // ACROSS UNIQUE SETS, tok tie-break. Any fixed total order is lossless
    // (verification is exact); set-frequency ≈ doc-frequency minus dup
    // clusters, and rarity across unique sets is the better selectivity
    // proxy anyway — a token frequent only inside one giant dup cluster is
    // still a rare (selective) prefix token across unique sets.
    val freq = usets.select(explode(col("set")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val gsets = usets.select(col("gid"), explode(col("set")).as("tok"))
      .join(freq, "tok")
      .groupBy("gid")
      .agg(transform(array_sort(collect_list(struct(col("tf"), col("tok")))),
        x => x("tok")).as("ordered"))
      .withColumn("sz", size(col("ordered")))
    val gsetsP = persistAt(gsets, storage)
    // 2. PPJoin: prefix = the sz - ceil(tau*sz) + 1 rarest tokens
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = gsetsP
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
      .join(gsetsP.select(col("gid").as("ga"), col("ordered").as("seta"),
        col("sz").as("sza")), "ga")
      .join(gsetsP.select(col("gid").as("gb"), col("ordered").as("setb"),
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

  /** PPJoin candidate-volume profile — run BEFORE committing a corpus to
    * [[jaccardPairs]]: the prefix-index equi-join generates
    * Σ_token C(prefix_count, 2) candidate pairs, which is ~n²/|vocab| on a
    * dense/templated corpus (fixed vocabulary) and ~n on Zipfian text
    * (measured: exponent 1.99 vs 0.94 for minhash on the dense synthetic —
    * BENCH_NOTES round 5). One row: (n_docs, n_unique_sets,
    * n_prefix_entries, est_candidates). Decision rule: est_candidates
    * within a small multiple of the expected output → [[jaccardPairs]];
    * orders of magnitude above → [[minhashLshPairs]], whose candidates are
    * band-collision-bounded.
    *
    * The estimate is a deliberate UPPER bound: it slices the lexicographic
    * prefix (the real join uses the rarest-first order, which is never
    * worse) and counts a pair once per shared prefix token. Upper is the
    * safe direction for a go/no-go profiler.
    */
  def jaccardCandidateProfile(df: DataFrame, idCol: String, textCol: String,
                              tau: Double): DataFrame = {
    val docArr = df.select(col(idCol).as("id"),
        array_sort(array_distinct(TextAnalysis.tokensArr(col(textCol)))).as("set"))
      .filter(size(col("set")) > 0)
      .withColumn("gid",
        md5(to_binary(concat_ws("\u0001", col("set")), lit("utf-8"))))
    val usets = docArr.groupBy("gid").agg(first(col("set")).as("set"))
      .withColumn("sz", size(col("set")))
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = usets.select(explode(slice(col("set"), lit(1), prefLen)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    docArr.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gid")).as("n_unique_sets"))
      .crossJoin(pref.agg(
        sum(col("c")).as("n_prefix_entries"),
        // c(c-1) is even — integral `div` keeps the halved product exact
        // past 2^53, where double `/` would silently round (the dense
        // hot-key regime this profiler exists to detect)
        sum(expr("c * (c - 1) div 2")).as("est_candidates")))
  }

  /** Which engine [[jaccardPairsAuto]] would pick: "ppjoin" when the
    * profiled candidate volume stays within `maxCandidateRatio` × the
    * unique-set count, else "minhash". Exposed so callers (and specs) can
    * observe the routing decision without running the join.
    *
    * The bound is candidates-per-unique-set, not absolute: PPJoin's healthy
    * regime is candidates ≈ output ≈ O(n) (Zipfian text, measured exponent
    * ~1.0); the dense/templated failure mode is candidates ~ n²/|vocab|
    * (measured exponent 1.99), which crosses any fixed per-set ratio as n
    * grows — exactly the property a go/no-go gate needs.
    */
  def jaccardRoute(df: DataFrame, idCol: String, textCol: String, tau: Double,
                   maxCandidateRatio: Double = 32.0): String = {
    val p = jaccardCandidateProfile(df, idCol, textCol, tau).head()
    val nSets = p.getAs[Long]("n_unique_sets")
    val est = p.getAs[Long]("est_candidates")
    if (est <= maxCandidateRatio * math.max(1L, nSets)) "ppjoin" else "minhash"
  }

  /** Profiler-routed Jaccard near-dup join — the round-5 probe's decision
    * rule, automated: run [[jaccardCandidateProfile]] (one cheap
    * aggregation pass), then route to [[jaccardPairs]] (exact, lossless
    * PPJoin) when the candidate estimate is healthy, or fall back to
    * [[minhashLshPairs]] (band-collision-bounded, recall < 1) when the
    * corpus is in PPJoin's dense-vocabulary blow-up regime. Same output
    * schema either way: (a, b, jaccard).
    *
    * The two engines' PAIR SETS differ by contract (minhash misses pairs
    * no band catches) — the router trades that recall for a candidate
    * volume that cannot explode. Callers that need exact recall at any
    * cost should call [[jaccardPairs]] directly.
    */
  def jaccardPairsAuto(df: DataFrame, idCol: String, textCol: String,
                       tau: Double, maxCandidateRatio: Double = 32.0,
                       shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                       storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame =
    jaccardRoute(df, idCol, textCol, tau, maxCandidateRatio) match {
      case "ppjoin" => jaccardPairs(df, idCol, textCol, tau, storage)
      case _ => minhashLshPairs(df, idCol, textCol, shingleN, bands,
        rowsPerBand, tau, storage)
    }

  /** Word n-gram shingles per document (distinct) — per-row dedupe, same
    * zero-shuffle rationale AND one-row-per-doc contract as [[tokenSet]].
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // fanOut: the shingle explode + the md5 minhash work above it are
    // scan-side — spread a sub-core-count input first (no-op at scale)
    graft.ops.ScaleOps.fanOut(df)
      .select(col(idCol).as("id"), TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"),
        explode(array_distinct(TextAnalysis.ngramsArr(col("toks"), n))).as("shingle"))

  /** All minhashes AND the verification shingle set in ONE aggregation:
    * column `mh<s>` = min over shingles of hash_s(shingle), plus the
    * per-doc shingle set carried alongside. One wide groupBy instead of a
    * numHashes× row-explosion + a second sets-groupBy over the same shingle
    * table — same signatures, one shuffle of the shingle corpus instead of
    * two (the plan-shape that survives a 100× scale-up).
    *
    * Hash family: hash_s = 8 hex chars `[(s%4)*8, +8)` of md5((s/4)':'
    * shingle) — ONE md5 digest feeds FOUR independent 32-bit minhash
    * components (the standard slice-a-wide-digest derivation), so the
    * per-shingle hash cost is numHashes/4 md5s, not numHashes. Fixed-width
    * hex min = numeric min (order-isomorphic); deterministic and
    * engine-portable (the DuckDB oracle replicates the slicing
    * bit-for-bit).
    */
  private def minhashWide(sh: DataFrame, numHashes: Int): DataFrame = {
    val groups = (numHashes + 3) / 4
    val withDigests = sh.select(
      Seq(col("id"), col("shingle")) ++ (0 until groups).map { g =>
        md5(to_binary(concat(lit(g.toString), lit(":"), col("shingle")),
          lit("utf-8"))).as(s"_d$g")
      }: _*)
    val aggs = (0 until numHashes).map { s =>
      min(substring(col(s"_d${s / 4}"), (s % 4) * 8 + 1, 8)).as(s"mh$s")
    } :+ collect_set(col("shingle")).as("set")
    withDigests.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, bandHash) rows from a [[minhashWide]] signature table: band
    * hash = md5 of the band's minhashes joined in seed order — the same
    * bytes the per-seed formulation produced (oracle-compatible).
    */
  private def bandHashes(mh: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    mh.select(col("id"), posexplode(array((0 until bands).map { b =>
        md5(to_binary(array_join(array(
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*),
          ","), lit("utf-8")))
      }: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))

  /** MinHash + LSH banding: near-dup candidate pairs (a < b) that share at
    * least one band, verified by exact shingle-set Jaccard >= tau.
    * numHashes = bands * rowsPerBand.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                      tau: Double = 0.7,
                      storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    val mh = persistAt(minhashWide(shingles(df, idCol, textCol, shingleN),
      bands * rowsPerBand), storage)
    val bandHash = bandHashes(mh, bands, rowsPerBand)
    val cands = bandHash.as("x").join(bandHash.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sets = mh.select(col("id"), col("set"))
    cands
      .join(sets.as("sa"), col("a") === col("sa.id"))
      .join(sets.as("sb"), col("b") === col("sb.id"))
      .withColumn("inter", size(array_intersect(col("sa.set"), col("sb.set"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sa.set")) + size(col("sb.set")) - col("inter")))
      .filter(col("jac") >= tau)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jaccard"))
  }

  /** SCOPE-LOCAL near-dup pairs — LSH banding with a scope column (the
    * registrable domain from [[graft.ops.UrlOps.registrableDomain]], or
    * a source/publisher label) IN the bucket join key, so dedup runs
    * within each scope only. The standard 100 TB cost lever: most real
    * duplication is intra-site (templates, reposts, mirrors of the same
    * publisher), the scoped join's buckets shrink by the scope fan-out,
    * and cross-site boilerplate is the LINE-dedup pass's job
    * ([[lineDedup]]) — a global near-dup sweep stays an occasional
    * sampled audit. Semantics: exactly [[minhashLshPairs]] restricted
    * to same-scope pairs (the oracle replays it as the same closure
    * with the scope equality in the candidate join).
    */
  def minhashLshPairsScoped(df: DataFrame, idCol: String, textCol: String,
                            scopeCol: String,
                            shingleN: Int = 3, bands: Int = 4,
                            rowsPerBand: Int = 4, tau: Double = 0.7,
                            storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    val mh = persistAt(minhashWide(shingles(df, idCol, textCol, shingleN),
      bands * rowsPerBand), storage)
    // keep the ORIGINAL id type: a long cast here silently nulls string
    // ids, empties the scope join, and turns the dedup into a no-op
    val scope = df.select(col(idCol).as("id"),
      col(scopeCol).cast("string").as("_sc"))
    val bandHash = bandHashes(mh, bands, rowsPerBand).join(scope, "id")
    val cands = bandHash.as("x").join(bandHash.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x._sc") === col("y._sc") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sets = mh.select(col("id"), col("set"))
    cands
      .join(sets.as("sa"), col("a") === col("sa.id"))
      .join(sets.as("sb"), col("b") === col("sb.id"))
      .withColumn("inter", size(array_intersect(col("sa.set"), col("sb.set"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sa.set")) + size(col("sb.set")) - col("inter")))
      .filter(col("jac") >= tau)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jaccard"))
  }

  /** (id, band, bandHash, set) rows for an incoming document batch — the
    * per-batch half of the STREAMING near-dup pipeline ([[graft.streaming
    * .Streams.dedupStreamMinhash]] drives it): band hashes for the LSH
    * lookup against the accumulated index, the shingle set for exact
    * verification of collisions.
    */
  private[graft] def bandTable(df: DataFrame, idCol: String, textCol: String,
                               shingleN: Int, bands: Int,
                               rowsPerBand: Int): DataFrame = {
    val mh = minhashWide(shingles(df, idCol, textCol, shingleN),
      bands * rowsPerBand)
    bandHashes(mh, bands, rowsPerBand)
      .join(mh.select(col("id"), col("set")), "id")
  }

  /** Cross-corpus fuzzy decontamination — the doc-level MinHash pass run
    * between a training corpus and an evaluation set before pretraining
    * (the complement of [[graft.ops.TextOps.contamination]]'s exact n-gram
    * overlap): every train document is scored against the eval corpus by
    * LSH-banded MinHash, candidates verified by exact shingle-set Jaccard.
    *
    * Output one row PER TRAIN DOC (a report, not just the flagged subset):
    * `(doc_id, n_eval_matches, max_jaccard)` — max_jaccard is null for
    * unflagged docs, so the downstream cut is a simple filter.
    *
    * Shape at 100 TB: the eval side is benchmark-sized — its band table
    * broadcasts (AQE decides; a huge eval set degrades gracefully to a
    * shuffle equi-join on (band, bandHash)). The train corpus is touched by
    * exactly one shingle aggregation + one band join; candidate volume is
    * collision-bounded, never |train|×|eval|.
    */
  def crossCorpusContamination(train: DataFrame, eval: DataFrame,
                               idCol: String, textCol: String,
                               shingleN: Int = 2, bands: Int = 4,
                               rowsPerBand: Int = 4,
                               tau: Double = 0.7,
                               storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mhT = persistAt(
      minhashWide(shingles(train, idCol, textCol, shingleN), numHashes), storage)
    val mhE = persistAt(
      minhashWide(shingles(eval, idCol, textCol, shingleN), numHashes), storage)
    val cands = bandHashes(mhT, bands, rowsPerBand).as("x")
      .join(bandHashes(mhE, bands, rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.id").as("tid"), col("y.id").as("eid"))
      .distinct()
    val verified = cands
      .join(mhT.select(col("id").as("tid"), col("set").as("seta")), "tid")
      .join(mhE.select(col("id").as("eid"), col("set").as("setb")), "eid")
      .withColumn("inter", size(array_intersect(col("seta"), col("setb"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("seta")) + size(col("setb")) - col("inter")))
      .filter(col("jac") >= tau)
    train.select(col(idCol).as("doc_id"))
      .join(verified.groupBy("tid").agg(
          count(lit(1)).as("n_eval_matches"),
          round(max(col("jac")), 6).as("max_jaccard"))
        .withColumnRenamed("tid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        col("max_jaccard"))
  }

  /** Connected components over an undirected edge list `(a, b)` by min-label
    * propagation: each node's label converges to the smallest id reachable
    * from it. Rounds are bounded by the component DIAMETER, and near-dup
    * graphs are dense clusters with 2-3-hop diameters, so a handful of
    * rounds suffices even at 100 TB; each round is one groupBy(node)
    * shuffle + a broadcast-or-shuffle join that AQE sizes at runtime.
    * Lineage is truncated per round (localCheckpoint, the PageRank-chain
    * pattern) so plans stay flat across iterations. Throws if `maxIter`
    * rounds don't converge — an unstable labeling must never be returned.
    *
    * Output: (id, lbl) for every node that appears in an edge.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // No distinct() on the undirected expansion: min-label propagation is
    // multiset-safe (min over duplicate edges = min over the set), and the
    // groupBy below dedupes per key anyway — one less shuffle per build.
    val und0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    // Scale-adaptive edge-list width (round 17): the union checkpoint
    // inherits BOTH children's partitioning (the bench edge build left
    // 64-66 near-empty partitions), and every propagation round then
    // schedules that many tasks per stage — measured ~0.5 s/stage of
    // pure scheduling on a ~5k-row list. Derive the width from the
    // MATERIALIZED row count (~2M edge rows per task), floor 1, never
    // wider than it already is; coalesce on a checkpointed frame is a
    // narrow merge (no shuffle). A 100 TB edge list keeps its width.
    val parts = math.min(und0.rdd.getNumPartitions.toLong,
      und0.count() / 2000000L + 1L).toInt
    val und = if (parts < und0.rdd.getNumPartitions) und0.coalesce(parts)
      else und0
    // Init fused with round 1: label(id) = min(id, min neighbor id) in ONE
    // shuffle — the separate identity-label init plus a first propagation
    // round would spend two.
    // the label-state checkpoints get the same size-derived width: a
    // checkpoint materializes its plan's raw shuffle partitioning (AQE
    // coalescing does not apply to the checkpoint job), so without the
    // cap every round schedules shuffle-partition-count near-empty tasks
    var labels = und.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("lbl"))
      .withColumnRenamed("src", "id").coalesce(parts).localCheckpoint()
    var changed = 1L
    var i = 1
    while (changed > 0 && i < maxIter) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src").agg(min("lbl").as("nbr"))
        .withColumnRenamed("src", "id")
      // Lineage.truncate, not bare localCheckpoint: the round references
      // `labels` twice (nbrMin + the left join), so the size ESTIMATE the
      // checkpoint carries forward doubles its digit count per round — see
      // graftbridge.localCheckpointCappedStats for the measured blowup.
      val next = graft.core.Lineage.truncate(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"),
            (col("nbr") < col("lbl")).as("chg"))
          .coalesce(parts))
      changed = next.filter(col("chg")).count()
      labels = next.select("id", "lbl")
      i += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds — component diameter exceeds bound")
    labels
  }

  /** [[minhashLshPairs]]'s scale path for corpora with heavy EXACT
    * duplication (the common real shape: one boilerplate page repeated a
    * million times). The naive banding puts all m copies of a text in the
    * same (band, hash) bucket → m²/2 candidate pairs in one join — the
    * quadratic blowup no banding parameter can bound. Here exact
    * duplicates first collapse to their min-id representative (one
    * md5-keyed aggregation), LSH runs over REPRESENTATIVES only, and each
    * dup class re-attaches as a STAR (rep → member, jaccard 1, m−1 edges
    * — linear). The output is NOT the full pair list: it is an edge set
    * whose CONNECTED COMPONENTS equal the naive op's (identical text ⇒
    * identical shingle set ⇒ identical jaccard to every third doc, so
    * rep-level near-dup edges + class stars reproduce exactly the naive
    * clique connectivity) — which is the contract every downstream use
    * ([[canonicalize]], [[splitLeakageSafe]], dedup keep-one) actually
    * needs. Oracle-checked by feeding the edges into canonicalize and
    * matching the naive closure's labels.
    */
  def minhashLshEdges(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
                      tau: Double = 0.7): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("_text"))
    val classes = base.groupBy(md5(to_binary(col("_text"), lit("utf-8"))).as("_fp"))
      .agg(min(col("id")).as("rep"))
    val members = base
      .withColumn("_fp", md5(to_binary(col("_text"), lit("utf-8"))))
      .join(classes, "_fp")
    val repDocs = members.filter(col("id") === col("rep"))
      .select(col("id"), col("_text"))
    val repPairs = minhashLshPairs(repDocs, "id", "_text",
      shingleN, bands, rowsPerBand, tau)
    val stars = members.filter(col("id") =!= col("rep"))
      .select(col("rep").as("a"), col("id").as("b"), lit(1.0).as("jaccard"))
    repPairs.unionByName(stars)
  }

  /** Near-dup canonicalization — the "keep one doc per dup cluster" step of
    * a training-data pipeline: every document maps to the canonical
    * (smallest-id) member of its near-dup cluster; documents in no pair map
    * to themselves. `pairs` is any near-dup pair set ([[minhashLshPairs]],
    * [[jaccardPairs]], embedding near-dup — they all emit (a, b)).
    */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    docs.select(col(idCol).as("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("canon_id"))
  }

  /** Leakage-safe train/val/test split: every document is assigned the
    * split of its near-dup cluster's CANONICAL member, so near-duplicates
    * can never straddle a train/eval boundary (the standard guard against
    * eval contamination by duplication — splitting on raw doc ids leaks
    * whenever two near-identical docs hash into different buckets).
    *
    * Composition, not new machinery: [[canonicalize]] (pairs → connected
    * components → min-id canonical label) followed by
    * [[graft.ops.Sampling.splitByHash]] keyed on `canon_id` — the same
    * bit-portable md5 bucket assignment as a plain split, just on the
    * cluster representative. Output: (doc_id, canon_id, split).
    *
    * Scale shape: the split itself is a pure codegen'd projection (zero
    * shuffle beyond what the pair generation + CC already spent); cluster
    * diameter bounds CC rounds exactly as in [[connectedComponents]].
    */
  def splitLeakageSafe(docs: DataFrame, idCol: String, pairs: DataFrame,
                       weights: Seq[Double], salt: String = "graft"): DataFrame =
    graft.ops.Sampling.splitByHash(
      canonicalize(docs, idCol, pairs), col("canon_id"), weights, salt)

  /** Substring-level duplication profile — the window-hash approximation of
    * exact-substring dedup (Lee et al. 2021, arXiv:2107.06499: their
    * suffix-array pass is inherently single-machine; hashing every w-token
    * window is the standard distributable variant). A window POSITION is
    * duplicated iff its w-token text occurs in >= `minDocs` distinct
    * documents. Output per doc: total window positions, duplicated
    * positions, and the duplicated fraction — the signal a substring-dedup
    * cut filters on (docs below `w` tokens have no window and are omitted,
    * same contract as [[shingles]]).
    *
    * Scale shape: windows explode to ~n_tokens rows per doc, but every
    * corpus-wide movement is keyed on the 16-byte window HASH, never the
    * window text — one groupBy(wh) for document frequency plus one
    * equi-join back, both AQE-skewable. (A boilerplate window occurring in
    * millions of docs is precisely the hot key AQE skew-split handles.)
    */
  def substringDupStats(df: DataFrame, idCol: String, textCol: String,
                        w: Int, minDocs: Int = 2): DataFrame = {
    val wins = graft.ops.ScaleOps.fanOut(df)
      .select(col(idCol).as("id"), TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("id"),
        explode(TextAnalysis.ngramsArr(col("toks"), w)).as("win"))
      .select(col("id"), md5(to_binary(col("win"), lit("utf-8"))).as("wh"))
    // collapse the exploded corpus ONCE to (wh, id, occurrences) — document
    // frequency and the per-doc rollup both derive from this (the direct
    // wins->docFreq->join-wins shape re-exploded the whole corpus twice)
    val perDoc = wins.groupBy("wh", "id").agg(count(lit(1)).as("occ"))
    val docFreq = perDoc.groupBy("wh").agg(count(lit(1)).as("ndocs"))
    perDoc.join(docFreq, "wh")
      .groupBy("id")
      .agg(
        sum(col("occ")).as("n_windows"),
        sum(when(col("ndocs") >= minDocs, col("occ")).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
  }

  /** Asymmetric CONTAINMENT near-dup pairs over w-shingle sets:
    * C(A→B) = |S_A ∩ S_B| / |S_A| ≥ tau — the "document A is (nearly) a
    * passage of document B" relation Jaccard structurally misses when
    * |B| ≫ |A| (aggregator pages, quote farms, boilerplate wrappers;
    * Broder 1997 defines the measure next to resemblance). Exact, not
    * sketched. Directed output (a, b, containment): a's shingle set is
    * tau-covered by b's; identical sets surface as containment 1 in both
    * directions.
    *
    * Scale shape — the asymmetric prefix filter: a qualifying pair must
    * share a shingle among A's (sz − ⌈tau·sz⌉ + 1) RAREST shingles
    * (rarest-first global order, shingle tie-break), because missing all
    * of them caps the intersection below ⌈tau·sz⌉. Candidates are
    * therefore A-prefix ⋈ B-full-inverted-index — never all-pairs, and
    * hot shingles almost never appear in a rarest-first prefix, which is
    * what bounds the hot-key product (B has no size constraint by
    * design: that asymmetry IS the operator). Identical sets collapse to
    * one md5 gid before any corpus-wide work, same as [[jaccardPairs]].
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, tau: Double = 0.9,
                       storage: Option[StorageLevel] = Some(StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must lie in (0, 1]: $tau")
    val docArr = shingles(df, idCol, textCol, shingleN)
      .groupBy("id").agg(array_sort(collect_list(col("shingle"))).as("set"))
      .withColumn("gid",
        md5(to_binary(concat_ws("\u0001", col("set")), lit("utf-8"))))
    val docArrP = persistAt(docArr, storage)
    val members = docArrP.select("id", "gid")
    val usets = persistAt(
      docArrP.groupBy("gid").agg(first(col("set")).as("set")), storage)
    val freq = usets.select(explode(col("set")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("f"))
    val gsets = usets.select(col("gid"), explode(col("set")).as("sh"))
      .join(freq, "sh")
      .groupBy("gid")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("sh")))),
        x => x("sh")).as("ordered"))
      .withColumn("sz", size(col("ordered")))
    val gsetsP = persistAt(gsets, storage)
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = gsetsP
      .select(col("gid"), col("sz"),
        posexplode(slice(col("ordered"), lit(1), prefLen)))
      .select(col("gid"), col("sz"), (col("pos") + 1).as("r"), col("col").as("sh"))
    val full = gsetsP.select(col("gid").as("gb"), explode(col("ordered")).as("sh"))
    val gcands = pref.as("x").join(full.as("y"),
        col("x.sh") === col("y.sh") && col("x.gid") =!= col("y.gb") &&
          lit(1) + (col("x.sz") - col("x.r")) >= ceil(lit(tau) * col("x.sz")))
      .select(col("x.gid").as("ga"), col("y.gb").as("gb"))
      .distinct()
    val qual = gcands
      .join(gsetsP.select(col("gid").as("ga"), col("ordered").as("seta"),
        col("sz").as("sza")), "ga")
      .join(gsetsP.select(col("gid").as("gb"), col("ordered").as("setb")), "gb")
      .withColumn("i", size(array_intersect(col("seta"), col("setb"))).cast("double"))
      .withColumn("cont", col("i") / col("sza"))
      .filter(col("cont") >= tau)
    val cross = qual
      .join(members.as("ma"), col("ga") === col("ma.gid"))
      .join(members.as("mb"), col("gb") === col("mb.gid"))
      .select(col("ma.id").as("a"), col("mb.id").as("b"), col("cont"))
    val intra = members.as("ma").join(members.as("mb"),
        col("ma.gid") === col("mb.gid") && col("ma.id") =!= col("mb.id"))
      .select(col("ma.id").as("a"), col("mb.id").as("b"), lit(1.0).as("cont"))
    cross.unionByName(intra)
      .select(col("a"), col("b"), round(col("cont"), 6).as("containment"))
  }

  /** The corpus REWRITE [[substringDupStats]] only reports on: every
    * w-token window occurring in ≥ `minDocs` distinct documents is
    * removed from every occurrence EXCEPT the globally first one
    * (lexicographic min (doc id, position) — the deterministic stand-in
    * for Lee et al. 2021's "keep one copy of each duplicated span"), and
    * each document's text is rebuilt from its surviving tokens. Output is
    * over the normalized token stream (lowercased, punctuation-split —
    * the same [[graft.functions.TextAnalysis.tokensArr]] normalization
    * every text op here shares): (id, clean_text, n_tokens, n_dropped),
    * every input doc present, docs shorter than `w` tokens untouched.
    *
    * Scale shape: all corpus-wide movement is keyed on the 16-byte window
    * hash or (id, pos) — groupBy(wh) for doc-frequency + keeper, one
    * equi-join back, a ×w positional explode of REMOVABLE occurrences
    * only (bounded by w times the duplicated mass, not the corpus), an
    * anti-join on (id, pos), and a per-document rebuild whose state is
    * one document's tokens (the same bounded-row contract as every
    * per-doc aggregation here).
    */
  def substringDedupRewrite(df: DataFrame, idCol: String, textCol: String,
                            w: Int, minDocs: Int = 2): DataFrame = {
    val base = graft.ops.ScaleOps.fanOut(df).select(col(idCol).as("id"),
      TextAnalysis.tokensArr(col(textCol)).as("toks"))
    val wins = base.filter(size(col("toks")) >= w)
      .select(col("id"),
        posexplode(TextAnalysis.ngramsArr(col("toks"), w)).as(Seq("p0", "win")))
      .select(col("id"), (col("p0") + 1).as("pos"),
        md5(to_binary(col("win"), lit("utf-8"))).as("wh"))
    val stats = wins.groupBy("wh").agg(
      min(struct(col("id"), col("pos"))).as("keeper"),
      countDistinct(col("id")).as("ndocs"))
    val removable = wins
      .join(stats.filter(col("ndocs") >= minDocs), "wh")
      .filter(!(col("id") === col("keeper.id") && col("pos") === col("keeper.pos")))
      .select(col("id"), explode(sequence(col("pos"), col("pos") + (w - 1))).as("dpos"))
    val allPos = base.select(col("id"),
      posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).as("pos"), col("tok"))
    val kept = allPos.join(removable.withColumnRenamed("dpos", "pos"),
      Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id").agg(
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    base.join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")).cast("long") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
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
