package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text dataflow operators — the concrete map/reduce examples Disco ships,
  * re-expressed as declarative plans so Catalyst handles partial aggregation
  * (Disco's `combiner`, reference lib/disco/worker/classic/func.py:48-71),
  * shuffle, and codegen.
  */
object TextOps {

  /** Tokenize a text column into lowercase alphanumeric words.
    * Reference: examples/util/wordcount.py:12-22 (`line.split()` map).
    * `split` + `explode` stay inside whole-stage codegen; no UDF.
    */
  def tokens(text: Column): Column =
    explode(graft.functions.TextAnalysis.tokensArr(text))

  /** Word count: the canonical Disco job (reference README.md:17-30,
    * examples/util/count_words.py). Map-side partial count + final hash agg
    * are automatic (`groupBy.count` = two-phase aggregation), so shuffle
    * volume is O(distinct words), not O(tokens) — the same effect as Disco's
    * `sum_combiner` (func.py:164-173) but planned by Catalyst.
    */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    // filter empties INSIDE the array (tokensArr), before the explode
    // generates a row per token — not after
    df.select(explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Distributed grep: regex filter, map-only job (no shuffle at all).
    * Reference: examples/util/grep.py:10-21. The rlike predicate is pushed
    * into the scan's filter stage; column pruning keeps the read narrow.
    */
  def grep(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.filter(col(textCol).rlike(pattern))

  /** Per-key token count (the `sum_reduce` shape, func.py:175-184). */
  def tokenCounts(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.select(col(keyCol), tokens(col(textCol)).as("word"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_tokens"))

  /** Corpus n-gram frequency table (word n-grams, occurrence counts — NOT
    * per-doc-distinct like [[graft.dedup.Dedup.shingles]]). Wordcount's
    * plan shape at any n: explode → two-phase count, shuffle volume
    * O(distinct n-grams).
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(graft.functions.TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(
        graft.functions.TextAnalysis.ngramsArr(col("toks"), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))

  /** TF-IDF per (doc, token): tf(d,t) · ln(N / df(t)) — the classic
    * retrieval / feature-weighting op. Two aggregations (term freq, doc
    * freq) + a broadcast-or-shuffle join on token; the corpus size is a
    * 1-row broadcast. All counts integer-exact; the final score is
    * rounded for cross-engine stability.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("tfidf"))
  }

  /** Okapi BM25 retrieval scoring against a fixed query-term set — the
    * standard keyword-search ranker (Robertson & Zaragoza 2009; the
    * Lucene +1 IDF variant, so scores are non-negative even for terms in
    * more than half the corpus):
    *
    *   score(D) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5))
    *              · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    *
    * Scale shape: tokens are FILTERED to the query's terms immediately
    * after the explode (the per-(doc,term) table is |terms|-bounded per
    * doc, not vocabulary-bounded); doc lengths are one map-side-combined
    * agg over the corpus; df and avgdl collapse to |terms|-row / 1-row
    * broadcasts. One shuffle on doc_id joins lengths to term hits — no
    * inverted index materialized, which is the right trade until the
    * query volume amortizes index construction. Returns (doc_id, score)
    * for every doc matching ≥1 term; compose with [[RelationalOps]]
    * top-k (TakeOrdered) for a serving path.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val toks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val hits = toks.filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(lens.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl")))
    hits.join(dfreq, "tok").join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      // per-term singleton sums, then a FIXED-order add: each (doc, term)
      // part is unique, so the conditional sums are order-independent and
      // the final + chain is deterministic — bit-stable across engines
      // (a plain sum() over doubles is partition-order-dependent).
      .groupBy("doc_id")
      .agg(sum(when(col("tok") === terms.head, col("part"))).as(s"_p_${terms.head}"),
        terms.tail.map(t =>
          sum(when(col("tok") === t, col("part"))).as(s"_p_$t")): _*)
      .select(col("doc_id"),
        round(terms.map(t => coalesce(col(s"_p_$t"), lit(0.0)))
          .reduce(_ + _), 6).as("score"))
  }

  /** Multi-query BM25 retrieval — the search / RAG-labeling path: score a
    * BATCH of queries against the corpus in ONE token pass and return
    * each query's top-k documents (Robertson-Spärck Jones BM25, same
    * arithmetic as [[bm25]]). The query batch is broadcast-grain by
    * contract (a labeling run ships thousands of queries, not
    * corpus-many), so every query-side join broadcasts.
    *
    * Determinism across engines: each (query, doc, term) part is
    * quantized (round 6) BEFORE the per-(query, doc) DECIMAL(38,18) sum
    * — order-free, unlike a double sum — and the final score is
    * quantized again; ranks tie-break (score DESC, doc_id ASC).
    *
    * Shape at 100 TB: ONE tokenize/explode pass; `dl` rides the explode
    * from `size(toks)` so there is NO doc-grain length join (an
    * improvement over [[bm25]]'s lens join); the posting frame is
    * checkpointed once for its two consumers (doc-frequencies +
    * scoring); per-query ranks go through
    * [[graft.ops.ScaleOps.smallestKPerGroup]]'s two-level heap so a
    * stopword-heavy query's million hits never funnel through one task.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK: empty query batch")
    require(queries.forall(_._2.nonEmpty), "bm25TopK: a query has no terms")
    require(k >= 1, s"bm25TopK: k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "tok")
    val terms = qt.select("tok").distinct()
    val base = df.select(col(idCol).as("doc_id"),
      graft.functions.TextAnalysis.tokensArr(col(textCol)).as("toks"))
    // n_docs over ALL documents; avgdl over documents with >= 1 token
    // (the [[bm25]] / oracle convention) — integer sums, exact division
    val stats = df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(base.select(size(col("toks")).cast("long").as("dl"))
        .filter(col("dl") > 0)
        .agg((sum("dl").cast("double") / count(lit(1)).cast("double"))
          .as("avgdl")))
    val hits = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .join(broadcast(terms), "tok")
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // 2 consumers: doc-frequencies + scoring
    val dfreq = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    bm25Rank(hits, dfreq, stats, qt, k, k1, b)
  }

  /** The BM25 scoring + per-query top-k tail shared by [[bm25TopK]] and
    * the exported-index reader
    * ([[graft.similarity.HybridIndex.servedTopK]]) — ONE builder, so the
    * in-session and served renderings cannot drift. Inputs:
    * `hits(doc_id, dl, tok, tf)` restricted to the query terms,
    * `dfreq(tok, df)`, one-row `stats(n_docs, avgdl)`, `qt(qid, tok)`.
    */
  private[graft] def bm25Rank(hits: DataFrame, dfreq: DataFrame,
                              stats: DataFrame, qt: DataFrame, k: Int,
                              k1: Double, b: Double): DataFrame = {
    val parts = hits.join(broadcast(dfreq), "tok")
      .join(broadcast(qt), "tok")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), round(
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
        .as("part"))
    val scored = parts.groupBy("qid", "doc_id")
      .agg(round(sum(col("part").cast("decimal(38,18)")).cast("double"), 6)
        .as("score"))
      .withColumn("_ns", -col("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("_ns"), col("doc_id"))
    graft.ops.ScaleOps.smallestKPerGroup(scored, "qid", Seq("_ns", "doc_id"), k)
      .withColumn("rank", row_number().over(w))
      .select("qid", "doc_id", "score", "rank")
  }

  /** PII scrubbing — the standard pre-training redaction pass: emails,
    * phone-like number runs, and IPv4 literals replaced by typed
    * placeholder tokens. Pure codegen'd regexp_replace chain (scan-speed
    * over 100 TB; order fixed: emails first so their digits don't get
    * phone-masked). The patterns are the usual conservative heuristics —
    * tune per corpus; the op is the plumbing contract.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    regexp_replace(ip,
      "\\+?\\d[\\d\\s().-]{7,}\\d", "<PHONE>")
  }

  /** Benchmark decontamination — flag documents sharing word n-grams with
    * an evaluation set (the strictest standard filter before pretraining):
    * for each doc, the count and fraction of its distinct n-grams that
    * appear anywhere in `benchmark`.
    *
    * Shape at 100 TB: benchmark n-grams are distinct'd once (eval sets are
    * tiny → Catalyst broadcasts the join; a huge blocklist degrades
    * gracefully to a shuffle join on the n-gram), doc n-grams stream
    * through a left-semi-style aggregation — no row ever carries more than
    * its own n-gram count.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 3): DataFrame = {
    import graft.functions.TextAnalysis.{ngramsArr, tokensArr}
    val bench = benchmark
      .select(tokensArr(col(benchTextCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(array_distinct(ngramsArr(col("toks"), n))).as("g"))
      .distinct()
    // docs with fewer than n tokens have no n-grams and are excluded
    val dg = docs
      .select(col(idCol).as("id"), tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"),
        explode(array_distinct(ngramsArr(col("toks"), n))).as("g"))
    // ONE pass over the doc n-grams: left join against the (distinct)
    // benchmark set and count hits conditionally — not two aggregations
    // over an uncached dg, which would tokenize and explode the corpus
    // twice. bench is distinct on g, so the join never multiplies rows.
    dg.join(bench.withColumn("_hit", lit(1)), Seq("g"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("total"), count(col("_hit")).as("hit"))
      .select(col("id"),
        col("hit").as("contaminated_ngrams"),
        round(col("hit").cast("double") / col("total"), 6)
          .as("contamination_frac"))
  }

  /** Overlapping token-window chunking — context-window / RAG preparation:
    * split each document's token stream into chunks of `chunkSize` tokens,
    * one chunk starting every `stride` tokens (stride < chunkSize ⇒
    * overlap; trailing chunks may be short — the HF-tokenizer stride
    * contract). Token-less docs produce no chunks.
    *
    * Shape at 100 TB: a pure per-row transform — the chunk array is built
    * inside the row (`sequence` of starts → `transform`+`slice`) and
    * posexploded, so there is NO shuffle at any scale; chunking a corpus
    * is scan-speed and embarrassingly parallel. Output stays (doc_id,
    * chunk_idx)-keyed for downstream embedding/packing stages.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    df.select(col(idCol).as("doc_id"),
        graft.functions.TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")), lit(stride)),
          s => slice(col("toks"), s, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        size(col("col")).as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk"))
  }

  /** Vocabulary coverage / out-of-vocabulary profiling — the tokenizer-
    * coverage pass run before committing to a vocab: build the top-`vocabSize`
    * corpus vocabulary by token frequency (deterministic: frequency desc,
    * token asc tie-break) and score every document's OOV token fraction.
    *
    * Shape at 100 TB: one two-phase count keyed by token (shuffle volume =
    * O(distinct tokens)), a TakeOrdered(V) for the vocab — driver-small BY
    * CONSTRUCTION (V is a tokenizer-sized constant, not data-dependent) —
    * broadcast back as a membership join, then one per-doc aggregation.
    * Nothing global ever exceeds V rows.
    */
  def oovProfile(df: DataFrame, idCol: String, textCol: String,
                 vocabSize: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("_in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("_in"))).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Gopher-style repetition quality signals per document — the standard
    * "drop boilerplate/spam before pretraining" filters:
    *  - `top_ngram_frac`: occurrences of the most frequent word n-gram over
    *    total n-gram occurrences (token-level form of Gopher's
    *    top-n-gram character fraction);
    *  - `dup_ngram_frac`: occurrences belonging to n-grams appearing more
    *    than once, over total;
    *  - `dup_line_frac`: duplicated non-empty lines over total lines — a
    *    pure Column expression (no shuffle), since a doc's lines live in
    *    its own row.
    *
    * Shape at 100 TB: one explode + two hash aggregations keyed by (doc,
    * gram) then doc — partial aggregation collapses each doc's grams
    * map-side, so shuffle volume is O(distinct grams), and nothing ever
    * groups by a corpus-global key. Docs with fewer than n tokens score 0.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame = {
    // split/filter once behind a projection boundary — the filter lambda
    // dodges codegen subexpression elimination, so inlining `lines` three
    // times would re-split the text per use
    val docs = df.select(col(idCol).as("id"),
        filter(split(col(textCol), "\n"), x => x =!= "").as("lines"))
      .select(col("id"),
        when(size(col("lines")) > 0,
          round((size(col("lines")) - size(array_distinct(col("lines")))).cast("double") /
            size(col("lines")), 6)).otherwise(0.0).as("dup_line_frac"))
    val grams = df
      .select(col(idCol).as("id"),
        graft.functions.TextAnalysis.tokensArr(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"),
        explode(graft.functions.TextAnalysis.ngramsArr(col("toks"), n)).as("g"))
    val stats = grams.groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum("c").as("total"), max("c").as("maxc"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupc"))
    docs.join(stats, Seq("id"), "left")
      .select(col("id"),
        coalesce(round(col("maxc").cast("double") / col("total"), 6), lit(0.0))
          .as("top_ngram_frac"),
        coalesce(round(col("dupc").cast("double") / col("total"), 6), lit(0.0))
          .as("dup_ngram_frac"),
        col("dup_line_frac"))
  }

  /** Per-document token entropy — lexical diversity in nats:
    * H = −Σ (c/t)·ln(c/t) over the doc's token counts (0 for
    * single-token docs; low entropy = repetitive/templated text, the
    * cheap complement of [[repetitionProfile]]'s n-gram signals).
    *
    * H = ln(t) − (Σ c·ln c)/t: per-token-type ln terms are summed in
    * decimal(38,18) and the result rounds to 4 (the surprisal libm
    * treatment). Shape: two hash aggregations keyed (doc, token) then
    * doc — no joins, no corpus-global keys.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("t"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast("decimal(38,18)")).as("sclnc"))
      .select(col("id"), col("t").as("n_tokens"),
        round(log(col("t").cast("double")) -
          col("sclnc").cast("double") / col("t").cast("double"), 4)
          .as("entropy"))

  /** Feature hashing (the hashing trick, Weinberger et al. 2009 — public
    * paper): fixed-`dim` bag-of-words vectors with bucket =
    * md5-derived hash of the token mod dim — no vocabulary dictionary to
    * build, broadcast, or keep consistent across a 100 TB corpus, and the
    * bucketing is engine-portable (the oracle replays it). Output one row
    * per document: `features` = the sparse vector as a sorted
    * "bucket:count" string (the comparator-friendly encoding the int8
    * codes use), plus `n_tokens`.
    *
    * Shape: explode → two hash aggregations keyed (id, bucket) then id —
    * map-side partial aggregation collapses repeated tokens first; no
    * joins, no dictionary state.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    require(dim >= 2, s"featureHash: dim must be >= 2: $dim")
    val bucket = pmod(conv(substring(md5(to_binary(
      concat(col("tok"), lit(":fh")), lit("utf-8"))), 1, 8), 16, 10)
      .cast("long"), lit(dim.toLong))
    df.select(col(idCol).as("id"),
        explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
      .select(col("id"), bucket.as("b"))
      .groupBy("id", "b").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum(col("c")).as("n_tokens"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("b"), col("c")))),
          e => concat(e("b"), lit(":"), e("c")))).as("features"))
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023 — public paper): score every document by how much
    * more likely its hashed-n-gram bag is under a TARGET-slice unigram
    * model than under the RAW-corpus model,
    * lw(doc) = Σ_tok [ln p̂_tgt(b(tok)) − ln p̂_raw(b(tok))],
    * with add-one smoothing over the `dim` hash buckets. High lw =
    * "reads like the target domain"; resampling by lw is the standard
    * recipe for steering a web-scale corpus toward a quality slice
    * without training a classifier.
    *
    * The feature space is exactly [[featureHash]]'s bucketing (same md5
    * derivation, same `:fh` salt), so the oracle replays it and the
    * weights are comparable with the hashed bag-of-words features.
    *
    * Determinism across engines: each bucket's log-ratio is quantized
    * (round 6) BEFORE the per-doc sum, the sum runs through
    * DECIMAL(38,18) (association-order-free), and the final weight is
    * quantized again — both engines add identical numbers.
    *
    * Shape at 100 TB: ONE tokenize/hash pass (the (id, bucket, count)
    * frame is localCheckpointed and feeds the target counts, the raw
    * counts, and the scoring join); both models are dictionary-grain
    * (≤ dim rows) so the scoring join BROADCASTS; no all-pairs, no
    * global window. Output: (id, n_tokens, lw).
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetCol: Column, dim: Int): DataFrame = {
    require(dim >= 2, s"dsirWeights: dim must be >= 2: $dim")
    val bucket = pmod(conv(substring(md5(to_binary(
      concat(col("tok"), lit(":fh")), lit("utf-8"))), 1, 8), 16, 10)
      .cast("long"), lit(dim.toLong))
    val perDocB = df.select(col(idCol).as("id"), targetCol.as("_tgt"),
        explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
      .select(col("id"), col("_tgt"), bucket.as("b"))
      .groupBy("id", "_tgt", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint() // 3 consumers: target counts, raw counts, scoring
    val raw = perDocB.groupBy("b").agg(sum(col("c")).as("cr"))
    val tgt = perDocB.filter(col("_tgt")).groupBy("b").agg(sum(col("c")).as("ct"))
    val tot = raw.agg(sum(col("cr")).as("r"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("t")))
    val lr = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"), round(
        log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
          (col("t") + lit(dim.toLong)).cast("double")) -
        log((col("cr") + lit(1L)).cast("double") /
          (col("r") + lit(dim.toLong)).cast("double")), 6).as("lr"))
    perDocB.join(broadcast(lr), "b")
      .groupBy("id").agg(
        sum(col("c")).as("n_tokens"),
        round(sum((col("c").cast("double") * col("lr"))
          .cast("decimal(38,18)")).cast("double"), 6).as("lw"))
  }

  /** Doc-level PMI co-occurrence — the word-association table (collocation
    * mining, embedding-training diagnostics): for token pairs x < y,
    * PMI = ln(P(x,y) / (P(x)·P(y))) with document-level probabilities
    * (c_xy·N / (c_x·c_y), counts = documents containing the token(s)).
    *
    * Scale contract — the quadratic term is bounded on BOTH axes:
    * vocabulary-wise, only tokens in ≥ `minDocFreq` documents participate
    * (the doc-freq table broadcasts); per-document, at most
    * `maxTokensPerDoc` kept tokens enter the self-join (the top-m by
    * global doc frequency, ties broken by token — standard collocation
    * practice). Without the per-doc cap, ONE pathological document with
    * 10⁴ distinct frequent tokens makes ~5·10⁷ pairs inside a single
    * task — a straggler no vocabulary knob prevents; with it, a doc
    * contributes ≤ m²/2 pairs, period. The corpus-wide movement is keyed
    * on (x, y) token pairs. Output is bounded the same way (pairs must
    * co-occur in ≥ `minDocFreq` docs).
    *
    * Engine parity: ONE ln per output row over an integer-ratio argument
    * evaluated in a fixed double order, rounded to 6 — no summation of
    * logs, so libm ulp differences cannot accumulate.
    */
  def pmiPairs(df: DataFrame, idCol: String, textCol: String,
               minDocFreq: Int, maxTokensPerDoc: Int = 500): DataFrame = {
    require(maxTokensPerDoc >= 2,
      s"pmiPairs: maxTokensPerDoc must be >= 2, got $maxTokensPerDoc")
    val dt = graft.dedup.Dedup.tokenSet(df, idCol, textCol)
    val nDocs = dt.agg(countDistinct(col("id")).as("n"))
    val dfreq = dt.groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minDocFreq)
    // per-doc cap: rank each doc's kept tokens by global doc freq (desc,
    // token asc — deterministic) and slice to the top m BEFORE the
    // self-join; per-doc window groups are tiny (≤ kept vocab), so the
    // window sort is cheap — it is the m² pair volume being bounded
    val keptAll = dt
      .join(broadcast(dfreq.select(col("tok"), col("c").as("_df"))), "tok")
    val kept = keptAll
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("_df").desc, col("tok"))))
      .filter(col("_rn") <= maxTokensPerDoc)
      .drop("_rn", "_df")
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.id") === col("b.id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("x"), col("b.tok").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minDocFreq)
    pairs
      .join(broadcast(dfreq.select(col("tok").as("x"), col("c").as("c_x"))), "x")
      .join(broadcast(dfreq.select(col("tok").as("y"), col("c").as("c_y"))), "y")
      .crossJoin(broadcast(nDocs))
      .select(col("x"), col("y"), col("c_xy"),
        round(log((col("c_xy").cast("double") * col("n").cast("double")) /
          (col("c_x").cast("double") * col("c_y").cast("double"))), 6).as("pmi"))
  }

  /** Compression-ratio quality signal (the Gopher/CCNet-family filter:
    * near-incompressible text is noise, hyper-compressible text is
    * boilerplate): deflated-size / raw-size per document at a FIXED zlib
    * level, so the score is deterministic across runs and machines.
    * A real compressor can't be a codegen'd builtin — deliberate UDF,
    * the genuine-format-parsing exception. No SQL oracle exists (DuckDB
    * has no zlib surface), so this is spec-verified + rows-only checked.
    *
    * Output: (id, n_bytes, ratio) — ratio in (0, ~1.2], rounded to 6.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    val deflatedLen = udf { (s: String) =>
      if (s == null) null
      else {
        val raw = s.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(level)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        java.lang.Long.valueOf(n)
      }
    }
    df.select(col(idCol).as("id"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        deflatedLen(col(textCol)).as("zlen"))
      .select(col("id"), col("n_bytes"),
        when(col("n_bytes") > 0,
          round(col("zlen").cast("double") / col("n_bytes"), 6))
          .otherwise(null).as("ratio"))
  }

  /** Oracle-replayable compressibility profile — the exact-arithmetic
    * companion to [[compressionRatio]] (whose zlib byte count no SQL
    * engine can replay): per document, (a) the distinct-8-gram fraction
    * — the substring-repetition signal LZ77 compression literally
    * exploits, so it ranks boilerplate < prose < noise in the same
    * order as the deflate ratio (spec-pinned) — and (b) the empirical
    * character entropy, the order-0 compressibility bound in
    * bits-per-char terms (natural log here).
    *
    * Determinism contract: the 8-gram fraction is an exact integer
    * ratio in one IEEE division; entropy = ln(n) − (Σ c·ln c)/n with
    * the per-character c·ln c terms cast to decimal(38,18) and summed
    * order-independently (the surprisal/bigram-LM recipe), then one
    * fixed double expression rounded to 4 — cross-engine replayable.
    *
    * Scale shape: the 8-gram leg is fully ROW-LOCAL (a codegen'd
    * transform + array_distinct inside the projection — no shuffle, no
    * explode); the entropy leg is one explode + two hash aggregations
    * with map-side combine on (id, char) — the wordcount shape, at
    * alphabet-bounded fan-in per doc.
    *
    * Output: (id, n_chars, gram8_frac, entropy); gram8_frac is NULL for
    * docs shorter than 8 chars, entropy NULL for empty docs.
    */
  def compressibilityProfile(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    // fanOut: the per-row 8-gram distinct + char explode below are the
    // whole cost and scan-side (single-task on a one-split input)
    val base = ScaleOps.fanOut(df)
      .select(col(idCol).as("id"), col(textCol).as("t"),
        length(col(textCol)).cast("long").as("n_chars"))
    // ONE pass, no join: characters come from a single split(t, "")
    // (substr(i, …) in a lambda walks the UTF8String from byte 0 per
    // position — O(n²) per doc, measured 2.4 s vs 0.8 s at sf0.1), the
    // row-local 8-gram fraction rides the explode as a constant-per-doc
    // group key, and the entropy aggregation carries it through. The
    // previous grams ⋈ entropy left join planned as broadcast and ran
    // the two legs SEQUENTIALLY (build side first) — measured ~2×.
    val grams = base
      .select(col("id"), col("n_chars"), split(col("t"), "").as("cs"))
      .select(col("id"), col("n_chars"), col("cs"),
        when(col("n_chars") >= 8,
          round(
            size(array_distinct(transform(
              sequence(lit(0L), col("n_chars") - 8L),
              i => array_join(
                slice(col("cs"), (i + 1).cast("int"), lit(8)), ""))))
              .cast("double") /
            (col("n_chars") - 7L).cast("double"), 6))
          .as("gram8_frac"))
    // explode_outer + ""→NULL keeps empty docs as one NULL-char row
    // (split("", "") is [""], not an empty array) ⇒ NULL entropy, row kept
    val chars = grams
      .select(col("id"), col("n_chars"), col("gram8_frac"),
        explode_outer(col("cs")).as("ch0"))
      .select(col("id"), col("n_chars"), col("gram8_frac"),
        nullif(col("ch0"), lit("")).as("ch"))
    chars.groupBy("id", "n_chars", "gram8_frac", "ch")
      .agg(count(lit(1)).as("c"))
      .groupBy("id", "n_chars", "gram8_frac").agg(
        sum(when(col("ch").isNotNull, col("c"))).as("n"),
        sum(when(col("ch").isNotNull,
          (col("c").cast("double") * log(col("c").cast("double")))
            .cast("decimal(38,18)"))).as("clc"))
      .select(col("id"), col("n_chars"), col("gram8_frac"),
        when(col("n").isNotNull,
          round(log(col("n").cast("double")) -
            col("clc").cast("double") / col("n").cast("double"), 4))
          .as("entropy"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    * the MOSS algorithm): hash every character k-gram of the normalized
    * text (the [[graft.functions.RollingHash]] polynomial), then select
    * the MINIMUM hash of each sliding window of `window` consecutive
    * grams, ties to the RIGHTMOST position — the paper's robust-winnowing
    * rule, giving the guarantee that any shared substring of length ≥
    * k + window − 1 between two documents contributes at least one
    * IDENTICAL selected fingerprint (position-independent), while
    * keeping ~2/(window+1) of all grams. The local-fingerprint upgrade
    * over the whole-doc [[graft.functions.TextAnalysis]] digests.
    *
    * The min-with-rightmost-tie selection is ONE integer window min:
    * enc = h·2³² + (2³²−1−pos) orders by (hash asc, pos desc), so the
    * frame min IS the robust-winnowing choice — portable arithmetic both
    * engines replay exactly (hash < 2³¹ keeps enc inside int64; pos <
    * 2³² supports 4-billion-char documents). Per-doc window frames run
    * inside one doc's rows — docs distribute across tasks, the
    * rankingMetrics per-group contract.
    *
    * Output: (id, fp_pos, fp) — the distinct selected fingerprints with
    * the gram position they anchor to, ≥1 per window by construction.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, window: Int = 4): DataFrame = {
    require(k >= 2 && window >= 2, s"winnow needs k>=2, window>=2: $k/$window")
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    // fanOut: the per-position rolling-hash explode below is scan-side
    val base = ScaleOps.fanOut(df)
      .select(col(idCol).as("id"), split(norm, "").as("cs"),
        length(norm).cast("long").as("n"))
      .filter(col("n") >= k + window - 1)
    val grams = base.select(col("id"), col("n"),
      posexplode(transform(sequence(lit(0L), col("n") - k),
        i => graft.functions.RollingHash.rolling_hash(
          array_join(slice(col("cs"), (i + 1).cast("int"), lit(k)), ""))))
        .as(Seq("pos", "h")))
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        window - 1)
    grams
      .withColumn("enc",
        col("h") * lit(4294967296L) + (lit(4294967295L) - col("pos")))
      .withColumn("wmin", min("enc").over(wspec))
      .filter(col("pos") <= col("n") - k - (window - 1))
      .select(col("id"),
        (lit(4294967295L) - pmod(col("wmin"), lit(4294967296L))).as("fp_pos"),
        ((col("wmin") - pmod(col("wmin"), lit(4294967296L))) /
          lit(4294967296L)).cast("long").as("fp"))
      .distinct()
  }

  /** Cross-document overlap detection over [[winnowFingerprints]] — the
    * MOSS use case: pairs of documents sharing ≥ `minShared` selected
    * fingerprints, found through the fingerprint INVERTED INDEX (equi-
    * join on fp), never all-pairs. Fingerprints appearing in more than
    * `maxDf` documents are dropped first — the standard df-cap: a
    * ubiquitous gram ("the s…") carries no plagiarism signal and would
    * otherwise make the index join quadratic on hot keys (the same
    * rare-feature filtering as the PMI cap and PPJoin prefixes; the cap
    * is part of the algorithm, not a silent truncation).
    *
    * Output: (a, b, n_shared) with a < b, ordered pairs of ids sharing
    * ≥ minShared surviving fingerprints.
    */
  def winnowMatches(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, window: Int = 4, maxDf: Int = 10,
                    minShared: Int = 5): DataFrame = {
    require(maxDf >= 2 && minShared >= 1)
    val fp = winnowFingerprints(df, idCol, textCol, k, window)
      .select(col("id"), col("fp")).distinct()
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val indexed = fp.join(rare, "fp")
    indexed.as("x").join(indexed.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Span-grain MOSS matching — [[winnowMatches]] upgraded to report
    * WHERE the overlap is: for every matching pair (same df-cap, same
    * minShared-distinct-fingerprints gate), one row per shared
    * fingerprint ANCHOR pair — the gram position in each document whose
    * k-gram hashed to the shared fingerprint. The anchored gram is
    * `text[pos, pos+k)` of the normalized text, so the rows feed the
    * substring-rewrite family directly (which span of a to align with
    * which span of b). A fingerprint selected at several positions in a
    * doc yields all anchor combinations — that IS the span evidence,
    * still df-cap-bounded, never all-pairs.
    *
    * One pass: the pair gate (distinct-fp count) and the span rows come
    * from a single anchor-index self-join + one aggregation (spans
    * collect per pair, explode after the gate) — the inverted-index
    * subtree is not executed twice.
    *
    * Output: (a, b, fp, a_pos, b_pos) with a < b.
    */
  def winnowSpans(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 5, window: Int = 4, maxDf: Int = 10,
                  minShared: Int = 5): DataFrame = {
    require(maxDf >= 2 && minShared >= 1)
    val anchors = winnowFingerprints(df, idCol, textCol, k, window)
    val rare = anchors.select("id", "fp").distinct()
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val ix = anchors.join(rare, "fp")
    ix.as("x").join(ix.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), col("x.fp").as("fp"),
        col("x.fp_pos").as("a_pos"), col("y.fp_pos").as("b_pos"))
      .groupBy("a", "b")
      .agg(countDistinct(col("fp")).as("n_shared"),
        collect_list(struct(col("fp"), col("a_pos"), col("b_pos"))).as("sp"))
      .filter(col("n_shared") >= minShared)
      .select(col("a"), col("b"), explode(col("sp")).as("s"))
      .select(col("a"), col("b"), col("s.fp").as("fp"),
        col("s.a_pos").as("a_pos"), col("s.b_pos").as("b_pos"))
  }

  /** CROSS-CORPUS span decontamination — [[winnowSpans]] between a train
    * corpus and an evaluation set: which eval text leaked into which
    * train document, and WHERE. Fingerprints come from each side's own
    * [[winnowFingerprints]]; candidates are the fingerprint equi-join
    * (train fp × eval fp — eval is benchmark-sized, its index
    * broadcasts), df-capped on the EVAL side (a fingerprint matching
    * more than `maxEvalDf` eval docs is generic phrasing, not leakage);
    * pairs sharing ≥ `minShared` distinct fingerprints emit one row per
    * anchor combination. The span-evidence upgrade of
    * [[graft.dedup.Dedup.crossCorpusContamination]] — what a
    * decontamination audit actually reads (cut the span, not the doc).
    *
    * Output: (train_id, eval_id, fp, train_pos, eval_pos).
    */
  def winnowSpansCross(train: DataFrame, eval: DataFrame,
                       idCol: String, textCol: String,
                       k: Int = 5, window: Int = 4, maxEvalDf: Int = 10,
                       minShared: Int = 5): DataFrame = {
    require(maxEvalDf >= 1 && minShared >= 1)
    val tfp = winnowFingerprints(train, idCol, textCol, k, window)
    val efp = winnowFingerprints(eval, idCol, textCol, k, window)
    val rare = efp.select("id", "fp").distinct()
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxEvalDf)
      .select("fp")
    val eIx = efp.join(rare, "fp")
    tfp.as("t").join(eIx.as("e"), Seq("fp"))
      .select(col("t.id").as("train_id"), col("e.id").as("eval_id"),
        col("fp"), col("t.fp_pos").as("train_pos"),
        col("e.fp_pos").as("eval_pos"))
      .groupBy("train_id", "eval_id")
      .agg(countDistinct(col("fp")).as("n_shared"),
        collect_list(struct(col("fp"), col("train_pos"), col("eval_pos")))
          .as("sp"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_id"), col("eval_id"), explode(col("sp")).as("s"))
      .select(col("train_id"), col("eval_id"), col("s.fp").as("fp"),
        col("s.train_pos").as("train_pos"), col("s.eval_pos").as("eval_pos"))
  }

  /** Ingestion text normalization — the CCNet/RefinedWeb-family cleanup
    * pass every crawl pipeline runs before hashing or tokenizing, as one
    * codegen'd projection (no shuffle, no UDF):
    *
    *  1. Unicode NFC ([[graft.functions.NfcNormalize]], native
    *     expression) so decomposed sequences can't defeat dedup;
    *  2. strip non-whitespace C0/DEL control characters (explicit byte
    *     ranges, portable across regex engines);
    *  3. collapse whitespace runs to one space and trim.
    *
    * Output: (id, n_raw, n_clean, changed, text_clean) — the cleaned
    * text plus the accounting a pipeline monitors (how much of the crawl
    * was dirt). Cross-engine: the oracle replays NFC via DuckDB's
    * `nfc_normalize` (same UAX #15 algorithm as the JVM) and the same
    * explicit-range regexes with the 'g' flag.
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nfc = graft.functions.UnicodeNorm.nfc_normalize(col(textCol))
    val noCtl = regexp_replace(nfc, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")
    val clean = trim(regexp_replace(noCtl, "[ \\t\\n\\r\\x0B\\f]+", " "))
    df.select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_raw"),
        clean.as("text_clean"),
        (clean =!= col(textCol)).as("changed"))
      .select(col("id"), col("n_raw"),
        length(col("text_clean")).cast("long").as("n_clean"),
        col("changed"), col("text_clean"))
  }

  /** The fixture's Gopher stopword list — the SINGLE source for every
    * stopword-density signal (qualityRules, the streaming gate, the
    * q_html_blocks jusText verdict) and the oracle SQL's IN-list.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in")

  /** Gopher/C4-family RULE-BASED quality filter (Rae et al. 2021 §A1.1,
    * Raffel et al. 2020 C4 heuristics), the fixture-computable subset —
    * per document, exact-arithmetic signals and a composite keep verdict:
    *
    *  - `n_words` within [minWords, maxWords] (fragment / runaway cut);
    *  - mean word length within [minMeanLen, maxMeanLen] (symbol soup /
    *    concatenated-garbage cut);
    *  - `stop_frac` > 0 — at least one stopword (the Gopher "has common
    *    English words" rule at the fixture's tiny stoplist);
    *  - `top_share` (most frequent word's share) ≤ maxTopShare — the
    *    single-token repetition dominance cut.
    *
    * Everything is integer counts and exact ratios (round 6 / mean round
    * 4 in one fixed order), so a SQL oracle replays signals AND verdict.
    * Shape: one explode + two map-side-combined hash aggregations — the
    * wordcount shape, per-doc fan-in bounded by vocabulary.
    *
    * Output: (id, n_words, mean_word_len, stop_frac, top_share, keep).
    */
  def qualityRules(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 30, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxTopShare: Double = 0.15,
                   stopwords: Seq[String] = Stopwords)
      : DataFrame = {
    val toks = ScaleOps.fanOut(df).select(col(idCol).as("id"),
        explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
    toks.groupBy("id").agg(
        sum("c").as("n"),
        sum(length(col("tok")) * col("c")).as("chars"),
        sum(when(col("tok").isin(stopwords: _*), col("c"))
          .otherwise(0L)).as("stops"),
        max("c").as("maxc"))
      .select(col("id"), col("n").as("n_words"),
        round(col("chars").cast("double") / col("n").cast("double"), 4)
          .as("mean_word_len"),
        round(col("stops").cast("double") / col("n").cast("double"), 6)
          .as("stop_frac"),
        round(col("maxc").cast("double") / col("n").cast("double"), 6)
          .as("top_share"),
        (col("n") >= minWords && col("n") <= maxWords &&
          col("chars").cast("double") / col("n").cast("double") >= minMeanLen &&
          col("chars").cast("double") / col("n").cast("double") <= maxMeanLen &&
          col("stops") > 0 &&
          col("maxc").cast("double") / col("n").cast("double") <= maxTopShare)
          .as("keep"))
  }

  /** [[qualityRules]] as a ROW-LOCAL projection — the streaming-gate
    * form: every signal computed from the doc's own token array with
    * array lambdas (no shuffle, no state), so the gate drops into a
    * Structured Streaming pipeline in append mode where the batch op's
    * two chained aggregations cannot. Same signals, same rounding, same
    * verdict; docs with zero tokens are filtered (the batch op's
    * absent-from-output contract). The top-share histogram is O(n·d)
    * per row (d = distinct tokens) — the price of statelessness; the
    * batch form stays the corpus-scale path.
    */
  /** The row-local quality signals as ONE struct Column over a text
    * column: (n, chars, stops, maxc) — integer counts from the token
    * array, no shuffle, no state. Shared by [[qualityRulesLocal]] and
    * the streaming ingest (which must keep its other columns alongside
    * the verdict).
    */
  def qualitySignalsLocal(text: Column,
                          stopwords: Seq[String] = Stopwords)
      : Column = {
    val stopArr = array(stopwords.map(lit): _*)
    val a = graft.functions.TextAnalysis.tokensArr(text)
    struct(
      size(a).cast("long").as("n"),
      aggregate(a, lit(0L), (acc, x) => acc + length(x)).as("chars"),
      size(filter(a, x => array_contains(stopArr, x))).cast("long").as("stops"),
      coalesce(array_max(transform(array_distinct(a),
        x => size(filter(a, y => y === x)))).cast("long"), lit(0L)).as("maxc"))
  }

  /** The composite keep verdict over a [[qualitySignalsLocal]] struct —
    * the same inequality chain as [[qualityRules]], unrounded ratios.
    */
  def qualityKeepExpr(q: Column,
                      minWords: Int = 30, maxWords: Int = 100000,
                      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                      maxTopShare: Double = 0.15): Column = {
    // ANSI divide-by-zero-proof divisor: Spark's And gives no row-wise
    // short-circuit guarantee under codegen, so `n >= minWords` cannot
    // protect the ratios on an EMPTY text (the mixed-media ingest's
    // corrupt-payload rows). n=0 rows already fail the min-words clause;
    // for n >= 1 the divisor is untouched.
    val nd = greatest(q("n"), lit(1L)).cast("double")
    q("n") >= minWords && q("n") <= maxWords &&
      q("chars").cast("double") / nd >= minMeanLen &&
      q("chars").cast("double") / nd <= maxMeanLen &&
      q("stops") > 0 &&
      q("maxc").cast("double") / nd <= maxTopShare
  }

  def qualityRulesLocal(df: DataFrame, idCol: String, textCol: String,
                        minWords: Int = 30, maxWords: Int = 100000,
                        minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                        maxTopShare: Double = 0.15,
                        stopwords: Seq[String] = Stopwords)
      : DataFrame = {
    df.select(col(idCol).as("id"),
        qualitySignalsLocal(col(textCol), stopwords).as("q"))
      .filter(col("q.n") > 0)
      .select(col("id"), col("q.n").as("n"), col("q.chars").as("chars"),
        col("q.stops").as("stops"), col("q.maxc").as("maxc"))
      .select(col("id"), col("n").as("n_words"),
        round(col("chars").cast("double") / col("n").cast("double"), 4)
          .as("mean_word_len"),
        round(col("stops").cast("double") / col("n").cast("double"), 6)
          .as("stop_frac"),
        round(col("maxc").cast("double") / col("n").cast("double"), 6)
          .as("top_share"),
        (col("n") >= minWords && col("n") <= maxWords &&
          col("chars").cast("double") / col("n").cast("double") >= minMeanLen &&
          col("chars").cast("double") / col("n").cast("double") <= maxMeanLen &&
          col("stops") > 0 &&
          col("maxc").cast("double") / col("n").cast("double") <= maxTopShare)
          .as("keep"))
  }

  /** Unigram surprisal — the cheapest corpus-statistics quality score
    * (a document of globally-rare tokens has high surprisal; templated
    * boilerplate scores low): mean over tokens of -ln(count(tok)/total)
    * = ln(total) - mean(ln(count(tok))), from ONE corpus token-count
    * aggregation joined back to the exploded tokens.
    *
    * Engine parity: per-token ln() may differ by an ulp across libm
    * implementations, so the per-doc mean is summed in decimal(38,18)
    * (order-independent) and the result rounds to 4 decimals — 1e9×
    * the worst accumulated libm divergence.
    *
    * Shape at 100 TB: explode + two hash aggregations (corpus counts,
    * per-doc mean) + one shuffle join on the token key; map-side partial
    * aggregation collapses repeated tokens per doc first.
    */
  /** Skip-gram (center, context) pair counts within a ±`window` token
    * distance — the word2vec / embedding-training data-generation pass.
    * The positional range join lowers to `window` EQUI-joins (offset k
    * explodes on one side, join key (doc, pos+k)) — hash-partitioned and
    * AQE-friendly, no range-condition nested loop; both directions come
    * from one forward join union its swap.
    */
  def skipgramPairs(df: DataFrame, idCol: String, textCol: String,
                    window: Int): DataFrame = {
    require(window >= 1, s"skipgramPairs: window must be >= 1, got $window")
    val pos = df.select(col(idCol).as("id"),
        posexplode(graft.functions.TextAnalysis.tokensArr(col(textCol))))
      .select(col("id"), col("pos"), col("col").as("tok"))
    val left = pos.select(col("id"), col("pos"), col("tok").as("center"),
        explode(sequence(lit(1), lit(window))).as("k"))
      .select(col("id"), col("center"), (col("pos") + col("k")).as("rpos"))
    val fwd = left.join(pos.select(col("id"), col("pos").as("rpos"),
        col("tok").as("context")), Seq("id", "rpos"))
      .select("center", "context")
    fwd.union(fwd.select(col("context").as("center"), col("center").as("context")))
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
  }

  /** Per-document bigram language-model score — the n-gram-LM quality
    * signal (the cheap proxy for "does this read like the corpus" used to
    * rank crawl text before pretraining): mean over the doc's bigrams of
    * ln P(w2|w1) under the corpus's own add-one-smoothed bigram model,
    * P(w2|w1) = (C(w1 w2)+1) / (C(w1)+V). Fluent text (frequent
    * collocations) scores high; shuffled/garbage text scores low.
    *
    * Determinism: per-bigram log-probs pass through DECIMAL(38,18) before
    * the sum (exact, order-independent — the [[unigramSurprisal]] trick),
    * so the mean replays bit-for-bit in any engine. Docs with < 2 tokens
    * have no bigrams and are absent from the output.
    *
    * Shape at 100 TB: explode + three hash aggregations (bigram counts,
    * unigram counts, per-doc mean) + shuffle joins on the n-gram keys;
    * vocab size is a 1-row broadcast.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = df.select(col(idCol).as("id"),
        graft.functions.TextAnalysis.tokensArr(col(textCol)).as("a"))
      .filter(size(col("a")) >= 2)
    val bigr = arr.select(col("id"),
        explode(graft.functions.TextAnalysis.ngramsArr(col("a"), 2)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val toks = df.select(
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
    val big = bigr.groupBy("bg").agg(count(lit(1)).as("cb"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    bigr.join(big, "bg")
      .join(uni.withColumnRenamed("tok", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((col("cb") + 1).cast("double") /
        (col("cu") + col("v")).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(38,18)")).as("_slp"))
      .select(col("id"), col("n_bigrams"),
        round(col("_slp").cast("double") / col("n_bigrams").cast("double"), 4)
          .as("lm_score"))
  }

  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("n")) // 1 row, broadcast below
    toks.join(freq, "tok")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(col("c").cast("double")).cast("decimal(38,18)")).as("slnc"))
      .crossJoin(broadcast(total))
      .select(col("id"), col("n_tokens"),
        round(log(col("n").cast("double")) -
          (col("slnc").cast("double") / col("n_tokens").cast("double")), 4)
          .as("surprisal"))
  }

  /** Bigram-LM scorer with a REFERENCE training slice — the scoring half
    * of the language-ID / fluency gate: train the add-one-smoothed bigram
    * model ONLY on rows where `refCol` is true (the trusted slice, e.g.
    * docs already identified as the target language), then score EVERY
    * doc under that frozen model — mean over the doc's bigrams of
    * ln P(w2|w1) = ln((C_ref(w1w2)+1) / (C_ref(w1)+V_ref)). Bigrams and
    * first-words absent from the reference fall back to count 0 (pure
    * smoothing mass), so text unlike the reference floors toward
    * ln(1/V_ref) — which is exactly what separates other-language /
    * scrambled text from fluent target text. [[bigramLmScore]] is the
    * self-trained special case (ref = everything).
    *
    * Determinism: per-bigram log-probs through DECIMAL(38,18) before the
    * sum (order-independent), integer count arithmetic inside the ln —
    * the oracle replays bit-for-bit. Docs with < 2 tokens have no
    * bigrams and are absent.
    *
    * Shape at 100 TB: the [[bigramLmScore]] shape (explode + hash aggs +
    * n-gram-key shuffle joins) with the model legs filtered to the
    * reference slice; the model is dictionary-grain (distinct n-grams),
    * never corpus-grain.
    */
  def bigramLmScoreRef(df: DataFrame, idCol: String, textCol: String,
                       refCol: Column): DataFrame = {
    val (bigr, refTok) = lmFramesShared(df, idCol, textCol, refCol)
    bigramLmScoreOn(bigr, refTok)
  }

  /** Shared tokenize/explode front end for the bigram LMs: `bigr` =
    * (id, _ref, bg, w1, w2), one row per bigram of every ≥2-token doc;
    * `refTok` = one (tok) row per token of every reference-slice doc
    * (INCLUDING <2-token docs — the vocabulary sees them even though the
    * bigram stream can't). Both [[bigramLmScoreOn]] and [[knLmScoreOn]]
    * consume exactly these frames, so a bake-off like q_kn_heldout can
    * tokenize ONCE (localCheckpoint both) and train both models from the
    * same pass instead of re-exploding the corpus per model.
    */
  def lmFrames(df: DataFrame, idCol: String, textCol: String,
               refCol: Column): (DataFrame, DataFrame) = {
    // fanOut once: both frames' tokenize/explode legs are scan-side
    val wide = ScaleOps.fanOut(df)
    val arr = wide.select(col(idCol).as("id"), refCol.as("_ref"),
        graft.functions.TextAnalysis.tokensArr(col(textCol)).as("a"))
      .filter(size(col("a")) >= 2)
    val bigr = arr.select(col("id"), col("_ref"),
        explode(graft.functions.TextAnalysis.ngramsArr(col("a"), 2)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val refTok = wide.filter(refCol)
      .select(explode(graft.functions.TextAnalysis.tokensArr(col(textCol)))
        .as("tok"))
    (bigr, refTok)
  }

  /** [[lmFrames]] with both frames materialized ONCE (localCheckpoint).
    * Every model built on the frames references them several times (the
    * add-one legs read bigr 2x / refTok 2x; the KN legs read bigr 4x) and
    * Catalyst does not dedupe common subtrees — each leg's branch re-runs
    * the full corpus tokenize/explode up to its first exchange. One
    * materialized pass beats 3-5 re-scans at any scale; this is the
    * q_kn_heldout share-the-tokenize-pass treatment applied at the
    * library layer so every scoring entry point gets it.
    */
  def lmFramesShared(df: DataFrame, idCol: String, textCol: String,
                     refCol: Column): (DataFrame, DataFrame) = {
    val (bigr, refTok) = lmFrames(df, idCol, textCol, refCol)
    (bigr.localCheckpoint(), refTok.localCheckpoint())
  }

  /** Add-one model + scoring over pre-built [[lmFrames]] output —
    * identical arithmetic to the original inline form, factored so the
    * frames can be shared across models.
    */
  def bigramLmScoreOn(bigr: DataFrame, refTok: DataFrame): DataFrame = {
    val uni = refTok.groupBy("tok").agg(count(lit(1)).as("cu"))
    val big = bigr.filter(col("_ref")).groupBy("bg").agg(count(lit(1)).as("cb"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    bigr.join(big, Seq("bg"), "left")
      .join(uni.withColumnRenamed("tok", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
        (coalesce(col("cu"), lit(0L)) + col("v")).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(38,18)")).as("_slp"))
      .select(col("id"), col("n_bigrams"),
        round(col("_slp").cast("double") / col("n_bigrams").cast("double"), 4)
          .as("lm_score"))
  }

  /** Language-ID / fluency GATE — [[bigramLmScoreRef]] composed into the
    * per-doc keep/drop verdict every corpus pipeline runs after the rule
    * gate: score every doc under the reference-slice bigram model, keep
    * when `lm_score >= threshold`. Pick the threshold by sweeping the
    * curve ([[EvalMetrics.prCurve]] over these scores — the q_lm_sweep
    * operating-point table); the gate itself is one fixed comparison so
    * the verdict replays exactly.
    *
    * Output: (id, n_bigrams, lm_score, keep). Docs with < 2 tokens are
    * absent (unscorable — route them to the rule gate's length cut).
    */
  def lmFilter(df: DataFrame, idCol: String, textCol: String,
               refCol: Column, threshold: Double): DataFrame =
    bigramLmScoreRef(df, idCol, textCol, refCol)
      .withColumn("keep", col("lm_score") >= threshold)

  /** Interpolated Kneser-Ney bigram LM score (Kneser & Ney 1995; Chen &
    * Goodman 1999 — the standard n-gram smoothing, consistently better
    * held-out perplexity than add-one because the backoff weight of a
    * word is its CONTEXT-TYPE count, not its raw frequency: "Francisco"
    * is frequent but follows almost nothing except "San", so KN backs
    * off to it far less than add-one does). Train on the `refCol` slice,
    * score every doc — drop-in upgrade for the [[lmFilter]] fluency gate.
    *
    *   P(w2|w1) = max(c(w1w2)−d, 0)/c(w1·) + d·N1+(w1,·)/c(w1·) · Pc(w2)
    *   Pc(w2)   = (N1+(·,w2) + 1) / (B + V)        (open-vocab smoothed)
    *   unseen w1 → P(w2|w1) = Pc(w2)               (pure continuation)
    *
    * with d = 0.75 (the Chen-Goodman fixed discount), c(w1·) = bigram
    * starts of w1 in ref, N1+(w1,·)/N1+(·,w2) = distinct successor /
    * predecessor TYPE counts, B = distinct ref bigrams, V = ref vocab.
    * The +1/(B+V) continuation smoothing keeps every probability
    * positive for out-of-reference words (the same open-vocab floor the
    * add-one model gets from its +1).
    *
    * Determinism: per-bigram ln-probs are QUANTIZED (round 9) before the
    * DECIMAL(38,18) sum — the zipfFit recipe — so the per-doc mean
    * replays bit-for-bit cross-engine. Docs with < 2 tokens are absent.
    *
    * Shape at 100 TB: identical to [[bigramLmScoreRef]] — explode + hash
    * aggregations + shuffle joins on n-gram keys; every model leg
    * (bigram counts, context totals, successor/predecessor type counts)
    * is dictionary-grain, the type totals are a 1-row broadcast.
    */
  def knLmScore(df: DataFrame, idCol: String, textCol: String,
                refCol: Column, discount: Double = KnDiscount): DataFrame = {
    val (bigr, refTok) = lmFramesShared(df, idCol, textCol, refCol)
    knLmScoreOn(bigr, refTok, discount)
  }

  /** The Chen-Goodman fixed discount — the SINGLE source of the KN d:
    * [[knLmScore]]'s default and the oracle SQL's interpolated literal
    * both read this constant, so the Scala op and its DuckDB twin cannot
    * silently disagree on the operating point.
    */
  val KnDiscount: Double = 0.75

  /** KN model + scoring over pre-built [[lmFrames]] output (see
    * [[knLmScore]] for the math and determinism notes).
    */
  def knLmScoreOn(bigr: DataFrame, refTok: DataFrame,
                  discount: Double = KnDiscount): DataFrame = {
    require(discount > 0 && discount < 1, s"knLmScore discount: $discount")
    // model legs — all dictionary-grain, trained on the ref slice only
    val refBg = bigr.filter(col("_ref"))
    val big = refBg.groupBy("bg").agg(count(lit(1)).as("cb"))       // c(w1w2)
    val ctx = refBg.groupBy("w1").agg(count(lit(1)).as("cw"),       // c(w1·)
      count_distinct(col("w2")).as("n1f"))                          // N1+(w1,·)
    val cont = refBg.groupBy("w2")
      .agg(count_distinct(col("w1")).as("n1b"))                     // N1+(·,w2)
    val vocab = refTok.agg(count_distinct(col("tok")).as("v"))
    val btypes = big.agg(count(lit(1)).as("b"))
    val d = lit(discount)
    bigr.join(big, Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(btypes))
      .withColumn("pc",
        (coalesce(col("n1b"), lit(0L)) + 1).cast("double") /
          (col("b") + col("v")).cast("double"))
      .withColumn("p", when(col("cw").isNull, col("pc"))
        .otherwise(
          greatest(coalesce(col("cb"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("cw").cast("double") +
          d * col("n1f").cast("double") / col("cw").cast("double") * col("pc")))
      .withColumn("lp", round(log(col("p")), 9))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(38,18)")).as("_slp"))
      .select(col("id"), col("n_bigrams"),
        round(col("_slp").cast("double") / col("n_bigrams").cast("double"), 4)
          .as("kn_score"))
  }

  /** FILL-IN-THE-MIDDLE transformation (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle" — the code-LLM
    * data-prep transform): with probability `rate`, a document is split
    * at two uniform character positions into (prefix, middle, suffix)
    * and re-serialized in PSM order with sentinel tokens —
    * `<|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle` — so the
    * model learns to infill; the rest of the corpus passes through
    * unchanged (the paper's joint objective).
    *
    * Everything is deterministic: the FIM coin and both split positions
    * are [[Sampling.hashDraw]]s of the id (independent salts), so the
    * transform is retry-stable, partitioning-independent, and
    * oracle-replayable character for character. Split positions are
    * uniform over [0, len] (empty pieces are legal — the paper keeps
    * them). Output: (id, fim, pre_len, mid_len, suf_len, text_out);
    * non-FIM rows report (len, 0, 0).
    *
    * Shape at 100 TB: one codegen'd projection at scan grain — no
    * shuffle, no state, safe inside any ingest chain.
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
               rate: Double = 0.5, salt: String = "fim"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"fimSplit rate: $rate")
    val len = length(col(textCol))
    val thr = math.floor(rate * 4294967296.0).toLong
    val fim = Sampling.hashDraw(col(idCol), salt + ":p") < lit(thr)
    val da = pmod(Sampling.hashDraw(col(idCol), salt + ":a"),
      (len + 1).cast("long"))
    val db = pmod(Sampling.hashDraw(col(idCol), salt + ":b"),
      (len + 1).cast("long"))
    val lo = least(da, db).cast("int")
    val hi = greatest(da, db).cast("int")
    val pre = col(textCol).substr(lit(1), lo)
    val mid = col(textCol).substr(lo + 1, hi - lo)
    val suf = col(textCol).substr(hi + 1, len - hi)
    df.select(col(idCol).as("id"), fim.as("fim"),
      when(fim, lo.cast("long")).otherwise(len.cast("long")).as("pre_len"),
      when(fim, (hi - lo).cast("long")).otherwise(lit(0L)).as("mid_len"),
      when(fim, (len - hi).cast("long")).otherwise(lit(0L)).as("suf_len"),
      when(fim, concat(lit("<|fim_pre|>"), pre, lit("<|fim_suf|>"), suf,
          lit("<|fim_mid|>"), mid))
        .otherwise(col(textCol)).as("text_out"))
  }

  /** Cavnar-Trenkle n-gram rank-profile language ID (Cavnar & Trenkle
    * 1994, "N-Gram-Based Text Categorization" — the langid/CLD lineage's
    * root algorithm, and the concrete form of the reference-era
    * "language-ID by n-gram heuristic"): per language, the TRAINING
    * slice's top-`profileK` character n-grams by frequency form a rank
    * profile; a document is classified by the OUT-OF-PLACE distance —
    * for each of the doc's own top-`docM` n-grams, |doc rank − profile
    * rank|, or `profileK` when the gram is absent from the profile —
    * summed, argmin over languages. Text is normalized through the same
    * [[graft.functions.TextAnalysis.tokensArr]] pass as every text op
    * (lowercase, punctuation → space) and space-padded so n-grams see
    * word boundaries.
    *
    * Determinism (oracle-replayable): ranks are integers with the
    * (count DESC, gram ASC) tie-break, distances are integer sums, the
    * argmin ties on language ASC — no floats anywhere.
    *
    * Shape at 100 TB: the gram explode is in-row (rows = chars); doc
    * counts are the wordcount shape keyed (id, gram); doc ranks ride a
    * per-DOC window (bounded by one doc's distinct grams); the per-LANG
    * profile ranks go through [[ScaleOps.smallestKPerGroup]]'s two-level
    * heap — languages are few and huge, exactly the
    * one-task-window straggler that machinery exists for — and the
    * resulting profile (langs × profileK rows) broadcasts onto the
    * doc-gram stream. Docs with no tokens are absent (unclassifiable).
    *
    * Output: (id, lang, pred_lang, dist, is_train, correct), one row per
    * classifiable doc.
    */
  def langIdNgram(df: DataFrame, idCol: String, textCol: String,
                  langCol: String, trainPred: Column,
                  n: Int = 3, profileK: Int = 100, docM: Int = 50): DataFrame = {
    require(n >= 1 && profileK >= 1 && docM >= 1,
      s"langIdNgram: n/profileK/docM must be >= 1: $n/$profileK/$docM")
    val norm = concat(lit(" "),
      array_join(graft.functions.TextAnalysis.tokensArr(col(textCol)), " "),
      lit(" "))
    val base = ScaleOps.fanOut(df)
      .select(col(idCol).as("id"), col(langCol).as("lang"),
        trainPred.as("_train"), norm.as("_t"))
      .filter(length(col("_t")) >= n)
    val grams = base.select(col("id"), col("lang"), col("_train"),
      explode(transform(sequence(lit(1), length(col("_t")) - lit(n - 1)),
        i => col("_t").substr(i, lit(n)))).as("gram"))
    // (id, gram) counts feed BOTH the doc ranks and the lang profiles —
    // materialize once, the explode is a full corpus char pass
    val dCnt = grams.groupBy("id", "lang", "_train", "gram")
      .agg(count(lit(1)).as("c"))
      .withColumn("negc", -col("c"))
      .localCheckpoint()
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("negc"), col("gram"))
    val docTop = ScaleOps.smallestKPerGroup(
        dCnt.select("id", "gram", "negc"), "id", Seq("negc", "gram"), docM)
      .withColumn("rd", row_number().over(wDoc))
      .select("id", "gram", "rd")
    val pCnt = dCnt.filter(col("_train"))
      .groupBy(col("lang").as("plang"), col("gram"))
      .agg(sum(col("c")).as("c"))
      .withColumn("negc", -col("c"))
    val wLang = org.apache.spark.sql.expressions.Window
      .partitionBy("plang").orderBy(col("negc"), col("gram"))
    val profTop = ScaleOps.smallestKPerGroup(
        pCnt.select("plang", "gram", "negc"), "plang", Seq("negc", "gram"),
        profileK)
      .withColumn("rp", row_number().over(wLang))
      .select("plang", "gram", "rp")
    val langs = profTop.select("plang").distinct()
    // langs is a handful of rows: the broadcast-NLJ expansion ×L is the
    // intended plan (every doc scored under every candidate language)
    val pen = docTop.crossJoin(broadcast(langs))
      .join(broadcast(profTop), Seq("plang", "gram"), "left")
      .select(col("id"), col("plang"),
        coalesce(abs(col("rd") - col("rp")), lit(profileK)).cast("long")
          .as("pen"))
    val dist = pen.groupBy("id", "plang").agg(sum("pen").as("dist"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dist"), col("plang"))
    dist.withColumn("_rn", row_number().over(wBest)).filter(col("_rn") === 1)
      .join(base.select("id", "lang", "_train"), "id")
      .select(col("id"), col("lang"), col("plang").as("pred_lang"),
        col("dist"), col("_train").as("is_train"),
        (col("lang") === col("plang")).as("correct"))
  }

  /** Zipf-law fit of the corpus frequency spectrum (Zipf 1949; the
    * sanity panel every corpus data card carries — a healthy natural
    * corpus fits log f ≈ α·log r + c with α ≈ −1; boilerplate floods
    * flatten the head, OCR/garbage fattens the tail): OLS of ln(freq)
    * on ln(rank) over the top `topN` tokens by frequency.
    *
    * Shape at 100 TB: one wordcount (map-side-combined, shuffle =
    * vocabulary), a distributed TakeOrdered for the top-N (never a
    * global sort), and a single bounded agg — the window rank runs over
    * topN rows only. Cross-engine: both ln values are QUANTIZED (round
    * 9) before the decimal sums and every product is an exact IEEE
    * double of quantized inputs (the logreg gradient recipe), so the
    * fitted coefficients replay bit-for-bit.
    *
    * Output: one row (n_ranks, slope, intercept, r2), round 6.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    require(topN >= 2, s"zipfFit topN: $topN")
    val freq = df
      .select(explode(graft.functions.TextAnalysis.tokensArr(col(textCol)))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val top = freq.orderBy(col("c").desc, col("tok").asc).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok").asc)))
    val q = top.select(
      round(log(col("rank").cast("double")), 9).as("x"),
      round(log(col("c").cast("double")), 9).as("y"))
    val s = q.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,18)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,18)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,18)")).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,18)")).cast("double").as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varx = col("n") * col("sxx") - col("sx") * col("sx")
    val vary = col("n") * col("syy") - col("sy") * col("sy")
    s.select(col("n").cast("long").as("n_ranks"),
      round(cov / varx, 6).as("slope"),
      round((col("sy") - (cov / varx) * col("sx")) / col("n"), 6).as("intercept"),
      round(cov * cov / (varx * vary), 6).as("r2"))
  }

  /** Heaps-law vocabulary growth (Heaps 1978: V(n) ≈ K·n^β, β < 1 for
    * natural text — a vocabulary growing LINEARLY with corpus size means
    * ids/noise, one that plateaus hard means boilerplate): cumulative
    * token and distinct-type counts at `buckets` id-prefix cut points.
    *
    * Computed WITHOUT a per-cut corpus pass: one agg produces each
    * token's FIRST-occurrence doc id and each doc's token count; a
    * bounded broadcast join against the cut list (buckets rows, cuts in
    * VALUE space off one max(id) aggregate — no global rank over doc
    * ids) then cumulates both. Vocabulary at cut c = tokens whose first
    * occurrence ≤ c — the identity that turns 10 distinct-counts into
    * one. Output: (bucket, cut, n_tokens, vocab) per cut.
    */
  def heapsGrowth(df: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"heapsGrowth buckets: $buckets")
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(graft.functions.TextAnalysis.tokensArr(col(textCol))).as("tok"))
    val firstSeen = toks.groupBy("tok").agg(min(col("id")).as("first_id"))
    val perDoc = toks.groupBy("id").agg(count(lit(1)).as("n_tok"))
    val maxId = df.agg(max(col(idCol).cast("long")).as("mx"))
    val cuts = maxId.select(explode(sequence(lit(1), lit(buckets)))
        .as("bucket"), col("mx"))
      .select(col("bucket").cast("long").as("bucket"),
        // integer division: `/` would go through double and drift at scale
        expr(s"CAST(bucket AS BIGINT) * mx DIV $buckets").as("cut"))
    val nTok = perDoc.crossJoin(broadcast(cuts))
      .filter(col("id") <= col("cut"))
      .groupBy("bucket", "cut").agg(sum(col("n_tok")).as("n_tokens"))
    val vocab = firstSeen.crossJoin(broadcast(cuts))
      .filter(col("first_id") <= col("cut"))
      .groupBy("bucket", "cut").agg(count(lit(1)).as("vocab"))
    nTok.join(vocab, Seq("bucket", "cut"))
      .select(col("bucket"), col("cut"), col("n_tokens"), col("vocab"))
  }
}
