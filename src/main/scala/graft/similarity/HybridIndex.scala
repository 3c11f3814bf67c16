package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HYBRID retrieval index persistence — the serving handoff for
  * BM25 + vector-ANN search ([[Similarity.rrfFuse]] over
  * [[graft.ops.TextOps.bm25TopK]] and [[Similarity.bqTopK]] legs).
  *
  * The in-session hybrid recomputes the BM25 statistics and the binary-
  * quantization code table per session; a production retrieval stack
  * builds them ONCE beside the corpus and serves queries from the
  * exported tables. [[export]] materializes both legs' statistics as
  * plain parquet under one root with the [[IndexPublish]] atomic
  * versioned-publish protocol (readers never see a partial index), and
  * [[servedTopK]] answers hybrid queries from disk with results
  * bit-identical to the in-session composition: the scoring tails are
  * the batch ops' OWN builders ([[graft.ops.TextOps.bm25Rank]],
  * [[Similarity.bqRank]], [[Similarity.rrfFuse]] — shared code, cannot
  * drift), and parquet round-trips longs and doubles exactly.
  *
  * Layout under each published version root `path/v{N}`:
  *  - `postings/`    (tok, doc_id, dl, tf) — the full inverted lists
  *    over EVERY token (a serving index answers arbitrary queries, not a
  *    fixed batch); one token-linear corpus pass.
  *  - `termstats/`   (tok, df) — per-term document frequencies.
  *  - `corpusstats/` one row (n_docs, avgdl): n_docs over ALL documents,
  *    avgdl over documents with >= 1 token (the bm25TopK convention).
  *  - `bqcodes/`     (vec_id, code) — the 48-bit sign codes
  *    ([[Similarity.bqTopK]]'s Hamming scan tier; 16 bytes/row).
  *  - `vectors/`     (vec_id, v, n) — full vectors + precomputed norms
  *    for the exact-cosine re-rank of the BQ shortlist.
  *  - `manifest/`    (component, rows) — exact READ-BACK counts (the
  *    source-of-truth rule: the manifest says what landed).
  *
  * Scale shape: every export pass is one linear scan + a key-grain
  * aggregation (postings are the wordcount shape); serving reads the
  * postings of the query terms only (broadcast term join — predicate
  * pushdown on `tok`), the 16 B/row code table, and the shortlisted
  * vectors. At 100 TB the postings would additionally be bucketed by
  * `tok` for static pruning; the layout is otherwise unchanged.
  */
object HybridIndex {

  import graft.functions.VectorOps.vec_norm

  /** Build + publish the hybrid index; returns the manifest
    * (component, rows) from read-back counts.
    */
  def export(spark: SparkSession, docs: DataFrame, docId: String,
             textCol: String, vectors: DataFrame, vecId: String,
             vecCol: String, path: String, bits: Int = 48, table: Int = 1,
             maxDim: Int = 1024): DataFrame = {
    val (root, next, prev) = IndexPublish.begin(spark, path)
    val base = docs.select(col(docId).as("doc_id"),
      graft.functions.TextAnalysis.tokensArr(col(textCol)).as("toks"))
    val postings = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .groupBy("tok", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // 2 consumers: the sink + termstats
    postings.write.mode("overwrite").parquet(s"$root/postings")
    postings.groupBy("tok").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$root/termstats")
    // n_docs over ALL documents (zero-token docs included); avgdl over
    // documents with >= 1 token — the bm25TopK/oracle convention. dl
    // comes from the CHECKPOINTED postings (exactly the >= 1-token docs,
    // one row per (tok, doc)) — never a second tokenization scan.
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(postings.select("doc_id", "dl").distinct()
        .agg((sum("dl").cast("double") / count(lit(1)).cast("double"))
          .as("avgdl")))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/corpusstats")
    val vecs = vectors.select(col(vecId).as("vec_id"),
      Similarity.asDouble(col(vecCol)).as("v"))
    vecs.select(col("vec_id"),
        Similarity.lshBucket(col("v"), bits, table, maxDim).as("code"))
      .write.mode("overwrite").parquet(s"$root/bqcodes")
    vecs.withColumn("n", vec_norm(col("v")))
      .write.mode("overwrite").parquet(s"$root/vectors")
    val manifest = writeManifest(spark, root)
    IndexPublish.publish(spark, path, next, prev)
    manifest
  }

  private val Components =
    Seq("postings", "termstats", "corpusstats", "bqcodes", "vectors")

  private def writeManifest(spark: SparkSession, root: String): DataFrame = {
    val manifest = Components.map { c =>
      spark.read.parquet(s"$root/$c")
        .agg(count(lit(1)).as("rows"))
        .select(lit(c).as("component"), col("rows"))
    }.reduce(_ unionByName _).orderBy("component").localCheckpoint()
    manifest.write.mode("overwrite").parquet(s"$root/manifest")
    manifest
  }

  /** Answer hybrid top-k FROM THE EXPORTED TABLES: the BM25 leg scores
    * the query terms' postings with [[graft.ops.TextOps.bm25Rank]], the
    * vector leg Hamming-shortlists the stored code table and re-ranks
    * with [[Similarity.bqRank]] (stored norms reused), and the legs fuse
    * through [[Similarity.rrfFuse]] — bit-identical to the in-session
    * `rrfFuse(bm25TopK, bqTopK)` composition over the same corpus/params.
    */
  def servedTopK(spark: SparkSession, path: String,
                 lexQueries: Seq[(Int, Seq[String])], queryVecs: DataFrame,
                 queryId: String, queryVec: String, k: Int, legK: Int = 20,
                 cands: Int = 100, k1: Double = 1.2, b: Double = 0.75,
                 bits: Int = 48, table: Int = 1, maxDim: Int = 1024,
                 k0: Int = 60): DataFrame = {
    require(lexQueries.nonEmpty && lexQueries.forall(_._2.nonEmpty),
      "servedTopK: empty lexical query batch")
    import spark.implicits._
    // resolve ONCE so every component comes from the same version even if
    // a rebuild publishes mid-query
    val root = IndexPublish.resolve(spark, path)
    val qt = lexQueries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "tok")
    val terms = qt.select("tok").distinct()
    val hits = spark.read.parquet(s"$root/postings")
      .join(broadcast(terms), "tok")
      .select("doc_id", "dl", "tok", "tf")
    val dfreq = spark.read.parquet(s"$root/termstats")
      .join(broadcast(terms), "tok")
    val stats = spark.read.parquet(s"$root/corpusstats")
    val lex = graft.ops.TextOps.bm25Rank(hits, dfreq, stats, qt, legK, k1, b)
      .select(col("qid").as("query_id"), col("doc_id"), col("rank"))
    val q0 = queryVecs
      .select(col(queryId).as("query_id"),
        Similarity.asDouble(col(queryVec)).as("qv"))
      .withColumn("qn", vec_norm(col("qv")))
      .withColumn("qcode", Similarity.lshBucket(col("qv"), bits, table, maxDim))
    val vec = Similarity.bqRank(
        spark.read.parquet(s"$root/bqcodes"),
        spark.read.parquet(s"$root/vectors")
          .select(col("vec_id"), col("v").as("cv"), col("n").as("cn")),
        q0, legK, cands)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    Similarity.rrfFuse(Seq(lex, vec), k, k0)
  }
}
