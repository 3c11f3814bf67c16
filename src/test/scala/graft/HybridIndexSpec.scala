package graft

import graft.similarity.{HybridIndex, Similarity}
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Disk-parity for the exported hybrid index: the served path over the
  * persisted BM25 statistics + BQ code table must answer exactly what
  * the in-session rrfFuse(bm25TopK, bqTopK) composition answers.
  */
class HybridIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, sfDir)
  private def embs = graft.core.Tables.embeddings(spark, sfDir)
  private val lexQueries = Seq(1 -> Seq("scan", "column"),
    2 -> Seq("window", "sort"), 3 -> Seq("stream", "batch"))

  test("servedTopK over the exported index is bit-identical to the in-session hybrid") {
    val path = graft.io.IoScratch.dir + "/hybrid_index_spec"
    HybridIndex.export(spark, docs, "doc_id", "text",
      embs, "vec_id", "embedding", path)
    val queries = embs.filter(col("vec_id").isin(1, 2, 3))
    val lex = TextOps.bm25TopK(docs, "doc_id", "text", lexQueries, k = 20)
      .select(col("qid").as("query_id"), col("doc_id"), col("rank"))
    val vec = Similarity.bqTopK(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 20, bits = 48, cands = 100)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    val direct = Similarity.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val served = HybridIndex.servedTopK(spark, path, lexQueries,
        queries, "vec_id", "embedding", k = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(served == direct)
  }

  test("manifest counts what landed; re-export publishes a new version atomically") {
    val path = graft.io.IoScratch.dir + "/hybrid_index_spec2"
    val hconf0 = spark.sparkContext.hadoopConfiguration
    new org.apache.hadoop.fs.Path(path).getFileSystem(hconf0)
      .delete(new org.apache.hadoop.fs.Path(path), true) // clean slate: v1 next
    val m1 = HybridIndex.export(spark, docs, "doc_id", "text",
        embs, "vec_id", "embedding", path)
      .as[(String, Long)].collect().toMap
    val nVecs = embs.count()
    assert(m1("bqcodes") == nVecs && m1("vectors") == nVecs)
    assert(m1("corpusstats") == 1L)
    assert(m1("postings") >= m1("termstats")) // >= one posting per term
    val r1 = graft.similarity.AnnIndex.resolve(spark, path)
    assert(r1.endsWith("/v1"), r1)
    // the stored stats match the bm25TopK convention exactly
    val (nd, avgdl) = spark.read.parquet(s"$r1/corpusstats")
      .as[(Long, Double)].head()
    assert(nd == docs.count())
    val base = docs.select(
      graft.functions.TextAnalysis.tokensArr(col("text")).as("toks"))
      .select(size(col("toks")).cast("long").as("dl")).filter(col("dl") > 0)
    val expected = base.agg(
        (sum("dl").cast("double") / count(lit(1)).cast("double")).as("a"))
      .as[Double].head()
    assert(avgdl == expected)
    // re-export publishes v2; v1 is retained as the predecessor
    HybridIndex.export(spark, docs, "doc_id", "text",
      embs, "vec_id", "embedding", path)
    assert(graft.similarity.AnnIndex.resolve(spark, path).endsWith("/v2"))
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/v1/_PUBLISHED")))
  }
}
