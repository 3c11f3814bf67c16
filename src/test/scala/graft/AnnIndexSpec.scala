package graft

import graft.similarity.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Round-trip parity for the exported ANN index: the serving path over
  * the persisted tables must answer exactly what the in-session
  * operators answer.
  */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def embs = graft.core.Tables.embeddings(spark, sfDir)
  private def path = graft.io.IoScratch.dir + "/ann_index_spec"

  test("servedTopK over the exported index is bit-identical to ivfTopK") {
    AnnIndex.export(spark, embs, "vec_id", "embedding", path,
      cells = 4, lloydIters = 3, m = 4, ks = 4, pqIters = 3)
    val direct = Similarity.ivfTopK(embs, "vec_id", "embedding",
        embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, cells = 4, nProbe = 2, lloydIters = 3)
      .orderBy("query_id", "vec_id")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val served = AnnIndex.servedTopK(spark, path,
        embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nProbe = 2)
      .orderBy("query_id", "vec_id")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(served == direct)
  }

  test("loadCodebooks round-trips pqTrain; ADC from disk matches in-session ADC") {
    AnnIndex.export(spark, embs, "vec_id", "embedding", path,
      cells = 4, lloydIters = 3, m = 4, ks = 4, pqIters = 3)
    val cbs = Similarity.pqTrain(spark, embs, "vec_id", "embedding",
      m = 4, ks = 4, iterations = 3)
    assert(AnnIndex.loadCodebooks(spark, path) == cbs)
    val queries = embs.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val fresh = Similarity.pqSearchAdc(
        Similarity.pqEncode(embs, "vec_id", "embedding", cbs)
          .select(col("id"), col("codes")),
        cbs, queries, k = 5)
      .orderBy("query_id", "vec_id")
      .as[(Long, Long, Int, Double)].collect().toSeq
    val fromDisk = Similarity.pqSearchAdc(
        spark.read.parquet(s"$path/codes")
          .select(col("vec_id").as("id"), col("codes")),
        AnnIndex.loadCodebooks(spark, path), queries, k = 5)
      .orderBy("query_id", "vec_id")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(fromDisk == fresh)
  }

  test("manifest counts what landed; re-export overwrites cleanly") {
    val m1 = AnnIndex.export(spark, embs, "vec_id", "embedding", path,
        cells = 4, lloydIters = 3, m = 4, ks = 4, pqIters = 3)
      .as[(String, Long, Long)].collect().toSeq
    val n = embs.count()
    assert(m1.filter(_._1 == "vectors").map(_._3).sum == n)
    assert(m1.find(_._1 == "codes").get._3 == n)
    assert(m1.find(_._1 == "centroids").get._3 == 4L)
    assert(m1.find(_._1 == "codebooks").get._3 == 16L)
    // a second export at DIFFERENT cell count must fully replace the
    // first layout (stale cell directories must not survive)
    val m2 = AnnIndex.export(spark, embs, "vec_id", "embedding", path,
        cells = 2, lloydIters = 3, m = 4, ks = 4, pqIters = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(m2.filter(_._1 == "vectors").map(_._3).sum == n)
    assert(m2.count(_._1 == "vectors") == 2)
    assert(spark.read.option("basePath", s"$path/vectors")
      .parquet(s"$path/vectors").count() == n)
  }
}
