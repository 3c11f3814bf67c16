package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index PERSISTENCE — the serving handoff of a 100 TB index build.
  *
  * [[Similarity.ivfTopK]] and the PQ machinery compute their structures
  * per session; a production vector store builds the index ONCE and
  * serves it for months. [[export]] materializes every structure as
  * plain parquet tables under one root (no custom format — any engine
  * that reads parquet can serve it), and [[servedTopK]] answers queries
  * from the exported tables with results bit-identical to the in-session
  * [[Similarity.ivfTopK]] (spec-pinned round-trip parity).
  *
  * Layout under `path`:
  *  - `centroids/`  (cell INT, v ARRAY<DOUBLE>) — the coarse quantizer,
  *    `cells` rows; tiny, the serving process loads it once.
  *  - `vectors/`    hive-partitioned by `cell`: (vec_id, v, n) — the
  *    inverted lists. The partition layout IS the index: a probe of
  *    nProbe cells reads only those directories (static pruning when the
  *    probe list is literal, dynamic partition pruning under the
  *    broadcast probe join).
  *  - `codebooks/`  (sub INT, cluster INT, v ARRAY<DOUBLE>) — PQ
  *    codebooks, m×ks rows; loaded driver-side for ADC lookup tables.
  *  - `codes/`      (vec_id, cell, codes ARRAY<INT>, recon_err) — the
  *    PQ-compressed corpus (the memory-resident serving tier; ~dim/m
  *    bytes per vector instead of 4·dim).
  *  - `manifest/`   (component, cell, rows) — exact READ-BACK counts
  *    (the [[graft.io.Sinks.writeSharded]] source-of-truth rule: the
  *    manifest says what landed, not what was supposed to land);
  *    per-cell rows for the inverted lists, -1 for unpartitioned
  *    components.
  *
  * Scale shape: the quantizer/codebook fits are the bounded driver pulls
  * of [[graft.chain.KMeans]]; the corpus is written once, hive-
  * partitioned on the cell id (cells ∝ n keeps directories scan-sized);
  * the manifest is one read-back count per component. At 100 TB train
  * both quantizers on a [[graft.ops.Sampling.hashSample]] and raise
  * `cells` — the layout is unchanged.
  */
object AnnIndex {

  import graft.functions.VectorOps.vec_norm

  private def del(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite semantics for the whole index root: a previous export's
    // components at a different layout must not survive beside the new
    // ones and duplicate reads (the q_chunk_format lesson)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Build + persist the IVF(+PQ) index; returns the manifest
    * (component, cell, rows) from read-back counts.
    *
    * `fitRate` < 1 trains the coarse quantizer on a deterministic hash
    * sample (the [[Similarity.semDedupSampledFit]] contract — at
    * cells ∝ n a full-corpus Lloyd is the superlinear term; the sampled
    * fit pays one full assign pass instead). 1.0 reproduces the full fit
    * bit-for-bit.
    */
  def export(spark: SparkSession, corpus: DataFrame, idCol: String,
             vecCol: String, path: String, cells: Int = 16,
             lloydIters: Int = 3, m: Int = 4, ks: Int = 16,
             pqIters: Int = 3, fitRate: Double = 1.0,
             salt: String = "annfit", assignNProbe: Int = 0): DataFrame = {
    import spark.implicits._
    del(spark, path)
    val fit =
      if (fitRate >= 1.0) corpus
      else graft.ops.Sampling.hashSample(corpus, col(idCol), fitRate, salt)
    val (centers, fitAssigned) =
      graft.chain.KMeans.run(spark, fit, idCol, vecCol, cells, lloydIters)
    val assigned =
      if (fitRate >= 1.0) fitAssigned
      else if (assignNProbe > 0)
        graft.chain.KMeans.assignRouted(corpus, idCol, vecCol, centers, assignNProbe)
      else graft.chain.KMeans.assign(corpus, idCol, vecCol, centers)
    centers.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    graft.io.Sinks.writePartitioned(
      assigned.select(col("id").as("vec_id"), col("v"),
        vec_norm(col("v")).as("n"), col("cluster").as("cell")),
      s"$path/vectors", Seq("cell"))
    val cbs = Similarity.pqTrain(spark, corpus, idCol, vecCol, m, ks, pqIters)
    (for { (cb, s) <- cbs.zipWithIndex; (c, j) <- cb.zipWithIndex }
      yield (s, j, c)).toDF("sub", "cluster", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Similarity.pqEncode(corpus, idCol, vecCol, cbs)
      .withColumnRenamed("id", "vec_id")
      .join(assigned.select(col("id").as("vec_id"),
        col("cluster").as("cell")), "vec_id")
      .select("vec_id", "cell", "codes", "recon_err")
      .write.mode("overwrite").parquet(s"$path/codes")
    writeManifest(spark, path)
  }

  /** Recompute + persist the manifest from READ-BACK counts (the
    * source-of-truth rule): per-cell rows for the inverted lists, -1 for
    * the unpartitioned components.
    */
  private def writeManifest(spark: SparkSession, path: String): DataFrame = {
    val perCell = spark.read.option("basePath", s"$path/vectors")
      .parquet(s"$path/vectors")
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("rows"))
      .select(lit("vectors").as("component"), col("cell"), col("rows"))
    val flat = Seq("centroids", "codebooks", "codes").map { c =>
      spark.read.parquet(s"$path/$c")
        .agg(count(lit(1)).as("rows"))
        .select(lit(c).as("component"), lit(-1L).as("cell"), col("rows"))
    }.reduce(_ unionByName _)
    val manifest = perCell.unionByName(flat).orderBy("component", "cell")
      .localCheckpoint()
    manifest.write.mode("overwrite").parquet(s"$path/manifest")
    manifest
  }

  /** INCREMENTAL index maintenance — the daily-shard path: append new
    * vectors to an exported index against its FROZEN quantizers (no
    * refit). Arrivals are assigned with the stored centroids (exact scan,
    * or [[graft.chain.KMeans.assignRouted]] via `assignNProbe` at large
    * cell counts), appended to the hive-partitioned inverted lists,
    * PQ-encoded against the stored codebooks and appended to `codes/`;
    * the manifest is recomputed from read-back counts. A 100 TB index
    * absorbs arriving shards in one linear pass each — retraining is an
    * explicit [[export]] rebuild, triggered by the drift/recall monitors
    * (q_embed_drift, q_ann_recall), never implicit. Deterministic and
    * ORDER-INVARIANT: the frozen quantizers make the final lists a pure
    * function of the vector set, whatever the append batching.
    *
    * Returns the refreshed manifest.
    */
  def append(spark: SparkSession, newVectors: DataFrame, idCol: String,
             vecCol: String, path: String,
             assignNProbe: Int = 0): DataFrame = {
    val centers = loadCentroids(spark, path)
    val assigned =
      if (assignNProbe > 0)
        graft.chain.KMeans.assignRouted(newVectors, idCol, vecCol, centers,
          assignNProbe)
      else graft.chain.KMeans.assign(newVectors, idCol, vecCol, centers)
    assigned.select(col("id").as("vec_id"), col("v"),
        vec_norm(col("v")).as("n"), col("cluster").as("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
    val cbs = loadCodebooks(spark, path)
    Similarity.pqEncode(newVectors, idCol, vecCol, cbs)
      .withColumnRenamed("id", "vec_id")
      .join(assigned.select(col("id").as("vec_id"),
        col("cluster").as("cell")), "vec_id")
      .select("vec_id", "cell", "codes", "recon_err")
      .write.mode("append").parquet(s"$path/codes")
    writeManifest(spark, path)
  }

  /** The coarse quantizer from an exported index (cells×dim doubles —
    * the bounded serving-process pull).
    */
  def loadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

  /** PQ codebooks from an exported index (m×ks×subDim doubles). */
  def loadCodebooks(spark: SparkSession, path: String): Seq[Seq[Seq[Double]]] =
    spark.read.parquet(s"$path/codebooks").orderBy("sub", "cluster")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](2).toSeq)).toSeq
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))

  /** Answer IVF top-k FROM THE EXPORTED TABLES — the serving path: load
    * the (tiny) centroid table, probe each query's nProbe nearest cells,
    * exact-cosine re-rank only those cells' inverted lists (stored norms
    * reused). Bit-identical to [[Similarity.ivfTopK]] over the same
    * corpus/params: same probe rule ([[Similarity.probeCells]] — shared
    * code, cannot drift), same rank tail, and parquet round-trips
    * doubles exactly.
    */
  def servedTopK(spark: SparkSession, path: String, queries: DataFrame,
                 queryId: String, queryVec: String, k: Int,
                 nProbe: Int = 2): DataFrame = {
    val centers = loadCentroids(spark, path)
    val lists = spark.read.option("basePath", s"$path/vectors")
      .parquet(s"$path/vectors")
      .select(col("vec_id"), col("v").as("cv"), col("n").as("cn"), col("cell"))
    Similarity.rankTopK(lists.join(
      broadcast(Similarity.probeCells(queries, queryId, queryVec, centers,
        nProbe)), "cell"), k)
  }
}
