package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway timing probe — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.names.foreach(n => graft.core.Tables.load(spark, sfDir, n).count())
    graft.SparkEntry.queries("q_join_agg")(spark, sfDir).count()
    // warm the array-ops codegen family with the same plan shape on a slice
    val t0w = System.nanoTime()
    val docs = graft.core.Tables.load(spark, sfDir, "documents").limit(300)
    graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.8).count()
    spark.catalog.clearCache()
    println(f"[scratch] warmup_jaccard_300 ${(System.nanoTime() - t0w) / 1e9}%.2f s")
    for (q <- Seq("q_dedup_jaccard", "q_semdedup", "q_dedup_jaccard")) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[scratch] $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
