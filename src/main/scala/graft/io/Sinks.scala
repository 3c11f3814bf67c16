package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output surface — the analog of Disco's task output streams
  * (reference: worker/task_io.py:319-331 plain-text out, DDFS blob save).
  * Writes go through Spark's commit protocol (staging + atomic rename), the
  * same guarantee Disco gets from DDFS tag flips.
  */
object Sinks {

  /** Plain text sink (task_io.py:319-331): one record per line, columns
    * joined by `sep`. Overwrite is atomic per the commit protocol.
    */
  def writeText(df: DataFrame, path: String, sep: String = "\t"): Unit =
    // null-safe: concat_ws silently DROPS nulls, which would shift every
    // later field left; empty-string them to keep field positions stable
    df.select(concat_ws(sep,
        df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
        .as("value"))
      .write.mode("overwrite").text(path)

  /** CSV sink with header. */
  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", sep)
      .csv(path)

  /** JSONL sink — one JSON object per line (string fields escaped by the
    * writer, so embedded newlines/quotes round-trip, unlike raw text).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet sink — the default chunk format (replaces Disco chunks). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** ORC sink — the other mainstream columnar format (Spark-native reader/
    * writer, predicate pushdown and column pruning like parquet); for
    * interop with ORC-standardized warehouses.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-partitioned parquet sink: one directory per distinct value of
    * `partitionCols` — THE layout that lets a predicate on those columns
    * skip entire directories at planning time (partition pruning: a
    * `lang='en'` filter over a 100 TB corpus reads only `lang=en/`).
    * Choose low-cardinality columns: a high-cardinality partition column
    * degenerates into the millions-of-small-files pathology
    * ([[graft.ops.ScaleOps.compactParquet]] is the repair, prevention is
    * better).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Parquet sink that also registers the output under the job-results tag
    * `job:results:<jobName>` (ddfs.py:288-292, `disco:job:results:<jobname>`
    * — Disco auto-tags every job's outputs so downstream jobs can consume
    * them by name). Read it back with `catalog.read("job:results:<name>")`.
    */
  def writeResults(df: DataFrame, path: String,
                   catalog: TagCatalog, jobName: String): Unit = {
    writeParquet(df, path)
    catalog.put(s"job:results:$jobName", Seq(path))
  }
}

/** Scratch dir for io round-trip queries (DDFS temp-space analog). */
object IoScratch {
  val dir: String =
    sys.env.getOrElse("GRAFT_SCRATCH", "/root/repo/target/io_scratch")
}
