package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Input surface — the Spark-native analog of Disco's io schemes + readers
  * (reference: lib/disco/schemes/__init__.py:28-42 dispatch,
  * scheme_raw.py:1-11, worker/task_io.py:251-317 readers).
  *
  * Everything returns a lazy DataFrame scan: Catalyst keeps pushdown and
  * pruning, Spark's FileSourceScan splits large files into tasks
  * (maxPartitionBytes) — a 100 TB text/CSV corpus parallelizes for free,
  * with codec inference (gzip et al.) handled by the datasource layer.
  */
object Sources {

  /** Raw text line reader (`file://` + line iterator, task_io.py chain
    * default): one row per line, column `line`.
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")

  /** CSV reader (csv_reader, examples/util/simple_innerjoin.py:12-17).
    * Pass an explicit schema for production reads — schema inference is a
    * second full scan at 100 TB.
    *
    * Newline contract: [[Sinks.writeCsv]] quotes embedded newlines, but
    * parsing them back needs `multiLine = true`, which makes each file
    * UNSPLITTABLE (one task per file — a 10 GB file becomes one task).
    * Default is false (splittable, byte-range parallel); flip it only when
    * text fields genuinely carry newlines.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType = null,
              header: Boolean = true, sep: String = ",",
              multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("header", header.toString).option("sep", sep)
      .option("multiLine", multiLine.toString)
    (if (schema != null) r.schema(schema) else r.option("inferSchema", "true"))
      .csv(path)
  }

  /** JSONL reader — one JSON object per line, the de-facto LLM corpus
    * interchange format. Line-delimited ⇒ byte-range SPLITTABLE (unlike
    * multiLine JSON): a 10 GB .jsonl parallelizes for free. Pass a schema:
    * inference is a second full scan at 100 TB.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType = null,
                mode: String = "FAILFAST"): DataFrame = {
    // FAILFAST by default: PERMISSIVE (Spark's default) turns a malformed
    // line into an all-null row and downstream aggregates go silently
    // wrong — corruption must be loud
    val r = spark.read.option("mode", mode)
    (if (schema != null) r.schema(schema) else r).json(path)
  }

  /** ORC source — Spark-native columnar reader with the same pushdown/
    * pruning contract as parquet (the scan's PushedFilters/ReadSchema show
    * it); schema travels in the file footer, no inference scan needed.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolved parquet read: merge the footers of every file under
    * `path` into one superset schema (columns added over a dataset's
    * lifetime come back as nulls for files written before them) — the
    * standard contract for a long-lived 100 TB dataset whose schema grew.
    * Off by default in Spark because footer-merging costs one extra
    * distributed pass at planning time; this entry point makes the choice
    * explicit at the call site.
    */
  def readParquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** `raw://` literal source (scheme_raw.py:1-11): the payload IS the
    * record. Driver-side literals, parallelized — for seeds and unit inputs.
    */
  def raw(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(records).toDF("line")
  }

  /** `http(s)://` (or any URL) line source (scheme_http.py): the task list
    * is the URL list; each task pulls ITS url and streams lines — Disco's
    * exact worker model (inputs are http urls served by peer nodes). One
    * task per URL; for many small urls Spark schedules them across the
    * cluster, for few big ones prefer a real datasource. Connection setup
    * amortizes per URL, bytes never touch the driver.
    */
  def readUrls(spark: SparkSession, urls: Seq[String], maxRetries: Int = 3,
               backoffMs: Long = 100): DataFrame =
    readUrlsWith(spark, urls, maxRetries, backoffMs,
      u => scala.io.Source.fromURL(u)("UTF-8"))

  /** Opener-injectable variant (tests swap in a flaky opener). The URL body
    * is STREAMED — lines flow through the task iterator-to-iterator, never
    * materialized whole, so a multi-GB URL holds one line in memory, not the
    * file (round-2 fix: was getLines().toVector). Opens are retried with
    * bounded exponential backoff (comm.py:57-117 semantics — retry the
    * request, give up after `maxRetries`); a failure mid-stream is NOT
    * silently resumed (Disco resumes via HTTP Range; without a byte offset
    * a line-count resume could duplicate records, so we fail the task and
    * let Spark's task retry re-pull the URL idempotently).
    */
  private[graft] def readUrlsWith(spark: SparkSession, urls: Seq[String],
                                  maxRetries: Int, backoffMs: Long,
                                  opener: String => scala.io.Source): DataFrame = {
    import spark.implicits._
    require(urls.nonEmpty, "url read: empty url list")
    spark.createDataset(urls).repartition(urls.size)
      .flatMap { u => lines(openWithRetry(u, maxRetries, backoffMs, opener)) }
      .toDF("line")
  }

  /** Streaming line iterator over a Source that closes on exhaustion AND on
    * task completion — a consumer that stops early (limit/head) abandons
    * the iterator, so exhaustion alone would leak the handle for the
    * executor's lifetime.
    */
  private def lines(src: scala.io.Source): Iterator[String] = {
    var closed = false
    def close(): Unit = if (!closed) { closed = true; src.close() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    val it = src.getLines()
    new Iterator[String] {
      def hasNext: Boolean = {
        val h = !closed && it.hasNext
        if (!h) close()
        h
      }
      def next(): String = it.next()
    }
  }

  /** Replicated inputs (tests/test_redundant.py, util.py urllist): each
    * input is a SET of equivalent replicas; a task exhausts one replica's
    * retries, then falls over to the next — only when every replica of a
    * set fails does the task (and job) fail. Disco's redundant-input
    * contract on Spark's task model.
    */
  def readUrlsReplicated(spark: SparkSession, replicaSets: Seq[Seq[String]],
                         maxRetries: Int = 1, backoffMs: Long = 100): DataFrame =
    readUrlsReplicatedWith(spark, replicaSets, maxRetries, backoffMs,
      u => scala.io.Source.fromURL(u)("UTF-8"))

  private[graft] def readUrlsReplicatedWith(
      spark: SparkSession, replicaSets: Seq[Seq[String]],
      maxRetries: Int, backoffMs: Long,
      opener: String => scala.io.Source): DataFrame = {
    import spark.implicits._
    require(replicaSets.nonEmpty, "url read: empty replica-set list")
    require(replicaSets.forall(_.nonEmpty), "empty replica set")
    spark.createDataset(replicaSets.map(_.toList)).repartition(replicaSets.size)
      .flatMap { replicas =>
        val src = replicas.iterator.map { u =>
          try Right(openWithRetry(u, maxRetries, backoffMs, opener))
          catch { case e: java.io.IOException => Left(e) }
        }.collectFirst { case Right(s) => s }
          .getOrElse(throw new java.io.IOException(
            s"all ${replicas.size} replicas failed: ${replicas.mkString(", ")}"))
        lines(src)
      }.toDF("line")
  }

  private def openWithRetry(u: String, maxRetries: Int, backoffMs: Long,
                            opener: String => scala.io.Source): scala.io.Source = {
    var attempt = 0
    var delay = backoffMs
    while (true) {
      try return opener(u)
      catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Input-stream chain (task_io.py:339-363): readers compose — each stage
    * wraps the previous stream. Here a chain is a fold of DataFrame
    * transforms over the base source (gzip is already below this layer, as
    * in Disco).
    */
  def chain(base: DataFrame, stages: (DataFrame => DataFrame)*): DataFrame =
    stages.foldLeft(base)((df, f) => f(df))

  /** Regex record parser (re_reader, task_io.py:251-317): every match of
    * `pattern` in `textCol` becomes one record; capture group i becomes
    * column `groups(i)`. Non-matching content yields no records (the
    * reference's finditer semantics). Pure codegen'd expressions.
    */
  def reReader(df: DataFrame, textCol: String, pattern: String,
               groups: Seq[String]): DataFrame = {
    val base = df.select(
      explode(regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("_m"))
    groups.zipWithIndex.foldLeft(base) { case (d, (g, i)) =>
      d.withColumn(g, regexp_extract(col("_m"), pattern, i + 1))
    }.drop("_m")
  }
}
