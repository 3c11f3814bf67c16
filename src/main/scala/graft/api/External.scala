package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** External program interface — Disco's external-worker protocol
  * (reference: lib/disco/worker/classic/external.py:56-170: records are
  * piped over stdin/stdout of a user binary running next to each task).
  *
  * Spark shape: `RDD.pipe` — each partition's rows stream to one process
  * instance's stdin (line-delimited), its stdout lines become the output
  * partition. Process startup amortizes per partition, data never touches
  * the driver; at 1000 executors that's 1000 concurrent local processes,
  * exactly the reference's deployment shape.
  */
object External {

  /** Pipe a single-string-column DataFrame through `command` line-by-line. */
  def pipe(spark: SparkSession, input: Dataset[String],
           command: Seq[String]): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(input.rdd.pipe(command))
  }

  /** Pipe any DataFrame: rows are tab-joined for stdin, stdout lines come
    * back as a `line` column.
    */
  def pipeRows(df: DataFrame, command: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.toDF().rdd
      .map(_.toSeq.map(v => if (v == null) "" else v.toString).mkString("\t"))
      .pipe(command)
    spark.createDataset(lines).toDF("line")
  }
}
