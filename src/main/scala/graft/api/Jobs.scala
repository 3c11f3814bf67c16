package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.io.{Sinks, TagCatalog}

/** Job lifecycle glue — Disco's `Job().run()` / `job.wait()` / results-tag
  * flow (reference: lib/disco/job.py:99-166 run/wait, lib/disco/ddfs.py:
  * 288-292 `disco:job:results:<jobname>`): a classic job's output lands in
  * DDFS and is auto-registered under a results tag so downstream jobs
  * consume it BY NAME, never by path.
  *
  * Spark shape: [[Classic.run]] builds the lazy plan ("run"), the parquet
  * write is the blocking materialization ("wait" — Spark actions are
  * synchronous, so completion == the write returning), and the TagCatalog
  * registration makes `tag://job:results:<name>` the stable handle.
  */
object Jobs {

  case class JobResult(name: String, path: String, tag: String)

  /** Run a classic job, persist its output, register the results tag. */
  def run(spark: SparkSession, name: String, input: Dataset[String],
          job: Classic.Job, outDir: String, catalog: TagCatalog): JobResult = {
    val out = Classic.run(spark, input, job).toDF("key", "value")
    val path = s"$outDir/$name"
    Sinks.writeResults(out, path, catalog, name)
    JobResult(name, path, s"job:results:$name")
  }

  /** Read a finished job's results by name (`disco.result_iterator` over a
    * job name, without knowing where the bytes live).
    */
  def results(catalog: TagCatalog, name: String) =
    catalog.read(s"job:results:$name")
}
