package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** The Disco *pipeline* model: a linear sequence of `{grouping, Stage}`
  * pairs over labeled (label, key, value) records.
  *
  * Reference: lib/disco/worker/pipeline/worker.py:44-125 (Stage lifecycle),
  * master/include/pipeline.hrl:11-28 (groupings), semantics in
  * master/src/pipeline_utils.erl:106-181.
  *
  * Grouping → Spark lowering (SURVEY.md §2.2):
  *  - Split          → keep current partitioning (one task per input split)
  *  - GroupLabel     → `repartition(n, label)` — shuffle-by-label
  *  - GroupAll       → `repartition(1)` — single global task
  *  - GroupNode      → no-op: node-local compaction is a locality artifact;
  *                     Spark's AQE partition coalescing owns this
  *  - GroupNodeLabel → no shuffle: stage runs per existing partition as a
  *                     map-side pre-combine (Disco uses it to cut shuffle
  *                     volume; here the subsequent GroupLabel shuffle moves
  *                     already-combined records)
  *
  * `Stage.process` receives the whole task iterator (init/done = code before/
  * after consuming it, exactly Disco's init → process* → done lifecycle);
  * `sort=true` sorts the task's records by (label, key) first — Spark's
  * spillable external sort, the analog of Disco's Unix-sort spill
  * (lib/disco/util.py:319-388).
  */
object Pipeline {

  /** A labeled record: Disco's (label, key, value). */
  final case class LKV(label: Int, key: String, value: String)

  sealed trait Grouping
  case object Split extends Grouping
  case object GroupLabel extends Grouping
  case object GroupAll extends Grouping
  case object GroupNode extends Grouping
  case object GroupNodeLabel extends Grouping

  /** Stage lifecycle = Disco's init → process* → done
    * (pipeline/worker.py:44-125): `init` runs once per task before any
    * record; `done` runs once per task after the last record and may emit
    * trailing output (the combiner-flush idiom, worker.py:117-125).
    */
  final case class Stage(
      name: String,
      process: Iterator[LKV] => Iterator[LKV],
      sort: Boolean = false,
      init: () => Unit = () => (),
      done: () => Iterator[LKV] = () => Iterator.empty)

  /** Value-bounded pre-combine stage (the Classic combiner pattern,
    * func.py:48-71 flush-on-limit, lifted to the pipeline model): sums
    * integer values per (label, key) in a task-local buffer that FLUSHES
    * whenever `maxEntries` distinct keys accumulate — partial aggregation
    * with bounded memory at ANY key cardinality. Safe under flushing
    * because partial sums are additive: a downstream sorted GroupLabel
    * reduce merges multiple partials of one key.
    */
  def combineStage(name: String, maxEntries: Int = 1 << 16): Stage =
    Stage(name, { it =>
      // size counter = distinct keys (each key's state is one Long)
      FlushBuffer.run(it)(r => (r.label, r.key))(_.value.toLong)(
        (a, r) => a + r.value.toLong)((isNew, _) => if (isNew) 1L else 0L)(
        maxEntries.toLong) { case ((l, k), n) => Iterator.single(LKV(l, k, n.toString)) }
    })

  /** Compile and run the pipeline. `labels` is Disco's nr-of-labels: it sets
    * the GroupLabel shuffle degree (`repartition(labels, label)`), so a job
    * declaring 8 labels runs 8 reduce tasks, exactly like Disco. Several
    * labels may hash to one task; the stage is still invoked once per label
    * with ALL (and only) that label's records (pipeline_utils.erl:147-159).
    */
  def run(spark: SparkSession, input: Dataset[LKV],
          stages: Seq[(Grouping, Stage)], labels: Int = 32): Dataset[LKV] = {
    import spark.implicits._
    stages.foldLeft(input) { case (ds, (grouping, stage)) =>
      grouping match {
        case GroupLabel =>
          // labels-wide shuffle on label; records of one label are contiguous
          // after the partition-local (spillable) sort, so one pass invokes
          // the stage per label run.
          val parted = ds.repartition(labels, col("label"))
          val sorted =
            if (stage.sort) parted.sortWithinPartitions(col("label"), col("key"))
            else parted.sortWithinPartitions(col("label"))
          sorted.mapPartitions { it =>
            stage.init()
            val buf = it.buffered
            new Iterator[Iterator[LKV]] {
              def hasNext = buf.hasNext
              def next() = {
                val l = buf.head.label
                val run = new Iterator[LKV] {
                  def hasNext = buf.hasNext && buf.head.label == l
                  def next() = buf.next()
                }
                // drain any records the stage didn't consume before moving on
                stage.process(run) ++ new Iterator[LKV] {
                  def hasNext = { while (run.hasNext) run.next(); false }
                  def next() = throw new NoSuchElementException
                }
              }
            }.flatten ++ stage.done()
          }
        case other =>
          val regrouped = other match {
            case GroupAll => ds.repartition(1)
            case _        => ds // Split / GroupNode / GroupNodeLabel: in place
          }
          val sorted =
            if (stage.sort) regrouped.sortWithinPartitions(col("label"), col("key"))
            else regrouped
          sorted.mapPartitions { it => stage.init(); stage.process(it) ++ stage.done() }
      }
    }
  }
}
