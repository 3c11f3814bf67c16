package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** The "classic" Disco job facade: `map → [combiner] → shuffle(partition) →
  * [sort] → reduce`, re-expressed on typed Datasets.
  *
  * Reference semantics:
  *  - map: per-record fn emitting 0..n (k,v) pairs
  *    (lib/disco/worker/classic/func.py:20-37; exec loop
  *    lib/disco/worker/classic/worker.py:332-355)
  *  - combiner: map-side bounded-buffer accumulation flushed at task end
  *    (func.py:48-71)
  *  - partition: hash(key) % nr_partitions (func.py:128-129)
  *  - sort: external sort of reduce input by key (worker.py:397-404)
  *  - reduce: iterator over grouped pairs (func.py:73-114)
  *
  * Spark mapping: `flatMap` → per-partition combine (`mapPartitions` with a
  * bounded hash buffer — same spill discipline as Disco's `done()` flush) →
  * `groupByKey.flatMapGroups` (hash shuffle) or `.flatMapSortedGroups`
  * (sort=true). Closures here are NOT codegen'd — this facade exists for
  * API parity with arbitrary user functions; the relational operators in
  * `graft.ops` are the performance path. At 100 TB the plan is still sane:
  * one shuffle, map-side combine bounds shuffle volume, sorted groups use
  * Spark's spillable external sorter.
  */
object Classic {

  type KV = (String, String)

  final case class Job(
      map: String => IterableOnce[KV],
      combiner: Option[(String, Iterator[String]) => Iterator[KV]] = None,
      reduce: Option[(String, Iterator[String]) => Iterator[KV]] = None,
      partitions: Int = 32,
      sort: Boolean = false,
      /** combiner buffer cap in TOTAL buffered values (not keys), à la
        * Disco's user-managed flush (func.py:60-66) — a single hot key can
        * never accumulate unboundedly before the combiner runs. */
      combinerBufferSize: Int = 1 << 16,
      /** map_init (func.py:39-46): once per map task before the first
        * record — connection setup, dictionaries, etc. */
      mapInit: Option[() => Unit] = None,
      /** reduce_init: once per reduce task before the first group. */
      reduceInit: Option[() => Unit] = None)

  /** Per-stage results of a classic job — Disco's `job.stageresults(stage)`
    * (tests/test_mapresults.py, core.py stage results): the map stage's
    * output is observable independently of the final reduce output. `map`
    * is POST-combiner, matching Disco, where the combiner runs inside the
    * map task and shapes what it writes (func.py:48-71). Both are lazy
    * plans over the same lineage; cache `map` if reading both (otherwise
    * the map stage recomputes — Disco re-reading a stage's DDFS outputs is
    * a re-fetch, not a re-run, so cache = parity).
    */
  final case class StageResults(map: Dataset[KV], results: Dataset[KV])

  /** Run a classic job over a dataset of input records ("lines"). */
  def run(spark: SparkSession, input: Dataset[String], job: Job): Dataset[KV] =
    runStaged(spark, input, job).results

  /** [[run]], also exposing the map-stage output (stageresults parity). */
  def runStaged(spark: SparkSession, input: Dataset[String], job: Job): StageResults = {
    import spark.implicits._
    val mapped: Dataset[KV] = job.mapInit match {
      case None       => input.flatMap(job.map)
      case Some(init) => input.mapPartitions { it => init(); it.flatMap(job.map) }
    }

    val preCombined: Dataset[KV] = job.combiner match {
      case None => mapped
      case Some(c) =>
        // size counter = TOTAL buffered values (not keys): a single hot key
        // can never accumulate unboundedly before the combiner runs
        mapped.mapPartitions { it =>
          FlushBuffer.run(it)(_._1)(t => mutable.ArrayBuffer(t._2))(
            (a, t) => { a += t._2; a })((_, _) => 1L)(
            job.combinerBufferSize.toLong)((k, vs) => c(k, vs.iterator))
        }
    }

    val results = job.reduce match {
      case None => preCombined.repartition(job.partitions, $"_1")
      case Some(r0) =>
        // reduce_init: once per task before its first group
        // (the guard is @transient state re-created when the task
        // deserializes its closure — Disco-style idempotent setup,
        // func.py:39-46)
        val r: (String, Iterator[String]) => Iterator[KV] = job.reduceInit match {
          case None    => r0
          case Some(f) =>
            val once = new InitOnce(f)
            (k, it) => { once(); r0(k, it) }
        }
        // nr_partitions IS the reduce-task count (the func.py:128-129 hash
        // partition contract — NOT spark.sql.shuffle.partitions): shuffle
        // to exactly job.partitions on the key, sort within each task so a
        // key's records are contiguous (+ value order under sort=true),
        // stream each run to the reduce. Disco's sort-merge reduce shape.
        val parted = preCombined.repartition(job.partitions, $"_1")
        val sorted =
          if (job.sort) parted.sortWithinPartitions($"_1", $"_2")
          else parted.sortWithinPartitions($"_1")
        sorted.mapPartitions { it =>
          val buf = it.buffered
          new Iterator[Iterator[KV]] {
            def hasNext = buf.hasNext
            def next() = {
              val k = buf.head._1
              val run = new Iterator[String] {
                def hasNext = buf.hasNext && buf.head._1 == k
                def next() = buf.next()._2
              }
              // drain whatever the reduce didn't consume before moving on
              r(k, run) ++ new Iterator[KV] {
                def hasNext = { while (run.hasNext) run.next(); false }
                def next() = throw new NoSuchElementException
              }
            }
          }.flatten
        }
    }
    StageResults(preCombined, results)
  }

  /** result_iterator (lib/disco/core.py:283-311): stream job output back to
    * the driver one partition at a time — no full collect, the driver holds
    * at most one partition.
    */
  def resultIterator(results: Dataset[KV]): Iterator[KV] = {
    import scala.jdk.CollectionConverters._
    results.toLocalIterator().asScala
  }

  /** Runs `f` at most once per deserialized closure instance (= per task)
    * and at most once per thread thereafter.
    */
  private final class InitOnce(f: () => Unit) extends Serializable {
    @transient private lazy val done = new ThreadLocal[java.lang.Boolean] {
      override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
    }
    def apply(): Unit = if (!done.get()) { f(); done.set(true) }
  }
}
