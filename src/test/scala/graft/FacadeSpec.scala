package graft

import graft.api.{Classic, Pipeline}

/** Classic/pipeline facade semantics, ported test shapes from the reference
  * (tests/test_simple.py, test_flow.py, test_pipe.py).
  */
class FacadeSpec extends SparkTestBase {

  test("classic: map-only job (test_flow.py map-only shape)") {
    import spark.implicits._
    val in = Seq("3", "5", "7").toDS()
    val job = Classic.Job(map = e => Iterator((e, (e.toInt * 10).toString)))
    val got = Classic.run(spark, in, job).collect().toSet
    assert(got == Set(("3", "30"), ("5", "50"), ("7", "70")))
  }

  test("classic: map+reduce echo of primes x10 (test_simple.py shape)") {
    import spark.implicits._
    val primes = Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31)
    val in = spark.createDataset(primes.flatMap(p => Seq.fill(10)(p.toString)))
    val job = Classic.Job(
      map = e => Iterator((e.trim, e.trim)),
      reduce = Some((k, vs) => vs.map(v => (k, v))),
      sort = true)
    val got = Classic.run(spark, in, job).collect()
    assert(got.length == primes.length * 10)
    assert(got.toSet == primes.map(p => (p.toString, p.toString)).toSet)
    val counts = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts.values.forall(_ == 10))
  }

  test("classic: combiner cuts records but not totals (func.py:48-71)") {
    import spark.implicits._
    val words = Seq.fill(100)("gutta cavat lapidem cavat").toDS()
    val job = Classic.Job(
      map = l => l.split(" ").iterator.map(w => (w, "1")),
      combiner = Some((k, vs) => Iterator((k, vs.map(_.toLong).sum.toString))),
      reduce = Some((k, vs) => Iterator((k, vs.map(_.toLong).sum.toString))))
    val got = Classic.run(spark, words, job).collect().toMap
    assert(got == Map("gutta" -> "100", "cavat" -> "200", "lapidem" -> "100"))
  }

  test("classic: sorted reduce sees values in order (sort=True)") {
    import spark.implicits._
    val in = Seq("k:9", "k:1", "k:5").toDS()
    val job = Classic.Job(
      map = e => { val Array(k, v) = e.split(":"); Iterator((k, v)) },
      reduce = Some((k, vs) => Iterator((k, vs.mkString(",")))),
      sort = true)
    val got = Classic.run(spark, in, job).collect().toMap
    assert(got("k") == "1,5,9")
  }

  test("pipeline: GroupAll runs as a single global task") {
    import spark.implicits._
    val in = (1 to 100).map(i => Pipeline.LKV(i % 4, s"k$i", "1")).toDS().repartition(8)
    var maxPerTask = 0
    val countStage = Pipeline.Stage("count_all", { it =>
      val all = it.toVector
      Iterator(Pipeline.LKV(0, "total", all.size.toString))
    })
    val got = Pipeline.run(spark, in, Seq(Pipeline.GroupAll -> countStage)).collect()
    assert(got.length == 1 && got.head.value == "100")
  }

  test("pipeline: bounded combineStage flushes at cap without losing counts") {
    import graft.api.Pipeline
    import graft.api.Pipeline.{GroupLabel, GroupNodeLabel, LKV}
    val in = spark.createDataset(
      (0 until 40).map(i => LKV(0, s"k${i % 5}", "1")))(
      org.apache.spark.sql.Encoders.product[LKV]).repartition(2)
    // cap of 2 forces many flushes; the sorted reduce must still see
    // additive partials totaling 8 per key (40 rows / 5 keys)
    val reduce = Pipeline.Stage("sum", { it =>
      val buf = it.buffered
      new Iterator[LKV] {
        def hasNext = buf.hasNext
        def next() = {
          val h = buf.next(); var s = h.value.toLong
          while (buf.hasNext && buf.head.key == h.key) s += buf.next().value.toLong
          LKV(h.label, h.key, s.toString)
        }
      }
    }, sort = true)
    val out = Pipeline.run(spark, in, Seq(
      GroupNodeLabel -> Pipeline.combineStage("combine", maxEntries = 2),
      GroupLabel -> reduce), labels = 2)
      .collect().map(r => r.key -> r.value.toLong).toMap
    assert(out == (0 until 5).map(i => s"k$i" -> 8L).toMap)
  }

  test("pipeline: GroupLabel co-locates equal labels") {
    import spark.implicits._
    val in = (1 to 64).map(i => Pipeline.LKV(i % 4, s"k${i % 4}", "1")).toDS().repartition(8)
    val stage = Pipeline.Stage("labels_per_task", { it =>
      val labels = it.map(_.label).toSet
      if (labels.isEmpty) Iterator.empty
      else Iterator(Pipeline.LKV(0, labels.mkString("+"), labels.size.toString))
    })
    val got = Pipeline.run(spark, in, Seq(Pipeline.GroupLabel -> stage), labels = 4)
      .collect()
    // every non-empty task saw exactly one distinct label
    assert(got.forall(_.value == "1"))
  }
}
