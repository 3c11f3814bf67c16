package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.{Classic, External}
import graft.functions.Udafs
import graft.io.{Sources, TagCatalog}

/** The long-tail API rows from SURVEY §2: init hooks, result_iterator,
  * external pipe, registered UDAFs, URL source, reader chains, input_hook.
  */
class ApiCompletionSpec extends SparkTestBase {
  import spark.implicits._

  test("map_init and reduce_init run before processing (func.py:39-46 shape)") {
    val mapInits = spark.sparkContext.longAccumulator("mapInits")
    val redInits = spark.sparkContext.longAccumulator("redInits")
    val in = spark.createDataset(Seq("a b", "b c", "c d")).repartition(2)
    val out = Classic.run(spark, in, Classic.Job(
      map = line => line.split(" ").map(_ -> "1"),
      reduce = Some((k, vs) => Iterator.single(k -> vs.size.toString)),
      mapInit = Some(() => mapInits.add(1)),
      reduceInit = Some(() => redInits.add(1))))
    val m = out.collect().toMap
    assert(m == Map("a" -> "1", "b" -> "2", "c" -> "2", "d" -> "1"))
    assert(mapInits.value == 2) // once per map partition
    assert(redInits.value >= 1) // at most once per reduce thread
  }

  test("resultIterator streams results without a full collect") {
    val in = spark.createDataset(Seq("x y", "y z"))
    val out = Classic.run(spark, in, Classic.Job(
      map = line => line.split(" ").map(_ -> "1"),
      reduce = Some((k, vs) => Iterator.single(k -> vs.size.toString))))
    val viaIter = Classic.resultIterator(out).toSeq.sortBy(_._1)
    assert(viaIter == Seq("x" -> "1", "y" -> "2", "z" -> "1"))
  }

  test("External.pipe streams partitions through a process (external.py shape)") {
    val in = spark.createDataset(Seq("alpha", "beta", "gamma")).repartition(2)
    val out = External.pipe(spark, in, Seq("tr", "a-z", "A-Z"))
      .collect().sorted
    assert(out.toSeq == Seq("ALPHA", "BETA", "GAMMA"))
  }

  test("External.pipeRows tab-joins columns for stdin") {
    val df = Seq((1, "a"), (2, "b")).toDF("n", "s")
    val out = External.pipeRows(df, Seq("cat")).as[String].collect().sorted
    assert(out.toSeq == Seq("1\ta", "2\tb"))
  }

  test("External.pipeFramed round-trips binary values with \\n and NUL (external.py:63-95 framing)") {
    val recs: Seq[(Array[Byte], Array[Byte])] = Seq(
      ("k1".getBytes("UTF-8"), Array[Byte](0, 10, 13, 0, 65)),
      ("k\n2".getBytes("UTF-8"), "line1\nline2\u0000tail".getBytes("UTF-8")),
      ("empty".getBytes("UTF-8"), Array.emptyByteArray))
    val in = spark.createDataset(recs).repartition(2)
    val out = External.pipeFramed(in, Seq("cat")).collect()
    def render(rs: Seq[(Array[Byte], Array[Byte])]) =
      rs.map { case (k, v) => (k.toSeq, v.toSeq) }.sortBy(_._1.toString)
    assert(render(out.toSeq) == render(recs))
  }

  test("External.pipeFramed fails the task on non-zero exit (Spark retry = Disco task restart)") {
    val in = spark.createDataset(Seq(
      ("k".getBytes("UTF-8"), "v".getBytes("UTF-8")))).repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      External.pipeFramed(in, Seq("false")).collect()
    }
    assert(e.getMessage.contains("exited") || e.getCause != null)
  }

  test("External.pipeFramed rejects a key frame without its value (truncated output)") {
    val in = spark.createDataset(Seq(
      ("k".getBytes("UTF-8"), "v".getBytes("UTF-8")))).repartition(1)
    // emits ONE frame (len=1 little-endian + 'k') then exits 0: corrupt pair
    val e = intercept[org.apache.spark.SparkException] {
      External.pipeFramed(in,
        Seq("sh", "-c", "cat > /dev/null; printf '\\001\\000\\000\\000k'")).collect()
    }
    assert(e.getMessage.contains("key without a value") ||
      Option(e.getCause).exists(_.getMessage.contains("key without a value")))
  }

  test("registered UDAFs work from SQL with partial aggregation") {
    Udafs.register(spark)
    Seq(("k1", 1L, "x"), ("k1", 2L, "y"), ("k2", 5L, "z"))
      .toDF("k", "n", "v").createOrReplaceTempView("udaf_in")
    val rows = spark.sql(
      "SELECT k, graft_sum(n) AS s, graft_kvgroup(v) AS vs FROM udaf_in GROUP BY k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(("k1", 3L, "x,y"), ("k2", 5L, "z")))
  }

  test("stageresults: map output observable next to reduce output (test_mapresults.py shape)") {
    val ducks = Seq("huey", "dewey", "louie")
    val staged = Classic.runStaged(spark, spark.createDataset(ducks), Classic.Job(
      map = d => Iterator.single((d + "!", "")),
      reduce = Some((k, vs) => vs.map(v => (k + "?", v)))))
    assert(staged.map.collect().map(_._1).sorted.toSeq == ducks.map(_ + "!").sorted)
    assert(staged.results.collect().map(_._1).sorted.toSeq == ducks.map(_ + "!?").sorted)
  }

  test("Jobs.run persists output and registers the results tag (job.py run/wait flow)") {
    import graft.api.Jobs
    val cat = new TagCatalog(spark)
    val in = spark.createDataset(Seq("a b", "b c"))
    val res = Jobs.run(spark, "wc_job", in, Classic.Job(
      map = line => line.split(" ").map(_ -> "1"),
      reduce = Some((k, vs) => Iterator.single(k -> vs.size.toString))),
      graft.io.IoScratch.dir, cat)
    assert(res.tag == "job:results:wc_job")
    val back = Jobs.results(cat, "wc_job")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(back == Map("a" -> "1", "b" -> "2", "c" -> "1"))
  }

  test("readUrls pulls lines per url task (scheme_http model, file:// stand-in)") {
    val d = Files.createTempDirectory("graft_url").toFile
    val f1 = new java.io.File(d, "a.txt"); val f2 = new java.io.File(d, "b.txt")
    Files.write(f1.toPath, "l1\nl2\n".getBytes); Files.write(f2.toPath, "l3\n".getBytes)
    val lines = Sources.readUrls(spark,
      Seq(f1.toURI.toString, f2.toURI.toString))
      .as[String].collect().sorted
    assert(lines.toSeq == Seq("l1", "l2", "l3"))
  }

  test("Pipeline Stage init runs per task and done emits trailing output") {
    import graft.api.Pipeline
    import graft.api.Pipeline.{GroupLabel, LKV, Stage}
    val inits = spark.sparkContext.longAccumulator("stage_inits")
    val in = spark.createDataset(
      (0 until 6).map(i => LKV(i % 2, s"k$i", "v")))
    val out = Pipeline.run(spark, in, Seq(
      GroupLabel -> Stage("count_per_label",
        process = it => Iterator.single(it.foldLeft(LKV(0, "n", "0")) {
          (acc, r) => LKV(r.label, "n", (acc.value.toInt + 1).toString)
        }),
        init = () => inits.add(1),
        done = () => Iterator.single(LKV(-1, "done", "1")))), labels = 2)
      .collect()
    assert(out.count(_.key == "n") == 2) // one count record per label
    assert(out.count(_.key == "done") == 2) // one done record per task
    assert(inits.value == 2) // one init per task (labels=2)
  }

  test("reader chains compose and tag input_hook filters/reorders inputs") {
    val base = Seq("a=1", "b=2", "skip").toDF("line")
    val chained = Sources.chain(base,
      df => Sources.reReader(df, "line", """(\w+)=(\d+)""", Seq("k", "v")),
      df => df.filter(col("v") > 1))
    assert(chained.collect().map(_.getString(0)).toSeq == Seq("b"))

    val cat = new TagCatalog(spark)
    cat.put("t1", Seq(s"$sfDir/region.parquet", s"$sfDir/nation.parquet"))
    val onlyNation = cat.read("t1", inputHook = _.filter(_.contains("nation")))
    assert(onlyNation.columns.exists(_.startsWith("n_")))
  }
}
