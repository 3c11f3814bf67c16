package graft

import org.apache.spark.sql.functions._
import graft.api.{OOB, Params}
import graft.io.{Sinks, Sources, TagCatalog}

/** io surface (SURVEY M6) + §2.9 OOB/Params. The CORRECTNESS gate covers
  * the fixture-scale round-trips (q_csv_roundtrip etc.); these pin the
  * semantics the oracles can't see: tag DAG walks, cycle safety, finditer
  * multi-match, executor-side OOB puts.
  */
class IoSpec extends SparkTestBase {
  import spark.implicits._

  test("reReader yields one record per match with group columns") {
    val df = Seq("a=1 b=2 c=33", "d=4", "nothing here").toDF("line")
    val out = Sources.reReader(df, "line", """(\w)=(\d+)""", Seq("name", "num"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq(("a", "1"), ("b", "2"), ("c", "33"), ("d", "4")))
  }

  test("raw literal source parallelizes driver records") {
    assert(Sources.raw(spark, Seq("x", "y", "z")).count() == 3)
  }

  test("tag catalog walks DAGs, survives cycles, keeps blob multiplicity") {
    val cat = new TagCatalog(spark)
    cat.put("leaf1", Seq("/data/p1"))
    cat.put("leaf2", Seq("/data/p2", "/data/p1"))
    cat.put("mid", Seq("tag://leaf1", "tag://leaf2"))
    cat.put("top", Seq("tag://mid", "/data/p3"))
    assert(cat.urls("top") == Seq("/data/p1", "/data/p2", "/data/p1", "/data/p3"))
    // cycle: a -> b -> a terminates (ddfs walk visited-set semantics)
    cat.put("a", Seq("tag://b", "/data/a"))
    cat.put("b", Seq("tag://a", "/data/b"))
    assert(cat.urls("a") == Seq("/data/b", "/data/a"))
    // attributes
    cat.setAttr("top", "owner", "graft")
    assert(cat.getAttr("top", "owner").contains("graft"))
    assert(cat.getAttr("top", "missing").isEmpty)
  }

  test("text sink + reader round-trips lines") {
    val path = graft.io.IoScratch.dir + "/spec_txt"
    Sinks.writeText(Seq(("r1", 1), ("r2", 2)).toDF("s", "n"), path)
    val back = Sources.readText(spark, path).as[String].collect().sorted
    assert(back.toSeq == Seq("r1\t1", "r2\t2"))
  }

  test("readParquetEvolved merges footers: new column is null for old-gen rows") {
    val path = graft.io.IoScratch.dir + "/spec_evolved"
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    Sinks.writeParquet(Seq((1L, "a")).toDF("id", "v"), path + "/gen=1")
    Sinks.writeParquet(Seq((2L, "b", 99L)).toDF("id", "v", "extra"), path + "/gen=2")
    val m = Sources.readParquetEvolved(spark, path)
    assert(m.columns.toSet == Set("id", "v", "extra", "gen"))
    val rows = m.select("id", "extra").as[(Long, Option[Long])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(99L)), s"got $rows")
  }

  test("writeSharded manifest works with STRING shard names (and escaped chars)") {
    val path = graft.io.IoScratch.dir + "/spec_sharded_str"
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    val df = Seq(("en us", "a"), ("en us", "b"), ("zh", "c"))
      .toDF("shard", "payload")
    val manifest = Sinks.writeSharded(df, path, "shard")
      .select("shard", "rows").as[(String, Long)].collect().toMap
    assert(manifest == Map("en us" -> 2L, "zh" -> 1L), s"got $manifest")
    val bytes = spark.read.parquet(path + "._manifest")
      .select("bytes").as[Long].collect()
    assert(bytes.forall(_ > 0L))
  }

  test("OOB: executor-side puts are visible to the driver and persist (test_oob.py shape)") {
    val oob = new OOB(spark, "spec_job")
    val ds = spark.range(0, 8).repartition(4)
    ds.mapPartitions { it =>
      val n = it.size
      oob.put(s"part_seen_$n", n.toString) // executor-side put
      Iterator.single(n)
    }.collect()
    assert(oob.get("part_seen_2").contains("2")) // 8 rows / 4 partitions
    oob.put("driver_key", "v")
    oob.save(graft.io.IoScratch.dir)
    val loaded = OOB.load(spark, graft.io.IoScratch.dir, "spec_job")
    assert(loaded("driver_key") == "v")
    assert(loaded.keys.exists(_.startsWith("part_seen")))
  }

  test("Params broadcast is readable from executor closures") {
    val params = Params(spark, Map("threshold" -> 3))
    val n = spark.range(0, 10)
      .filter(id => id >= params()("threshold")).count()
    assert(n == 7)
  }

  test("TagCatalog.read batches a many-blob tag into ONE scan node") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val dir = graft.io.IoScratch.dir + "/tag_batch"
    spark.range(0, 1000).toDF("id").repartition(50)
      .write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
    assert(parts.size == 50)
    val cat = new TagCatalog(spark)
    cat.put("big", parts)
    val df = cat.read("big")
    assert(df.count() == 1000)
    val scans = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }
    assert(scans.size == 1) // 50 blobs -> one multi-path scan, not 50 unions
    // blob multiplicity survives batching: a path listed twice counts twice
    val firstCount = spark.read.parquet(parts.head).count()
    cat.put("dup", parts.head +: parts)
    assert(cat.read("dup").count() == 1000 + firstCount)
  }

  test("writeResults registers job:results:<name>, readable via the tag") {
    val cat = new TagCatalog(spark)
    val path = graft.io.IoScratch.dir + "/job_out"
    Sinks.writeResults(Seq((1, "a"), (2, "b")).toDF("n", "s"), path, cat, "myjob")
    assert(cat.exists("job:results:myjob"))
    val back = cat.read("job:results:myjob")
    assert(back.orderBy("n").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("readUrls retries flaky opens with backoff, fails after maxRetries") {
    FlakyOpener.attempts.set(0)
    val lines = Sources.readUrlsWith(spark, Seq("flaky://x"),
      maxRetries = 3, backoffMs = 1, FlakyOpener.open)
      .as[String].collect().sorted
    assert(lines.toSeq == Seq("a", "b"))
    assert(FlakyOpener.attempts.get() == 3) // 2 IOExceptions + 1 success

    FlakyOpener.attempts.set(0)
    intercept[org.apache.spark.SparkException] { // 1 retry < 2 failures
      Sources.readUrlsWith(spark, Seq("flaky://x"),
        maxRetries = 1, backoffMs = 1, FlakyOpener.open).collect()
    }
  }

  test("csv round-trips embedded newlines/commas/quotes with multiLine=true") {
    val path = graft.io.IoScratch.dir + "/spec_csv_ml"
    val df = Seq((1L, "line1\nline2"), (2L, "with,comma and \"quote\""))
      .toDF("id", "s")
    Sinks.writeCsv(df, path)
    val back = Sources.readCsv(spark, path, multiLine = true)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(back == Seq("line1\nline2", "with,comma and \"quote\""))
  }

  test("jsonl round-trips newlines/quotes/unicode and STAYS splittable") {
    val path = graft.io.IoScratch.dir + "/spec_jsonl"
    val df = Seq((1L, "line1\nline2"), (2L, "a \"quote\" and 中文 and \\slash"),
      (3L, "")).toDF("id", "s")
    Sinks.writeJsonl(df, path)
    val back = Sources.readJsonl(spark, path, df.schema)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    // the JSON writer escapes what raw text cannot carry — and the file
    // stays one-object-per-line, so byte-range splitting keeps working
    // (the CSV multiLine round-trip gives up splittability for this)
    assert(back == Seq("line1\nline2", "a \"quote\" and 中文 and \\slash", ""))
    // pin the one-object-per-line framing itself: physical line count of
    // the part files must equal the row count, or splittability is gone
    val dir = new java.io.File(path)
    val physLines = dir.listFiles().filter(_.getName.endsWith(".json"))
      .map(f => scala.io.Source.fromFile(f)("UTF-8"))
      .map { s => try s.getLines().size finally s.close() }.sum
    assert(physLines == 3, s"expected 3 physical lines, got $physLines")
  }

  test("netstring reader round-trips binary-ish values (old_netstr_reader format)") {
    import graft.io.Netstring
    val pairs = Seq(
      ("k1", "plain"),
      ("k2", "value with\nnewline and \u0000 NUL"),
      ("", "empty key ok"),
      ("k4", ""))
    val f = java.nio.file.Files.createTempFile("graft_netstr", ".bin")
    java.nio.file.Files.write(f, Netstring.encode(pairs))
    val back = Netstring.read(spark, f.toString)
      .as[(String, String)].collect().toSeq
    assert(back.sorted == pairs.sorted)
  }

  test("xml records parse via reReader (xml_reader worked example)") {
    // ref examples/util/xml_reader.py: one record per <entry> element,
    // fields pulled from child tags — same finditer mechanism as reReader.
    val xml = Seq(
      "<feed><entry><id>1</id><lang>en</lang></entry>" +
        "<entry><id>2</id><lang>fr</lang></entry></feed>",
      "<feed><entry><id>3</id><lang>en</lang></entry></feed>").toDF("line")
    val entries = Sources.chain(xml,
      df => Sources.reReader(df, "line", """<entry>(.*?)</entry>""", Seq("body")),
      df => Sources.reReader(df, "body",
        """<id>(\d+)</id><lang>(\w+)</lang>""", Seq("id", "lang")))
    val got = entries.collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(got.toSeq == Seq(("1", "en"), ("2", "fr"), ("3", "en")))
  }

  test("replicated inputs fall over to the next replica (test_redundant.py)") {
    val good = java.nio.file.Files.createTempFile("graft_replica", ".txt")
    java.nio.file.Files.write(good, "r1\nr2\n".getBytes)
    val df = Sources.readUrlsReplicated(spark, Seq(
      Seq("file:///nonexistent/replica_a", good.toUri.toString)))
    assert(df.as[String].collect().sorted.toSeq == Seq("r1", "r2"))

    intercept[org.apache.spark.SparkException] { // ALL replicas dead -> fail
      Sources.readUrlsReplicated(spark, Seq(
        Seq("file:///nonexistent/a", "file:///nonexistent/b"))).collect()
    }
  }

  test("readUrls streams a large url without materializing it") {
    val f = java.nio.file.Files.createTempFile("graft_big_url", ".txt")
    val w = java.nio.file.Files.newBufferedWriter(f)
    (0 until 100000).foreach { i => w.write(s"line$i"); w.newLine() }
    w.close()
    val df = Sources.readUrls(spark, Seq(f.toUri.toString))
    assert(df.count() == 100000)
    assert(df.as[String].head() == "line0")
  }

  test("readUrls closes the source even when the consumer stops early") {
    CloseTracker.closed.set(false)
    val got = Sources.readUrlsWith(spark, Seq("tracked://x"),
      maxRetries = 0, backoffMs = 1, CloseTracker.open)
      .limit(1).as[String].collect() // LocalLimit abandons the iterator
    assert(got.toSeq == Seq("l0"))
    assert(CloseTracker.closed.get(), "source leaked after early termination")
  }

  test("netstring rejects overflowing and non-digit frame lengths") {
    import graft.io.Netstring
    def decode(s: String) = Netstring.decodeStream(
      new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))).toList
    val big = intercept[IllegalArgumentException] { decode("99999999999 x\n") }
    assert(big.getMessage.contains("exceeds 1 GiB"))
    val sp = intercept[IllegalArgumentException] { decode(" 1 a\n") }
    assert(sp.getMessage.contains("length byte"))
  }

  test("TagCatalog.read hands the reader paths in input_hook order") {
    val cat = new TagCatalog(spark)
    cat.put("ordered", Seq("/p/a", "/p/b", "/p/c"))
    var seen: Seq[String] = Nil
    cat.read("ordered",
      reader = ps => { seen = ps; spark.range(1).toDF("id") },
      inputHook = _.reverse)
    assert(seen == Seq("/p/c", "/p/b", "/p/a"))
  }

  test("partitioned write prunes non-matching partitions at planning time") {
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.documents(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString + "/bylang"
    graft.io.Sinks.writePartitioned(d, path, Seq("lang"))
    val q = spark.read.parquet(path).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected a lang partition filter in the scan:\n$scan")
    // the pruned read sees exactly the en rows, with all columns intact
    assert(q.count() == d.filter(col("lang") === "en").count())
    assert(q.columns.toSet == d.columns.toSet)
  }
}

/** Tracks whether the streamed Source was closed (early-termination leak
  * regression). JVM-static — valid in local mode.
  */
object CloseTracker {
  val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
  def open(u: String): scala.io.Source =
    new scala.io.Source {
      val iter = "l0\nl1\nl2\n".iterator
      override def close(): Unit = closed.set(true)
    }
}

/** Deterministic flaky URL opener: fails the first two opens per test run.
  * JVM-static counter — valid in local mode where tasks share the JVM.
  */
object FlakyOpener {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  def open(u: String): scala.io.Source =
    if (attempts.incrementAndGet() <= 2) throw new java.io.IOException(s"flaky open of $u")
    else scala.io.Source.fromString("a\nb\n")
}
