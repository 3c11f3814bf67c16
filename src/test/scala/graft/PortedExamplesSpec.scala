package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{Classic, Jobs}
import graft.io.TagCatalog
import graft.query.QExpr

/** End-to-end ports of the reference's worked examples — the "a user of the
  * reference could switch" demonstration, run through the SAME facades a
  * migrating job would use (Classic.Job → Jobs.run → results tag →
  * DiscoDB build/query), not through the relational shortcuts.
  *
  * Reference: examples/util/wordcount_ddb.py (wordcount whose reduce output
  * lands in a DiscoDB) + query_ddb.py (query it, sum the counts) + the
  * doc/howto/discodb.rst tutorial transcript ('word' → 18, 'this | word' →
  * counts summed across dbs).
  */
class PortedExamplesSpec extends SparkTestBase {
  import spark.implicits._

  test("wordcount_ddb + query_ddb: job -> results tag -> discodb -> query") {
    val outDir = Files.createTempDirectory("graft_ported").toString
    val catalog = new TagCatalog(spark)

    // the classic wordcount job, verbatim shape (map emits (word, 1),
    // combiner+reduce sum) — wordcount_ddb.py:10-20
    val job = Classic.Job(
      map = line => line.toLowerCase.split("[^a-z0-9]+").toSeq
        .filter(_.nonEmpty).map(_ -> "1"),
      combiner = Some((k, vs) => Iterator.single(k -> vs.map(_.toLong).sum.toString)),
      reduce = Some((k, vs) => Iterator.single(k -> vs.map(_.toLong).sum.toString)),
      partitions = 4)
    val input = spark.createDataset(Seq(
      "this word and this other word", "a word is a word is a word"))
    val res = Jobs.run(spark, "wc_ddb", input, job, outDir, catalog)

    // downstream consumes BY NAME (the results tag), never by path
    val kv = Jobs.results(catalog, "wc_ddb")
    val ddb = QExpr.build(kv, "key", "value")

    // query_ddb.py's CNF query + client-side int-sum merge
    def q(s: String): Long =
      QExpr.metaQuery(Seq(ddb), QExpr.parse(s))
        .agg(coalesce(sum("total"), lit(0L))).head().getLong(0)
    assert(q("word") == 5L)
    assert(q("this | word") == 7L)
    assert(q("this & word") == 0L) // no single key is both literals
    assert(res.tag == "job:results:wc_ddb")
  }

  test("waitmany: concurrent jobs complete independently; one failure doesn't sink the rest") {
    // tests/test_waitmany.py: several jobs in flight from one client, a
    // failing job raises while the healthy ones still finish. Spark
    // actions are thread-safe per session — each Future is one "job.wait".
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val outDir = Files.createTempDirectory("graft_waitmany").toString
    val catalog = new TagCatalog(spark)
    val ok = Classic.Job(map = l => Seq(l -> "1"),
      reduce = Some((k, vs) => Iterator.single(k -> vs.size.toString)))
    val bad = Classic.Job(map =
      _ => throw new IllegalStateException("This job is supposed to fail."))
    val input = spark.createDataset(Seq("a", "b", "a"))
    val fa = Future(Jobs.run(spark, "wm_a", input, ok, outDir, catalog))
    val fb = Future(Jobs.run(spark, "wm_b", input, ok, outDir, catalog))
    val fc = Future(Jobs.run(spark, "wm_c", input, bad, outDir, catalog))
    val (ra, rb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    intercept[org.apache.spark.SparkException](Await.result(fc, 120.seconds))
    // the healthy jobs' results are intact and readable by name
    for (r <- Seq(ra, rb)) {
      val m = Jobs.results(catalog, r.name).collect()
        .map(row => row.getString(0) -> row.getString(1)).toMap
      assert(m == Map("a" -> "2", "b" -> "1"))
    }
  }

  test("simple_innerjoin: classic join via the relational surface") {
    // examples/util/simple_innerjoin.py joins persons × pets on col0; the
    // migrating user swaps the hand-partitioned sort-merge for a join()
    val persons = Seq((1, "alice"), (2, "bob"), (3, "carol")).toDF("id", "name")
    val pets = Seq((1, "cat"), (1, "dog"), (3, "fish")).toDF("pid", "pet")
    val got = graft.ops.RelationalOps.innerJoin(persons, pets, "id", "pid")
      .select("id", "name", "pet")
      .orderBy("id", "pet").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1, "alice", "cat"), (1, "alice", "dog"), (3, "carol", "fish")))
  }
}
