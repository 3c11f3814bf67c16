package graft

import graft.dedup.Dedup
import graft.functions.TextAnalysis
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkTestBase {

  lazy val docs = graft.core.Tables.documents(spark, sfDir)
  lazy val embs = graft.core.Tables.embeddings(spark, sfDir)

  test("rolling hash matches the reference recurrence") {
    import spark.implicits._
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    val samples = Seq("", "a", "ab", "hello world", "ümlaut ß")
    val got = samples.toDF("s")
      .select(TextAnalysis.fingerprintRolling(col("s"))).as[Long].collect()
    assert(got.sameElements(samples.map(ref)))
  }

  test("jaccard: token-less docs pair with nothing (no empty-set cluster)") {
    import spark.implicits._
    val docs = Seq((1L, "???"), (2L, ""), (3L, "actual words here"),
      (4L, "actual words here")).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((3L, 4L, 1.0))) // never (1,2,1.0)
  }

  test("prefix-filtered jaccard equals the naive all-pairs result") {
    import spark.implicits._
    val sample = docs.filter(col("doc_id") < 100)
    val fast = Dedup.jaccardPairs(sample, "doc_id", "text", 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // naive spec: full token-set cross compare
    val toks = Dedup.tokenSet(sample, "doc_id", "text")
      .groupBy("id").agg(collect_set("tok").as("set"))
    val naive = toks.as("x").join(toks.as("y"), col("x.id") < col("y.id"))
      .withColumn("i", size(array_intersect(col("x.set"), col("y.set"))).cast("double"))
      .withColumn("j", col("i") / (size(col("x.set")) + size(col("y.set")) - col("i")))
      .filter(col("j") >= 0.8)
      .select(col("x.id"), col("y.id")).as[(Long, Long)].collect().toSet
    assert(fast == naive)
  }

  test("minhash LSH pairs are a subset of true near-dups and catch jac=1 pairs") {
    import spark.implicits._
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, bands = 4, rowsPerBand = 4, tau = 0.8)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= 0.8))
    // identical shingle sets always share every band → must be found
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
      .groupBy("id").agg(sort_array(collect_set("shingle")).as("set"))
    val identical = sh.as("x").join(sh.as("y"),
        col("x.id") < col("y.id") && col("x.set") === col("y.set"))
      .select(col("x.id"), col("y.id")).as[(Long, Long)].collect().toSet
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(identical.subsetOf(gotPairs))
  }

  test("jaccardCandidateProfile: dense corpora estimate high, disjoint corpora low") {
    import spark.implicits._
    // 40 DISTINCT sets all sharing prefix token "a": C(40,2)=780 candidates
    // (identical sets would collapse before the index — correctly free)
    val dense = (0 until 40).map(i => (i.toLong, s"a w$i"))
      .toDF("doc_id", "text")
    // 40 docs with fully disjoint vocabularies: no candidate pairs at all
    val disjoint = (0 until 40).map(i => (i.toLong, s"w${i}x w${i}y w${i}z"))
      .toDF("doc_id", "text")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.jaccardCandidateProfile(df, "doc_id", "text", 0.9)
        .select("est_candidates").collect().head.getLong(0)
    assert(est(disjoint) == 0L)
    assert(est(dense) > 100L, s"dense estimate ${est(dense)} suspiciously low")
    // the estimate is an upper bound on the real candidate join
    val realPairs = Dedup.jaccardPairs(dense, "doc_id", "text", 0.9).count()
    assert(est(dense) >= realPairs)
  }

  test("crossCorpusContamination flags the planted train/eval near-dup only") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about catalyst optimizer internals"),
      (3L, "tiny")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "unrelated evaluation prompt with its own words entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.crossCorpusContamination(train, evalSet, "doc_id", "text",
      shingleN = 2, bands = 4, rowsPerBand = 4, tau = 0.7)
      .orderBy("doc_id").collect()
    // one report row per train doc; only doc 1 matches (identical shingle
    // sets share every band, Jaccard exactly 1), the rest report 0 + null
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 0L), (3L, 0L)))
    assert(got(0).getDouble(2) == 1.0)
    assert(got(1).isNullAt(2) && got(2).isNullAt(2))
  }

  test("containmentPairs: finds the embedded passage Jaccard misses; brute-force parity") {
    import spark.implicits._
    // doc 1 is a short passage fully embedded in the long doc 2 — its
    // shingles are a strict subset, so containment(1→2)=1 while Jaccard
    // is far below any useful threshold. docs 3/4 are identical (both
    // directions at 1.0); doc 5 is unrelated.
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words alpha beta gamma delta and then a very long tail " +
        "of completely different content stretching the set much further"),
      (3L, "same exact text here okay"),
      (4L, "same exact text here okay"),
      (5L, "nothing shared with anyone at all")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 1.0)), s"embedded passage missed: $got")
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L },
      "containment must stay asymmetric: the long doc is not covered by the passage")
    assert(got.contains((3L, 4L, 1.0)) && got.contains((4L, 3L, 1.0)))
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L })
    // Jaccard at the same tau indeed misses the passage pair
    val jac = Dedup.jaccardPairs(corpus, "doc_id", "text", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(!jac.exists { case (a, b, _) => Set(a, b) == Set(1L, 2L) })
    // brute-force parity on the fixture corpus
    val sample = docs.filter(col("doc_id") < 80)
    val fast = Dedup.containmentPairs(sample, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val sh = Dedup.shingles(sample, "doc_id", "text", 3)
      .groupBy("id").agg(collect_set("shingle").as("set"))
    val naive = sh.as("x").join(sh.as("y"), col("x.id") =!= col("y.id"))
      .select(col("x.id"), col("y.id"),
        round(size(array_intersect(col("x.set"), col("y.set"))).cast("double") /
          size(col("x.set")), 6).as("c"))
      .filter(col("c") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast == naive)
  }

  test("simhash: near-identical docs get close fingerprints (hamming)") {
    import spark.implicits._
    val fp = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(fp.size == docs.count())
    // compare vs an exact-dup pair found via distinct token sets
    val toks = Dedup.tokenSet(docs, "doc_id", "text")
      .groupBy("id").agg(sort_array(collect_set("tok")).as("set"))
    val samePair = toks.as("x").join(toks.as("y"),
        col("x.id") < col("y.id") && col("x.set") === col("y.set"))
      .select(col("x.id"), col("y.id")).as[(Long, Long)].head()
    assert(fp(samePair._1) == fp(samePair._2)) // same token set -> same simhash
  }

  test("hard negatives: never the query's label, equal to label-filtered brute force") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 8)
    val negs = Similarity.hardNegatives(embs, "vec_id", "embedding", "label",
      queries, "vec_id", "embedding", "label", k = 10)
    val qLabel = queries.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    val cLabel = embs.select("vec_id", "label").as[(Long, Int)]
      .collect().toMap
    val rows = negs.select("query_id", "vec_id", "rank").as[(Long, Long, Int)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, v, _) =>
      assert(cLabel(v) != qLabel(q), s"negative $v shares label with query $q")
    }
    // per query: exactly the top-10 of the brute-force ranking restricted
    // to different-label candidates
    val full = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = embs.count().toInt)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    val expected = full.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      cs.sortBy(_._3).iterator
        .filter { case (_, v, _) => cLabel(v) != qLabel(q) }
        .take(10).map { case (_, v, _) => (q, v) }
    }.toSet
    assert(rows.map { case (q, v, _) => (q, v) }.toSet == expected)
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10, bits = 4, tables = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10, bits = 4, tables = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    val recall1 = (exact intersect single).size.toDouble / exact.size
    info(f"LSH recall@10 (4 bits): 1 table $recall1%.2f, 4 tables $recall%.2f")
    assert(recall > 0.3)       // multi-table amplification
    assert(recall >= recall1)  // more tables never hurt recall
  }

  test("BQ ANN: full shortlist equals brute force exactly; recall sane at 48 bits") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    // cands = corpus size -> every vector survives the Hamming shortlist,
    // so the exact re-rank must reproduce brute force bit-for-bit
    val n = embs.count().toInt
    val full = Similarity.bqTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10, bits = 48, cands = n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(full == exact, "cands=n BQ must equal brute force exactly")
    // default shortlist: recall bounded below, and a wider shortlist never
    // hurts (candidate sets are nested in cands)
    def recallAt(c: Int) = {
      val got = Similarity.bqTopK(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", 10, bits = 48, cands = c)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val ex = exact.map { case (q, v, _, _) => (q, v) }
      (ex intersect got).size.toDouble / ex.size
    }
    val r50 = recallAt(50)
    val r200 = recallAt(200)
    info(f"BQ recall@10 (48 bits): cands=50 $r50%.2f, cands=200 $r200%.2f")
    assert(r50 > 0.35, f"48-bit Hamming shortlist of 50: $r50%.2f") // measured 0.44
    assert(r200 > 0.7, f"wider shortlist should recover most neighbors: $r200%.2f")
    assert(r200 >= r50)
  }

  test("rrfFuse: both-list docs outrank single-list docs; ranks contiguous") {
    import spark.implicits._
    // query 1: doc 10 is rank 1 in BOTH lists; doc 20 rank 2 lexical only;
    // doc 30 rank 1 vector only (so 30 beats 20 on the shared-rank term,
    // and 10 beats both by summing two legs)
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 10L, 1L), (1L, 30L, 1L)).toDF("query_id", "doc_id", "rank")
    val got = graft.similarity.Similarity.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(x => (x._1, x._2)).toSeq == Seq((10L, 1L), (30L, 2L), (20L, 3L)))
    // the scores are the literal reciprocal sums, rounded 6 (HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._3 == r6(1.0 / 61.0 + 1.0 / 61.0))
    assert(got(1)._3 == r6(1.0 / 61.0))
  }

  test("IVF ANN achieves reasonable recall vs brute force; more probes never hurt") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def ivf(nProbe: Int) = Similarity.ivfTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10, cells = 8, nProbe = nProbe)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val r2 = (exact intersect ivf(2)).size.toDouble / exact.size
    val r1 = (exact intersect ivf(1)).size.toDouble / exact.size
    info(f"IVF recall@10 (8 cells): 1 probe $r1%.2f, 2 probes $r2%.2f")
    assert(r2 > 0.5)
    assert(r2 >= r1)
  }

  test("IVFADC: deterministic, self-free, contiguous ranks, sane L2 recall") {
    import spark.implicits._
    val all = embs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect()
    val qs = all.filter(_._1 < 10).sortBy(_._1).toSeq
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    // exact L2 top-10 reference, computed driver-side (corpus is tiny)
    val exact = qs.flatMap { case (qid, qv) =>
      all.filter(_._1 != qid).map { case (id, v) => (id, l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10)
        .map { case (id, _) => (qid, id) }
    }.toSet
    def run() = Similarity.ivfAdcTopK(spark, embs, "vec_id", "embedding",
      qs, k = 10, cells = 4, nProbe = 4, m = 16, ks = 16)
    val got = run().select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect()
    // deterministic end to end
    assert(got.toSeq == run().select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq)
    // no self matches; ranks are 1..10 per query
    assert(!got.exists { case (q, v, _) => q == v })
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 10), s"query $q ranks")
    }
    // probing ALL cells leaves only PQ quantization error — recall vs
    // exact L2 must clear a sane floor for a 4×16 residual code budget
    val approx = got.map { case (q, v, _) => (q, v) }.toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVFADC recall@10 (4 cells, all probed, m=16 ks=16): $recall%.2f")
    assert(recall > 0.4)
  }

  test("connectedComponents labels every node with its component's min id") {
    import spark.implicits._
    // two components: {1,2,3,4} (a path — worst-case diameter) and {10,11};
    // 20 is absent from every edge
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents refuses to return an unconverged labeling") {
    import spark.implicits._
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 1)
    }
  }

  test("canonicalize maps singletons to themselves, cluster members to min id") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Dedup.canonicalize(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 9L))
  }

  test("brute-force ANN ranks by true cosine") {
    import spark.implicits._
    val got = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      embs.filter(col("vec_id") === 0), "vec_id", "embedding", 5)
      .orderBy("rank").select("sim").as[Double].collect()
    assert(got.sameElements(got.sorted(Ordering[Double].reverse)))
  }

  test("semDedup: planted duplicate clusters keep exactly the least-centroid-similar member") {
    import spark.implicits._
    // 3 exact-duplicate groups planted on top of the fixture corpus: clones
    // of vectors 0, 1, 2 with ids >= 10000 (cosine 1.0 to their source).
    val clones = embs.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val planted = embs.unionByName(clones)
    val out = Similarity.semDedup(planted, "vec_id", "embedding",
      tau = 0.999999, k = 8).cache()
    assert(out.count() == embs.count() + 3)
    // each planted pair: same cluster (identical vectors), identical csim →
    // id tie-break keeps the ORIGINAL (smaller id), drops the clone
    val flags = out.filter(col("id") < 3 || col("id") >= 10000)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    (0L until 3L).foreach { i =>
      assert(flags(i), s"original $i must be kept")
      assert(!flags(i + 10000), s"clone of $i must be dropped")
    }
    // a dropped row always has a kept, cosine-similar, more-keepable
    // neighbor in ITS OWN cluster: verify via the exact pair spec
    val dropped = out.filter(!col("keep")).select("id").as[Long].collect().toSet
    assert(dropped.nonEmpty)
    val pairs = Similarity.nearDupPairsExact(planted, "vec_id", "embedding", 0.999999)
      .as[(Long, Long, Double)].collect()
    dropped.intersect(Set(10000L, 10001L, 10002L)).foreach { d =>
      assert(pairs.exists(p => p._1 == d - 10000 && p._2 == d))
    }
  }

  test("int8 quantization: codes in range, error bounded by half a bucket") {
    import spark.implicits._
    val vs = Seq(
      (1L, Seq(0.0f, 10.0f, 5.0f)),
      (2L, Seq(1.0f, 10.0f, -5.0f)),   // dim 1 constant -> code 0, err 0...
      (3L, Seq(0.5f, 10.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vs, "vec_id", "embedding")
      .orderBy("id").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val codes = r.getString(1).split(",").map(_.toInt)
      assert(codes.forall(c => c >= 0 && c <= 255))
      // bucket half-width per dim: (hi-lo)/256/2; dims here span <= 10
      assert(r.getDouble(3) <= 10.0 / 256.0, s"max_abs_err ${r.getDouble(3)}")
    }
    // constant dimension (index 1, value 10 everywhere) must code to 0
    assert(out.forall(_.getString(1).split(",")(1) == "0"))
  }

  test("standardizeDims: per-dim z-scores, constant dims map to 0") {
    import spark.implicits._
    val vs = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)), (3L, Seq(5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.standardizeDims(vs, "vec_id", "embedding")
      .as[(Long, Int, Double)].collect()
    // dim 0 values {1,3,5}: mean 3, population std sqrt(8/3)
    val d0 = z.filter(_._2 == 0).sortBy(_._1).map(_._3)
    val expect = Seq(-2.0, 0.0, 2.0).map(_ / math.sqrt(8.0 / 3.0))
    d0.zip(expect).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5, s"got ${d0.toSeq}, want $expect")
    }
    // constant dim 1: std 0 -> all z = 0
    assert(z.filter(_._2 == 1).forall(_._3 == 0.0))
    // standardized column has mean ~0 and pop-variance ~1
    assert(math.abs(d0.sum) < 1e-9)
    assert(math.abs(d0.map(v => v * v).sum / 3 - 1.0) < 1e-6)
  }

  test("semDedup is invariant under repartitioning") {
    val a = Similarity.semDedup(embs, "vec_id", "embedding", tau = 0.35, k = 8)
      .orderBy("id").collect().toSeq
    val b = Similarity.semDedup(embs.repartition(17), "vec_id", "embedding",
      tau = 0.35, k = 8).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("semDedupSampledFit: rate 1.0 equals the full fit; partial fit still covers every id") {
    // threshold(1.0) = 2^32 keeps every row — the sampled path must then
    // be the SAME quantizer, so verdicts match row-for-row
    val full = Similarity.semDedup(embs, "vec_id", "embedding",
      tau = 0.35, k = 8).orderBy("id").collect().toSeq
    val all = Similarity.semDedupSampledFit(embs, "vec_id", "embedding",
      tau = 0.35, k = 8, fitRate = 1.0).orderBy("id").collect().toSeq
    assert(all == full)
    // a half-sample fit trains on fewer points but the assign pass must
    // still place EVERY input vector exactly once
    val half = Similarity.semDedupSampledFit(embs, "vec_id", "embedding",
      tau = 0.35, k = 8, fitRate = 0.5)
    assert(half.count() == embs.count())
    assert(half.select("id").distinct().count() == embs.count())
  }

  test("jaccardPairsAuto: dense/templated corpus routes to minhash, real text to ppjoin") {
    import spark.implicits._
    // templated corpus: every doc shares a 5-token boilerplate prefix and
    // differs in one id token — PPJoin's profiled candidate volume is
    // ~n²/2 (every pair collides on the shared lexicographic-first token)
    val dense = (0 until 200).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon w$i")).toDF("doc_id", "text")
    assert(Dedup.jaccardRoute(dense, "doc_id", "text", 0.9) == "minhash")
    // the auto join on that corpus is the minhash result
    val auto = Dedup.jaccardPairsAuto(dense, "doc_id", "text", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val mh = Dedup.minhashLshPairs(dense, "doc_id", "text", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == mh)
    // sparse-vocabulary corpus (each doc's tokens unique to its dup pair —
    // the Zipfian-tail shape): candidates ≈ output → exact PPJoin route,
    // and the auto result IS the exact result
    val sparse = (0 until 300).map(i =>
      (i.toLong, s"p${i / 2}x p${i / 2}y p${i / 2}z")).toDF("doc_id", "text")
    assert(Dedup.jaccardRoute(sparse, "doc_id", "text", 0.8) == "ppjoin")
    val autoSparse = Dedup.jaccardPairsAuto(sparse, "doc_id", "text", tau = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.jaccardPairs(sparse, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(autoSparse == exact && exact.size == 150)
    // the 31-word-vocab FIXTURE corpus is itself PPJoin's dense regime
    // (the round-5 finding the profiler exists to catch): minhash route
    assert(Dedup.jaccardRoute(docs, "doc_id", "text", 0.8) == "minhash")
  }

  test("similarity builders honor the caller-chosen storage level") {
    import org.apache.spark.storage.StorageLevel
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    reset()
    Dedup.jaccardPairs(docs, "doc_id", "text", 0.8,
      storage = Some(StorageLevel.DISK_ONLY)).count()
    val levels = spark.sparkContext.getPersistentRDDs.values
      .map(_.getStorageLevel).toSet
    assert(levels.nonEmpty && levels.forall(_ == StorageLevel.DISK_ONLY),
      s"expected only DISK_ONLY persisted blocks, got $levels")
    reset()
    Dedup.minhashLshPairs(docs, "doc_id", "text", tau = 0.7, storage = None).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "storage=None must not persist anything")
    reset()
    Similarity.semDedup(embs, "vec_id", "embedding", tau = 0.35, k = 8,
      storage = Some(StorageLevel.DISK_ONLY)).count()
    val sdLevels = spark.sparkContext.getPersistentRDDs.values
      .map(_.getStorageLevel).toSet
    assert(sdLevels.contains(StorageLevel.DISK_ONLY),
      s"semDedup scored vectors not persisted DISK_ONLY: $sdLevels")
    reset()
  }

  test("semDedupAutoK scales k with corpus size so cluster sizes stay bounded") {
    import spark.implicits._
    // deterministic synthetic embeddings: 2-d points on a hash-scattered grid
    def corpus(n: Int) = spark.range(0, n).select(col("id"),
        array((pmod(hash(col("id")), lit(1000)) / 100.0).cast("float"),
          (pmod(hash(col("id") * 7), lit(1000)) / 100.0).cast("float"))
          .as("embedding"))
    val small = Similarity.semDedupAutoK(corpus(100), "id", "embedding",
      tau = 0.999, kMin = 4, docsPerCluster = 50)
    val big = Similarity.semDedupAutoK(corpus(800), "id", "embedding",
      tau = 0.999, kMin = 4, docsPerCluster = 50)
    // k(100) = max(4, 2) = 4; k(800) = max(4, 16) = 16
    val kSmall = small.select(countDistinct(col("cluster"))).as[Long].head()
    val kBig = big.select(countDistinct(col("cluster"))).as[Long].head()
    assert(kSmall <= 4)
    assert(kBig > 4 && kBig <= 16,
      s"auto-k must grow clusters with n: got $kBig for n=800")
    // bounded pairwise work: max cluster size stays well under n
    val maxC = big.groupBy("cluster").count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxC < 800, s"one cluster swallowed the corpus: $maxC")
  }

  test("PQ: codes in range, ADC recall vs exact euclidean top-k, exact corpus → zero error") {
    import spark.implicits._
    val cb = Similarity.pqTrain(spark, embs, "vec_id", "embedding",
      m = 16, ks = 32, iterations = 5)
    assert(cb.length == 16 && cb.forall(_.length == 32) &&
      cb.forall(_.forall(_.length == 4)))
    val enc = Similarity.pqEncode(embs, "vec_id", "embedding", cb)
      .localCheckpoint()
    val codes = enc.select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 32), "code outside [0, ks)")
    assert(enc.filter(col("recon_err") < 0).count() == 0)

    // recall contract: ADC top-10 against the exact squared-euclidean
    // top-10 (same distance the codes approximate) for 5 probe queries.
    // The fixture is uniform noise — quantization's WORST case (random
    // top-10 overlap would be ~0.02 of the corpus → expected recall 0.2)
    // — so the contract is two-sided: (1) a 16×32 budget beats the random
    // baseline by 2×+, and (2) recall is MONOTONE in the code budget (the
    // knob a capacity decision turns at 100 TB).
    def recallAt10(codebooks: Seq[Seq[Seq[Double]]],
                   encoded: org.apache.spark.sql.DataFrame): Double = {
      val queries = embs.orderBy("vec_id").limit(5)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq
      val adc = Similarity.pqSearchAdc(encoded, codebooks, queries, k = 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val all = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect()
      def sq(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
      val recalls = queries.map { case (qid, qv) =>
        val exact = all.filter(_._1 != qid).sortBy(p => (sq(p._2, qv), p._1))
          .take(10).map(_._1).toSet
        (adc(qid) & exact).size / 10.0
      }
      recalls.sum / recalls.size
    }
    val rBig = recallAt10(cb, enc)
    assert(rBig >= 0.4, s"ADC recall@10 under 2x the random baseline: $rBig")
    val cbSmall = Similarity.pqTrain(spark, embs, "vec_id", "embedding",
      m = 2, ks = 4, iterations = 3)
    val rSmall = recallAt10(cbSmall,
      Similarity.pqEncode(embs, "vec_id", "embedding", cbSmall).localCheckpoint())
    assert(rBig > rSmall,
      s"recall must grow with code budget: 16x32 -> $rBig vs 2x4 -> $rSmall")

    // a corpus whose subvectors take ≤ ks distinct values reconstructs
    // EXACTLY: codebooks converge onto the true patterns (deterministic
    // init covers them — the first ks vectors hold all ks patterns)
    val patterns = (0 until 4).map(p =>
      Seq.tabulate(64)(d => (p * 64 + d).toDouble))
    val tiny = (0 until 20).map(i => (i.toLong, patterns(i % 4)))
      .toDF("vec_id", "embedding")
    val cb2 = Similarity.pqTrain(spark, tiny, "vec_id", "embedding",
      m = 4, ks = 4, iterations = 3)
    val err = Similarity.pqEncode(tiny, "vec_id", "embedding", cb2)
      .agg(max(col("recon_err"))).head().getDouble(0)
    assert(err == 0.0, s"exact-representable corpus must reconstruct: $err")
  }

  test("minhashLshEdges: component-equal to naive pairs at linear edge cost") {
    import spark.implicits._
    // 50 exact copies of one boilerplate + near-dup pair + distinct docs
    val boiler = "subscribe to our newsletter for updates and offers every week " +
      "click here to manage preferences or unsubscribe from this mailing list"
    val near1 = "the quick brown fox jumps over the lazy dog near the old mill"
    val near2 = "the quick brown fox jumps over the lazy dog near the old barn"
    val corpus = ((0L until 50L).map(i => (i, boiler)) :+
      (100L, near1) :+ (101L, near2) :+
      (200L, "completely unrelated text about distributed query planning") :+
      (201L, "another standalone document on columnar storage formats"))
      .toDF("doc_id", "text")
    val naive = Dedup.minhashLshPairs(corpus, "doc_id", "text", 2, 4, 4, 0.8)
      .localCheckpoint()
    val edges = Dedup.minhashLshEdges(corpus, "doc_id", "text", 2, 4, 4, 0.8)
      .localCheckpoint()
    // the whole point: quadratic clique (1225 pairs for the 50-class)
    // becomes a linear star (49 edges)
    assert(naive.count() >= 1225L, s"naive=${naive.count()}")
    assert(edges.count() <= naive.count() - 1000,
      s"edges=${edges.count()} naive=${naive.count()}")
    // identical canonical labels
    val a = Dedup.canonicalize(corpus, "doc_id", naive)
      .as[(Long, Long)].collect().toMap
    val b = Dedup.canonicalize(corpus, "doc_id", edges)
      .as[(Long, Long)].collect().toMap
    assert(a == b, s"labels diverged: ${a.toSeq.sorted.take(8)} vs ${b.toSeq.sorted.take(8)}")
    // sanity: the boilerplate class collapsed to min id 0, near pair joined
    assert((0L until 50L).forall(i => a(i) == 0L))
    assert(a(100L) == a(101L) && a(200L) == 200L)
  }

  test("leakage-safe split: near-dup clusters never straddle a split") {
    import spark.implicits._
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, bands = 4, rowsPerBand = 4, tau = 0.8)
    val split = Dedup.splitLeakageSafe(docs, "doc_id", pairs, Seq(0.8, 0.1, 0.1))
      .localCheckpoint()
    // exhaustive: every doc assigned exactly one split in range
    assert(split.count() == docs.count())
    assert(split.filter(col("split") < 0 || col("split") > 2).isEmpty)
    // the leakage guard: one split per cluster
    val perCluster = split.groupBy("canon_id")
      .agg(countDistinct("split").as("k"))
    assert(perCluster.filter(col("k") =!= 1).isEmpty,
      "a near-dup cluster straddles splits")
    // non-degenerate on the fixture: at least one real (size>1) cluster
    // and more than one split represented overall
    assert(split.groupBy("canon_id").count().filter(col("count") > 1).count() > 0)
    assert(split.select(countDistinct("split")).head().getLong(0) > 1)
    // agrees with a plain split applied to the canonical id
    val plain = graft.ops.Sampling.splitByHash(
      split.select("doc_id", "canon_id"), col("canon_id"), Seq(0.8, 0.1, 0.1))
      .withColumnRenamed("split", "split2")
    assert(split.join(plain, Seq("doc_id", "canon_id"))
      .filter(col("split") =!= col("split2")).isEmpty)
  }

  test("substringDedupRewrite cuts duplicated spans, keeps the first copy") {
    import spark.implicits._
    // docs 1 and 2 share the 3-token span "a b c"; doc 1 is the global
    // first occurrence (min (id, pos)) and keeps it; doc 2 loses exactly
    // those three tokens. doc 3 is short (< w tokens) and passes through;
    // doc 4 shares nothing.
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "p q a b c r"),
      (3L, "a b"),
      (4L, "m n o u v w")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup
      .substringDedupRewrite(docs, "doc_id", "text", w = 3, minDocs = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a b c x y z", 6L, 0L),
      (2L, "p q r", 6L, 3L),
      (3L, "a b", 2L, 0L),
      (4L, "m n o u v w", 6L, 0L)))
    // idempotence on its own output: rewriting the cleaned corpus again
    // drops nothing (the kept copy is now the only occurrence)
    val again = graft.dedup.Dedup.substringDedupRewrite(
      Seq((1L, "a b c x y z"), (2L, "p q r"), (3L, "a b"),
        (4L, "m n o u v w")).toDF("doc_id", "text"),
      "doc_id", "text", w = 3, minDocs = 2)
    assert(again.filter(col("n_dropped") > 0).isEmpty)
  }
}
