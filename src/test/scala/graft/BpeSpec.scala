package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer against the Sennrich et al. (2016) reference example:
  * the corpus {low ×5, lower ×2, newest ×6, widest ×3} with an end-of-word
  * marker must learn the canonical merge sequence under the deterministic
  * tie-break (count desc, pair lexicographic asc).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // one doc per word occurrence so the word-frequency dictionary is exact
  private def corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("train learns the canonical Sennrich merge sequence") {
    val rules = Bpe.train(spark, corpus, "text", nMerges = 6)
    // hand-derived: (e,s)=9 wins the 9-way tie lexicographically, then the
    // merged symbol chains, then (l,o)/(lo,w) at 7, then (e,w) at 6
    assert(rules == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")), s"got $rules")
  }

  test("tokenize segments an UNSEEN word with the learned vocab") {
    val rules = Bpe.train(spark, corpus, "text", nMerges = 6)
    val toks = Bpe.tokenize(spark,
        Seq((42L, "lowest")).toDF("doc_id", "text"), "doc_id", "text", rules)
      .as[(Long, String)].collect().toSeq
    // the textbook result: "lowest" -> low + est</w>
    assert(toks == Seq((42L, "low"), (42L, "est</w>")), s"got $toks")
  }

  test("mergePair is left-to-right non-overlapping") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.mergePair(Nil, "a", "b") == Nil)
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text") // 1-char words: only marker pairs
    val rules = Bpe.train(spark, tiny, "text", nMerges = 10)
    // merges (a,</w>) and (b,</w>) exhaust every pair; no further rules
    assert(rules.size == 2 && rules.toSet ==
      Set(("a", "</w>"), ("b", "</w>")), s"got $rules")
  }

  test("train agrees with an in-memory reference BPE on random corpora") {
    // reference implementation: plain Scala fold over a word-count map,
    // same tie-break (count desc, then (a, b) lexicographic asc)
    def refTrain(words: Seq[String], nMerges: Int): Seq[(String, String)] = {
      var dict: Map[Seq[String], Long] = words.groupBy(identity)
        .map { case (w, g) => (w.map(_.toString) :+ "</w>", g.size.toLong) }
      val out = Seq.newBuilder[(String, String)]
      var continue = true
      var i = 0
      while (i < nMerges && continue) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        dict.foreach { case (syms, c) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) continue = false
        else {
          val (a, b) = counts.toSeq
            .sortBy { case ((x, y), c) => (-c, x, y) }.head._1
          out += ((a, b))
          dict = dict.toSeq.map { case (syms, c) =>
            (graft.ops.Bpe.mergePair(syms, a, b), c)
          }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
          i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      // small vocab + short words force heavy pair ties — the regime
      // where a wrong tie-break diverges immediately
      val words = Seq.fill(30)(
        (0 until 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = Bpe.train(spark, docs, "text", nMerges = 5)
      val want = refTrain(words, nMerges = 5)
      assert(got == want, s"trial $trial: got $got want $want (corpus $words)")
    }
  }

  test("pairCounts matches a hand count on the reference corpus") {
    val got = Bpe.pairCounts(spark, corpus, "text")
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got(("e", "s")) == 9L)   // newest 6 + widest 3
    assert(got(("w", "e")) == 8L)   // lower 2 + newest 6
    assert(got(("l", "o")) == 7L)
    assert(got(("t", "</w>")) == 9L)
    assert(got(("w", "</w>")) == 5L) // low's marker pair
  }

  test("fixtureRules: golden segmentations incl. composite-rule ordering") {
    // the two composite rules only exist after their inputs merged —
    // segment() must apply rules IN ORDER for these to come out
    assert(Bpe.segment("scan", Bpe.fixtureRules) == Seq("scan", "</w>"))
    assert(Bpe.segment("query", Bpe.fixtureRules) == Seq("qu", "er", "y", "</w>"))
    assert(Bpe.segment("customer", Bpe.fixtureRules) ==
      Seq("c", "u", "s", "t", "o", "m", "er</w>"))
    assert(Bpe.segment("the", Bpe.fixtureRules) == Seq("th", "e</w>"))
    assert(Bpe.segment("window", Bpe.fixtureRules) ==
      Seq("w", "i", "n", "d", "ow", "</w>"))
    // a word no rule touches stays fully split
    assert(Bpe.segment("big", Bpe.fixtureRules) == Seq("b", "i", "g", "</w>"))
  }

  test("fixtureRules fire at most once per fixture-vocabulary word") {
    // THE property that makes the DuckDB oracle's one-replace-per-rule
    // replay exact: if fixture drift ever lets a rule fire twice in one
    // word, this fails before the oracle silently diverges
    val dict = graft.core.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextAnalysis.tokensArr(col("text")))
        .as("w"))
      .distinct().as[String].collect()
    assert(dict.nonEmpty)
    for (w <- dict) {
      var syms: Seq[String] = w.map(_.toString) :+ "</w>"
      for ((a, b) <- Bpe.fixtureRules) {
        val fires = syms.iterator.zip(syms.iterator.drop(1))
          .count(p => p._1 == a && p._2 == b)
        assert(fires <= 1, s"rule ($a,$b) fires $fires times in '$w'")
        syms = Bpe.segment(w, Bpe.fixtureRules.takeWhile(_ != (a, b)) :+ ((a, b)))
      }
    }
  }

  test("applyVocab (dictionary-grain) agrees with tokenize (corpus-grain)") {
    // same frozen table, two execution shapes: exploding the corpus via
    // tokenize and the never-explode dictionary-count path must produce
    // identical token counts
    val docs = graft.core.Tables.documents(spark, sfDir)
      .limit(200).select(col("doc_id"), col("text"))
    val viaTokens = Bpe.tokenize(spark, docs, "doc_id", "text", Bpe.fixtureRules)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val viaVocab = Bpe.applyVocab(spark, docs, "text", Bpe.fixtureRules)
      .select("tok", "cnt").as[(String, Long)].collect().toMap
    assert(viaVocab == viaTokens,
      s"dictionary-grain and corpus-grain counts diverge: " +
        s"${(viaVocab.toSet diff viaTokens.toSet).take(5)}")
    // ids are dense 1..V by (cnt desc, tok asc)
    val ids = Bpe.applyVocab(spark, docs, "text", Bpe.fixtureRules)
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ids.map(_._2).toSeq == (1L to ids.length).toSeq)
    assert(ids.sortBy(t => (-t._3, t._1)).map(_._2).toSeq ==
      (1L to ids.length).toSeq)
  }

  test("wordpieceStats: greedy longest-match, UNK chars advance singly — hand-computed") {
    // "window" is one whole-word piece (beats "wind"); "windows" adds an
    // UNK 's'; "scanner" = scan|n|er (longest "scan" beats "sc", bare
    // 'n' is UNK); "then" = the|n ("the" beats "th"); "string" =
    // str|ing; "xyz" is three UNK chars
    val docs = Seq((1L, "window windows scanner the then string xyz window"))
      .toDF("doc_id", "text")
    val got = Bpe.wordpieceStats(spark, docs, "text", Bpe.fixtureVocab)
      .orderBy("word").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("scanner", 1L, 3L), ("string", 1L, 2L), ("the", 1L, 1L),
      ("then", 1L, 2L), ("window", 2L, 1L), ("windows", 1L, 2L),
      ("xyz", 1L, 3L)), got.toString)
  }
}
